"""Motion-module + VAE decode micro-profiles (in-jit scans, TPU).

Isolates where the 212 ms/step of motion-module time goes by timing
stripped-down variants of the temporal stack on the real 512px shapes, and
sweeps VAE decode slice sizes.  Run: ``python -m i2v_adapter_tpu.ops.profile_motion``.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2v_adapter_tpu.models.temporal import TemporalTransformer
from i2v_adapter_tpu.ops.attention import temporal_attention

B, F = 2, 16
SITES = [(64, 320), (32, 640), (16, 1280), (8, 1280)]
N_ITERS = 16


def bench_scan(name, module, x_shape, dtype=jnp.bfloat16, **apply_kwargs):
    x0 = jax.random.normal(jax.random.PRNGKey(0), x_shape, dtype)
    params = module.init(jax.random.PRNGKey(1), x0, **apply_kwargs)

    def run(params, x0):
        def step(x, _):
            return module.apply(params, x, **apply_kwargs).astype(x.dtype), None

        return jax.lax.scan(step, x0, None, length=N_ITERS)[0]

    f = jax.jit(run)
    xs = [jax.random.normal(jax.random.PRNGKey(i), x_shape, dtype) for i in (2, 3)]
    out = f(params, xs[0])
    float(out.ravel()[0])  # block_until_ready is a no-op on the tunnel
    t0 = time.time()
    out = f(params, xs[1])
    float(out.ravel()[0])
    per = (time.time() - t0 - 0.07) / N_ITERS  # dispatch+readback overhead
    print(f"{name:34s} {per * 1e3:8.2f} ms", flush=True)
    return per


class NormOnly(nn.Module):
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, num_frames):
        bf, h, w, c = x.shape
        b = bf // num_frames
        t = x.reshape(b, num_frames * h * w, c)
        t = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype)(t)
        return t.reshape(bf, h, w, c) + x


class ProjOnly(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, num_frames):
        bf, h, w, c = x.shape
        t = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        t = nn.Dense(c, dtype=self.dtype, name="proj_out")(t)
        return t + x


class AttnOnly(nn.Module):
    heads: int = 8
    impl: str = "vpu"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, num_frames):
        bf, h, w, c = x.shape
        b = bf // num_frames
        t = x.reshape(b, num_frames, h * w, c)
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="q")(t)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="k")(t)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="v")(t)
        o = temporal_attention(q, k, v, heads=self.heads, impl=self.impl)
        return (o + t).reshape(bf, h, w, c)


class FFOnly(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, num_frames):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(x.shape[-1] * 8, dtype=self.dtype)(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g)
        return x + nn.Dense(x.shape[-1], dtype=self.dtype)(h)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    total = {}
    for hw, c in SITES:
        n_sites = {64: 5, 32: 5, 16: 5, 8: 1}[hw]  # sites per level (down+up+mid approx)
        shape = (B * F, hw, hw, c)
        print(f"--- level {hw}x{hw} c={c} (x{n_sites} sites) ---", flush=True)
        for name, mod in (
            ("full motion module", TemporalTransformer(heads=8, dim_head=c // 8,
                                                       dtype=jnp.bfloat16)),
            ("groupnorm only", NormOnly()),
            ("proj in+out only", ProjOnly()),
            ("temporal attn (vpu)", AttnOnly(impl="vpu")),
            ("temporal attn (vpu2)", AttnOnly(impl="vpu2")),
            ("temporal attn (mxu)", AttnOnly(impl="mxu")),
            ("geglu ff only", FFOnly()),
        ):
            key = f"{name}@{hw}"
            try:
                total[key] = bench_scan(name, mod, shape, num_frames=F) * n_sites
            except Exception as e:  # noqa: BLE001
                print(f"{name} FAILED: {type(e).__name__} {e}", flush=True)

    # VAE decode slice sweep
    from i2v_adapter_tpu.config import VAEConfig
    from i2v_adapter_tpu.models.vae import AutoencoderKL, decode_sliced

    cfg = VAEConfig()
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3),
                                                          jnp.bfloat16))
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    z0 = jax.random.normal(jax.random.PRNGKey(0), (16, 64, 64, 4), jnp.bfloat16)
    z1 = jax.random.normal(jax.random.PRNGKey(1), (16, 64, 64, 4), jnp.bfloat16)
    for s in (1, 2, 4, 8, 16):
        try:
            f = jax.jit(lambda p, z, s=s: decode_sliced(
                lambda pp, zz: vae.apply(pp, zz, method=vae.decode), p, z, s))
            out = f(params, z0)
            float(out.ravel()[0])
            t0 = time.time()
            out = f(params, z1)
            float(out.ravel()[0])
            print(f"vae decode slice={s:2d}: {time.time() - t0 - 0.07:6.3f} s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"vae decode slice={s}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
