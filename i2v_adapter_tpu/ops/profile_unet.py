"""UNet step profiler: isolates component costs by ablation.

Times ``lax.scan`` over N UNet evaluations inside ONE jit dispatch (the
axon tunnel costs ~0.3 s per dispatch, so per-call timing of sub-second
kernels lies).  Params are passed as arguments (closure constants get
re-shipped through the tunnel every call).

Variants isolate: pallas vs XLA attention, motion modules, the i2v adapter,
and the IP branch.  Run: ``python -m i2v_adapter_tpu.ops.profile_unet``.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from i2v_adapter_tpu.config import VideoUNetConfig
from i2v_adapter_tpu.models import VideoUNet

N_STEPS = 8
FRAMES = 16
LAT = 64  # 512px


def time_config(name: str, cfg: VideoUNetConfig, params=None):
    dtype = jnp.bfloat16
    unet = VideoUNet(cfg, dtype=dtype)
    b = 2  # CFG-doubled single clip
    sample = jnp.zeros((b, FRAMES, LAT, LAT, 4), dtype)
    text = jnp.zeros((b, 77 + (4 if cfg.use_ip_adapter else 0), 768), dtype)

    if params is None:
        shapes = jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0), sample, jnp.zeros((b,)), text, None,
                enable_cross_frame_attn=cfg.use_i2v_adapter,
            )
        )
        # bf16 weights like serving (fp32 zeros double the weight reads and
        # halve matmul rate — round-2 lesson: it inflated every component)
        params = jax.tree.map(
            lambda s: jnp.zeros(
                s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
            ),
            shapes,
        )

    def run(params, x0):
        def step(x, _):
            out = unet.apply(
                params, x, jnp.zeros((b,)), text, None,
                enable_cross_frame_attn=cfg.use_i2v_adapter,
            )
            # feed output back so steps can't be parallelized/elided
            return out.astype(x.dtype), None

        x, _ = jax.lax.scan(step, x0, None, length=N_STEPS)
        return x

    f = jax.jit(run)
    x0s = [
        jax.random.normal(jax.random.PRNGKey(i), sample.shape, dtype)
        for i in range(2)
    ]
    t0 = time.time()
    out = f(params, x0s[0])
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = f(params, x0s[1])
    jax.block_until_ready(out)
    total = time.time() - t0
    per_step = (total - 0.3) / N_STEPS  # subtract tunnel dispatch overhead
    print(
        f"{name:28s} per-step {per_step * 1e3:7.1f} ms  "
        f"(total {total:.2f}s, compile {compile_s:.0f}s)",
        flush=True,
    )
    return per_step


def main():
    base = VideoUNetConfig()  # ip branch needs image_embeds; drop it here
    base = base.replace(use_ip_adapter=False)
    no_attn = (False,) * 4
    variants = [
        ("full (pallas attn)", base),
        ("no motion modules", base.replace(use_motion_modules=False)),
        ("no i2v adapter", base.replace(use_i2v_adapter=False)),
        ("2d unet only",
         base.replace(use_motion_modules=False, use_i2v_adapter=False)),
        ("convs only (no attn/motion)",
         base.replace(use_motion_modules=False, use_i2v_adapter=False,
                      down_block_has_attention=no_attn,
                      up_block_has_attention=no_attn)),
    ]
    for name, cfg in variants:
        try:
            time_config(name, cfg)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
