"""Microbench: int8 lowering options for the transformer dense matmuls.

Round-2 measured XLA ``dot_general`` int8 at NO gain over bf16 on v5e
(108 vs 106 T/s) while int8 *convolutions* gain 1.34x — both run on the
same MXU, so the dot lowering, not the hardware, is the limiter.  This
tool times the UNet's actual projection/FF shapes through four lowerings:

  bf16 dot            — the current serving path
  int8 dot_general    — the round-2 dead end (re-verified here)
  int8 1x1 conv       — reformulates (M,K)@(K,N) as NHWC conv, riding the
                        conv path that measurably gains from int8
  int8 pallas         — explicit MXU tiles with int32 accumulation

Run: ``python -m i2v_adapter_tpu.ops.profile_int8_dense``.
"""

from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (M, K, N) of the hot dense sites at 512px/16f CFG-doubled (B*F=32):
# QKV/out projections and the GEGLU FF at each UNet level.
SHAPES = [
    (32 * 4096, 320, 320),    # L0 qkv/out
    (32 * 4096, 320, 960),    # L0 fused qkv
    (32 * 4096, 320, 640),    # L0 fused kv
    (32 * 4096, 320, 2560),   # L0 ff in (geglu 2*4*dim)
    (32 * 4096, 1280, 320),   # L0 ff out
    (32 * 1024, 640, 640),    # L1 qkv/out
    (32 * 1024, 640, 1920),   # L1 fused qkv
    (32 * 1024, 640, 5120),   # L1 ff in
    (32 * 1024, 2560, 640),   # L1 ff out
    (32 * 256, 1280, 1280),   # L2/L3 qkv/out
    (32 * 256, 1280, 3840),   # L2 fused qkv
    (32 * 256, 1280, 10240),  # L2 ff in
    (32 * 256, 5120, 1280),   # L2 ff out
]

SCAN_ITERS = 32


def _timed(fn, *args) -> float:
    """Median seconds per call of jit(fn) amortized over an in-jit scan
    (the tunnel costs ~0.3 s per dispatch; per-call host timing lies)."""

    def scanned(x, *rest):
        # Unrolled chain of data-dependent calls in ONE device program.
        # scan/while iterations cost ~0.9 ms each on this tunnel backend
        # (measured: an empty-body scan times the same as one with an
        # 8 GFLOP matmul), so loop-based amortization swamps sub-ms kernels;
        # the chained scalar perturbation defeats CSE/hoisting instead.
        carry = jnp.float32(0)
        for _ in range(SCAN_ITERS):
            out = fn(x + carry.astype(x.dtype), *rest)
            carry = jnp.sum(out[..., :1].astype(jnp.float32)) * 1e-9
        return carry

    f = jax.jit(scanned)
    float(f(*args))  # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        float(f(*args))
        times.append((time.time() - t0) / SCAN_ITERS)
    return sorted(times)[1]


def bf16_dot(x, w, ws):
    return x @ w.astype(jnp.bfloat16)


def int8_dot(x, w, ws):
    xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)


def int8_conv(x, w, ws):
    m, k = x.shape
    n = w.shape[1]
    xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq.reshape(1, m // 128, 128, k), w.reshape(1, 1, k, n), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.reshape(m, n).astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)


def _int8_mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _fin():
        o_ref[...] = acc_ref[...]


def int8_pallas(x, w, ws, block_m=512, block_n=512, block_k=None):
    m, k = x.shape
    n = w.shape[1]
    block_k = block_k or min(k, 1280)
    block_n = min(block_n, n)
    block_m = min(block_m, m)
    xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    k_steps = pl.cdiv(k, block_k)
    y = pl.pallas_call(
        functools.partial(_int8_mm_kernel, k_steps=k_steps),
        grid=(m // block_m, n // block_n, k_steps),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, t: (t, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, t: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + 4 * m * n,
            transcendentals=0,
        ),
    )(xq, w)
    return (y.astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)


def main() -> None:
    key = jax.random.PRNGKey(0)
    print(f"{'shape':>24} {'bf16':>8} {'i8dot':>8} {'i8conv':>8} "
          f"{'i8pallas':>9}  (ms, T/s in parens)")
    for m, k, n in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, (m * k * n) % (1 << 31)))
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        wf = jax.random.normal(kw, (k, n), jnp.float32) / k**0.5
        ws = jnp.max(jnp.abs(wf), axis=0) / 127.0
        wq = jnp.round(wf / ws).astype(jnp.int8)
        flops = 2 * m * k * n
        cols = []
        for name, fn, w in (
            ("bf16", bf16_dot, wf.astype(jnp.bfloat16)),
            ("i8dot", int8_dot, wq),
            ("i8conv", int8_conv, wq),
            ("i8pallas", int8_pallas, wq),
        ):
            try:
                dt = _timed(fn, x, w, ws)
                cols.append(f"{dt * 1e3:7.3f}({flops / dt / 1e12:4.0f})")
            except Exception as e:  # noqa: BLE001
                cols.append(f"ERR:{type(e).__name__[:12]}")
        print(f"{f'{m}x{k}x{n}':>24} " + " ".join(cols))


if __name__ == "__main__":
    main()
