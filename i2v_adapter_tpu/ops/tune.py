"""Attention micro-benchmark: Pallas vs XLA per model attention site.

Run on the TPU to pick the fastest implementation per shape:
``python -m i2v_adapter_tpu.ops.tune`` prints a table of per-site timings
(the SD1.5 512px/16-frame workload shapes) for the pallas kernel at several
block sizes and the XLA einsum path.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from i2v_adapter_tpu.ops.attention import flash_attention, xla_attention

# (name, Bq, Bkv, Nq, Nk, H, D) — CFG-doubled 16-frame 512px SD1.5 workload
SITES = [
    ("spat64 d40", 32, 32, 4096, 4096, 8, 40),
    ("xfrm64 d40", 32, 2, 4096, 4096, 8, 40),
    ("spat32 d80", 32, 32, 1024, 1024, 8, 80),
    ("xfrm32 d80", 32, 2, 1024, 1024, 8, 80),
]

BLOCKS = (
    (512, 1024), (512, 2048), (1024, 1024), (256, 4096), (512, 4096),
    (1024, 2048),
)


def _bench(fn, arg_sets, iters: int = 6) -> float:
    """Cycle distinct input sets — the TPU tunnel memoizes identical
    dispatches, so same-input loops report fantasy numbers."""
    out = fn(*arg_sets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*arg_sets[i % len(arg_sets)]))
    jax.block_until_ready(outs)
    # force a real host readback in case block_until_ready is lazy on the
    # tunneled backend
    _ = [float(o.ravel()[0]) for o in outs]
    return (time.perf_counter() - t0) / iters


def main():
    dtype = jnp.bfloat16
    print(f"backend: {jax.default_backend()}  dtype: {dtype.__name__}")
    for name, bq, bkv, nq, nk, h, d in SITES:
        arg_sets = []
        for s in range(3):
            kq, kk, kv = jax.random.split(jax.random.PRNGKey(s), 3)
            arg_sets.append((
                jax.random.normal(kq, (bq, nq, h, d), dtype),
                jax.random.normal(kk, (bkv, nk, h, d), dtype),
                jax.random.normal(kv, (bkv, nk, h, d), dtype),
            ))
        rep = bq // bkv
        flops = 4 * bq * h * nq * nk * d  # QK^T + PV

        results = {}
        for bq_blk, bkv_blk in BLOCKS:
            if bq_blk > nq or bkv_blk > nk:
                continue
            try:
                f_p = jax.jit(
                    lambda q, k, v, a=bq_blk, b=bkv_blk: flash_attention(
                        q, k, v, kv_repeat=rep, block_q=a, block_kv=b
                    )
                )
                results[f"pallas {bq_blk}/{bkv_blk}"] = _bench(f_p, arg_sets)
            except Exception as e:  # noqa: BLE001
                results[f"pallas {bq_blk}/{bkv_blk}"] = float("nan")
                print(f"  pallas {bq_blk}/{bkv_blk} failed: {e}")

        best = min((v for v in results.values() if v == v), default=float("nan"))
        line = "  ".join(
            f"{k}={v * 1e3:7.2f}ms({flops / v / 1e12:5.1f}T)" if v == v else f"{k}=FAIL"
            for k, v in results.items()
        )
        print(f"{name:13s} {line}   best={best * 1e3:.2f}ms")


if __name__ == "__main__":
    main()
