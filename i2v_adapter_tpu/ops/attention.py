"""Fused attention kernel family (Pallas/TPU) with an XLA fallback.

One kernel serves every attention site in the video UNet (SURVEY.md §2.4):

* spatial self-attention            — q = k = v, per frame
* I2V cross-frame attention         — K/V come from the *first frame* of each
  clip.  The reference materializes the broadcast with ``einops.repeat``
  (/root/reference/src/modules/i2v_adapter.py:484-492); here the kernel's
  index map reads the same first-frame block for all frames of a clip, so the
  repeat never hits HBM (``kv_repeat`` argument).
* text / IP-Adapter cross-attention — short K/V (77 text + 4 image tokens)
* temporal (motion-module) attention — tiny sequence, huge batch

Layout convention: ``q: (Bq, Nq, H, D)``, ``k/v: (Bkv, Nk, H, D)`` with
``Bq = Bkv * kv_repeat`` and the repeated axis *minor* in Bq (clip-major,
frame-minor — matching the reference's ``(b f) n d`` flattening).

The Pallas forward is wrapped in a ``jax.custom_vjp`` whose backward pass is
the straightforward XLA formulation: training resolutions (256px → ≤1024
tokens) don't need a flash backward, and XLA fuses it well.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(n: int, preferred: int, align: int = 8) -> int:
    """Largest block <= preferred that tiles padded-n reasonably."""
    if n <= preferred:
        return _round_up(n, align)
    return preferred


# ---------------------------------------------------------------------------
# XLA reference / fallback implementation
# ---------------------------------------------------------------------------


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_repeat: int = 1,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain einsum attention with fp32 softmax; autodiff-friendly."""
    bq, nq, h, d = q.shape
    bkv, nk, _, _ = k.shape
    if bq != bkv * kv_repeat:
        raise ValueError(f"batch mismatch: {bq} != {bkv} * {kv_repeat}")
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qr = q.reshape(bkv, kv_repeat, nq, h, d)
    scores = jnp.einsum(
        "brqhd,bkhd->brhqk", qr, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(scores * scale, axis=-1)
    out = jnp.einsum(
        "brhqk,bkhd->brqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(bq, nq, h, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
    *, kv_len: int, block_kv: int,
):
    """Online-softmax attention over one (batch*head, q-block) program.

    Grid = (BH, num_q_blocks, num_kv_blocks) with kv innermost; running max /
    sum / accumulator live in VMEM scratch across the kv iterations.

    q arrives pre-scaled by ``scale * log2(e)`` so the scores live in log2
    space: the softmax runs on ``exp2`` (what ``exp`` lowers to anyway) and
    the per-element ``s * scale`` multiply disappears from the VPU hot path.
    """
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -1e30)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (block_q, d_pad)
    kb = k_ref[0]  # (block_kv, d_pad)
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_kv), log2-space scores

    # mask out kv padding in the last block (static check first; every
    # shape in the video UNet is block-aligned so this is normally dead)
    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
        s = jnp.where(col < kv_len, s, -1e30)

    m_prev = m_scratch[:]  # (block_q, LANE)
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
    m_cur = jnp.broadcast_to(m_cur, m_prev.shape)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)  # (block_q, LANE) — all lanes equal
    p = jnp.exp2(s - m_new[:, :1])  # (block_q, block_kv)
    l_new = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
    )

    m_scratch[:] = m_new
    l_scratch[:] = l_new
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, d_pad)
    acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + pv

    @pl.when(j == num_kv - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / l_scratch[:, :1]).astype(o_ref.dtype)


def _flash_kernel_t(
    q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
    *, kv_len: int, block_kv: int, out_t: bool = False,
    static_max: float = 0.0, lse_ref=None, fused_rowsum: bool = False,
):
    """Transposed-input variant: q/k/v arrive as (1, Dp, block) — the layout
    the projection matmuls already produce on TPU ((B,H,D,N) row-major is
    byte-identical to XLA's natural transposed-matmul output), so the
    (B,N,H,D)->(B,H,N,D) HBM copies before the kernel disappear.  The MXU
    contracts over sublanes on both operands (the "TN" dot form it natively
    streams); output stays (block_q, Dp) row-major for the to_out matmul."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -1e30)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (d_pad, block_q)
    kb = k_ref[0]  # (d_pad, block_kv)
    s = jax.lax.dot_general(
        q, kb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_kv), log2-space scores

    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
        s = jnp.where(col < kv_len, s, -1e30)

    dp = v_ref.shape[1]
    if fused_rowsum:
        # Fold the softmax row-sum into the p@v MXU dot: append an 8-row
        # ones block to the v tile (sublane rule needs multiples of 8) so
        # output lanes [dp:dp+8] each hold sum_k p — the output tile is
        # 128 lanes either way (d = 40/80/160 all stay within the same
        # lane-tile count), so the MXU does the reduction for free and the
        # cross-lane jnp.sum VPU pass disappears.  The in-VMEM concat
        # copies dp*block_kv v-elements — 1/12.8th of one score pass at
        # block_q=512.  l then lives in acc column dp; l_scratch is unused.
        vb = jnp.concatenate(
            [v_ref[0], jnp.ones((8, v_ref.shape[2]), v_ref.dtype)], axis=0
        )
    else:
        vb = v_ref[0]

    if static_max:
        # Static-offset softmax: exp2(s - C) with a compile-time C instead
        # of the per-row running max.  Exact for log2-scores in
        # [C-110, C+127] (fp32 exponent range with the 4096-term sum) —
        # LayerNormed activations keep |s| well inside that; serving
        # numerics match the exact path (tested).  Removes the full
        # (block_q, block_kv) max pass AND the online rescale machinery —
        # the kernel is VPU-softmax-bound, so one fewer pass is ~20%.
        p = jnp.exp2(s - static_max)
        if not fused_rowsum:
            l_scratch[:] = l_scratch[:] + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_scratch.shape
            )
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:] = acc_scratch[:] + pv
    else:
        m_prev = m_scratch[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_cur = jnp.broadcast_to(m_cur, m_prev.shape)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new[:, :1])
        if not fused_rowsum:
            l_scratch[:] = alpha * l_scratch[:] + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_scratch.shape
            )

        m_scratch[:] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, d_pad [+8])
        # with fused_rowsum the alpha rescale applies to the l column of
        # acc exactly as the explicit l update did
        acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + pv

    @pl.when(j == num_kv - 1)
    def _finalize():
        if fused_rowsum:
            l_col = acc_scratch[:, dp : dp + 1]
            o = (acc_scratch[:, :dp] / l_col).astype(o_ref.dtype)
        else:
            l_col = l_scratch[:, :1]
            o = (acc_scratch[:] / l_col).astype(o_ref.dtype)
        # out_t writes (d_pad, block_q): the in-VMEM transpose is a few
        # thousand elements; it lets the HBM output keep the N-minor layout
        # the to_out matmul can read without a materialized copy.
        o_ref[0] = jnp.transpose(o, (1, 0)) if out_t else o
        if lse_ref is not None:
            # log2-space logsumexp per q row (the softmax denominator the
            # flash backward needs): m + log2(l); under the static offset
            # m == static_max identically.  Ref block is (1, 1, block_q) —
            # Mosaic requires the last two block dims be (8,128)-divisible
            # or full, which a 2-D (1, block_q) row block violates.
            m_term = (
                jnp.float32(static_max) if static_max else m_scratch[:, :1]
            )
            lse = m_term + jnp.log2(l_col)  # (block_q, 1)
            lse_ref[0] = jnp.transpose(lse, (1, 0))


def _flash_forward_t(
    q3: jnp.ndarray,  # (BH, Dp, Nq_pad)
    k3: jnp.ndarray,  # (BkvH, Dp, Nk_pad)
    v3: jnp.ndarray,
    *,
    heads: int,
    kv_repeat: int,
    kv_len: int,
    block_q: int,
    block_kv: int,
    interpret: bool = False,
    transposed_out: bool = False,
    static_max: float = 0.0,
    with_stats: bool = False,
    fused_rowsum: bool = False,
):
    bh, dp, nq_pad = q3.shape
    _, _, nk_pad = k3.shape
    grid = (bh, nq_pad // block_q, nk_pad // block_kv)
    fh = kv_repeat * heads

    def q_index(b, i, j):
        return (b, 0, i)

    def kv_index(b, i, j):
        return ((b // fh) * heads + b % heads, 0, j)

    def o_index(b, i, j):
        return (b, i, 0)

    def o_index_t(b, i, j):
        return (b, 0, i)

    kernel = functools.partial(
        _flash_kernel_t, kv_len=kv_len, block_kv=block_kv,
        out_t=transposed_out, static_max=static_max,
        fused_rowsum=fused_rowsum,
    )
    if transposed_out:
        out_spec = pl.BlockSpec((1, dp, block_q), o_index_t, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bh, dp, nq_pad), q3.dtype)
    else:
        out_spec = pl.BlockSpec((1, block_q, dp), o_index, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bh, nq_pad, dp), q3.dtype)
    out_specs = [out_spec]
    out_shapes = [out_shape]
    if with_stats:
        # the kernel takes lse_ref as a positional output after o_ref
        def kernel(*refs, _kv_len=kv_len):  # noqa: F811
            q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, acc_s = refs
            _flash_kernel_t(
                q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s,
                kv_len=_kv_len, block_kv=block_kv, out_t=transposed_out,
                static_max=static_max, lse_ref=lse_ref,
                fused_rowsum=fused_rowsum,
            )

        out_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((bh, 1, nq_pad), jnp.float32)
        )
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dp, block_q), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp, block_kv), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp, block_kv), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_stats else out_spec,
        out_shape=out_shapes if with_stats else out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, dp + 8 if fused_rowsum else dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nq_pad * nk_pad * dp,
            bytes_accessed=(q3.size + k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return result


def _flash_forward(
    q3: jnp.ndarray,  # (BH, Nq_pad, Dp)
    k3: jnp.ndarray,  # (BkvH, Nk_pad, Dp)
    v3: jnp.ndarray,
    *,
    heads: int,
    kv_repeat: int,
    kv_len: int,
    block_q: int,
    block_kv: int,
    interpret: bool = False,
) -> jnp.ndarray:
    bh, nq_pad, dp = q3.shape
    _, nk_pad, _ = k3.shape
    grid = (bh, nq_pad // block_q, nk_pad // block_kv)

    fh = kv_repeat * heads  # q-batch entries sharing one kv-batch entry

    def q_index(b, i, j):
        return (b, i, 0)

    def kv_index(b, i, j):
        # q3 batch b = (clip * kv_repeat + frame) * heads + head
        # kv3 batch  = clip * heads + head
        return ((b // fh) * heads + b % heads, j, 0)

    kernel = functools.partial(
        _flash_kernel, kv_len=kv_len, block_kv=block_kv
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, dp), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, dp), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), q_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, dp), q3.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nq_pad * nk_pad * dp,
            bytes_accessed=(q3.size + k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=interpret,
    )(q3, k3, v3)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_repeat: int = 1,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: bool = False,
    transposed_io: bool = True,
    transposed_out: bool = False,
    static_max: float = 0.0,
    with_stats: bool = False,
    fused_rowsum: Optional[bool] = None,
):
    """Pallas fused attention. Shapes as in module docstring.

    ``static_max`` (transposed_io only): replace the per-row running max
    with a compile-time log2-space offset — exact within the fp32/bf16
    exponent range (see _flash_kernel_t); cuts one full VPU pass over the
    scores.

    ``with_stats`` (transposed_io only): also return the per-row log2-space
    logsumexp (BH, Nq_pad) consumed by the Pallas flash backward."""
    bq, nq, h, d = q.shape
    bkv, nk, hk, dk = k.shape
    assert (h, d) == (hk, dk) and v.shape == k.shape
    assert bq == bkv * kv_repeat, (bq, bkv, kv_repeat)
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    # Head dim stays UNPADDED in HBM: Mosaic pads VMEM tiles to the 128-lane
    # boundary transparently, so explicitly padding 40 -> 128 only cost HBM
    # traffic and pad kernels (measured ~19 ms/step of pad ops + copies at
    # 512px).  The MXU contraction is 128-deep either way.
    dp = d
    block_q = _pick_block(nq, block_q)
    block_kv = _pick_block(nk, block_kv)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_kv)

    # pre-scale q by scale*log2(e): the kernel softmax runs in log2 space
    # (fp32 multiply before the cast keeps the rounding at bf16 level)
    log2e_scale = scale * 1.4426950408889634
    q = (q.astype(jnp.float32) * log2e_scale).astype(q.dtype)

    if transposed_io:
        # (B, N, H, D) -> (B*H, D, N): byte-identical to the layout XLA's
        # projection matmuls already produce for a transposed consumer, so
        # this is a bitcast, not an HBM copy (the row-major path costs a
        # measured ~0.55 ms copy per tensor per 4096-token site).
        def to3t(x, n_pad):
            b, n, _, _ = x.shape
            x = jnp.transpose(x, (0, 2, 3, 1))  # (B, H, D, N)
            if n_pad != n:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)))
            return x.reshape(b * h, dp, n_pad)

        if fused_rowsum is None:
            # MXU row-sum: fold the softmax denominator into the p@v dot
            # via an in-kernel 8-row ones block on v — deletes the
            # cross-lane jnp.sum VPU pass (the kernel is VPU-bound).
            # A/B knob; see BASELINE.md round-3 ledger for the measurement.
            import os

            fused_rowsum = (
                os.environ.get("I2V_FLASH_FUSED_ROWSUM", "0") == "1"
            )
        o3 = _flash_forward_t(
            to3t(q, nq_pad), to3t(k, nk_pad), to3t(v, nk_pad),
            heads=h, kv_repeat=kv_repeat, kv_len=nk,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
            transposed_out=transposed_out, static_max=static_max,
            with_stats=with_stats, fused_rowsum=fused_rowsum,
        )
        lse = None
        if with_stats:
            o3, lse = o3
            lse = lse[:, 0]  # (BH, Nq_pad)
        if transposed_out:
            # (BH, D, N) -> (B, Nq, H, D); N-minor stays physical, so the
            # logical transpose is layout-foldable into the to_out matmul.
            o = o3.reshape(bq, h, dp, nq_pad)[:, :, :, :nq]
            o = jnp.transpose(o, (0, 3, 1, 2))
            return (o, lse) if with_stats else o
        o = o3.reshape(bq, h, nq_pad, dp)[:, :, :nq, :]
        o = jnp.swapaxes(o, 1, 2)
        return (o, lse) if with_stats else o
    else:
        # (B, N, H, D) -> (B*H, N, D): head becomes part of the grid batch.
        def to3(x, n_pad):
            b, n, _, _ = x.shape
            x = jnp.swapaxes(x, 1, 2)  # (B, H, N, D)
            if n_pad != n:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
            return x.reshape(b * h, n_pad, dp)

        o3 = _flash_forward(
            to3(q, nq_pad), to3(k, nk_pad), to3(v, nk_pad),
            heads=h, kv_repeat=kv_repeat, kv_len=nk,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
        )
    o = o3.reshape(bq, h, nq_pad, dp)[:, :, :nq, :]
    return jnp.swapaxes(o, 1, 2)  # (B, Nq, H, D)


# ---------------------------------------------------------------------------
# Pallas flash backward (VERDICT r2 #6)
#
# The XLA backward materializes per-head (bkv, rep, nq, nk) fp32 score
# tensors — 2.1 GB/head at 512px training shapes.  These kernels recompute
# scores blockwise from the transposed-IO residuals + the forward's saved
# log2-space logsumexp, so nothing quadratic hits HBM.
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, dsum_ref, dq_ref, acc,
    *, kv_len: int, block_kv: int,
):
    """dq for one (bh, q-block) across kv blocks (innermost grid dim).

    Refs: q/g (1, Dp, block_q) — q PRE-SCALED by scale*log2(e) like the
    forward; k/v (1, Dp, block_kv); lse/dsum (1, block_q) fp32.
    Computes ds' = p * (dp - D); the caller applies the trailing * scale.
    """
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_kv), log2-space
    if kv_len % block_kv != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
        s = jnp.where(col < kv_len, s, -jnp.inf)
    lse = jnp.transpose(lse_ref[0], (1, 0))  # (block_q, 1)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        g_ref[0], v_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_kv)
    dsum = jnp.transpose(dsum_ref[0], (1, 0))  # (block_q, 1)
    ds = p * (dp - dsum)
    acc[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, Dp)

    @pl.when(j == num_kv - 1)
    def _fin():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    k_ref, v_ref, q_ref, g_ref, lse_ref, dsum_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, kv_len: int, block_kv: int,
):
    """dk/dv for one (bkv·h, kv-block) across (frame, q-block) pairs
    (innermost grid dim) — accumulates over every query that attends to
    this kv block, including the cross-frame ``kv_repeat`` fan-in.

    Scores are computed TRANSPOSED (block_kv, block_q) so the q axis rides
    the lanes: lse/dsum broadcast along sublanes with no relayout.
    """
    t = pl.program_id(2)
    num_t = pl.num_programs(2)

    @pl.when(t == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    s_t = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_kv, block_q), log2-space
    if kv_len % block_kv != 0:
        row = (
            jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
            + pl.program_id(1) * block_kv
        )
        s_t = jnp.where(row < kv_len, s_t, -jnp.inf)
    p_t = jnp.exp2(s_t - lse_ref[0])  # lse (1, block_q) broadcasts
    dv_acc[:] += jax.lax.dot_general(
        p_t.astype(g_ref.dtype), g_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_kv, Dp)
    dp_t = jax.lax.dot_general(
        v_ref[0], g_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_kv, block_q)
    ds_t = p_t * (dp_t - dsum_ref[0])
    dk_acc[:] += jax.lax.dot_general(
        ds_t.astype(q_ref.dtype), q_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_kv, Dp)

    @pl.when(t == num_t - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, o, g, lse,
    *, kv_repeat: int, scale: float, interpret: bool = False,
    block_q: int = 512, block_kv: int = 1024,
):
    """Blockwise flash backward on logical (B, N, H, D) tensors.

    ``lse`` is the forward's (BH, Nq_pad) log2-space logsumexp.  Returns
    (dq, dk, dv) in logical layout.  Bound by the same transposed-IO
    bitcast property as the forward: all kernel operands are (BH, Dp, N).
    """
    bq, nq, h, d = q.shape
    bkv, nk, _, _ = k.shape
    log2e = 1.4426950408889634
    block_q = _pick_block(nq, block_q)
    block_kv = _pick_block(nk, block_kv)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, block_kv)
    fh = kv_repeat * h

    def to3t(x, n_pad, pre=1.0):
        b = x.shape[0]
        x = jnp.transpose(
            (x.astype(jnp.float32) * pre).astype(x.dtype), (0, 2, 3, 1)
        )
        if n_pad != x.shape[-1]:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, n_pad - x.shape[-1])))
        return x.reshape(b * h, d, n_pad)

    q3 = to3t(q, nq_pad, pre=scale * log2e)
    k3 = to3t(k, nk_pad)
    v3 = to3t(v, nk_pad)
    g3 = to3t(g, nq_pad)
    # D = rowsum(g * o) per q row, (BH, Nq_pad) fp32
    dsum = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dsum = jnp.transpose(dsum, (0, 2, 1)).reshape(bq * h, nq)
    if nq_pad != nq:
        dsum = jnp.pad(dsum, ((0, 0), (0, nq_pad - nq)))
    lse_p = lse if lse.shape[1] == nq_pad else jnp.pad(
        lse, ((0, 0), (0, nq_pad - lse.shape[1]))
    )
    # (BH, 1, Nq_pad): row blocks must be 3-D — see the forward stats note
    dsum = dsum[:, None, :]
    lse_p = lse_p[:, None, :]

    row_spec = lambda idx: pl.BlockSpec((1, 1, block_q), idx,
                                        memory_space=pltpu.VMEM)
    # ---- dq: grid (BH, q blocks, kv blocks) ----
    grid_dq = (bq * h, nq_pad // block_q, nk_pad // block_kv)
    dq3 = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, kv_len=nk,
                          block_kv=block_kv),
        grid=grid_dq,
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_kv),
                         lambda b, i, j: ((b // fh) * h + b % h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_kv),
                         lambda b, i, j: ((b // fh) * h + b % h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            row_spec(lambda b, i, j: (b, 0, i)),
            row_spec(lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bq * h, nq_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3, g3, lse_p, dsum)

    # ---- dk/dv: grid (BkvH, kv blocks, rep * q blocks) ----
    nqb = nq_pad // block_q
    grid_kv = (bkv * h, nk_pad // block_kv, kv_repeat * nqb)

    def q_index(b, j, t):
        clip, head = b // h, b % h
        return ((clip * kv_repeat + t // nqb) * h + head, 0, t % nqb)

    def row_index(b, j, t):
        clip, head = b // h, b % h
        return ((clip * kv_repeat + t // nqb) * h + head, 0, t % nqb)

    dk3, dv3 = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, kv_len=nk,
                          block_kv=block_kv),
        grid=grid_kv,
        in_specs=[
            pl.BlockSpec((1, d, block_kv), lambda b, j, t: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_kv), lambda b, j, t: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_q), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_q), q_index, memory_space=pltpu.VMEM),
            row_spec(row_index),
            row_spec(row_index),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda b, j, t: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, j, t: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bkv * h, nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bkv * h, nk_pad, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(k3, v3, q3, g3, lse_p, dsum)

    def from3(x3, b, n_pad, n):
        x = x3.reshape(b, h, n_pad, d)[:, :, :n, :]
        return jnp.swapaxes(x, 1, 2)  # (b, n, h, d)

    # q was pre-scaled by scale*log2e: ds'^T @ q_pre = scale*log2e*(ds'^T q),
    # and dk wants scale*(ds'^T q) -> divide by log2e.  dq used raw k: * scale.
    dq = from3(dq3, bq, nq_pad, nq) * scale
    dk = from3(dk3, bkv, nk_pad, nk) * (1.0 / log2e)
    dv = from3(dv3, bkv, nk_pad, nk)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# custom_vjp dispatcher
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attention_pallas(q, k, v, kv_repeat, scale, interpret, static_max=None):
    # Block sweep on v5e (512px 4096-token sites, round 2): (512, 4096)
    # 12.3 ms vs (512, 1024) 14.9 ms — the whole K/V fits VMEM so the
    # online-softmax runs single-pass per q block.  _pick_block caps the
    # kv block at nk for shorter sites.
    import os

    if static_max is None:
        # legacy env-var default for call sites that don't thread the
        # config field (VideoUNetConfig.flash_static_max is the recorded,
        # per-model source of truth; the env var remains an emergency
        # override for ad-hoc scripts)
        static_max = float(os.environ.get("I2V_FLASH_STATIC_MAX", "64"))
    return flash_attention(
        q, k, v, kv_repeat=kv_repeat, scale=scale,
        block_q=512, block_kv=4096, interpret=interpret,
        transposed_out=os.environ.get("I2V_FLASH_OUT_T", "1") == "1",
        # static_max > 0: exact for raw attention logits in ~(-48, +132) —
        # far beyond observed ranges.  attn1's q.q diagonal bounds the
        # underflow side; the cross-frame site has no diagonal, but a
        # fully-underflowed row needs every first-frame logit < -48.  Out
        # of range the row goes NaN (not silently wrong): training's
        # non-finite skip-guard catches it, the pipeline's host-side
        # finite check names the knob, and static_max=0 restores the
        # per-row running max for unbounded logits.
        static_max=static_max,
    )


def _flash_bwd_mode(nk: int) -> str:
    """'pallas' / 'pallas_interpret' / '' (XLA chunked backward).

    Pallas backward engages on TPU at nk >= 1024.  Originally gated at
    2048 for the long-sequence sites whose XLA backward materializes
    (bkv, rep, nq, nk) fp32 score tensors per head (512px training:
    2.1 GB/head), but a config-4 train-step trace showed the XLA chunked
    backward costing 132 ms/step at the 256px nk=1024 sites
    (dynamic-update-slice fusions writing per-head grad chunks) — the
    threshold sweep measured 0.378 / 0.283 / 0.291 / 0.290 s/step at
    2048 / 1024 / 256 / 64, so 1024 is the floor of the win.
    I2V_FLASH_BWD forces a mode ('xla' / 'pallas' / 'pallas_interpret');
    I2V_FLASH_BWD_MIN moves the dispatch threshold."""
    import os

    forced = os.environ.get("I2V_FLASH_BWD", "")
    if forced:
        return "" if forced == "xla" else forced
    if _on_tpu() and nk >= int(os.environ.get("I2V_FLASH_BWD_MIN", "1024")):
        return "pallas"
    return ""


def _attention_fwd(q, k, v, kv_repeat, scale, interpret, static_max):
    if _flash_bwd_mode(k.shape[1]):
        # stats-emitting forward: also save (o, lse) for the flash backward
        import os

        out, lse = flash_attention(
            q, k, v, kv_repeat=kv_repeat, scale=scale,
            block_q=512, block_kv=4096, interpret=interpret,
            transposed_out=os.environ.get("I2V_FLASH_OUT_T", "1") == "1",
            static_max=(
                float(os.environ.get("I2V_FLASH_STATIC_MAX", "64"))
                if static_max is None else static_max
            ),
            with_stats=True,
        )
        return out, (q, k, v, out, lse)
    out = _attention_pallas(q, k, v, kv_repeat, scale, interpret, static_max)
    return out, (q, k, v, None, None)


def _attention_bwd(kv_repeat, scale, interpret, static_max, res, g):
    q, k, v, o, lse = res
    if lse is not None:
        mode = _flash_bwd_mode(k.shape[1]) or "pallas"
        return _flash_backward(
            q, k, v, o, g, lse, kv_repeat=kv_repeat,
            scale=scale if scale is not None else 1.0 / math.sqrt(q.shape[-1]),
            interpret=interpret or mode == "pallas_interpret",
        )
    # XLA backward, chunked over heads: the recomputed probs are
    # (bkv, rep, nq, nk) fp32 per head — materializing all heads at once
    # OOMs at training shapes (e.g. 8 x 128 MB x several sites live).
    bq, nq, h, d = q.shape
    bkv, nk, _, _ = k.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # (h, bkv, rep/1, n, d) layouts for lax.map over heads
    qr = jnp.moveaxis(q.reshape(bkv, kv_repeat, nq, h, d), 3, 0)
    gr = jnp.moveaxis(g.reshape(bkv, kv_repeat, nq, h, d), 3, 0)
    kh = jnp.moveaxis(k, 2, 0)
    vh = jnp.moveaxis(v, 2, 0)

    def per_head(args):
        qh, gh, kh1, vh1 = args  # (bkv,rep,nq,d), same, (bkv,nk,d), (bkv,nk,d)
        s = jnp.einsum("brqd,bkd->brqk", qh, kh1,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1)
        dv = jnp.einsum("brqk,brqd->bkd", p, gh,
                        preferred_element_type=jnp.float32)
        dp = jnp.einsum("brqd,bkd->brqk", gh, vh1,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True)) * scale
        dq = jnp.einsum("brqk,bkd->brqd", ds, kh1,
                        preferred_element_type=jnp.float32)
        dk = jnp.einsum("brqk,brqd->bkd", ds, qh,
                        preferred_element_type=jnp.float32)
        return dq, dk, dv

    dq, dk, dv = jax.lax.map(per_head, (qr, gr, kh, vh))
    dq = jnp.moveaxis(dq, 0, 3).reshape(bq, nq, h, d)
    dk = jnp.moveaxis(dk, 0, 2)
    dv = jnp.moveaxis(dv, 0, 2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention_pallas.defvjp(_attention_fwd, _attention_bwd)


def _temporal_kernel4(
    q_ref, k_ref, v_ref, o_ref, *, frames: int, heads: int, scale: float,
):
    """Fused frame-axis attention for one (batch, s-block) program.

    Refs are (1, F, block_s, C) slices of the (B, F, S, C) activations —
    the layout the projection matmuls already produce, so no HBM
    transposes happen outside the kernel (the XLA vpu2 path costs ~5
    materialized transposes per call).  Blocks span the full channel dim
    (the Pallas TPU lowering requires the last two block dims be
    (8,128)-divisible or full); heads split in-kernel.  Inside, per-head
    tiles are flipped to (d, block_s) so the d-contraction runs over
    sublanes and every elementwise op streams along the lanes; q arrives
    pre-scaled by ``scale*log2(e)`` so the softmax is a pure exp2.

    The per-query-frame Python loop keeps intermediates at (G, d, block_s)
    — a whole-(F,G,d,S) broadcast product was the round-2 dead end that
    made Mosaic serialize (34.6 ms vs 2.3 ms at the top site).

    ``q_ref`` may carry FEWER frames than k/v (``frames`` counts K/V
    frames): the SPMD path shards query frames across the ``seq`` mesh axis
    and all-gathers only K/V, so each device computes its local F/S query
    frames against the full frame axis."""
    c = q_ref.shape[-1]
    d = c // heads
    frames_q = q_ref.shape[1]
    q = q_ref[0]  # (Fq, bs, C)
    k = k_ref[0]  # (F, bs, C)
    v = v_ref[0]
    out_heads = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        # scale*log2(e) folded here: an outside prescale costs a full
        # elementwise pass AND broke the producer-layout bitcast into the
        # kernel (measured 9.2 ms of copy+multiply per step at 512px)
        qT = jnp.transpose(q[..., sl], (0, 2, 1)).astype(jnp.float32) * scale
        kT = jnp.transpose(k[..., sl], (0, 2, 1)).astype(jnp.float32)
        vT = jnp.transpose(v[..., sl], (0, 2, 1)).astype(jnp.float32)
        outs = []
        for f in range(frames_q):
            s = jnp.sum(qT[f][None] * kT, axis=1)  # (G, bs), log2-space
            # per-frame max kept: the static-offset trick (see the flash
            # kernel) trips a Mosaic relayout bug here ("non-singleton
            # logical dimension is replicated in destination"), and the
            # (G, bs) sublane max is cheap anyway
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp2(s - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            o_f = jnp.sum(p[:, None, :] * vT, axis=0)  # (d, bs)
            # cast per frame: keeps the staged head outputs at bf16 (the
            # fp32 staging was half the VMEM overrun at block_s=128)
            outs.append(jnp.transpose(o_f, (1, 0)).astype(o_ref.dtype))
        out_heads.append(jnp.stack(outs, axis=0))  # (F, bs, d)
    o_ref[0] = jnp.concatenate(out_heads, axis=-1)


def _temporal_flash(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, heads: int,
    block_s: int = 0, interpret: bool = False,
) -> jnp.ndarray:
    """Pallas frame-attention; q is (B, Fq, S, C), k/v (B, F, S, C) with
    Fq <= F (query-frame slicing for the SPMD seq-sharded path; Fq == F in
    the single-device case).  Returns (B, Fq, S, C)."""
    b, fq, s, c = q.shape
    f = k.shape[1]
    d = c // heads
    scale = 1.4426950408889634 / math.sqrt(d)
    if block_s == 0:
        # blocks span the full channel dim, so scale the s-block down as C
        # grows to stay inside the 16 MB scoped-VMEM limit (at C=320,
        # block_s 256/128 measured 24.0/19.2 MB: 3 double-buffered inputs
        # + per-head staging; 64 fits).  I2V_TEMPORAL_BLOCK_S overrides the
        # C=320 base (use with --xla_tpu_scoped_vmem_limit_kib).  The base
        # is calibrated for bf16 inputs; fp32 (training with fp32 frozen
        # params) doubles every buffer, so halve the block (measured: the
        # bf16 block at fp32 overruns scoped vmem 18 MB > 16 MB).
        import os

        base = int(os.environ.get("I2V_TEMPORAL_BLOCK_S", "64"))
        if q.dtype.itemsize >= 4:
            base //= 2
        block_s = max(8, base * 320 // c)
    block_s = min(block_s, s)
    if s % block_s != 0:  # spatial sites are powers of two; be safe
        block_s = math.gcd(s, block_s)
    grid = (b, s // block_s)
    qspec = pl.BlockSpec(
        (1, fq, block_s, c),
        lambda bi, si: (bi, 0, si, 0),
        memory_space=pltpu.VMEM,
    )
    kvspec = pl.BlockSpec(
        (1, f, block_s, c),
        lambda bi, si: (bi, 0, si, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_temporal_kernel4, frames=f, heads=heads, scale=scale),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, fq, s, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * fq * f * s * d,
            bytes_accessed=(2 * f + fq) * b * s * c * q.dtype.itemsize,
            transcendentals=b * heads * fq * f * s,
        ),
        interpret=interpret,
    )(q, k, v)


def _temporal_kernel_cs(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Channel-major frame attention for one (batch, head, s-block) program.

    Refs are (1, F, d, block_s) slices of (B, F, C, S) activations — S on
    the lanes, the head's d-channel slice on the sublanes.  Head slicing
    happens in the BLOCK SPEC (grid axis), not in-kernel: with S minor,
    the per-head C-slice only needs 8-divisibility (d = 40/80/160 all
    pass), where the C-minor kernel's head slices could never satisfy the
    128-lane rule and paid per-head in-kernel relayouts instead.  The
    body is _temporal_kernel4's inner loop with every transpose deleted.

    ``q_ref`` may carry fewer frames than k/v (seq-sharded SPMD path)."""
    q = q_ref[0]  # (Fq, d, bs)
    k = k_ref[0]  # (F, d, bs)
    v = v_ref[0]
    # q arrives pre-scaled by scale*log2(e) folded into the fp32 cast
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    outs = []
    for f in range(q.shape[0]):
        s = jnp.sum(qf[f][None] * kf, axis=1)  # (F, bs), log2-space
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp2(s - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        o_f = jnp.sum(p[:, None, :] * vf, axis=0)  # (d, bs)
        outs.append(o_f.astype(o_ref.dtype))
    o_ref[0] = jnp.stack(outs, axis=0)


def _cs_block_s(s: int, d: int, f: int, itemsize: int):
    """Legal S-block for the CS kernel, or None if no legal block fits.

    Mosaic's lane rule: the minor block dim must be a multiple of 128 or
    equal to the full array dim.  512px spatial sites (4096/1024/256/64)
    are powers of two, but 768px sites (96^2=9216, 48^2=2304, 24^2=576,
    12^2=144) include sizes with NO 128-multiple divisor (2^7 does not
    divide 576 or 144) — the only legal block there is the whole S axis,
    which must also fit the scoped-VMEM budget (~28*f*d bytes per unit of
    block_s: 3 double-buffered bf16 inputs + 3 fp32 staging copies +
    double-buffered bf16 out; capped at 8 MB below).  Found by BASELINE
    config 5 crashing at the c=1280 s=576 site (round 3, session 4)."""
    import os

    base = int(os.environ.get("I2V_TEMPORAL_CS_BLOCK_S", "256"))
    if itemsize >= 4:  # fp32 staging doubles every buffer
        base //= 2
    # base sweep at the L0 site (s=4096, d=40), ms/call in-graph:
    # 256 -> 3.08, 512 -> 3.34, >=1024 -> VMEM compile failure; L1 ties.
    bs = min(max(128, base * 40 // d), s)
    if s % bs:
        bs = math.gcd(s, bs)
    if bs % 128 == 0:
        return bs
    # Mosaic's scoped-VMEM accounting measured ~2x this double-buffered
    # estimate (s=144/d=160 full-S: 19.57M reported vs 10.3M estimated),
    # so the cap is conservative; the einsum path wins at these small
    # sites anyway (s=64 A/B: cs 10.3 vs mxu 1.38 ms/call).
    budget_per_s = 28 * max(f, 1) * d
    vmem_cap = 8 * 1024 * 1024
    for m in range(128, s, 128):
        if s % m == 0 and m * budget_per_s <= vmem_cap:
            return m
    if s * budget_per_s <= vmem_cap:
        return s  # full-S block is lane-legal at any size
    return None


def _temporal_flash_cs(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, heads: int,
    block_s: int = 0, interpret: bool = False,
) -> jnp.ndarray:
    """Channel-major Pallas frame attention; q (B, Fq, S, C), k/v
    (B, F, S, C), returns (B, Fq, S, C).

    The (B, F, S, C) -> (B, F, C, S) transposes here are logical: XLA
    folds them into the projection matmuls' output layout (same
    producer-layout property as the flash kernel's transposed IO), and
    the inverse transpose on the output folds into the to_out matmul."""
    b, fq, s, c = q.shape
    f = k.shape[1]
    d = c // heads
    scale = 1.4426950408889634 / math.sqrt(d)
    qt = jnp.transpose(q, (0, 1, 3, 2))  # (B, Fq, C, S)
    kt = jnp.transpose(k, (0, 1, 3, 2))
    vt = jnp.transpose(v, (0, 1, 3, 2))
    if block_s == 0:
        block_s = _cs_block_s(s, d, f, q.dtype.itemsize)
        if block_s is None:
            raise ValueError(
                f"no Mosaic-legal S-block for CS temporal kernel at s={s}, "
                f"d={d}, f={f} — dispatch should have routed this site to "
                "the einsum path (temporal_attention impl='auto')"
            )
    block_s = min(block_s, s)
    if s % block_s != 0:
        block_s = math.gcd(s, block_s)
    grid = (b, heads, s // block_s)
    qspec = pl.BlockSpec(
        (1, fq, d, block_s),
        lambda bi, hi, si: (bi, 0, hi, si),
        memory_space=pltpu.VMEM,
    )
    kvspec = pl.BlockSpec(
        (1, f, d, block_s),
        lambda bi, hi, si: (bi, 0, hi, si),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_temporal_kernel_cs, scale=scale),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, fq, c, s), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * fq * f * s * d,
            bytes_accessed=(2 * f + fq) * b * s * c * q.dtype.itemsize,
            transcendentals=b * heads * fq * f * s,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.transpose(out, (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _temporal_pallas_cs(q, k, v, heads, interpret):
    return _temporal_flash_cs(q, k, v, heads=heads, interpret=interpret)


def _temporal_fwd_cs(q, k, v, heads, interpret):
    return _temporal_pallas_cs(q, k, v, heads, interpret), (q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _temporal_pallas(q, k, v, heads, interpret):
    return _temporal_flash(q, k, v, heads=heads, interpret=interpret)


def _temporal_ref_mxu(q, k, v, heads):
    """XLA einsum reference used for the pallas backward.  HIGHEST matmul
    precision: DEFAULT lowers fp32 einsums through bf16 passes (~1.5e-2 max
    err measured at d=40) — the gradient would otherwise carry the exact
    precision loss the forward kernel avoids."""
    b, f, s, c = q.shape
    d = c // heads
    qh = q.reshape(b, f, s, heads, d)
    kh = k.reshape(b, f, s, heads, d)
    vh = v.reshape(b, f, s, heads, d)
    scores = jnp.einsum(
        "bfshd,bgshd->bshfg", qh, kh, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / math.sqrt(d)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bshfg,bgshd->bfshd", probs, vh, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(b, f, s, c).astype(q.dtype)


def _temporal_fwd(q, k, v, heads, interpret):
    return _temporal_pallas(q, k, v, heads, interpret), (q, k, v)


def _temporal_bwd(heads, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b2, c2: _temporal_ref_mxu(a, b2, c2, heads), q, k, v)
    return vjp(g.astype(q.dtype))


_temporal_pallas.defvjp(_temporal_fwd, _temporal_bwd)
_temporal_pallas_cs.defvjp(_temporal_fwd_cs, _temporal_bwd)


def temporal_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, heads: int,
    impl: str = "auto", _spmd: bool = True,
) -> jnp.ndarray:
    """Frame-axis self-attention on (B, F, S, C) — frames second, spatial
    tokens third (no (B·S, F, C) transpose round-trips like the torch
    stack's TransformerTemporalModel layout).

    F is tiny (<=32), so the per-token F x F attention is thousands of
    (16x40)@(40x16) matmuls — hopeless MXU shapes.  impl='vpu' expresses
    the contraction as broadcast-multiply-reduce, which XLA fuses into
    VPU streams with S on the lanes (measured several times faster than
    the batched-matmul einsum lowering at 64x64); impl='mxu' keeps the
    einsum form.

    Under an active ``attention_spmd`` mesh context the whole site routes
    through ``spmd_temporal_attention`` FIRST (token-sharded shard_map —
    frames local, S over seq — falling back to frame-sharded K/V gathers),
    and the local body re-enters this dispatcher with ``_spmd=False`` so
    kernel selection (CS-block Mosaic legality, cs_min, vpu2-vs-mxu) is
    made on the LOCAL shard shapes, not the global ones.
    """
    b, f, s, c = q.shape

    if _spmd:
        from i2v_adapter_tpu.parallel.spmd import (
            current_attention_spmd,
            spmd_temporal_attention,
        )

        ctx = current_attention_spmd()
        if ctx is not None and ctx.mesh.size > 1:
            out = spmd_temporal_attention(
                lambda ql, kl, vl, hl: temporal_attention(
                    ql, kl, vl, heads=hl, impl=impl, _spmd=False
                ),
                q, k, v, heads, ctx,
            )
            if out is not None:
                return out
            # no shard_map layout fits: continue below — the einsum
            # lowerings partition under GSPMD; the pallas branch guards
            # itself against bare-Mosaic-on-mesh

    d = c // heads
    qh = q.reshape(b, f, s, heads, d)
    kh = k.reshape(b, f, s, heads, d)
    vh = v.reshape(b, f, s, heads, d)
    scale = 1.0 / math.sqrt(d)

    if impl in ("auto", "xla"):
        # Kernel history: vpu2 pays ~5 HBM transposes/call; the full-C
        # pallas kernel (heads split IN-kernel) removed those but paid
        # per-head relayouts, losing below s=2048; the channel-major CS
        # kernel (heads split by the GRID along sublanes, S on lanes, zero
        # in-kernel transposes) beats all of them for s >= 128 and is the
        # auto choice there — see the per-site A/B below.  Numerics: 3e-6
        # vs f64 (the einsum path shows 1.5e-2 under DEFAULT matmul
        # precision, identical under 'highest').  A whole-(F,G,D,S)
        # broadcast kernel was the round-2 dead end (34.6 ms).
        # impl='xla' (cfg.flash_attention=False) never selects a custom
        # Pallas kernel — only the pure-XLA vpu2/mxu lowerings.
        import os

        # Channel-major (CS) kernel dispatch: per-site A/B on v5e with the
        # projection matmuls in-graph (layout folding included), ms/call —
        #   s=4096/c=320: cs 3.34  pallas 5.05  vpu2 6.50  mxu 11.15
        #   s=1024/c=640: cs 2.23  pallas 4.17  vpu2 2.76  mxu  3.51
        #   s= 256/c=1280: cs 1.85 pallas 3.81  vpu2 6.99  mxu  1.95
        #   s=  64/c=1280: cs 10.3 pallas 6.90  vpu2 7.34  mxu  1.38
        # (the cs kernel loses only when block_s = s < 128 lanes).
        forced = os.environ.get("I2V_TEMPORAL_IMPL")
        cs_min = int(os.environ.get("I2V_TEMPORAL_CS_MIN", "128"))
        if forced:
            impl = forced
        elif (
            impl != "xla" and _on_tpu() and s >= cs_min
            and _cs_block_s(s, d, f, q.dtype.itemsize) is not None
        ):
            # sites with no Mosaic-legal S-block (768px: s=576/144 have no
            # 128-multiple divisor and full-S overruns VMEM at d=160) fall
            # through to the einsum lowerings
            impl = "pallas_cs"
        elif impl != "xla" and _on_tpu() and os.environ.get(
            "I2V_TEMPORAL_SMALL_IMPL"
        ):
            # A/B hook: alternate kernel for the sub-cs_min sites
            impl = os.environ["I2V_TEMPORAL_SMALL_IMPL"]
        else:
            impl = "vpu2" if s >= 2048 else "mxu"
    if impl in ("pallas", "pallas_interpret", "pallas_cs", "pallas_cs_interpret"):
        interp = impl.endswith("_interpret")
        cs = impl.startswith("pallas_cs")
        if _spmd:
            from i2v_adapter_tpu.parallel.spmd import current_attention_spmd

            ctx = current_attention_spmd()
            if ctx is not None and ctx.mesh.size > 1:
                # the top-of-function shard_map wrap found no legal layout
                # (_spmd=False re-entries never reach here): a bare Mosaic
                # kernel cannot be GSPMD-partitioned — hard error on real
                # TPU graphs — so use the einsum lowering, which partitions
                # fine (concrete impl, not 'xla', so an I2V_TEMPORAL_IMPL
                # force can't re-enter here)
                return temporal_attention(
                    q, k, v, heads=heads,
                    impl="vpu2" if s >= 2048 else "mxu", _spmd=False,
                )
        if cs:
            return _temporal_pallas_cs(q, k, v, heads, interp)
        return _temporal_pallas(q, k, v, heads, interp)
    if impl == "mxu":
        scores = jnp.einsum(
            "bfshd,bgshd->bshfg", qh, kh, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "bshfg,bgshd->bfshd", probs, vh, preferred_element_type=jnp.float32
        )
        return out.reshape(b, f, s, c).astype(q.dtype)

    if impl == "vpu2":
        # S-on-lanes layout: transpose to (B,H,F,D,S) so the d-reduction runs
        # over sublanes and every elementwise op streams along the lanes.
        qt = jnp.transpose(qh, (0, 3, 1, 4, 2))  # (b,h,f,d,s)
        kt = jnp.transpose(kh, (0, 3, 1, 4, 2))
        vt = jnp.transpose(vh, (0, 3, 1, 4, 2))
        scores = jnp.sum(
            qt[:, :, :, None].astype(jnp.float32)
            * kt[:, :, None].astype(jnp.float32),
            axis=-2,
        ) * scale  # (b,h,f,g,s)
        probs = jax.nn.softmax(scores, axis=3)
        out = jnp.einsum(
            "bhfgs,bhgds->bhfds", probs.astype(v.dtype), vt,
            preferred_element_type=jnp.float32,
        )
        out = jnp.transpose(out, (0, 2, 4, 1, 3))  # (b,f,s,h,d)
        return out.reshape(b, f, s, c).astype(q.dtype)

    # VPU path: scores[b,f,g,s,h] = sum_d q[b,f,s,h,d] * k[b,g,s,h,d].
    # The multiply broadcasts over (f, g) and reduces over d — XLA fuses
    # this into a streaming reduce; nothing (b,f,g,s,h,d)-sized hits HBM.
    scores = jnp.sum(
        qh[:, :, None].astype(jnp.float32) * kh[:, None].astype(jnp.float32),
        axis=-1,
    ) * scale  # (b, f, g, s, h)
    probs = jax.nn.softmax(scores, axis=2)
    # out[b,f,s,h,d] = sum_g probs[b,f,g,s,h] * v[b,g,s,h,d]
    out = jnp.sum(
        probs[..., None].astype(jnp.float32) * vh[:, None].astype(jnp.float32),
        axis=2,
    )
    return out.reshape(b, f, s, c).astype(q.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_repeat: int = 1,
    scale: Optional[float] = None,
    impl: str = "auto",
    static_max: Optional[float] = None,
) -> jnp.ndarray:
    """Dispatching attention entry point used by every model site.

    impl: "auto" (pallas on TPU when profitable, else XLA), "pallas",
    "pallas_interpret" (CPU testing), "xla".

    static_max: compile-time log2-space softmax offset for the pallas
    kernel (``VideoUNetConfig.flash_static_max`` threads it; 0 restores
    the exact per-row running max).  None falls back to the
    I2V_FLASH_STATIC_MAX env var (default 64).
    """
    if impl == "xla":
        return xla_attention(q, k, v, kv_repeat=kv_repeat, scale=scale)
    if impl == "pallas":
        return _pallas_maybe_spmd(q, k, v, kv_repeat, scale, False, static_max)
    if impl == "pallas_interpret":
        return _pallas_maybe_spmd(q, k, v, kv_repeat, scale, True, static_max)
    if impl != "auto":
        raise ValueError(f"unknown impl: {impl}")
    nk = k.shape[1]
    # Short-KV sites (text/IP tokens, temporal f<=64) are bandwidth-trivial;
    # XLA fuses them into one kernel already (measured: pallas at nk=81 is
    # ~20 ms/step SLOWER than the XLA path — lane padding 81->128 plus grid
    # overhead beats the materialized-scores cost at these sizes).  The
    # fused kernel wins on the long spatial sequences and cross-frame reuse.
    if _on_tpu() and nk >= 128:
        return _pallas_maybe_spmd(q, k, v, kv_repeat, scale, False, static_max)
    return xla_attention(q, k, v, kv_repeat=kv_repeat, scale=scale)


def _pallas_maybe_spmd(q, k, v, kv_repeat, scale, interpret, static_max):
    """Pallas flash entry that honors an active SPMD mesh context: under
    GSPMD a pallas_call forces full replication (XLA cannot slice the
    custom call's grid), so mesh-sharded samplers activate
    ``parallel.spmd.attention_spmd`` and the kernel runs shard-local via
    shard_map instead.  Falls back to the plain (replicated) call when no
    context is active or the shapes don't meet the layout constraints."""
    from i2v_adapter_tpu.parallel.spmd import (
        current_attention_spmd,
        spmd_flash_attention,
    )

    ctx = current_attention_spmd()
    if ctx is not None:
        out = spmd_flash_attention(
            lambda ql, kl, vl, rep: _attention_pallas(
                ql, kl, vl, rep, scale, interpret, static_max
            ),
            q, k, v, kv_repeat, ctx,
        )
        if out is not None:
            return out
        if ctx.mesh.size > 1:
            # shapes don't meet the shard_map layout constraints: a bare
            # pallas_call inside a multi-device GSPMD graph is a HARD
            # Mosaic error when propagation assigns it a non-replicated
            # sharding ("Mosaic kernels cannot be automatically
            # partitioned" — hit by the v5e-8 train-step topology AOT), so
            # degrade to the partitionable XLA lowering instead
            return xla_attention(q, k, v, kv_repeat=kv_repeat, scale=scale)
    return _attention_pallas(q, k, v, kv_repeat, scale, interpret, static_max)
