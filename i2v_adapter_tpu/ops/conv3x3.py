"""Pallas 3x3 SAME-padding NHWC convolution (stride 1).

The reference's resnet convs (torch Conv2d inside diffusers ResnetBlock2D,
consumed via /root/reference/src/models/unet_motion_cross_frame_attn.py)
lower through XLA's conv emitter at ~35-48 T/s on v5e — 2.5-4x off the
MXU matmul path at the same shapes.  This kernel expresses the 3x3 conv
as NINE SHIFTED MATMULS accumulated in fp32: for tap (dy, dx) the
flattened-token activation matrix is shifted by ``dy*W + dx`` rows
(a sublane-axis slice in VMEM — free of HBM traffic, unlike the same
rewrite in XLA where each shifted copy materializes) and masked at the
W borders, then multiplied against the (C, co) tap weight on the MXU.

Measured motivation (chip, scan-chain amortized): the XLA-level 9-matmul
rewrite already beats lax.conv at (32,32,32,640->640): 4.28 vs 6.90 ms —
but loses at (32,64,64,320->320) purely on the HBM cost of 9 shifted
copies; VMEM shifting removes exactly that term.

Blocking: the grid is (batch, cout-blocks, row-blocks).  Each program
receives THREE row-block views of x — the rows above, the center rows,
and the rows below (three in_specs whose index maps clamp at the image
edges) — so the +-1-row halo never needs overlapping blocks or a whole
image in VMEM (a full 64x64x320 image + shifted copies measured 19.6 MB
of scoped VMEM, over the 16 MB limit).  Out-of-image dy taps at the
first/last row block are zeroed by masks on ``program_id``.

Layout rules used: tokens (rows*W) on sublanes, channels on lanes; the
cout block is the full cout when the (3,3,C,cout) weight fits ~4 MB,
else a 128-multiple divisor (lane rule for the w/out blocks).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _conv3x3_kernel(*refs, W: int, n_rowblocks: int, pre_silu: bool):
    """One (batch, cout-block, row-block) program.  xa/xc/xb are the
    (1, rows, W, C) row blocks above / at / below this program's rows
    (index-map-clamped copies of the edge block at the image borders);
    w (3, 3, C, co); b (1, co); out (1, rows, W, co).

    With ``pre_silu`` two extra refs carry per-(batch, channel) affine
    vectors a/s (1, C) and the kernel computes conv(silu(x*a + s)) — the
    GroupNorm apply + SiLU that XLA would otherwise run as separate HBM
    passes once the conv is an opaque custom call (measured: the unfused
    pallas conv LOST 21 ms/step in-context to exactly those exposed
    passes)."""
    if pre_silu:
        xa_ref, xc_ref, xb_ref, a_ref, s_ref, w_ref, b_ref, o_ref = refs
    else:
        xa_ref, xc_ref, xb_ref, w_ref, b_ref, o_ref = refs
    rows = xc_ref.shape[1]
    c = xc_ref.shape[-1]
    co = o_ref.shape[-1]
    n = rows * W

    def pre(t):
        if not pre_silu:
            return t
        tf = t.astype(jnp.float32) * a_ref[0] + s_ref[0]
        return (tf * jax.nn.sigmoid(tf)).astype(t.dtype)

    xc = pre(xc_ref[0].reshape(n, c))
    ti = pl.program_id(2)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % W

    acc = jnp.zeros((n, co), jnp.float32)
    for dy in (-1, 0, 1):
        # rows [dy, rows+dy) of the center block, borrowing one row from
        # the neighbor block; at the image edge the borrowed row is
        # garbage (clamped index map) and is zeroed below.
        if dy == -1:
            up = pre(xa_ref[0, rows - 1:].reshape(W, c))
            # rows == 1: the block IS the borrowed neighbor row (zero-size
            # center slices are invalid vectors in Mosaic)
            xd = up if rows == 1 else jnp.concatenate(
                [up, xc[: n - W]], axis=0
            )
            edge_bad = ti == 0
            bad_row = 0
        elif dy == 1:
            down = pre(xb_ref[0, :1].reshape(W, c))
            xd = down if rows == 1 else jnp.concatenate(
                [xc[W:], down], axis=0
            )
            edge_bad = ti == n_rowblocks - 1
            bad_row = rows - 1
        else:
            xd, edge_bad, bad_row = xc, None, 0
        if edge_bad is not None:
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) // W
            keep = jnp.logical_or(
                jnp.logical_not(edge_bad), row_idx != bad_row
            )
            xd = jnp.where(keep, xd, jnp.zeros_like(xd))
        for dx in (-1, 0, 1):
            if dx == 1:
                xs = jnp.concatenate(
                    [xd[1:], jnp.zeros((1, c), xd.dtype)], axis=0
                )
                xs = jnp.where(col != (W - 1), xs, jnp.zeros_like(xs))
            elif dx == -1:
                xs = jnp.concatenate(
                    [jnp.zeros((1, c), xd.dtype), xd[: n - 1]], axis=0
                )
                xs = jnp.where(col != 0, xs, jnp.zeros_like(xs))
            else:
                xs = xd
            acc += jax.lax.dot_general(
                xs, w_ref[dy + 1, dx + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = (
        (acc + b_ref[0].astype(jnp.float32))
        .astype(o_ref.dtype).reshape(rows, W, co)
    )


def _pick_co_block(c: int, cout: int, itemsize: int) -> int:
    """Largest cout block whose (3,3,C,co) weight stays ~<=4 MB: the full
    cout if it fits, else the biggest 128-multiple divisor of cout (the
    lane rule: the w/out blocks' last dim must be 128-divisible or full)."""
    budget = 4 * 1024 * 1024
    if 9 * c * cout * itemsize <= budget:
        return cout
    best = 0
    for co in range(128, cout + 1, 128):
        if cout % co == 0 and 9 * c * co * itemsize <= budget:
            best = co
    return best


def _pick_rows(h: int, w: int, c: int, co_blk: int, itemsize: int) -> int:
    """Row-block height: ~<=1 MB fp32 accumulator AND ~<=0.7 MB x row
    block (three of them live, double-buffered: the full-H choice at
    (32,32,640) measured over the 16 MB scoped-VMEM limit), halved until
    both budgets hold; must divide H."""
    rows = h
    while rows > 1 and (
        rows * w * co_blk * 4 > 1024 * 1024
        or rows * w * c * itemsize > 700 * 1024
        or (h % rows)
    ):
        rows = rows // 2 if h % (rows // 2) == 0 else rows - 1
    return max(1, rows)


def conv3x3_pallas(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
    pre_scale: "jnp.ndarray | None" = None,
    pre_shift: "jnp.ndarray | None" = None,
    *, interpret: bool = False, rows: int = 0,
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv; x (B, H, W, C) NHWC, kernel (3, 3, C, cout)
    HWIO, bias (cout,).  Returns (B, H, W, cout) in x.dtype.  ``rows``
    overrides the row-block height (tests exercise multi-block halos).

    ``pre_scale``/``pre_shift`` (both (B, C) fp32 or neither): fuse
    ``silu(x * pre_scale + pre_shift)`` into the conv's input read — the
    GroupNorm-apply + SiLU epilogue in one VMEM pass."""
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    pre_silu = pre_scale is not None
    co_blk = _pick_co_block(c, cout, x.dtype.itemsize)
    if co_blk == 0:  # no legal block — caller should fall back
        raise ValueError(f"no cout block for C={c}, cout={cout}")
    rows = rows or _pick_rows(h, w, c, co_blk, x.dtype.itemsize)
    n_rowblocks = h // rows
    grid = (b, cout // co_blk, n_rowblocks)
    kern = functools.partial(
        _conv3x3_kernel, W=w, n_rowblocks=n_rowblocks, pre_silu=pre_silu
    )

    def x_spec(drow):
        return pl.BlockSpec(
            (1, rows, w, c),
            lambda bi, ci, ti: (
                bi, jnp.clip(ti + drow, 0, n_rowblocks - 1), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    in_specs = [x_spec(-1), x_spec(0), x_spec(1)]
    operands = [x, x, x]
    if pre_silu:
        # (B, 1, C) with a (1, 1, C) block: a bare (1, C) block over (B, C)
        # violates Mosaic's sublane rule when B > 1 (second-to-last block
        # dim must be 8-divisible or equal to the array dim).
        vec_spec = pl.BlockSpec(
            (1, 1, c), lambda bi, ci, ti: (bi, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [vec_spec, vec_spec]
        operands += [
            pre_scale.astype(jnp.float32)[:, None],
            pre_shift.astype(jnp.float32)[:, None],
        ]
    in_specs += [
        pl.BlockSpec((3, 3, c, co_blk), lambda bi, ci, ti: (0, 0, 0, ci),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co_blk), lambda bi, ci, ti: (0, ci),
                     memory_space=pltpu.VMEM),
    ]
    operands += [kernel.astype(x.dtype), bias.reshape(1, cout).astype(x.dtype)]

    flops = 2 * b * h * w * 9 * c * cout
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows, w, co_blk), lambda bi, ci, ti: (bi, ti, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(b * h * w * (3 * c + cout) + 9 * c * cout)
            * x.dtype.itemsize,
            transcendentals=b * h * w * c if pre_silu else 0,
        ),
        interpret=interpret,
    )(*operands)


def _conv3x3_ref(x, kernel, bias):
    """XLA reference (same math, fp32 accumulation) — used for the custom
    VJP so training gradients ride XLA's well-tested conv transpose."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, kernel, bias, interpret=False):
    """Dispatching entry: the Pallas forward with an XLA-conv backward."""
    return conv3x3_pallas(x, kernel, bias, interpret=interpret)


def _conv3x3_fwd(x, kernel, bias, interpret):
    return conv3x3(x, kernel, bias, interpret), (x, kernel, bias)


def _conv3x3_bwd(interpret, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_conv3x3_ref, x, kernel, bias)
    return vjp(g)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def _gn_silu_conv3x3_ref(x, a, s, kernel, bias):
    """XLA reference of the fused form: conv(silu(x*a + s))."""
    xf = x.astype(jnp.float32) * a[:, None, None, :] + s[:, None, None, :]
    xn = (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
    return _conv3x3_ref(xn, kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gn_silu_conv3x3(x, pre_scale, pre_shift, kernel, bias, interpret=False):
    """Fused GroupNorm-apply + SiLU + 3x3 conv: the affine (B, C) vectors
    come from the caller (stats and the gamma/beta fold are cheap XLA);
    the Pallas kernel reads x ONCE.  XLA-conv backward via custom VJP."""
    return conv3x3_pallas(
        x, kernel, bias, pre_scale, pre_shift, interpret=interpret
    )


def _gns_fwd(x, a, s, kernel, bias, interpret):
    return (
        gn_silu_conv3x3(x, a, s, kernel, bias, interpret),
        (x, a, s, kernel, bias),
    )


def _gns_bwd(interpret, res, g):
    _, vjp = jax.vjp(_gn_silu_conv3x3_ref, *res)
    return vjp(g)


gn_silu_conv3x3.defvjp(_gns_fwd, _gns_bwd)


def conv3x3_supported(x: jnp.ndarray, kernel: jnp.ndarray) -> bool:
    """Shape gate for the Pallas path: stride-1 3x3, channels that keep the
    MXU contraction deep and the lanes aligned, and a W-row token block
    that satisfies the 8-sublane rule."""
    if kernel.ndim != 4 or kernel.shape[:2] != (3, 3):
        return False
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    if c < 128 or c % 8 or cout % 8:
        return False
    if _pick_co_block(c, cout, x.dtype.itemsize) == 0:
        return False
    return (w * c * x.dtype.itemsize) % 1024 == 0 or (h * w) % 8 == 0
