"""SPMD inference: shard_map wrapping for Pallas kernels and tensor-parallel
parameter sharding rules.

Why this module exists: under plain ``jax.jit`` GSPMD partitioning, a
``pallas_call`` is an opaque custom call — XLA cannot slice its grid, so it
**forces full replication** (all-gather inputs, every device redoes the whole
kernel; verified on an 8-device mesh: the output sharding collapses to
``PartitionSpec()``).  The XLA ops around the kernels (convs, GroupNorms,
projections, FF matmuls) partition fine.  So the mesh-sharded sampler lets
GSPMD handle everything *except* the Pallas sites, which are wrapped here in
``shard_map`` with explicitly-local semantics:

* **flash (spatial / cross-frame / IP) attention** — batch dim 0 is the
  CFG-doubled clip-major frame-minor eval axis ``(B·F)``; it shards over
  ``(clip_axis, frame_axis)`` and the kernel runs untouched on each local
  slab (spatial attention is frame-local).  The cross-frame site's K/V carry
  one entry per clip: they shard over ``clip_axis`` only (replicated across
  frame shards) and the local kernel sees ``kv_repeat / seq`` — the
  first-frame broadcast never crosses the wire more than once.
* **temporal (frame-axis) attention** — ``(B, F, S, C)`` operands run
  TOKEN-sharded (Ulysses-style sequence parallelism): S shards over
  ``frame_axis``, every frame is local, and the F-axis contraction needs
  zero in-shard collectives.  The temporal module pins its whole block to
  this layout (``temporal_token_constraint``/``temporal_frame_constraint``)
  so the reshard from the surrounding frame-sharded eval layout is ONE
  all-to-all pair per motion module.  Replacing the earlier frame-sharded
  K/V all-gathers cut the compiled v5e-8 serving step from 4.77 GB to
  ~0 GB of gather wire (TPU-topology AOT audit).  A frame-sharded
  gather fallback remains for S that doesn't divide the seq axis.
* attention **heads** additionally shard over ``tensor_axis`` when the head
  count divides — this is the tensor-parallel axis made real: q/k/v
  projections are column-sharded (`tp_param_shardings`), each device runs
  the kernel on its local heads, and the row-sharded ``to_out`` matmul's
  psum is inserted by GSPMD.

The reference has no analogue of any of this — its only distribution is
NCCL data-parallel training via HF Accelerate (SURVEY.md §2.5/§5.8); its
inference is strictly single-GPU (pipeline_i2v_adapter.py:721-809).
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from i2v_adapter_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    SEQ_AXIS,
    TENSOR_AXIS,
)

# ---------------------------------------------------------------------------
# context: how attention operands are laid out over the mesh
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AttentionSpmd:
    """Declares the mesh layout of attention operands inside a sharded
    sampler or train step, so the ops-level dispatchers can wrap Pallas
    kernels in shard_map with matching specs.

    ``clip_axis`` may be a single mesh axis (inference: the CFG-doubled
    clip axis rides ``data``) or a tuple of axes (training: the global
    batch is sharded over ``(data, fsdp)``, matching
    ``parallel.mesh.batch_sharding``)."""

    mesh: Mesh
    clip_axis: Tuple[str, ...] = DATA_AXIS  # clip/batch axis (dim 0)
    frame_axis: str = SEQ_AXIS  # video frame axis
    tensor_axis: str = TENSOR_AXIS  # attention-head sharding

    @property
    def clip_axes(self) -> Tuple[str, ...]:
        c = self.clip_axis
        return (c,) if isinstance(c, str) else tuple(c)

    @property
    def eval_axes(self) -> Tuple[str, ...]:
        return self.clip_axes + (self.frame_axis,)

    def size(self, axis) -> int:
        if not isinstance(axis, str):
            n = 1
            for a in axis:
                n *= int(self.mesh.shape.get(a, 1))
            return n
        return int(self.mesh.shape.get(axis, 1))

    @property
    def eval_parallelism(self) -> int:
        return self.size(self.clip_axes) * self.size(self.frame_axis)


_STACK: list = []


@contextmanager
def attention_spmd(mesh: Mesh, **kwargs):
    """Activate SPMD attention dispatch for Pallas sites traced inside.

    Trace-time only (the dispatch decision is Python-level); no effect on
    already-compiled functions."""
    ctx = AttentionSpmd(mesh, **kwargs)
    _STACK.append(ctx)
    try:
        yield ctx
    finally:
        _STACK.pop()


def current_attention_spmd() -> Optional[AttentionSpmd]:
    return _STACK[-1] if _STACK else None


# ---------------------------------------------------------------------------
# shard_map wrappers (called from ops.attention dispatchers)
# ---------------------------------------------------------------------------


def _head_axis(ctx: AttentionSpmd, heads: int) -> Optional[str]:
    t = ctx.size(ctx.tensor_axis)
    if t > 1 and heads % t == 0:
        return ctx.tensor_axis
    return None


def spmd_flash_attention(
    plain_call, q, k, v, kv_repeat: int, ctx: AttentionSpmd
):
    """Run the flash kernel with per-device-local slabs.

    ``plain_call(q, k, v, kv_repeat)`` is the unwrapped kernel entry.
    Returns None when the shapes don't satisfy the layout constraints (the
    caller falls back to the plain call — correct, just replicated).

    Constraints (serving shapes satisfy them by construction):
      * kv_repeat == 1: dim 0 divisible by clip·frame parallelism.
      * kv_repeat > 1 (cross-frame), one clip per clip-shard
        (``k.shape[0] == clip_size``): the local q→kv index map stays the
        kernel's ``q_block // kv_repeat``; frames divisible by frame shards.
      * kv_repeat > 1, MULTIPLE clips per clip-shard (training / batched
        serving: ``k.shape[0] % clip_size == 0``): legal only when frames
        are NOT seq-sharded — q's dim 0 is clip-major, so a contiguous
        clip-shard slab holds whole clips and the kernel's multi-clip
        ``b // (kv_repeat·h)`` routing applies; with seq shards the slab
        would mix partial clips.
    """
    d, s = ctx.size(ctx.clip_axes), ctx.size(ctx.frame_axis)
    n = d * s
    if n == 1:
        return None
    heads = q.shape[2]
    haxis = _head_axis(ctx, heads)
    if kv_repeat == 1:
        if q.shape[0] % n:
            return None
        spec = P(ctx.eval_axes, None, haxis, None)
        in_specs = (spec, spec, spec)
        local_repeat = 1
        out_spec = spec
    elif k.shape[0] == d and kv_repeat % s == 0:
        qspec = P(ctx.eval_axes, None, haxis, None)
        kspec = P(ctx.clip_axes, None, haxis, None)
        in_specs = (qspec, kspec, kspec)
        local_repeat = kv_repeat // s
        out_spec = qspec
    elif k.shape[0] % d == 0 and s == 1:
        # multi-clip shards, frames unsharded: shard dim 0 over the clip
        # axes only
        qspec = P(ctx.clip_axes, None, haxis, None)
        kspec = P(ctx.clip_axes, None, haxis, None)
        in_specs = (qspec, kspec, kspec)
        local_repeat = kv_repeat
        out_spec = qspec
    else:
        return None

    fn = _shard_map(
        lambda ql, kl, vl: plain_call(ql, kl, vl, local_repeat),
        mesh=ctx.mesh,
        in_specs=in_specs,
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(q, k, v)


def spmd_conv3x3(local_call, x, kernel, bias, ctx: AttentionSpmd):
    """Frame-local 3x3 conv with the (B*F, H, W, C) eval axis sharded over
    (clip, frame) and the weights replicated — a bare pallas_call inside a
    GSPMD graph otherwise forces full replication (same property as the
    attention kernels).  Returns None when dim 0 doesn't shard."""
    n = ctx.eval_parallelism
    if n == 1 or x.shape[0] % n:
        return None
    spec = P(ctx.eval_axes, None, None, None)
    fn = _shard_map(
        local_call, mesh=ctx.mesh,
        in_specs=(spec, P(), P()), out_specs=spec, check_vma=False,
    )
    return fn(x, kernel, bias)


def spmd_gn_silu_conv3x3(local_call, x, a, s, kernel, bias,
                         ctx: AttentionSpmd):
    """Fused GN-apply+SiLU+conv with the eval axis sharded over
    (clip, frame); the (B, C) affine vectors shard with it, weights
    replicated.  Returns None when dim 0 doesn't shard."""
    n = ctx.eval_parallelism
    if n == 1 or x.shape[0] % n:
        return None
    spec = P(ctx.eval_axes, None, None, None)
    vec = P(ctx.eval_axes, None)
    fn = _shard_map(
        local_call, mesh=ctx.mesh,
        in_specs=(spec, vec, vec, P(), P()), out_specs=spec, check_vma=False,
    )
    return fn(x, a, s, kernel, bias)


def spmd_temporal_attention(local_call, q, k, v, heads: int, ctx: AttentionSpmd):
    """Frame-axis attention with (B, F, S, C) operands over the mesh.

    Preferred layout — **token-sharded** (Ulysses-style sequence
    parallelism, DeepSpeed-Ulysses / scaling-book reshard move): the
    spatial-token dim S shards over ``frame_axis`` and every frame is
    local, so the F-axis contraction needs ZERO collectives inside the
    shard.  The surrounding graph holds frame-sharded activations, so
    GSPMD inserts one all-to-all per operand at the shard_map boundary —
    (s-1)/s of the LOCAL shard per device, vs the legacy path's K/V
    all-gathers at (s-1)/s of the FULL per-clip tensor (s/2 x more wire;
    measured 4.77 GB/device/step on the v5e-8 serving graph).  The
    temporal module pins its whole block to this layout
    (``temporal_token_constraint``), which hoists the all-to-all pair to
    the module boundary so the per-attention reshards are no-ops.

    Legacy layout — frame-sharded with in-shard K/V all-gathers — remains
    for shapes where S doesn't divide (e.g. 768px S=9216 on s shards that
    don't divide it).

    ``local_call(q, k, v, heads_local)`` computes full attention over the
    frames it is given.  Returns None when no layout fits."""
    b, f, S, c = q.shape
    d, s = ctx.size(ctx.clip_axes), ctx.size(ctx.frame_axis)
    if d * s == 1:
        return None
    if b % d:
        return None
    haxis = _head_axis(ctx, heads)
    t = ctx.size(ctx.tensor_axis) if haxis else 1

    if S % s == 0:
        # token-sharded: frames fully local, S over the seq axis; C over
        # tensor keeps whole heads local (C is head-major)
        spec = P(ctx.clip_axes, None, ctx.frame_axis, haxis)
        fn = _shard_map(
            lambda ql, kl, vl: local_call(ql, kl, vl, heads // t),
            mesh=ctx.mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
        return fn(q, k, v)

    if f % s:
        return None
    spec = P(ctx.clip_axes, ctx.frame_axis, None, haxis)
    frame_axis = ctx.frame_axis

    def local(ql, kl, vl):
        if s > 1:
            kl = jax.lax.all_gather(kl, frame_axis, axis=1, tiled=True)
            vl = jax.lax.all_gather(vl, frame_axis, axis=1, tiled=True)
        return local_call(ql, kl, vl, heads // t)

    fn = _shard_map(
        local, mesh=ctx.mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def temporal_token_constraint(x):
    """Pin a (B, F, S, C) motion-module activation to the token-sharded
    layout (S over the seq axis, frames local) when an SPMD context is
    active and shapes divide; identity otherwise.

    Applied at the temporal module's entry so the whole block — proj_in,
    both attentions, FF, proj_out — runs token-sharded and the reshard
    from the surrounding frame-sharded eval layout is ONE all-to-all pair
    per module instead of one per attention operand."""
    ctx = current_attention_spmd()
    if ctx is None:
        return x
    d, s = ctx.size(ctx.clip_axes), ctx.size(ctx.frame_axis)
    if d * s == 1 or s == 1:
        return x
    if x.ndim != 4 or x.shape[0] % d or x.shape[2] % s:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, P(ctx.clip_axes, None, ctx.frame_axis, None))
    )


def temporal_frame_constraint(x):
    """Pin a (B, F, S, C) activation back to the frame-sharded eval layout
    (frames over the seq axis) at the temporal module's exit, so the
    reshape to (B*F, H, W, C) and the residual add stay local."""
    ctx = current_attention_spmd()
    if ctx is None:
        return x
    d, s = ctx.size(ctx.clip_axes), ctx.size(ctx.frame_axis)
    if d * s == 1 or s == 1:
        return x
    if x.ndim != 4 or x.shape[0] % d or x.shape[1] % s:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, P(ctx.clip_axes, ctx.frame_axis, None, None))
    )


def first_frame_constraint(x):
    """Pin an extracted per-clip first-frame tensor (B, S, C) to
    clip-sharded-only (replicated over seq/tensor).

    The cross-frame K/V source is frame 0 of each clip, sliced from the
    frame-sharded eval axis.  Without an explicit layout GSPMD materializes
    the slice by all-gathering the FULL hidden state over seq and slicing
    locally — measured [16,4096,320]-shaped gathers on the v5e-8 serving
    graph, ~31 MB wire each.  Pinning the slice itself makes the wire cost
    the (B, S, C) slice, an order of magnitude less."""
    ctx = current_attention_spmd()
    if ctx is None:
        return x
    d = ctx.size(ctx.clip_axes)
    if ctx.mesh.size == 1 or x.shape[0] % d:
        return x
    spec = [None] * x.ndim
    spec[0] = ctx.clip_axes
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, P(*spec))
    )


# ---------------------------------------------------------------------------
# tensor-parallel parameter sharding rules
# ---------------------------------------------------------------------------

# column-sharded projections (output features over tensor)
_COL_KEYS = ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip")
# row-sharded projections (input features over tensor; GSPMD inserts the
# psum of partial outputs)
_ROW_KEYS = ("to_out",)


def _tp_spec(path: Tuple[str, ...], shape, tsize: int, heads: int) -> P:
    """Megatron-style attention TP: q/k/v column-parallel, to_out
    row-parallel.  The GEGLU feed-forward is NOT tensor-sharded: its
    (d, 2·inner) projection splits at the midpoint, which a contiguous
    column sharding would scatter across devices (measured design note —
    frame-eval parallelism covers the FF instead).  Biases of row-parallel
    layers stay replicated (added once after the psum)."""
    if tsize <= 1 or len(shape) == 0:
        return P()
    names = [str(p) for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    inner_dim_ok = lambda dim: shape[dim] % tsize == 0
    if parent in _COL_KEYS and leaf == "kernel" and inner_dim_ok(-1):
        spec = [None] * len(shape)
        spec[-1] = TENSOR_AXIS
        return P(*spec)
    if parent in _COL_KEYS and leaf == "bias" and inner_dim_ok(0):
        return P(TENSOR_AXIS)
    if parent in _ROW_KEYS and leaf == "kernel" and shape[0] % tsize == 0:
        spec = [None] * len(shape)
        spec[0] = TENSOR_AXIS
        return P(*spec)
    return P()


def tp_param_shardings(params, mesh: Mesh, heads: int = 8):
    """NamedSharding tree for a UNet param tree: attention projections
    sharded over the ``tensor`` axis, everything else replicated.  Safe for
    tensor=1 meshes (everything replicated)."""
    tsize = int(mesh.shape.get(TENSOR_AXIS, 1))

    def leaf(path, p):
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", k)) for k in path
        )
        return NamedSharding(mesh, _tp_spec(keys, tuple(p.shape), tsize, heads))

    return jax.tree_util.tree_map_with_path(leaf, params)


def pipeline_param_shardings(params: dict, mesh: Mesh, heads: int = 8):
    """Sharding tree for the full pipeline param dict: UNet gets tensor-
    parallel rules; VAE / text / image encoders are replicated (their cost
    per clip is ~0.3 s total — not worth sharding rules)."""
    out = {}
    for name, tree in params.items():
        if name == "unet":
            out[name] = tp_param_shardings(tree, mesh, heads)
        else:
            out[name] = jax.tree.map(
                lambda p: NamedSharding(mesh, P()), tree
            )
    return out
