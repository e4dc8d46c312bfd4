"""Collective-audit machinery (VERDICT r3 #1): the HLO inventory must match
analytically-known collectives, and the real-width sharded serving step's
compile-verified comm volume must stay within the latency projection's
assumption.

The reference has no distributed tests and no comm-volume visibility at all
(SURVEY.md §4/§5.8) — this guards the framework's own multi-chip claims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from i2v_adapter_tpu.parallel.audit import (
    audit,
    parse_collectives,
    summarize,
)


def _mesh(shape, axes):
    return Mesh(np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape), axes)


def test_parse_known_all_gather():
    """A shard_map with one explicit tiled all_gather: the parsed inventory
    must contain exactly that op with the analytic byte count."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    mesh = _mesh((4,), ("seq",))
    x = jax.ShapeDtypeStruct((4, 16, 128), jnp.float32)

    def local(xl):
        g = jax.lax.all_gather(xl, "seq", axis=0, tiled=True)
        return g.sum(axis=0, keepdims=True)

    fn = shard_map(
        local, mesh=mesh, in_specs=P("seq", None, None),
        out_specs=P("seq", None, None), check_vma=False,
    )
    res = audit(fn, (x,), in_shardings=(NamedSharding(mesh, P("seq")),))
    gathers = [o for o in res.ops if o.kind == "all-gather"]
    assert len(gathers) == 1
    # gathered result: full (4, 16, 128) f32 = 32 KiB
    assert gathers[0].out_bytes == 4 * 16 * 128 * 4
    assert gathers[0].group_size == 4
    # ring model: each device receives (n-1)/n of the output
    assert gathers[0].wire_bytes_per_device() == int(32768 * 3 / 4)
    assert not gathers[0].in_loop


def test_parse_psum_and_loop_tagging():
    """GSPMD-inserted all-reduce (contraction over a sharded dim) parses
    with group size; a collective inside a lax.scan body is tagged
    loop-resident."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    mesh = _mesh((8,), ("data",))
    col = NamedSharding(mesh, P(None, "data"))

    def fn(x, w):
        return x @ w  # contracting dim sharded -> psum of partials

    x = jax.ShapeDtypeStruct((16, 64), jnp.float32)
    w = jax.ShapeDtypeStruct((64, 32), jnp.float32)
    res = audit(
        fn, (x, w),
        in_shardings=(col, NamedSharding(mesh, P("data", None))),
        out_shardings=NamedSharding(mesh, P()),
    )
    reds = [o for o in res.ops if o.kind == "all-reduce"]
    assert reds, "expected a psum for the sharded contraction"
    assert reds[0].group_size == 8

    # loop tagging: an explicit psum inside a scanned shard_map body
    def loop_fn(x):
        local = shard_map(
            lambda xl: jax.lax.psum(xl, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(), check_vma=False,
        )

        def body(c, _):
            # carry-dependent: XLA hoists loop-INVARIANT collectives out of
            # the while body (verified — a plain local(x) psum lands in
            # ENTRY), which is exactly why in_loop tagging must look at the
            # residual ones
            return c + local(x + c).sum(), None

        c, _ = jax.lax.scan(body, 0.0, None, length=3)
        return c

    res2 = audit(
        loop_fn, (jax.ShapeDtypeStruct((8, 16), jnp.float32),),
        in_shardings=(NamedSharding(mesh, P("data")),),
        out_shardings=NamedSharding(mesh, P()),
    )
    loop_reds = [
        o for o in res2.ops if o.kind == "all-reduce" and o.in_loop
    ]
    assert loop_reds, "psum inside the scan body must be tagged in_loop"
    assert res2.summary["loop_resident_ops"] >= 1
    s = summarize(res.ops)
    assert s["total_ops"] == len(res.ops)


def test_parse_collectives_text_forms():
    """Parser handles tuple shapes, -start/-done async pairs, and
    replica_groups in both [n,m]<=[k] and {{...}} forms."""
    hlo = """
HloModule m

ENTRY %main (p0: f32[8,4]) -> f32[8,4] {
  %p0 = f32[8,4]{1,0} parameter(0)
  %ag-start = (f32[8,4]{1,0}, f32[16,4]{1,0}) all-gather-start(%p0), channel_id=1, replica_groups=[4,2]<=[8], dimensions={0}
  %ag-done = f32[16,4]{1,0} all-gather-done(%ag-start)
  %ar = (f32[8,4]{1,0}, f32[8,4]{1,0}) all-reduce(%p0, %p0), channel_id=2, replica_groups={{0,1},{2,3}}, to_apply=%add
  ROOT %cp = f32[8,4]{1,0} collective-permute(%p0), channel_id=3, source_target_pairs={{0,1},{1,0}}
}
"""
    ops = parse_collectives(hlo)
    kinds = sorted(o.kind for o in ops)
    assert kinds == ["all-gather", "all-reduce", "collective-permute"]
    ag = next(o for o in ops if o.kind == "all-gather")
    assert ag.out_bytes == 16 * 4 * 4  # the -start's result component
    assert ag.group_size == 2
    ar = next(o for o in ops if o.kind == "all-reduce")
    assert ar.out_bytes == 2 * 8 * 4 * 4  # variadic tuple summed
    assert ar.group_size == 2
    cp = next(o for o in ops if o.kind == "collective-permute")
    assert cp.wire_bytes_per_device() == 8 * 4 * 4


def test_tiny_infer_audit_end_to_end():
    """The audit tool's infer case compiles on the CPU-sim mesh at tiny
    widths and yields a finite, loop-free inventory with memory stats."""
    from i2v_adapter_tpu.tools.audit_multichip import build_infer_case

    res, meta = build_infer_case(
        {"data": 2, "fsdp": 1, "tensor": 1, "seq": 2}, tiny=True
    )
    assert res.summary["total_ops"] > 0
    # one denoise step has no internal scan: every collective must execute
    # exactly once per step or the per-step byte accounting is wrong
    assert res.summary["loop_resident_ops"] == 0
    assert res.wire_gb() > 0
    assert res.memory.get("argument_size_in_bytes", 0) > 0
    assert meta["mesh"] == {"data": 2, "fsdp": 1, "tensor": 1, "seq": 2}
    # the token-sharded temporal layout (Ulysses reshard) + the first-frame
    # slice constraint must keep the serving step GATHER-FREE: a regression
    # to frame-sharded K/V gathers or full-hidden-state slice gathers shows
    # up here as all-gather wire (measured 4.77 GB/device/step at real
    # width before the fix, 0 after)
    ag = res.summary["by_kind"].get("all-gather", {})
    assert ag.get("wire_bytes_per_device", 0) == 0, (
        f"serving step regressed to all-gathers: {ag}"
    )


def test_tiny_train_audit_frozen_replicated_cuts_gathers():
    """``fsdp_frozen='replicate'`` must remove the frozen-param all-gathers
    from the compiled train step (the 15.2 GB/device/step pattern the
    real-width audit measured, BASELINE.md multi-chip table) while leaving
    the gradient psums in place.  Audited at tiny width with the sharding
    threshold lowered so the tiny leaves actually shard."""
    from i2v_adapter_tpu.tools.audit_multichip import build_train_case

    mesh_axes = {"data": 2, "fsdp": 2, "tensor": 1, "seq": 2}
    res_shard, _ = build_train_case(mesh_axes, tiny=True, min_size=1024)
    res_rep, _ = build_train_case(
        mesh_axes, tiny=True, min_size=1024, fsdp_frozen="replicate"
    )

    def ag_wire(r):
        return r.summary["by_kind"].get("all-gather", {}).get(
            "wire_bytes_per_device", 0
        )

    assert ag_wire(res_shard) > 0, (
        "sharded tiny audit gathered nothing — min_size too high to "
        "exercise the ZeRO path"
    )
    # replicating the frozen partitions must cut the gather wire by the
    # frozen share (frozen towers dominate the param count even at tiny
    # width); total wire must drop too, not just shift kinds
    assert ag_wire(res_rep) < 0.5 * ag_wire(res_shard), (
        ag_wire(res_rep), ag_wire(res_shard)
    )
    assert res_rep.wire_gb() < res_shard.wire_gb()
    # gradient all-reduces survive — this is comm removal, not a no-comm
    # graph
    assert res_rep.summary["by_kind"].get("all-reduce", {}).get("count", 0) > 0


@pytest.mark.slow
def test_real_width_serving_comm_within_projection():
    """THE projection guard (VERDICT r3 #1): compile the REAL 512px/16f
    SD1.5-width CFG denoise step over the data=2 x seq=4 mesh (CPU-sim
    GSPMD partitioning — an upper bound on the TPU shard_map graph, which
    pins Pallas sites shard-local) and assert the per-device wire bytes
    stay within the <4 s/clip projection's viability envelope:

      22 steps x (wire / 50 GB/s) must leave >= 2.4 s of the 4 s budget
      for compute (the measured (1,4)-shard step is 38.6 ms -> 0.85 s,
      encoders/decode/dispatch ~0.6 s) => wire <= ~3.4 GB/device/step.

    BASELINE.md's multi-chip table carries the exact audited numbers (TPU
    topology AOT); this test keeps regressions from silently blowing the
    comm budget (e.g. a sharding-constraint change replicating K/V)."""
    from i2v_adapter_tpu.tools.audit_multichip import build_infer_case

    res, meta = build_infer_case(
        {"data": 2, "fsdp": 1, "tensor": 1, "seq": 4}, tiny=False
    )
    assert res.summary["loop_resident_ops"] == 0
    wire_gb = res.wire_gb()
    # Ulysses layout (token-sharded temporal modules + first-frame slice
    # constraint): the real-width audits measured 0.455 GB/device on the TPU
    # topology graph (BASELINE.md multi-chip table) and 0.357 GB/device on
    # this CPU-sim GSPMD graph (MULTICHIP_AUDIT_CPUSIM_INFER.json, committed
    # at the repo root) — 85% of it the unavoidable all-to-all reshard
    # pairs.  Two separate bounds (ADVICE r4): a drift TRIPWIRE at 1.4x the
    # recorded CPU-sim value, and the projection's hard viability ENVELOPE.
    audited_cpusim_gb = 0.357
    if wire_gb >= 1.4 * audited_cpusim_gb:
        raise AssertionError(
            f"serving step comm {wire_gb:.3f} GB/device drifted >1.4x from "
            f"the recorded CPU-sim audit ({audited_cpusim_gb} GB — "
            f"MULTICHIP_AUDIT_CPUSIM_INFER.json).  If the sharding change "
            f"is intentional, re-run `python -m i2v_adapter_tpu.tools."
            f"audit_multichip --cases infer_v5e8 --out "
            f"MULTICHIP_AUDIT_CPUSIM_INFER.json`, update BASELINE.md's "
            f"multi-chip table, and bump audited_cpusim_gb here."
        )
    # hard envelope: 22 steps x (wire / 50 GB/s) must leave >= 2.4 s of the
    # 4 s budget for compute => wire <= ~3.4 GB/device/step
    assert wire_gb < 3.4, (
        f"serving step comm {wire_gb:.2f} GB/device blows the <4 s/clip "
        f"projection budget (see BASELINE.md multi-chip table)"
    )
    ag = res.summary["by_kind"].get("all-gather", {})
    assert ag.get("wire_bytes_per_device", 0) == 0, (
        f"serving step regressed to all-gathers: {ag}"
    )
    # the temporal reshard rides all-to-alls now
    assert res.summary["by_kind"].get("all-to-all", {}).get("count", 0) > 0


def test_committed_tpu_train_audits_support_the_ledger_claims():
    """Provenance check (ADVICE r4 pattern): the committed TPU-topology
    train-audit artifacts must support BASELINE.md's round-5 claims —
    (a) fsdp_frozen='replicate' cuts the composite train mesh's wire >3x
    and its all-gathers >5x while staying within the ~14.7 GiB usable
    HBM; (b) the 512px motion mesh that FITS is fsdp=2 x seq=4 (the
    round-4 fsdp=4 x seq=2 shape measured 15.78 GiB — over).  Reads the
    JSONs at the repo root; no compilation."""
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")

    def load(name):
        with open(os.path.join(root, name)) as f:
            return json.load(f)

    r4 = load("MULTICHIP_AUDIT_TPU_TRAIN.json")["cases"]
    r5 = load("MULTICHIP_AUDIT_TPU_TRAIN_R5.json")["cases"]
    usable_hbm_gib = 14.7

    def wire(c):
        return c["wire_gb_per_device"]

    def ag_gb(c):
        k = c["summary"]["by_kind"].get("all-gather", {})
        return k.get("wire_bytes_per_device", 0) / 2**30

    def peak_gib(c):
        return c["memory"]["peak_bytes"] / 2**30

    shard, rep = r4["train_v5e8"], r5["train_v5e8_frozrep"]
    assert wire(rep) < wire(shard) / 3, (wire(rep), wire(shard))
    assert ag_gb(rep) < ag_gb(shard) / 5, (ag_gb(rep), ag_gb(shard))
    assert peak_gib(rep) < usable_hbm_gib, peak_gib(rep)

    over, fits = r4["train_motion_512_fsdp"], r5["train_motion_512_v2"]
    assert peak_gib(over) > usable_hbm_gib  # the r4 finding
    assert peak_gib(fits) < usable_hbm_gib, peak_gib(fits)
    assert fits["meta"]["mesh"] == {
        "data": 1, "fsdp": 2, "tensor": 1, "seq": 4
    }

    # (c) the motion-512 frozrep variant halves the wire and still fits
    # (with a thin margin BASELINE.md states explicitly)
    mf = load("MULTICHIP_AUDIT_TPU_MOTFROZ.json")["cases"][
        "train_motion_512_v2_frozrep"
    ]
    assert wire(mf) < 0.6 * wire(fits), (wire(mf), wire(fits))
    assert peak_gib(mf) < usable_hbm_gib, peak_gib(mf)
