"""Compile-time collective audit for mesh-sharded programs (VERDICT r3 #1).

The multi-chip latency projections in BASELINE.md were built from measured
single-chip shard compute plus HAND-ESTIMATED ICI terms.  This module
replaces the estimates with facts extracted from the compiled sharded graph:

* :func:`parse_collectives` walks the optimized (post-GSPMD-partitioning)
  HLO text of a compiled function and inventories every collective op —
  kind, dtype, shape, participant-group size, and byte volume.
* :func:`wire_bytes_per_device` models per-device ICI traffic for each op
  under the standard ring algorithms (the same model every roofline uses):
  all-gather receives ``out*(n-1)/n``, all-reduce moves ``2*in*(n-1)/n``,
  reduce-scatter receives ``in*(n-1)/n``, collective-permute/all-to-all move
  their payload once.
* :func:`audit` AOT-lowers a function on a mesh (``jax.ShapeDtypeStruct``
  args — no weights materialized, nothing executed), compiles it, and
  returns the inventory plus the compiler's per-device
  ``memory_analysis()`` numbers.

Ops inside ``while`` bodies (``lax.scan``/``fori_loop``) execute once per
iteration but appear once in the text; the parser tags them ``in_loop`` so
per-step audits (the intended use: audit ONE denoise / train step) can
assert none are hidden in loops, or scale them explicitly.

Reference has no analogue: its only distribution is NCCL DDP via HF
Accelerate (SURVEY.md §5.8) with no visibility into comm volume at all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

_DTYPE_BITS = {
    "pred": 8, "s4": 4, "u4": 4, "s8": 8, "u8": 8, "s16": 16, "u16": 16,
    "s32": 32, "u32": 32, "s64": 64, "u64": 64, "f8e4m3fn": 8, "f8e5m2": 8,
    "bf16": 16, "f16": 16, "f32": 32, "f64": 64, "c64": 64, "c128": 128,
}

_COLLECTIVE_KINDS = (
    "all-gather", "all-reduce", "reduce-scatter", "all-to-all",
    "collective-permute", "collective-broadcast",
)

# one HLO instruction: ``%name = <shape> <op>(...), ...attrs``
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\(?[^=]*?\)?)\s+"
    r"(" + "|".join(_COLLECTIVE_KINDS) + r")(?:-start|-done)?\("
)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")
_GROUPS_LIST_RE = re.compile(r"replica_groups=\{([^}]*)\}")
# computation header: ``%name (params...) -> type {`` — params may contain
# nested tuple parens, so match greedily up to the ``->``
_COMPUTATION_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*->")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO shape string (tuples summed)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        bits = _DTYPE_BITS.get(dtype)
        if bits is None:
            continue  # token[] / opaque
        numel = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
        total += (numel * bits) // 8
    return total


@dataclass
class CollectiveOp:
    kind: str
    shape: str
    out_bytes: int
    group_size: int
    computation: str
    in_loop: bool = False

    def wire_bytes_per_device(self) -> int:
        """Modeled per-device ICI bytes moved (ring algorithms)."""
        n = max(self.group_size, 1)
        if self.kind == "collective-permute":
            # point-to-point: each device sends/receives its payload once
            # (source-target pairs, not replica groups)
            return self.out_bytes
        if n == 1:
            return 0
        if self.kind == "all-gather":
            # each device receives the other (n-1)/n of the gathered output
            return int(self.out_bytes * (n - 1) / n)
        if self.kind == "all-reduce":
            # ring all-reduce: reduce-scatter + all-gather over the operand
            return int(2 * self.out_bytes * (n - 1) / n)
        if self.kind == "reduce-scatter":
            # receives (n-1) shards of out size
            return int(self.out_bytes * (n - 1))
        if self.kind in ("all-to-all", "collective-broadcast"):
            return int(self.out_bytes * (n - 1) / n)
        return self.out_bytes


def _loop_computations(hlo_text: str) -> set:
    """Names of computations reachable only through while ops (loop bodies
    and conditions) — a one-level approximation: computations referenced by
    ``while(...)`` ``body=`` / ``condition=`` attrs, plus calls from them."""
    body_re = re.compile(r"(?:body|condition)=%?([\w.\-]+)")
    loops = set()
    for line in hlo_text.splitlines():
        if " while(" in line:
            loops.update(body_re.findall(line))
    if not loops:
        return loops
    # transitively include computations called from loop bodies
    call_re = re.compile(
        r"(?:to_apply|body|condition|branch_computations=\{)[=%]*%?([\w.\-]+)"
    )
    comp_calls: Dict[str, set] = {}
    current = None
    for line in hlo_text.splitlines():
        m = _COMPUTATION_RE.match(line)
        if m:
            current = m.group(1)
            comp_calls.setdefault(current, set())
        elif current is not None and ("to_apply=" in line or "call(" in line):
            comp_calls[current].update(call_re.findall(line))
    changed = True
    while changed:
        changed = False
        for comp, calls in comp_calls.items():
            if comp in loops:
                new = calls - loops
                if new:
                    loops.update(new)
                    changed = True
    return loops


def parse_collectives(hlo_text: str) -> List[CollectiveOp]:
    """Inventory every collective in optimized HLO text.

    ``-start``/``-done`` async pairs count once (the ``-start`` carries the
    shapes; ``-done`` is skipped)."""
    loops = _loop_computations(hlo_text)
    ops: List[CollectiveOp] = []
    current_comp = "?"
    for line in hlo_text.splitlines():
        m = _COMPUTATION_RE.match(line)
        if m:
            current_comp = m.group(1)
            continue
        if "-done(" in line:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        shape_text, kind = m.group(1), m.group(2)
        gm = _GROUPS_RE.search(line)
        if gm:
            group_size = int(gm.group(2))
        else:
            gl = _GROUPS_LIST_RE.search(line)
            if gl and gl.group(1).strip():
                first = gl.group(1).split("}")[0].strip("{ ")
                group_size = len([t for t in first.split(",") if t.strip()])
            else:
                group_size = 1
        out_bytes = _shape_bytes(shape_text)
        if kind == "all-gather" and "-start(" in line:
            # all-gather-start shape is (operand, result): count the result
            ms = _SHAPE_RE.findall(shape_text)
            if len(ms) >= 2:
                dtype, dims = ms[-1]
                bits = _DTYPE_BITS.get(dtype, 0)
                numel = (
                    int(np.prod([int(d) for d in dims.split(",") if d]))
                    if dims else 1
                )
                out_bytes = (numel * bits) // 8
        ops.append(CollectiveOp(
            kind=kind, shape=shape_text.strip(), out_bytes=out_bytes,
            group_size=group_size, computation=current_comp,
            in_loop=current_comp in loops,
        ))
    return ops


def summarize(ops: Sequence[CollectiveOp]) -> Dict[str, Any]:
    """Aggregate an op list: counts, output bytes, and modeled per-device
    wire bytes, per kind and total (loop-resident ops summarized separately
    since their execution count is not statically known here)."""
    by_kind: Dict[str, Dict[str, int]] = {}
    total_wire = 0
    loop_ops = 0
    for op in ops:
        d = by_kind.setdefault(op.kind, {"count": 0, "out_bytes": 0,
                                         "wire_bytes_per_device": 0})
        d["count"] += 1
        d["out_bytes"] += op.out_bytes
        if op.in_loop:
            loop_ops += 1
        else:
            w = op.wire_bytes_per_device()
            d["wire_bytes_per_device"] += w
            total_wire += w
    return {
        "by_kind": by_kind,
        "total_ops": len(ops),
        "loop_resident_ops": loop_ops,
        "wire_bytes_per_device": total_wire,
    }


@dataclass
class AuditResult:
    ops: List[CollectiveOp]
    summary: Dict[str, Any]
    memory: Dict[str, int] = field(default_factory=dict)

    def wire_gb(self) -> float:
        return self.summary["wire_bytes_per_device"] / 1e9

    def time_at(self, gbps: float) -> float:
        """Modeled comm seconds at ``gbps`` GB/s usable per-device ICI."""
        return self.wire_gb() / gbps


def audit(
    fn,
    args: Sequence[Any],
    *,
    in_shardings=None,
    out_shardings=None,
    donate_argnums: Tuple[int, ...] = (),
) -> AuditResult:
    """AOT-compile ``fn`` (args may be ``jax.ShapeDtypeStruct`` — nothing is
    materialized or executed) and extract the collective inventory plus the
    compiler's per-device memory analysis.

    ``fn`` may already be a ``jax.jit``-wrapped function (it is lowered
    as-is, keeping its own shardings/donation); otherwise it is jitted here
    with the given options."""
    import jax

    if hasattr(fn, "lower") and hasattr(fn, "trace"):
        jitted = fn  # already jit-wrapped
    else:
        jitted = jax.jit(
            fn, in_shardings=in_shardings, out_shardings=out_shardings,
            donate_argnums=donate_argnums,
        )
    compiled = jitted.lower(*args).compile()
    return audit_compiled(compiled)


def audit_compiled(compiled) -> AuditResult:
    """Extract the inventory from an already-compiled executable."""
    text = compiled.as_text()
    ops = parse_collectives(text)
    mem: Dict[str, int] = {}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                mem[k] = int(getattr(ma, k, 0) or 0)
            mem["peak_bytes"] = (
                mem.get("argument_size_in_bytes", 0)
                + mem.get("output_size_in_bytes", 0)
                + mem.get("temp_size_in_bytes", 0)
                - mem.get("alias_size_in_bytes", 0)
            )
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return AuditResult(ops=ops, summary=summarize(ops), memory=mem)
