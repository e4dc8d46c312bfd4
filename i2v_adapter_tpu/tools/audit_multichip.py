"""Compile-verified multi-chip audit (VERDICT r3 #1).

AOT-compiles the mesh-sharded denoise step and train step on an N-device
CPU-sim mesh at the REAL claimed shapes (SD1.5 widths, 512px/16f etc.) and
extracts from the compiled, GSPMD-partitioned HLO the collective inventory
— op kinds, shapes, total bytes, modeled per-device ICI wire bytes — plus
the compiler's per-device memory analysis.  Nothing is executed and no
weights are materialized (``jax.ShapeDtypeStruct`` lowering), so auditing
the full-width model is minutes of compile, not hours of interpret-mode
emulation.

This replaces BASELINE.md's hand-estimated ICI terms ("K+V = 1.53 GB/step
at 50 GB/s") with compiled-graph facts.  Honesty notes baked into the
output: (a) the graph is the CPU-backend GSPMD partitioning — on TPU the
Pallas attention sites additionally run shard-local via shard_map
(parallel/spmd.py), which can only REMOVE attention-internal comm relative
to what GSPMD chooses here, and the temporal shard_map wrapper's explicit
K/V all-gather matches GSPMD's own choice for the einsum lowering audited
here; (b) ``temp_size_in_bytes`` reflects CPU buffer assignment — layouts
and fusion differ from TPU, so it is indicative for HBM fit, while
argument sizes (params + state) are exact.

Usage (CPU-sim, from the repo root):

    JAX_PLATFORMS=cpu python -m i2v_adapter_tpu.tools.audit_multichip \
        --devices 8 --cases infer_v5e8,train_v5e8 --out MULTICHIP_AUDIT.json

**TPU topology mode** (`--platform tpu`): AOT-compiles against a REAL
v5e topology via ``jax.experimental.topologies.get_topology_desc`` — no
multi-chip hardware needed, but the executable is the genuine TPU one:
Mosaic-compiled Pallas kernels dispatched shard-local through the
shard_map wrappers, TPU collectives, and a real per-device HBM
``memory_analysis``.  This is the evidence-grade path; the CPU-sim mode
remains for boxes without a TPU compiler.

Run with --tiny for the fast CI-sized version (same code path, tiny
widths) — tests/test_audit_collectives.py asserts the inventory against
the analytic model there.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# real-width topology compiles run 10+ minutes on this box — cache them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

_TOPOLOGY_BY_N = {2: "v5e:1x2", 4: "v5e:2x2", 8: "v5e:2x4", 16: "v5e:4x4"}


def _force_cpu(n_devices: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)


def _get_devices(n: int, platform: str):
    """Device list for an n-device mesh: CPU-sim devices or an AOT TPU
    topology's abstract devices."""
    import jax

    if platform == "cpu":
        return jax.devices()[:n]
    from jax.experimental import topologies

    kwargs = {}
    if n == 2:
        # sub-host slice: the default chips_per_host_bounds (2x2) doesn't
        # divide 1x2
        kwargs["chips_per_host_bounds"] = (1, 2, 1)
    topo = topologies.get_topology_desc(
        _TOPOLOGY_BY_N[n], platform="tpu", **kwargs
    )
    return list(topo.devices)


def _zeros_struct(tree):
    import jax

    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), tree
    )


def _bf16_struct(tree):
    """Serving stores fp32 weights as bf16 (bench.py convention)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        tree,
    )


def build_infer_case(
    mesh_axes: dict,
    *,
    height: int = 512,
    width: int = 512,
    frames: int = 16,
    batch: int = 1,
    steps: int = 25,
    tiny: bool = False,
    unet_chunk: int = 1,
    platform: str = "cpu",
):
    """Audit one CFG denoise step of the mesh-sharded sampler.

    Returns (result, meta).  The step function is exactly what the fused
    scan body and the stepwise dispatcher run (``_build_parts``), traced
    under ``attention_spmd(mesh)`` like both samplers do, with the
    pipeline's own with_sharding_constraint layout (clips over ``data``,
    frames over ``seq``)."""
    import jax
    import jax.numpy as jnp

    from i2v_adapter_tpu.config import (
        I2VModelConfig, MeshConfig, PipelineConfig, tiny_test_config,
    )
    from i2v_adapter_tpu.models import (
        AutoencoderKL, CLIPTextEncoder, CLIPVisionEncoder, VideoUNet,
    )
    from i2v_adapter_tpu.parallel.audit import audit
    from i2v_adapter_tpu.parallel.mesh import create_mesh
    from i2v_adapter_tpu.parallel.spmd import (
        attention_spmd, pipeline_param_shardings,
    )
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline
    from i2v_adapter_tpu.schedulers import make_schedule

    if tiny:
        mc = tiny_test_config()
        height = width = 32
        frames = 4
    else:
        mc = I2VModelConfig()
        # serving default (bench.py): int8 convs in the audited graph too
        mc = mc.replace(
            unet=mc.unet.replace(int8_conv=True),
            vae=mc.vae.replace(int8_decode=True),
        )
    n = 1
    for v in mesh_axes.values():
        n *= v
    devices = _get_devices(n, platform)
    mesh = create_mesh(MeshConfig(**mesh_axes), devices)

    dtype = jnp.float32 if tiny else jnp.bfloat16
    pipe = I2VAdapterPipeline.__new__(I2VAdapterPipeline)
    pipe.config = mc
    pipe.pipe_config = PipelineConfig(
        num_frames=frames, height=height, width=width,
        num_inference_steps=steps,
        dtype="float32" if tiny else "bfloat16", blur_sigma=1.0,
    )
    pipe.dtype = dtype
    pipe.unet = VideoUNet(mc.unet, dtype=dtype)
    pipe.vae = AutoencoderKL(mc.vae, dtype=dtype)
    pipe.text_encoder = CLIPTextEncoder(mc.text_encoder, dtype=dtype)
    pipe.image_encoder = CLIPVisionEncoder(mc.image_encoder, dtype=dtype)
    pipe.schedule = make_schedule(mc.scheduler)
    pipe.tokenizer = None
    pipe.mesh = mesh

    lat = height // mc.vae.spatial_scale_factor
    rng = jax.random.PRNGKey(0)
    L = 16 if tiny else 77
    unet_abs = _bf16_struct(jax.eval_shape(
        lambda: pipe.unet.init(
            rng, jnp.zeros((2, frames, lat, lat, 4), dtype), jnp.zeros((2,)),
            jnp.zeros((2, L, mc.unet.cross_attention_dim), dtype),
            jnp.zeros((2, mc.unet.image_embed_dim), dtype),
            enable_cross_frame_attn=True,
        )
    ))
    params_abs = {
        "unet": unet_abs,
        "vae": _bf16_struct(jax.eval_shape(
            lambda: pipe.vae.init(rng, jnp.zeros((1, height, width, 3), dtype))
        )),
        "text_encoder": _bf16_struct(jax.eval_shape(
            lambda: pipe.text_encoder.init(rng, jnp.zeros((1, L), jnp.int32))
        )),
        "image_encoder": _bf16_struct(jax.eval_shape(
            lambda: pipe.image_encoder.init(
                rng,
                jnp.zeros((1, mc.image_encoder.image_size,
                           mc.image_encoder.image_size, 3), dtype),
            )
        )),
    }

    prep_fn, step_fn, decode_fn, ts, prev, _ = pipe._build_parts(
        batch, frames, height, width, steps, 0.9, 7.5, True, True, 0, False,
        unet_chunk,
    )

    # abstract carry/consts from an abstract prep pass
    s = mc.image_encoder.image_size
    carry_abs, consts_abs = jax.eval_shape(
        prep_fn,
        params_abs,
        jax.ShapeDtypeStruct((2 * batch, L), jnp.int32),
        jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, s, s, 3), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    t_abs = jax.ShapeDtypeStruct((), jnp.int32)

    param_sh = pipeline_param_shardings(
        params_abs, mesh, heads=mc.unet.num_attention_heads
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    rep_tree = lambda tree: jax.tree.map(lambda _: rep, tree)

    # trace under the SPMD context like _build_sampler/_stepwise_sampler:
    # on TPU the Pallas sites dispatch shard-local via shard_map (the graph
    # the projections claim); on CPU the dispatchers fall through to the
    # XLA lowerings and GSPMD partitions them (an upper bound on comm)
    def step_spmd(params, consts, carry, t, tp):
        with attention_spmd(mesh):
            return step_fn(params, consts, carry, t, tp)

    t0 = time.time()
    # consts replicated (they are per-clip scalars/embeddings); carry in/out
    # left to GSPMD so it follows the step's own shard_frames constraint —
    # matching the fused scan, where the carry stays sharded across steps
    res = audit(
        step_spmd,
        (params_abs, consts_abs, carry_abs, t_abs, t_abs),
        in_shardings=(
            param_sh, rep_tree(consts_abs), None, rep, rep,
        ),
    )
    n_params = sum(
        int(__import__("numpy").prod(x.shape))
        for x in jax.tree.leaves(params_abs)
    )
    meta = {
        "mesh": dict(mesh.shape),
        "workload": f"{height}px {frames}f batch{batch} CFG step",
        "params_m": round(n_params / 1e6, 1),
        "compile_s": round(time.time() - t0, 1),
        "steps_per_clip": len(ts),
    }
    return res, meta


def build_train_case(
    mesh_axes: dict,
    *,
    res: int = 256,
    frames: int = 16,
    per_device_batch: int = 2,
    tiny: bool = False,
    motion: bool = False,
    optimizer: str = "adamw",
    platform: str = "cpu",
    fsdp_frozen: str = "shard",
    min_size: int = 2**16,
):
    """Audit one training step over the mesh (batch over data x fsdp,
    frames over seq, ZeRO state sharding over fsdp; ``fsdp_frozen=
    'replicate'`` keeps the no-gradient partitions replicated; ``min_size``
    is the fsdp sharding threshold in elements — lower it for tiny-width
    audits whose leaves are all below the production default)."""
    import jax
    import jax.numpy as jnp

    from i2v_adapter_tpu.config import (
        I2VModelConfig, MeshConfig, TrainConfig, tiny_test_config,
    )
    from i2v_adapter_tpu.models import (
        AutoencoderKL, CLIPTextEncoder, CLIPVisionEncoder, VideoUNet,
    )
    from i2v_adapter_tpu.parallel.audit import audit
    from i2v_adapter_tpu.parallel.mesh import (
        batch_sharding, create_mesh, train_state_shardings,
    )
    from i2v_adapter_tpu.training.state import (
        create_train_state, make_optimizer,
    )
    from i2v_adapter_tpu.training.train_i2v import make_train_step

    if tiny:
        mc = tiny_test_config()
        res = 32
        frames = 4
    else:
        mc = I2VModelConfig()
    n = 1
    for v in mesh_axes.values():
        n *= v
    devices = _get_devices(n, platform)
    mesh = create_mesh(MeshConfig(**mesh_axes), devices)
    dp = int(mesh.shape["data"]) * int(mesh.shape["fsdp"])
    b = per_device_batch * dp

    from i2v_adapter_tpu.config import OptimizerConfig

    tc = TrainConfig(
        train_batch_size=b, num_frames=frames, resolution=res,
        gradient_accumulation_steps=1, mixed_precision="bfloat16",
        gradient_checkpointing=True, freeze_dtype="bfloat16",
        update_motion_modules=motion,
        optimizer=OptimizerConfig(optimizer=optimizer),
        fsdp_frozen=fsdp_frozen,
    )
    rng = jax.random.PRNGKey(0)
    unet = VideoUNet(mc.unet)
    vae = AutoencoderKL(mc.vae)
    text_enc = CLIPTextEncoder(mc.text_encoder)
    img_enc = CLIPVisionEncoder(mc.image_encoder)
    L = 16 if tiny else 77
    s = mc.image_encoder.image_size
    lat = res // mc.vae.spatial_scale_factor

    def make_state():
        unet_p = unet.init(
            rng, jnp.zeros((1, frames, lat, lat, 4)), jnp.zeros(()),
            jnp.zeros((1, L, mc.unet.cross_attention_dim)),
            jnp.zeros((1, mc.unet.image_embed_dim)),
            enable_cross_frame_attn=True,
        )
        vae_p = vae.init(rng, jnp.zeros((1, res, res, 3)))
        text_p = text_enc.init(rng, jnp.zeros((1, L), jnp.int32))
        img_p = img_enc.init(rng, jnp.zeros((1, s, s, 3)))
        return create_train_state(unet_p, tc, 100, vae_p, text_p, img_p)[0]

    state_abs = jax.eval_shape(make_state)
    shardings = train_state_shardings(
        state_abs, mesh, min_size=min_size,
        frozen_replicated=fsdp_frozen == "replicate",
    )
    tx = make_optimizer(tc, 100)
    step_fn = make_train_step(mc, tc, tx, mesh=mesh, state_shardings=shardings)

    batch_abs = {
        "pixel_values": jax.ShapeDtypeStruct(
            (b, frames, res, res, 3), jnp.float32
        ),
        "text_ids": jax.ShapeDtypeStruct((b, L), jnp.int32),
        "uncond_ids": jax.ShapeDtypeStruct((b, L), jnp.int32),
        "clip_image": jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
    }
    # attach the step's own batch shardings to the abstract args
    for k, v in batch_abs.items():
        batch_abs[k] = jax.ShapeDtypeStruct(
            v.shape, v.dtype,
            sharding=batch_sharding(
                mesh, len(v.shape),
                frame_axis=1 if k == "pixel_values" else None,
            ),
        )
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    t0 = time.time()
    result = audit(step_fn, (state_abs, batch_abs, rng_abs))
    n_params = sum(
        int(__import__("numpy").prod(x.shape))
        for x in jax.tree.leaves(state_abs)
    )
    meta = {
        "mesh": dict(mesh.shape),
        "workload": (
            f"{res}px {frames}f global-batch {b} "
            f"({'motion+adapter' if motion else 'adapter'} finetune, "
            f"{optimizer})"
        ),
        "state_m": round(n_params / 1e6, 1),
        "compile_s": round(time.time() - t0, 1),
    }
    return result, meta


def _fmt_case(res, meta, gbps: float = 50.0) -> dict:
    ops_brief = [
        {
            "kind": o.kind,
            "bytes": o.out_bytes,
            "group": o.group_size,
            "wire_per_dev": o.wire_bytes_per_device(),
            "in_loop": o.in_loop,
            "shape": o.shape[:90],
        }
        for o in sorted(res.ops, key=lambda o: -o.out_bytes)[:40]
    ]
    # complete per-(kind, shape) aggregation — the top-40 list truncates
    # exactly when something is wrong (hundreds of mid-size gathers), so
    # diagnosis needs the full histogram
    groups: dict = {}
    for o in res.ops:
        key = f"{o.kind} {o.shape[:70]}"
        g = groups.setdefault(key, {"count": 0, "wire_per_dev": 0})
        g["count"] += 1
        g["wire_per_dev"] += o.wire_bytes_per_device()
    by_shape = [
        {"op": k, **v}
        for k, v in sorted(groups.items(), key=lambda kv: -kv[1]["wire_per_dev"])
    ]
    return {
        "meta": meta,
        "summary": res.summary,
        "wire_gb_per_device": round(res.wire_gb(), 4),
        "modeled_comm_ms_at_%dgbps" % int(gbps): round(
            res.time_at(gbps) * 1e3, 2
        ),
        "memory": res.memory,
        "top_ops": ops_brief,
        "by_shape": by_shape,
    }


CASES = {
    # config-2 serving over the two claimed meshes
    "infer_v5e2": lambda tiny, pf: build_infer_case(
        {"data": 2, "fsdp": 1, "tensor": 1, "seq": 1}, tiny=tiny, platform=pf
    ),
    "infer_v5e8": lambda tiny, pf: build_infer_case(
        {"data": 2, "fsdp": 1, "tensor": 1, "seq": 4}, tiny=tiny, platform=pf
    ),
    # config-4 training: the pure data-parallel shape (the reference's DDP
    # analogue — adapter-only grads, comm should be tiny) ...
    "train_v5e8_dp": lambda tiny, pf: build_train_case(
        {"data": 8, "fsdp": 1, "tensor": 1, "seq": 1}, tiny=tiny, platform=pf
    ),
    # ... and the dryrun's composite dp x fsdp x seq mesh
    "train_v5e8": lambda tiny, pf: build_train_case(
        {"data": 2, "fsdp": 2, "tensor": 1, "seq": 2}, tiny=tiny, platform=pf
    ),
    # same mesh with the frozen partitions replicated (fsdp_frozen=
    # 'replicate'): the audited answer to train_v5e8's 15.2 GB/device of
    # frozen-param re-gathers
    "train_v5e8_frozrep": lambda tiny, pf: build_train_case(
        {"data": 2, "fsdp": 2, "tensor": 1, "seq": 2}, tiny=tiny, platform=pf,
        fsdp_frozen="replicate",
    ),
    # the dryrun's tensor-axis train mesh (train_tp) at REAL width: closes
    # the round-4 honesty note that tensor>1 training was audited only at
    # tiny width on the CPU-sim mesh — Megatron column/row rules on the
    # adapter projections share param layouts with the audited inference
    # tensor path, but the gradient psums only show up here
    "train_v5e8_tp": lambda tiny, pf: build_train_case(
        {"data": 2, "fsdp": 1, "tensor": 2, "seq": 2}, tiny=tiny, platform=pf
    ),
    # 512px motion finetune: single-chip AOT-proven infeasible; the claimed
    # multi-chip shape is fsdp (ZeRO moments sharded) x seq
    "train_motion_512_fsdp": lambda tiny, pf: build_train_case(
        {"data": 1, "fsdp": 4, "tensor": 1, "seq": 2},
        res=32 if tiny else 512, per_device_batch=1, tiny=tiny, motion=True,
        platform=pf,
    ),
    # ... which the round-4 audit showed does NOT fit HBM (15.78 GiB peak >
    # ~14.7 usable: per-device activations are b*f/8 frame-evals on ANY
    # 8-device factorization, so reshaping the mesh alone cannot help).
    # The viable shape halves the microbatch (global 2 + 2-step grad
    # accumulation keeps the effective batch) and spreads frames seq=4:
    "train_motion_512_v2": lambda tiny, pf: build_train_case(
        {"data": 1, "fsdp": 2, "tensor": 1, "seq": 4},
        res=32 if tiny else 512, per_device_batch=1, tiny=tiny, motion=True,
        platform=pf,
    ),
    # ... v2 audited round 5: peak 12.84 GiB — FITS — but 19.1 GB/device of
    # wire (12.0 all-gather: the default ZeRO layout re-gathers the frozen
    # partitions per use).  This variant asks whether fsdp_frozen=replicate
    # trades that wire for HBM within budget at 512px
    "train_motion_512_v2_frozrep": lambda tiny, pf: build_train_case(
        {"data": 1, "fsdp": 2, "tensor": 1, "seq": 4},
        res=32 if tiny else 512, per_device_batch=1, tiny=tiny, motion=True,
        platform=pf, fsdp_frozen="replicate",
    ),
    # config 5: 64f/768px stepwise step over data x seq (chunk 1 for the
    # audit: chunking splits evals inside a lax.map whose body would hide
    # the collectives from static counting; comm volume is chunk-invariant)
    "infer_cfg5_v5e8": lambda tiny, pf: build_infer_case(
        {"data": 2, "fsdp": 1, "tensor": 1, "seq": 4},
        height=32 if tiny else 768, width=32 if tiny else 768,
        frames=4 if tiny else 64, tiny=tiny, platform=pf,
    ),
}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--cases", default="infer_v5e2,infer_v5e8,train_v5e8")
    p.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                   help="'tpu' AOT-compiles against a real v5e topology "
                        "(evidence-grade: Mosaic kernels + real HBM "
                        "analysis); 'cpu' is the portable sim")
    p.add_argument("--tiny", action="store_true",
                   help="tiny widths (CI-speed; same code path)")
    p.add_argument("--gbps", type=float, default=50.0,
                   help="usable per-device ICI GB/s for the modeled time")
    p.add_argument("--out", default=None, help="write JSON here")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        _force_cpu(args.devices)

    out = {"devices": args.devices, "tiny": args.tiny,
           "platform": args.platform, "cases": {}}
    for name in args.cases.split(","):
        name = name.strip()
        if name not in CASES:
            print(f"unknown case {name!r}; have {sorted(CASES)}",
                  file=sys.stderr)
            return 2
        print(f"[audit] compiling {name} ...", file=sys.stderr)
        res, meta = CASES[name](args.tiny, args.platform)
        out["cases"][name] = _fmt_case(res, meta, args.gbps)
        print(
            f"[audit] {name}: {res.summary['total_ops']} collectives, "
            f"{res.wire_gb():.3f} GB/device wire, "
            f"~{res.time_at(args.gbps)*1e3:.1f} ms at {args.gbps:.0f} GB/s "
            f"(compile {meta['compile_s']}s)",
            file=sys.stderr,
        )
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
