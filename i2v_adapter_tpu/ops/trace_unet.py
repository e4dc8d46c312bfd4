"""Op-level trace of one UNet step: where does the time go?

Runs one CFG-doubled UNet eval (bf16 weights, 512px/16f — BASELINE.md
config 2's hot loop) under ``jax.profiler.trace``, then parses the
generated ``.trace.json.gz`` and aggregates device time per XLA op and
per category (conv/matmul fusions, attention custom-calls, copies,
elementwise fusions).  This is the measurement behind BASELINE.md's
roofline section.

Run: ``python -m i2v_adapter_tpu.ops.trace_unet [--steps N]``.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from i2v_adapter_tpu.config import VideoUNetConfig
from i2v_adapter_tpu.models import VideoUNet


def _bf16_zeros(shapes):
    """Zero param tree with fp32 leaves stored bf16 (serving storage)."""
    return jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        shapes,
    )


def build_step(cfg: VideoUNetConfig, frames: int = 16, lat: int = 64,
               n_steps: int = 4):
    dtype = jnp.bfloat16
    unet = VideoUNet(cfg, dtype=dtype)
    b = 2  # CFG-doubled single clip
    sample = jnp.zeros((b, frames, lat, lat, 4), dtype)
    text = jnp.zeros((b, 77, 768), dtype)
    img = (
        jnp.zeros((b, 1024), dtype) if cfg.use_ip_adapter else None
    )
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0), sample, jnp.zeros((b,)), text, img,
            enable_cross_frame_attn=cfg.use_i2v_adapter,
        )
    )
    params = _bf16_zeros(shapes)

    def run(params, x0):
        def step(x, _):
            out = unet.apply(
                params, x, jnp.zeros((b,)), text, img,
                enable_cross_frame_attn=cfg.use_i2v_adapter,
            )
            return out.astype(x.dtype), None

        x, _ = jax.lax.scan(step, x0, None, length=n_steps)
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(1), sample.shape, dtype)
    return jax.jit(run), params, x0


def categorize(name: str) -> str:
    n = name.lower()
    if n.startswith(("while", "body", "condition", "jit_", "scan")):
        return "parent (excluded)"
    if n.startswith(("attn", "i2v_adapter", "custom-call")) or "mosaic" in n:
        return "custom-call (pallas)"
    if n.startswith("copy") or "transpose" in n:
        return "copy/transpose"
    if "convolution" in n:
        return "conv"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "matmul"
    if "convert_reduce" in n or ("reduce" in n and "fusion" in n):
        return "norm-stats fusion"
    if "fusion" in n:
        return "fusion"
    if "reduce" in n:
        return "reduce"
    return "other"


def parse_trace(trace_dir: str):
    """Aggregate device-lane op durations from the xplane-exported
    chrome trace.  Returns (per-op Counter, per-source-line Counter,
    per-source op-kind breakdown); per-step normalization happens in
    report()."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device pids (process names containing 'TPU' / 'device')
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    op_time = collections.Counter()
    src_time = collections.Counter()
    src_ops = collections.defaultdict(collections.Counter)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        # XLA op lane: skip steps/scopes lanes; keep XLA Ops / TensorFlow Ops
        if "op" not in tname.lower():
            continue
        name = e.get("name", "?")
        op_time[name] += e.get("dur", 0)
        if categorize(name) != "parent (excluded)":
            src = (e.get("args") or {}).get("source", "?")
            src_time[src] += e.get("dur", 0)
            src_ops[src][name.split(".")[0]] += e.get("dur", 0)
    return op_time, src_time, src_ops


def build_pipeline_call(steps: int = 3, height: int = 512):
    """Whole-clip sampler dispatch (bench.py's workload) at a reduced step
    count so the trace is dominated by the NON-UNet overhead: encoders,
    similarity prior, VAE decode, scheduler."""
    import numpy as np

    from i2v_adapter_tpu.config import I2VModelConfig, PipelineConfig
    from i2v_adapter_tpu.models import (
        AutoencoderKL, CLIPTextEncoder, CLIPVisionEncoder, VideoUNet,
    )
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline
    from i2v_adapter_tpu.schedulers import make_schedule

    dtype = jnp.bfloat16
    model_config = I2VModelConfig()
    pipe = I2VAdapterPipeline.__new__(I2VAdapterPipeline)
    pipe.config = model_config
    pipe.pipe_config = PipelineConfig(
        num_frames=16, height=height, width=height,
        num_inference_steps=steps, dtype="bfloat16", blur_sigma=1.0,
    )
    pipe.tokenizer = None
    pipe.dtype = dtype
    pipe.unet = VideoUNet(model_config.unet, dtype=dtype)
    pipe.vae = AutoencoderKL(model_config.vae, dtype=dtype)
    pipe.text_encoder = CLIPTextEncoder(model_config.text_encoder, dtype=dtype)
    pipe.image_encoder = CLIPVisionEncoder(model_config.image_encoder, dtype=dtype)
    pipe.schedule = make_schedule(model_config.scheduler)

    rng = jax.random.PRNGKey(0)
    lat = height // model_config.vae.spatial_scale_factor
    bf16_tree = _bf16_zeros
    params = {
        "unet": bf16_tree(jax.eval_shape(lambda: pipe.unet.init(
            rng, jnp.zeros((2, 16, lat, lat, 4), dtype), jnp.zeros((2,)),
            jnp.zeros((2, 77, 768), dtype), jnp.zeros((2, 1024), dtype),
            enable_cross_frame_attn=True))),
        "vae": bf16_tree(jax.eval_shape(lambda: pipe.vae.init(
            rng, jnp.zeros((1, height, height, 3), dtype)))),
        "text_encoder": bf16_tree(jax.eval_shape(lambda: pipe.text_encoder.init(
            rng, jnp.zeros((1, 77), jnp.int32)))),
        "image_encoder": bf16_tree(jax.eval_shape(lambda: pipe.image_encoder.init(
            rng, jnp.zeros((1, 224, 224, 3), dtype)))),
    }
    pipe.params = params
    fn = pipe._sampler(1, 16, height, height, steps, 0.9, 7.5, True, True, 0)
    args = (
        params, jnp.zeros((2, 77), jnp.int32),
        jnp.zeros((1, height, height, 3), jnp.float32),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
    )

    def run(key):
        return fn(*args, key)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", action="store_true", help="keep trace dir")
    ap.add_argument("--pipeline", action="store_true",
                    help="trace a whole-clip sampler dispatch instead")
    ap.add_argument("--ip", action="store_true",
                    help="include the IP-Adapter branch (bench workload)")
    args = ap.parse_args()

    if args.pipeline:
        run = build_pipeline_call(steps=args.steps)
        out = run(jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        trace_dir = "/tmp/i2v_trace"
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            t0 = time.time()
            out = run(jax.random.PRNGKey(1))
            jax.block_until_ready(out)
            wall = time.time() - t0
        print(f"wall: {wall:.3f}s for one clip ({args.steps} configured steps)")
        report(trace_dir, 1, args.top)
        if not args.keep:
            shutil.rmtree(trace_dir, ignore_errors=True)
        return

    cfg = VideoUNetConfig().replace(use_ip_adapter=args.ip)
    f, params, x0 = build_step(cfg, n_steps=args.steps)
    out = f(params, x0)
    jax.block_until_ready(out)  # compile outside the trace

    trace_dir = "/tmp/i2v_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        t0 = time.time()
        out = f(params, x0)
        jax.block_until_ready(out)
        wall = time.time() - t0
    print(f"wall (incl. ~0.3s tunnel dispatch): {wall:.3f}s "
          f"for {args.steps} steps")

    report(trace_dir, args.steps, args.top)
    if not args.keep:
        shutil.rmtree(trace_dir, ignore_errors=True)


def report(trace_dir: str, steps: int, top: int):
    op_time, src_time, src_ops = parse_trace(trace_dir)
    cats = collections.Counter()
    for name, dur in op_time.items():
        cats[categorize(name)] += dur
    total = sum(d for c, d in cats.items() if c != "parent (excluded)")
    print(f"total device op time: {total / 1e3 / steps:.1f} ms/step "
          f"(excl. while/scan parents)")
    print("\nby category (ms/step):")
    for cat, dur in cats.most_common():
        if cat == "parent (excluded)":
            continue
        print(f"  {cat:24s} {dur / 1e3 / steps:8.2f}")
    print(f"\ntop {top} ops (ms/step):")
    shown = 0
    for name, dur in op_time.most_common():
        if categorize(name) == "parent (excluded)":
            continue
        print(f"  {dur / 1e3 / steps:8.2f}  {name[:110]}")
        shown += 1
        if shown >= top:
            break
    print("\nby source line (ms/step):")
    for src, dur in src_time.most_common(30):
        ops = ", ".join(
            f"{k}:{v / 1e3 / steps:.1f}"
            for k, v in src_ops[src].most_common(4)
        )
        print(f"  {dur / 1e3 / steps:8.2f}  {src[-68:]:68s} [{ops}]")


if __name__ == "__main__":
    main()
