"""Benchmark: end-to-end clip generation latency on one TPU chip.

Workload = BASELINE.md config 2: 1 condition image -> 16-frame 512px clip,
25 DDIM steps (truncated to 22 by strength 0.9), CFG 7.5 + IP-Adapter image
embedding, bf16.  The reference publishes no numbers (SURVEY.md §6); the
target is the BASELINE.json north star: < 4 s per clip.  vs_baseline is
4.0 / p50_latency (>1 means faster than the target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    from i2v_adapter_tpu.config import I2VModelConfig, PipelineConfig
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline

    height = width = 512
    frames = 16
    steps = 25
    batch = 1

    model_config = I2VModelConfig()
    pipe_config = PipelineConfig(
        num_frames=frames, height=height, width=width,
        num_inference_steps=steps, dtype="bfloat16", blur_sigma=1.0,
    )
    if pipe_config.int8_conv:
        # mirror I2VAdapterPipeline.__init__'s serving default (this bench
        # builds the pipe without the constructor): int8 UNet/VAE-decoder
        # convs, identical param tree
        model_config = model_config.replace(
            unet=model_config.unet.replace(int8_conv=True),
            vae=model_config.vae.replace(int8_decode=True),
        )

    # construct without tokenizer/real weights: zero params by shape
    pipe = I2VAdapterPipeline.__new__(I2VAdapterPipeline)
    pipe.config = model_config
    pipe.pipe_config = pipe_config
    pipe.tokenizer = None
    from i2v_adapter_tpu.models import (
        AutoencoderKL,
        CLIPTextEncoder,
        CLIPVisionEncoder,
        VideoUNet,
    )
    from i2v_adapter_tpu.schedulers import make_schedule

    dtype = jnp.bfloat16
    pipe.dtype = dtype
    pipe.unet = VideoUNet(model_config.unet, dtype=dtype)
    pipe.vae = AutoencoderKL(model_config.vae, dtype=dtype)
    pipe.text_encoder = CLIPTextEncoder(model_config.text_encoder, dtype=dtype)
    pipe.image_encoder = CLIPVisionEncoder(model_config.image_encoder, dtype=dtype)
    pipe.schedule = make_schedule(model_config.scheduler)

    rng = jax.random.PRNGKey(0)
    lat = height // model_config.vae.spatial_scale_factor

    def zeros_like_tree(shapes):
        # serving stores weights in bf16 (halves HBM: 8.9 -> 4.4 GB, and
        # weight reads per step)
        return jax.tree.map(
            lambda s: jnp.zeros(
                s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
            ),
            shapes,
        )

    t0 = time.time()
    unet_shapes = jax.eval_shape(
        lambda: pipe.unet.init(
            rng,
            jnp.zeros((2, frames, lat, lat, 4), dtype),
            jnp.zeros((2,)),
            jnp.zeros((2, 77, 768), dtype),
            jnp.zeros((2, 1024), dtype),
            enable_cross_frame_attn=True,
        )
    )
    vae_shapes = jax.eval_shape(
        lambda: pipe.vae.init(rng, jnp.zeros((1, height, width, 3), dtype))
    )
    text_shapes = jax.eval_shape(
        lambda: pipe.text_encoder.init(rng, jnp.zeros((1, 77), jnp.int32))
    )
    img_shapes = jax.eval_shape(
        lambda: pipe.image_encoder.init(rng, jnp.zeros((1, 224, 224, 3), dtype))
    )
    params = {
        "unet": zeros_like_tree(unet_shapes),
        "vae": zeros_like_tree(vae_shapes),
        "text_encoder": zeros_like_tree(text_shapes),
        "image_encoder": zeros_like_tree(img_shapes),
    }
    pipe.params = params
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"[bench] params: {n_params/1e6:.0f}M, init {time.time()-t0:.1f}s",
          file=sys.stderr)

    fn = pipe._sampler(
        batch, frames, height, width, steps,
        0.9, 7.5, True, True, 0,
    )

    text_ids = jnp.zeros((2 * batch, 77), jnp.int32)
    cond = jnp.zeros((batch, height, width, 3), jnp.float32)
    clip_img = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    out = fn(params, text_ids, cond, clip_img, key)
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"[bench] first call (compile+run): {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.time()
        out = fn(params, text_ids, cond, clip_img, jax.random.PRNGKey(i))
        out.block_until_ready()
        times.append(time.time() - t0)
    p50 = float(np.median(times))
    print(f"[bench] runs: {[f'{t:.3f}' for t in times]}", file=sys.stderr)


    if os.environ.get("BENCH_BREAKDOWN"):
        # component timings: in-jit scans with params passed as arguments
        # (closure constants re-ship through the tunnel per call) and host
        # readbacks (block_until_ready is a no-op on this backend)
        def timed(name, fn, p, make_input, iters=4):
            f = jax.jit(fn)
            out = f(p, make_input(jax.random.PRNGKey(99)))
            float(jnp.ravel(out)[0])
            inputs = [make_input(jax.random.PRNGKey(100 + i)) for i in range(iters)]
            t0 = time.time()
            outs = [f(p, x) for x in inputs]
            _ = [float(jnp.ravel(o)[0]) for o in outs]
            per = (time.time() - t0) / iters - 0.07
            print(f"[bench] {name}: {per:.3f}s", file=sys.stderr)

        text_states = jnp.zeros((2 * batch, 77 + 4, 768), dtype)
        img_emb = jnp.zeros((2 * batch, 1024), dtype)
        timed(
            "unet denoise eval",
            lambda p, x: pipe.unet.apply(
                p, x, jnp.zeros((x.shape[0],)), text_states, img_emb,
                enable_cross_frame_attn=True,
            ),
            params["unet"],
            lambda k: jax.random.normal(k, (2 * batch, frames, lat, lat, 4), dtype),
        )
        timed(
            "vae decode 16f (full batch)",
            lambda p, z: pipe.vae.apply(p, z, method=pipe.vae.decode),
            params["vae"],
            lambda k: jax.random.normal(k, (batch * frames, lat, lat, 4), dtype),
        )
        timed(
            "text encode",
            lambda p, ids: pipe.text_encoder.apply(p, ids),
            params["text_encoder"],
            lambda k: jax.random.randint(k, (2 * batch, 77), 0, 49408),
        )
        timed(
            "image encode",
            lambda p, x: pipe.image_encoder.apply(p, x),
            params["image_encoder"],
            lambda k: jax.random.normal(k, (batch, 224, 224, 3), dtype),
        )
        timed(
            "vae encode 1f",
            lambda p, x: pipe.vae.apply(p, x, method=pipe.vae.encode),
            params["vae"],
            lambda k: jax.random.normal(k, (batch, height, width, 3), dtype),
        )

    if os.environ.get("BENCH_SERVE"):
        # config 3: batched serving — multiple condition images per dispatch
        # (batch 8 with CFG doubling = 256 concurrent frame evals exceeds one
        # chip's HBM; batch 4 is the single-chip serving point)
        sb = int(os.environ.get("BENCH_SERVE_BATCH", "4"))
        chunk = int(os.environ.get(
            "BENCH_SERVE_CHUNK", "2" if sb >= 8 else "1"))
        fn8 = pipe._sampler(
            sb, frames, height, width, steps, 0.9, 7.5, True, True, 32,
            False, chunk,
        )
        text8 = jnp.zeros((2 * sb, 77), jnp.int32)
        cond8 = jnp.zeros((sb, height, width, 3), jnp.float32)
        clip8 = jnp.zeros((sb, 224, 224, 3), jnp.float32)
        t0 = time.time()
        out = fn8(params, text8, cond8, clip8, jax.random.PRNGKey(0))
        float(out.ravel()[0])
        print(f"[bench] serve batch{sb} compile+run: {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        out = fn8(params, text8, cond8, clip8, jax.random.PRNGKey(1))
        float(out.ravel()[0])
        dt = time.time() - t0
        print(
            f"[bench] serve batch{sb}: {dt:.2f}s/batch = {sb / dt:.3f} clips/s "
            f"= {sb * frames / dt:.2f} frames/s/chip", file=sys.stderr,
        )

    if os.environ.get("BENCH_TURBO"):
        # opt-in encoder-cache serving mode (Faster-Diffusion encoder
        # propagation): every 2nd step reuses the down-path features.
        # NOT the headline metric — it changes content, not just rounding.
        fn_t = pipe._sampler(
            batch, frames, height, width, steps,
            0.9, 7.5, True, True, 0, False, 1, 2,
        )
        t0 = time.time()
        out = fn_t(params, text_ids, cond, clip_img, key)
        out.block_until_ready()
        print(f"[bench] turbo compile+run: {time.time()-t0:.1f}s",
              file=sys.stderr)
        tt = []
        for i in range(3):
            t0 = time.time()
            out = fn_t(params, text_ids, cond, clip_img, jax.random.PRNGKey(i))
            out.block_until_ready()
            tt.append(time.time() - t0)
        print(
            f"[bench] turbo (encoder_cache=2) runs: {[f'{t:.3f}' for t in tt]}"
            f" p50 {float(np.median(tt)):.4f}s vs exact {p50:.4f}s",
            file=sys.stderr,
        )

    if os.environ.get("BENCH_CFG_CUTOFF"):
        # opt-in adaptive guidance: late steps skip the uncond UNet eval
        # (cfg_cutoff = leading fraction of steps with full CFG).  NOT the
        # headline metric — content-level approximation like turbo.
        cut = float(os.environ.get("BENCH_CFG_CUTOFF"))
        fn_c = pipe._sampler(
            batch, frames, height, width, steps,
            0.9, 7.5, True, True, 0, False, 1, 1, cut,
        )
        t0 = time.time()
        out = fn_c(params, text_ids, cond, clip_img, key)
        out.block_until_ready()
        print(f"[bench] cfg_cutoff={cut} compile+run: {time.time()-t0:.1f}s",
              file=sys.stderr)
        tt = []
        for i in range(3):
            t0 = time.time()
            out = fn_c(params, text_ids, cond, clip_img, jax.random.PRNGKey(i))
            out.block_until_ready()
            tt.append(time.time() - t0)
        print(
            f"[bench] cfg_cutoff={cut} runs: {[f'{t:.3f}' for t in tt]}"
            f" p50 {float(np.median(tt)):.4f}s vs exact {p50:.4f}s",
            file=sys.stderr,
        )

    if os.environ.get("BENCH_CFG5"):
        # config 5 (64-frame 768px): temporal tiling + stepwise dispatch.
        # BENCH_CFG5_TURBO=1 adds the per-window encoder-cache A/B (round
        # 4: turbo composes with tiling via per-window caches).
        img5 = np.zeros((768, 768, 3), np.uint8)

        def run_cfg5(**kw):
            t0 = time.time()
            v = pipe(
                "bench prompt", condition_image=img5, num_frames=64,
                height=768, width=768, num_inference_steps=steps, seed=1,
                output_type="float", **kw,
            )
            dt = time.time() - t0
            assert np.isfinite(v).all()
            return dt

        dt_cold = run_cfg5()
        print(f"[bench] config5 exact compile+run: {dt_cold:.1f}s",
              file=sys.stderr)
        dt5 = run_cfg5()
        print(f"[bench] config5 exact: {dt5:.1f}s/clip", file=sys.stderr)
        if os.environ.get("BENCH_CFG5_TURBO"):
            dtt_cold = run_cfg5(encoder_cache=2)
            dtt = run_cfg5(encoder_cache=2)
            print(
                f"[bench] config5 turbo (encoder_cache=2, per-window "
                f"caches): {dtt:.1f}s/clip vs exact {dt5:.1f}s "
                f"({(dtt / dt5 - 1) * 100:+.1f}%)", file=sys.stderr,
            )

    if os.environ.get("BENCH_TRAIN"):
        _bench_train(model_config)

    if os.environ.get("BENCH_LOADER"):
        _bench_loader()

    print(json.dumps({
        "metric": "p50 clip latency, 512px 16-frame 25-step DDIM + CFG + IP-Adapter, bf16 (serving-default int8 convs), 1 chip",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(4.0 / p50, 3),
    }))
    return 0


def _bench_train(model_config):
    """Config-4 probe: adapter-training step time at the reference workload
    (256px, 16 frames, per-device batch 4, bf16, remat) on one chip."""
    from i2v_adapter_tpu.config import TrainConfig
    from i2v_adapter_tpu.models import VideoUNet
    from i2v_adapter_tpu.training.state import create_train_state, make_optimizer
    from i2v_adapter_tpu.training.train_i2v import make_train_step

    b, f, res = 2, 16, 256
    tc = TrainConfig(
        train_batch_size=b, num_frames=f, resolution=res,
        gradient_accumulation_steps=1, mixed_precision="bfloat16",
        gradient_checkpointing=True, freeze_dtype="bfloat16",
    )
    lat = res // model_config.vae.spatial_scale_factor
    del lat

    rng = jax.random.PRNGKey(0)
    unet = VideoUNet(model_config.unet)
    unet_shapes = jax.eval_shape(
        lambda: unet.init(
            rng, jnp.zeros((1, f, 32, 32, 4)), jnp.zeros(()),
            jnp.zeros((1, 77, 768)), jnp.zeros((1, 1024)),
            enable_cross_frame_attn=True,
        )
    )
    zeros = lambda shapes: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    unet_params = zeros(unet_shapes)

    from i2v_adapter_tpu.models import AutoencoderKL, CLIPTextEncoder, CLIPVisionEncoder

    vae = AutoencoderKL(model_config.vae)
    text_enc = CLIPTextEncoder(model_config.text_encoder)
    img_enc = CLIPVisionEncoder(model_config.image_encoder)
    vae_p = zeros(jax.eval_shape(
        lambda: vae.init(rng, jnp.zeros((1, res, res, 3)))))
    text_p = zeros(jax.eval_shape(
        lambda: text_enc.init(rng, jnp.zeros((1, 77), jnp.int32))))
    img_p = zeros(jax.eval_shape(
        lambda: img_enc.init(rng, jnp.zeros((1, 224, 224, 3)))))

    state, _ = create_train_state(unet_params, tc, 100, vae_p, text_p, img_p)
    # free the fp32 originals — create_train_state made bf16 copies of the
    # frozen trees; keeping both is ~14 GB and OOMs the chip
    del unet_params, vae_p, text_p, img_p
    tx = make_optimizer(tc, 100)
    step_fn = make_train_step(model_config, tc, tx)

    def batch(i):
        k = jax.random.PRNGKey(i)
        k1, k2 = jax.random.split(k)
        return {
            "pixel_values": jax.random.normal(k1, (b, f, res, res, 3)),
            "text_ids": jnp.zeros((b, 77), jnp.int32),
            "uncond_ids": jnp.zeros((b, 77), jnp.int32),
            "clip_image": jax.random.normal(k2, (b, 224, 224, 3)),
        }

    t0 = time.time()
    state, m = step_fn(state, batch(0), jax.random.PRNGKey(0))
    float(m["loss"])
    print(f"[bench] train step compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    n = 4
    for i in range(1, n + 1):
        state, m = step_fn(state, batch(i), jax.random.PRNGKey(i))
    float(m["loss"])
    per = (time.time() - t0) / n
    clips_s = b / per
    print(
        f"[bench] train step (256px b{b} f{f} remat bf16): {per:.3f}s "
        f"({clips_s:.2f} clips/s/chip)", file=sys.stderr,
    )


def _bench_loader():
    """Input-pipeline throughput probe (VERDICT r1 #6): synthesize WebVid-style
    mp4s (long videos so stride sampling lands deep inside), then measure
    batches/s through WebVidDataset + DataLoader.  Sustaining >= 1 batch per
    train-step time (0.283 s/step at 256px b2 f16 on one chip -> 1.13 s per
    b8 batch) means the host pipeline doesn't starve the TPU."""
    import csv
    import tempfile

    import cv2

    from i2v_adapter_tpu.data.loader import DataLoader
    from i2v_adapter_tpu.data.webvid import WebVidDataset

    root = tempfile.mkdtemp(prefix="loaderbench_")
    page = os.path.join(root, "p0")
    os.makedirs(page)
    rng = np.random.default_rng(0)
    rows = []
    n_videos, n_frames_per_video = 48, 400
    for vid in range(n_videos):
        path = os.path.join(page, f"v{vid}.mp4")
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (320, 320)
        )
        frame = (rng.random((320, 320, 3)) * 255).astype(np.uint8)
        for i in range(n_frames_per_video):
            if i % 40 == 0:
                frame = (rng.random((320, 320, 3)) * 255).astype(np.uint8)
            w.write(frame)
        w.release()
        rows.append({"videoid": f"v{vid}", "name": f"clip {vid}",
                     "page_dir": "p0"})
    csv_path = os.path.join(root, "train.csv")
    with open(csv_path, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=["videoid", "name", "page_dir"])
        wtr.writeheader()
        wtr.writerows(rows)

    ds = WebVidDataset(csv_path, root, sample_size=256, sample_stride=4,
                       sample_n_frames=16, seed=0)
    batch_size = int(os.environ.get("BENCH_LOADER_BATCH", "8"))
    loader = DataLoader(ds, batch_size, shuffle=True, num_workers=8, seed=0)
    # one full cold epoch (decode + preprocess under worker overlap)
    t0 = time.time()
    n = sum(1 for _ in loader)
    dt = (time.time() - t0) / max(n, 1)
    import multiprocessing

    cores = multiprocessing.cpu_count()
    print(
        f"[bench] loader: {dt:.3f} s/batch over {n} batches (batch "
        f"{batch_size}, 256px 16f stride4, seek-decode, 8 workers on "
        f"{cores} visible core(s)) = {1 / dt:.2f} batches/s; the 0.283 "
        f"s/step b2 train budget scaled to b8 is 1.132 s/batch; per-sample "
        f"cost {dt * cores / batch_size:.2f} core-s scales with host cores "
        f"(v5e hosts have 100+)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    sys.exit(main())
