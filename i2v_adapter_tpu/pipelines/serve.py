"""Directory-queue serving daemon: a long-running process around the warm
pipeline.

The reference ships only a one-shot batch CLI
(/root/reference/src/pipelines/pipeline_i2v_adapter.py:721-809 reads an
eval CSV and exits); production serving wants a resident process that
keeps the compiled per-shape samplers warm (first 512px compile is
minutes; subsequent requests at the same shape bucket are pure run time)
and survives bad requests.  This daemon watches a directory:

  requests/<id>.json   -> {"prompt": ..., "image": <path>, ...overrides}
  output/<id>.gif      +  output/<id>.result.json

Request files are claimed by atomic rename (``<id>.json.working``), so
multiple daemons can share one queue directory; finished requests are
renamed ``.done`` / ``.failed``.  A request that fails — unreadable
image, over the single-chip HBM envelope (the refusal in
``_check_memory_envelope``), non-finite output (the serving NaN guard) —
writes its error to the result JSON and the daemon keeps serving: a
poison request must never take the worker down.  Per-request ``dispatch``
defaults to 'auto', so long/high-res clips run stepwise and stay
preemptible between denoise steps.

Request JSON fields (all but ``prompt`` + ``image`` optional):
  prompt, image (path), negative_prompt, num_frames, height, width,
  num_inference_steps, guidance_scale, frame_similarity_sample_ratio,
  seed, fps, format ('gif' | 'mp4' | 'npy'), dispatch, encoder_cache
  (2 = opt-in turbo approximation, see PipelineConfig.encoder_cache),
  cfg_cutoff (< 1.0 = opt-in adaptive guidance: late steps skip the
  uncond UNet eval, see PipelineConfig.cfg_cutoff).

Run: ``python -m i2v_adapter_tpu.pipelines.serve --pretrained_model_path
... --requests_dir requests/ --output_dir output/``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import threading
import time

import numpy as np

logger = logging.getLogger(__name__)


class RequestTimeout(Exception):
    """A request exceeded the per-request wall-clock bound."""


def _run_with_timeout(fn, timeout: float | None):
    """Run ``fn()`` bounded by ``timeout`` seconds of wall clock.

    A hung TPU transport blocks inside a C call, where signals can't
    interrupt — so the request runs in a daemon thread and the caller
    waits with a timeout.  On timeout the thread cannot be killed (it may
    hold a wedged device handle), so the caller must recycle the worker
    process after failing the request; the daemon flag lets process exit
    reap it."""
    if timeout is None:
        return fn()
    box: dict = {}

    def target():
        try:
            box["value"] = fn()
        except BaseException as e:  # noqa: BLE001 — re-raised in the caller
            box["error"] = e

    th = threading.Thread(target=target, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        raise RequestTimeout(
            f"request exceeded the {timeout:.1f}s wall-clock bound; the "
            "dispatch thread may be wedged on the device transport — "
            "recycling the worker"
        )
    if "error" in box:
        raise box["error"]
    return box["value"]

_REQUEST_KEYS = (
    "negative_prompt", "num_frames", "height", "width",
    "num_inference_steps", "guidance_scale",
    "frame_similarity_sample_ratio", "dispatch", "encoder_cache",
    "cfg_cutoff",
)


def _claim(path: str) -> str | None:
    """Atomically claim a request file; None if another worker got it."""
    working = path + ".working"
    try:
        os.rename(path, working)
        return working
    except OSError:
        return None


def process_request(pipe, req: dict, out_prefix: str) -> dict:
    """Run one request through the pipeline; returns the result record."""
    from PIL import Image

    t0 = time.time()
    image = Image.open(req["image"])
    kwargs = {k: req[k] for k in _REQUEST_KEYS if k in req}
    video = pipe(
        req["prompt"],
        condition_image=image,
        seed=int(req.get("seed", 0)),
        **kwargs,
    )
    fmt = req.get("format", "gif")
    if fmt == "gif":
        outputs = pipe.export_gifs(video, out_prefix, fps=int(req.get("fps", 8)))
    elif fmt == "mp4":
        from i2v_adapter_tpu.utils.image import export_to_mp4

        outputs = [
            export_to_mp4(video[i], f"{out_prefix}_{i}.mp4",
                          fps=int(req.get("fps", 8)))
            for i in range(video.shape[0])
        ]
    elif fmt == "npy":
        outputs = [out_prefix + ".npy"]
        np.save(outputs[0], video)
    else:
        raise ValueError(f"unknown format {fmt!r} (gif/mp4/npy)")
    return {
        "ok": True,
        "outputs": outputs,
        "shape": list(video.shape),
        "latency_s": round(time.time() - t0, 3),
    }


def serve(
    pipe,
    requests_dir: str,
    output_dir: str,
    poll_interval: float = 0.5,
    max_requests: int | None = None,
    request_timeout: float | None = None,
) -> int:
    """Serve until interrupted (or ``max_requests`` processed; for tests
    and smoke runs).  Returns the number of requests processed.

    ``request_timeout`` bounds each request's wall clock (the watchdog):
    a dispatch that hangs the device transport — the one failure mode
    poison-request isolation can't catch, observed on this box's tunnel
    under oversized work — fails the request with ``RequestTimeout`` and
    the loop RETURNS so a supervisor restarts the worker on a fresh
    device handle (the stuck dispatch thread can't be killed; process
    exit reaps it).  Interaction with dispatch modes: stepwise bounds
    every device call to one denoise step, so a wedge is detected within
    ~one step; the fused scan is a single dispatch, detected only at the
    timeout itself.  Size the timeout for the slowest legitimate shape
    bucket (first-call compiles can take minutes — warm the bucket first
    or include compile headroom)."""
    os.makedirs(requests_dir, exist_ok=True)
    os.makedirs(output_dir, exist_ok=True)
    done = 0
    logger.info("serving %s -> %s", requests_dir, output_dir)
    while max_requests is None or done < max_requests:
        pending = sorted(
            (f for f in os.listdir(requests_dir) if f.endswith(".json")),
            key=lambda f: os.path.getmtime(os.path.join(requests_dir, f)),
        )
        if not pending:
            if max_requests is not None:
                break  # drain mode: queue empty, stop
            time.sleep(poll_interval)
            continue
        for name in pending:
            if max_requests is not None and done >= max_requests:
                break
            working = _claim(os.path.join(requests_dir, name))
            if working is None:
                continue  # another worker took it
            rid = name[: -len(".json")]
            out_prefix = os.path.join(output_dir, rid)
            t0 = time.time()
            timed_out = False
            try:
                with open(working) as f:
                    req = json.load(f)
                result = _run_with_timeout(
                    lambda: process_request(pipe, req, out_prefix),
                    request_timeout,
                )
            except KeyboardInterrupt:
                os.rename(working, working[: -len(".working")])  # un-claim
                raise
            except RequestTimeout as e:
                timed_out = True
                result = {
                    "ok": False,
                    "error": f"{type(e).__name__}: {e}",
                    "latency_s": round(time.time() - t0, 3),
                }
                logger.error("request %s timed out: %s", rid, result["error"])
            except Exception as e:  # noqa: BLE001 — poison requests must
                # never take the serving worker down (HBM-envelope refusal,
                # NaN guard, bad image path, malformed JSON all land here)
                result = {
                    "ok": False,
                    "error": f"{type(e).__name__}: {e}",
                    "latency_s": round(time.time() - t0, 3),
                }
                logger.warning("request %s failed: %s", rid, result["error"])
            with open(out_prefix + ".result.json", "w") as f:
                json.dump(result, f, indent=1)
            os.rename(
                working,
                working[: -len(".working")]
                + (".done" if result["ok"] else ".failed"),
            )
            done += 1
            logger.info(
                "[%d] %s %s (%.2fs)", done, rid,
                "ok" if result["ok"] else "FAILED", result["latency_s"],
            )
            if timed_out:
                # the stuck dispatch thread may hold a wedged device handle:
                # stop claiming work and let the supervisor restart us
                logger.error("recycling worker after request timeout")
                return done
    return done


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="I2V-Adapter serving daemon")
    p.add_argument("--pretrained_model_path", type=str, required=True)
    p.add_argument("--task_name", type=str, default=None,
                   help="optional adapter checkpoint task (as in the CLI)")
    p.add_argument("--checkpoint_epoch", type=int, default=None)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoint")
    p.add_argument("--requests_dir", type=str, default="requests")
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--poll_interval", type=float, default=0.5)
    p.add_argument("--max_requests", type=int, default=None,
                   help="exit after N requests (smoke runs); default: forever")
    p.add_argument("--request_timeout", type=float, default=None,
                   help="per-request wall-clock bound in seconds; on timeout "
                        "the request fails and the worker exits for a "
                        "supervisor restart (see serve())")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--int8_conv", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument(
        "--mesh", type=str, default=None,
        help="multi-chip serving mesh 'data,tensor,seq' (see cli.py)",
    )
    return p.parse_args(argv)


def main(argv=None):
    from i2v_adapter_tpu.config import PipelineConfig
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline
    from i2v_adapter_tpu.training.checkpoint import find_latest_epoch

    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    adapter_path = None
    if args.task_name:
        task_dir = os.path.join(args.checkpoint_dir, args.task_name)
        epoch = args.checkpoint_epoch or find_latest_epoch(task_dir)
        if epoch is not None:
            adapter_path = os.path.join(
                task_dir, f"epoch_{epoch}", "i2v_adapter",
                "diffusion_pytorch_model.safetensors",
            )
    pc = PipelineConfig(
        num_frames=args.num_frames, height=args.height, width=args.width,
        num_inference_steps=args.num_inference_steps, dtype=args.dtype,
        int8_conv=args.int8_conv,
    )
    pipe = I2VAdapterPipeline.from_pretrained(
        args.pretrained_model_path, pipeline_config=pc,
        i2v_adapter_path=adapter_path,
    )
    if args.mesh:
        import jax

        from i2v_adapter_tpu.config import MeshConfig
        from i2v_adapter_tpu.parallel.mesh import create_mesh

        data, tensor, seq = (int(x) for x in args.mesh.split(","))
        mesh = create_mesh(
            MeshConfig(data=data, fsdp=1, tensor=tensor, seq=seq),
            jax.devices()[: data * tensor * seq],
        )
        pipe.enable_mesh(mesh)
    serve(
        pipe, args.requests_dir, args.output_dir,
        poll_interval=args.poll_interval, max_requests=args.max_requests,
        request_timeout=args.request_timeout,
    )


if __name__ == "__main__":
    main()
