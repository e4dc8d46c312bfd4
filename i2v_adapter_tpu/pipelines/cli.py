"""Inference CLI.

Equivalent of the reference pipeline's ``__main__``
(/root/reference/src/pipelines/pipeline_i2v_adapter.py:721-809): read an
eval CSV of (prompt, image_path) rows, load the grafted pipeline from a
task's epoch checkpoint, and write one GIF per row.

Run: ``python -m i2v_adapter_tpu.pipelines.cli --task_name X
--checkpoint_epoch N --pretrained_model_path ... --eval_csv_path ...``
"""

from __future__ import annotations

import argparse
import csv
import logging
import os

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="I2V-Adapter inference (TPU)")
    p.add_argument("--task_name", type=str, required=True)
    p.add_argument("--checkpoint_epoch", type=int, default=None)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoint")
    p.add_argument("--pretrained_model_path", type=str, required=True)
    p.add_argument("--eval_csv_path", type=str, required=True,
                   help="CSV with prompt,image_path columns")
    p.add_argument("--output_dir", type=str, default="samples")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--frame_similarity_sample_ratio", type=float, default=0.9)
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument(
        "--mesh", type=str, default=None,
        help="multi-chip serving mesh as 'data,tensor,seq' axis sizes "
        "(e.g. '2,1,4' on a v5e-8: CFG halves over data, frames over seq); "
        "product must divide the device count.  Default: single device.",
    )
    p.add_argument(
        "--dispatch", type=str, default="auto",
        choices=("auto", "scan", "stepwise"),
        help="'scan' fuses the whole clip into one device dispatch "
        "(fastest); 'stepwise' issues one dispatch per denoise step (for "
        "long/high-res clips whose fused dispatch would run for minutes); "
        "'auto' switches on estimated per-clip UNet work.",
    )
    p.add_argument(
        "--int8_conv", action=argparse.BooleanOptionalAction, default=True,
        help="serving-mode int8 convs (UNet 3x3s + VAE decoder; ~1e-2 "
        "relative quantization error, full-pipeline PSNR > 35 dB vs exact; "
        "--no-int8_conv restores exact bf16 convs)",
    )
    p.add_argument(
        "--encoder_cache", type=int, default=1, choices=(1, 2),
        help="2 = opt-in turbo: every second denoise step reuses the "
        "previous step's UNet down-path features (Faster Diffusion "
        "encoder propagation, arXiv:2312.09608) — a content-level "
        "approximation, off by default",
    )
    p.add_argument(
        "--cfg_cutoff", type=float, default=1.0,
        help="opt-in adaptive guidance: leading fraction of denoise steps "
        "that run full CFG; the rest run the conditional branch only "
        "(one UNet eval instead of two) — a content-level approximation, "
        "1.0 (off) by default; not composable with --encoder_cache 2",
    )
    return p.parse_args(argv)


def main(argv=None):
    from PIL import Image

    from i2v_adapter_tpu.config import PipelineConfig
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline
    from i2v_adapter_tpu.training.checkpoint import find_latest_epoch

    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    task_dir = os.path.join(args.checkpoint_dir, args.task_name)
    epoch = args.checkpoint_epoch or find_latest_epoch(task_dir)
    adapter_dir = None
    if epoch is not None:
        adapter_dir = os.path.join(task_dir, f"epoch_{epoch}")
        logger.info("using adapter checkpoint %s", adapter_dir)
    else:
        logger.warning("no adapter checkpoint found; zero-init adapter")

    pc = PipelineConfig(
        num_frames=args.num_frames, height=args.height, width=args.width,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        frame_similarity_sample_ratio=args.frame_similarity_sample_ratio,
        dtype=args.dtype,
        int8_conv=args.int8_conv,
    )
    pipe = I2VAdapterPipeline.from_pretrained(
        args.pretrained_model_path,
        pipeline_config=pc,
        i2v_adapter_path=(
            os.path.join(
                adapter_dir, "i2v_adapter", "diffusion_pytorch_model.safetensors"
            )
            if adapter_dir
            else None
        ),
    )
    if args.mesh:
        from i2v_adapter_tpu.config import MeshConfig
        from i2v_adapter_tpu.parallel.mesh import create_mesh

        import jax

        data, tensor, seq = (int(x) for x in args.mesh.split(","))
        mesh = create_mesh(
            MeshConfig(data=data, fsdp=1, tensor=tensor, seq=seq),
            jax.devices()[: data * tensor * seq],
        )
        pipe.enable_mesh(mesh)
        logger.info("serving over mesh %s", dict(mesh.shape))

    with open(args.eval_csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    os.makedirs(args.output_dir, exist_ok=True)
    for i, row in enumerate(rows):
        image = Image.open(row["image_path"])
        video = pipe(
            row["prompt"],
            condition_image=image,
            negative_prompt=args.negative_prompt,
            seed=args.seed + i,
            dispatch=args.dispatch,
            encoder_cache=args.encoder_cache,
            cfg_cutoff=args.cfg_cutoff,
        )
        out = pipe.export_gifs(
            video, os.path.join(args.output_dir, f"{args.task_name}_{i}"),
            fps=args.fps,
        )
        logger.info("[%d/%d] %s", i + 1, len(rows), out[0])


if __name__ == "__main__":
    main()
