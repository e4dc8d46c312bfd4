"""Training driver: CLI + epoch loop.

The library-level equivalent of the reference's ``accelerate launch
src/train_image_to_video.py`` flow (/root/reference/src/
train_image_to_video.py:469-974): build datasets, graft pretrained weights,
freeze, train with the pjit step, sample validation GIFs, and write adapter
checkpoints every ``checkpoint_epoch`` epochs.

Run: ``python -m i2v_adapter_tpu.training.driver --task_name X
--pretrained_model_path ... --csv_path ... --video_folder ...``
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from i2v_adapter_tpu.config import (
    I2VModelConfig,
    MeshConfig,
    OptimizerConfig,
    PipelineConfig,
    TrainConfig,
)
from i2v_adapter_tpu.data.loader import DataLoader
from i2v_adapter_tpu.data.webvid import WebVidDataset
from i2v_adapter_tpu.parallel.mesh import batch_sharding, create_mesh
from i2v_adapter_tpu.training import checkpoint as ckpt
from i2v_adapter_tpu.training.state import create_train_state, make_optimizer
from i2v_adapter_tpu.training.train_i2v import make_train_step
from i2v_adapter_tpu.utils.metrics import MetricsLogger, StepTimer

logger = logging.getLogger(__name__)


def parse_args(argv=None) -> argparse.Namespace:
    """Flag surface mirroring the reference's
    (/root/reference/src/train_image_to_video.py:208-467)."""
    p = argparse.ArgumentParser(description="I2V-Adapter training (TPU)")
    p.add_argument("--train_mode", type=str, default="i2v",
                   choices=["i2v", "t2i"],
                   help="'i2v': adapter/motion finetune on clips; 't2i': "
                        "full-UNet single-frame base finetune")
    p.add_argument("--task_name", type=str, default=None)
    p.add_argument("--pretrained_model_path", type=str, default=None,
                   help="dir with unet/ vae/ text_encoder/ tokenizer/ "
                        "motion_adapter/ image_encoder/ ip_adapter/")
    p.add_argument("--csv_path", type=str, default=None)
    p.add_argument("--video_folder", type=str, default=None)
    p.add_argument("--eval_csv_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="checkpoint")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--sample_stride", type=int, default=4)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=10)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--optimizer", type=str, default="adamw",
                   choices=["adamw", "adafactor"],
                   help="adafactor = factored second moments (the 8-bit-"
                        "Adam memory analogue, ref train_image_to_video.py"
                        ":706-719); runs classic Adafactor — adam_beta*/"
                        "weight_decay/epsilon are ignored in this mode")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--noise_offset", type=float, default=0.0)
    p.add_argument("--input_perturbation", type=float, default=0.0)
    p.add_argument("--prediction_type", type=str, default=None)
    p.add_argument("--text_padding", type=str, default="max_length",
                   choices=["max_length", "longest"],
                   help="prompt tokenization padding.  'max_length' (default)"
                        " compiles ONE jit-static step and matches the "
                        "conditioning length the pipeline serves with; "
                        "'longest' reproduces the reference's training recipe"
                        " (train_image_to_video.py:818) with batch lengths "
                        "bucketed to multiples of 8 (one step retrace per "
                        "bucket, <= 10 total)")
    p.add_argument("--mixed_precision", type=str, default="bfloat16",
                   choices=["none", "bfloat16"])
    p.add_argument("--freeze_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype for frozen params (UNet backbone, "
                        "VAE, CLIP) — the reference casts frozen models to "
                        "fp16 (train_image_to_video.py:743-754); bfloat16 "
                        "halves their HBM (needed for 512px on 16 GB)")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--vae_encode_slice", type=int, default=0,
                   help="VAE-encode N frames at a time in the train step "
                        "(0 = full batch); bounds encoder memory at 512px")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--update_motion_modules", action="store_true")
    p.add_argument("--uncond_prob_t", type=float, default=0.0)
    p.add_argument("--uncond_prob_i", type=float, default=0.0)
    p.add_argument("--uncond_prob_ti", type=float, default=0.0)
    p.add_argument("--first_frame_mode", type=str, default="scaled",
                   choices=["scaled", "exact"])
    p.add_argument("--checkpoint_epoch", type=int, default=2)
    p.add_argument("--checkpointing_steps", type=int, default=0,
                   help="also write full Orbax train-state checkpoints "
                        "(params+optimizer+step) every N steps (0 = off); "
                        "the accelerator.save_state analogue")
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--async_checkpoint", action="store_true",
                   help="overlap Orbax train-state writes with training: "
                        "save() returns after the device->host snapshot "
                        "and the serialization runs on a background "
                        "thread (Orbax async checkpointing)")
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="adapter epoch dir, or 'latest' to restore the "
                        "newest full Orbax train-state checkpoint")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--data_fsdp", type=int, default=1,
                   help="fsdp axis size of the mesh (ZeRO-style sharding)")
    p.add_argument("--seq_parallel", type=int, default=1,
                   help="seq axis size: video frames shard over it "
                        "(sequence parallelism; num_frames must divide)")
    p.add_argument("--fsdp_frozen", type=str, default="shard",
                   choices=["shard", "replicate"],
                   help="placement of the no-gradient state on the fsdp "
                        "axis: 'shard' = ZeRO-shard everything (default); "
                        "'replicate' keeps frozen UNet/encoder weights "
                        "replicated, deleting their per-use all-gathers "
                        "(~15 GB/device/step audited at 256px) at the cost "
                        "of ~2 GB/device HBM")
    p.add_argument("--validation_epoch", type=int, default=0,
                   help="sample eval GIFs every N epochs (0 = off)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps")
    p.add_argument("--report_to", type=str, default="tensorboard",
                   choices=["tensorboard", "wandb", "all", "none"],
                   help="metric trackers in addition to the always-on JSONL "
                        "(reference --report_to, train_image_to_video.py:406-"
                        "414); each activates only if its package imports")
    p.add_argument("--wandb_project", type=str, default="i2v_adapter_tpu")
    # ---- weak-scaling bench mode (no data/weights needed) ----
    p.add_argument("--bench_scaling", action="store_true",
                   help="time the pjit train step across mesh shapes on the "
                        "available devices and write JSONL; ignores "
                        "data/weight paths (synthetic batch, random params)")
    p.add_argument("--bench_mesh_shapes", type=str,
                   default="1,1,1;2,1,1;4,1,1;2,2,1;4,2,1;2,2,2",
                   help="semicolon-separated data,fsdp,seq triples; shapes "
                        "whose product exceeds the device count are skipped")
    p.add_argument("--bench_steps", type=int, default=4,
                   help="timed steps per mesh shape (after 1 compile step)")
    p.add_argument("--bench_model", type=str, default="sd15",
                   choices=["sd15", "tiny"],
                   help="tiny = CPU-sim proof run; sd15 = real shape")
    p.add_argument("--bench_output", type=str, default="bench_scaling.jsonl")
    p.add_argument("--bench_cpu_sim", type=int, default=0,
                   help="simulate N CPU devices for the sweep (this box's "
                        "CPU plugin ignores --xla_force_host_platform_"
                        "device_count; jax.config is the mechanism that "
                        "works, applied before backend init)")
    args = p.parse_args(argv)
    if not args.bench_scaling:
        missing = [
            n for n in ("task_name", "pretrained_model_path", "csv_path",
                        "video_folder")
            if getattr(args, n) is None
        ]
        if missing:
            p.error(f"the following arguments are required: "
                    f"{', '.join('--' + m for m in missing)}")
    return args


def args_to_train_config(args) -> TrainConfig:
    return TrainConfig(
        train_mode=args.train_mode,
        resolution=args.resolution,
        num_frames=args.n_frames,
        sample_stride=args.sample_stride,
        train_batch_size=args.train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        num_train_epochs=args.num_train_epochs,
        max_train_steps=args.max_train_steps,
        seed=args.seed,
        update_motion_modules=args.update_motion_modules,
        snr_gamma=args.snr_gamma,
        noise_offset=args.noise_offset,
        input_perturbation=args.input_perturbation,
        prediction_type=args.prediction_type,
        uncond_prob_t=args.uncond_prob_t,
        uncond_prob_i=args.uncond_prob_i,
        uncond_prob_ti=args.uncond_prob_ti,
        first_frame_mode=args.first_frame_mode,
        gradient_checkpointing=args.gradient_checkpointing,
        vae_encode_slice=args.vae_encode_slice,
        mixed_precision=args.mixed_precision,
        freeze_dtype=args.freeze_dtype,
        use_ema=args.use_ema,
        optimizer=OptimizerConfig(
            learning_rate=args.learning_rate,
            lr_scheduler=args.lr_scheduler,
            lr_warmup_steps=args.lr_warmup_steps,
            optimizer=args.optimizer,
            adam_beta1=args.adam_beta1,
            adam_beta2=args.adam_beta2,
            adam_weight_decay=args.adam_weight_decay,
            adam_epsilon=args.adam_epsilon,
            max_grad_norm=args.max_grad_norm,
            scale_lr=args.scale_lr,
        ),
        mesh=MeshConfig(data=-1, fsdp=args.data_fsdp, seq=args.seq_parallel),
        fsdp_frozen=getattr(args, "fsdp_frozen", "shard"),
        checkpoint_epoch=args.checkpoint_epoch,
        checkpoints_total_limit=args.checkpoints_total_limit,
    )


def train(args, model_config: Optional[I2VModelConfig] = None) -> dict:
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline

    logging.basicConfig(level=logging.INFO)
    tc = args_to_train_config(args)
    model_config = model_config or I2VModelConfig()
    if tc.train_mode == "t2i":
        # base finetune: plain per-frame SD UNet, no adapter/motion/IP
        model_config = model_config.replace(
            unet=model_config.unet.replace(
                use_motion_modules=False, use_i2v_adapter=False,
                use_ip_adapter=False,
            )
        )

    # ---- data ----
    dataset = WebVidDataset(
        args.csv_path, args.video_folder,
        sample_size=tc.resolution, sample_stride=tc.sample_stride,
        sample_n_frames=tc.num_frames, is_image=tc.train_mode == "t2i",
        clip_image_size=model_config.image_encoder.image_size,
        shard=jax.process_index(), num_shards=jax.process_count(),
        seed=tc.seed,
    )
    loader = DataLoader(
        dataset, tc.train_batch_size, shuffle=True,
        num_workers=args.num_workers, seed=tc.seed,
    )
    steps_per_epoch = max(len(loader), 1)
    total_steps = tc.max_train_steps or steps_per_epoch * tc.num_train_epochs

    if tc.optimizer.scale_lr:
        scaled = tc.optimizer.learning_rate * (
            tc.gradient_accumulation_steps * tc.train_batch_size
            * jax.process_count()
        )
        tc = tc.replace(optimizer=tc.optimizer.replace(learning_rate=scaled))

    # ---- models & pretrained weights (the from_unet2d surgery chain) ----
    pipe = I2VAdapterPipeline.from_pretrained(
        args.pretrained_model_path, model_config,
        PipelineConfig(dtype="bfloat16" if tc.mixed_precision == "bfloat16"
                       else "float32"),
    )
    unet_params = pipe.params["unet"]

    # resume: newest epoch_N under output_dir/task_name, or explicit dir
    task_dir = os.path.join(args.output_dir, args.task_name)
    first_epoch = args.start_epoch
    resume_dir = args.resume_from_checkpoint
    resume_full = resume_dir == "latest"
    if resume_dir is None and tc.train_mode == "i2v":
        latest = ckpt.find_latest_epoch(task_dir)
        if latest is not None:
            resume_dir = os.path.join(task_dir, f"epoch_{latest}")
            first_epoch = latest
    if (
        tc.train_mode == "i2v"
        and not resume_full
        and resume_dir is not None
        and os.path.isdir(resume_dir)
    ):
        logger.info("resuming adapters from %s", resume_dir)
        unet_params = {
            "params": ckpt.load_adapter_checkpoint(
                unet_params["params"], model_config.unet, resume_dir
            )
        }

    state, _ = create_train_state(
        unet_params, tc, total_steps,
        vae_params=pipe.params["vae"],
        text_params=pipe.params["text_encoder"],
        image_params=pipe.params.get("image_encoder"),
    )

    # Full train-state checkpointing (exact resume incl. optimizer state).
    step_ckpt = None
    if args.checkpointing_steps or resume_full:
        step_ckpt = ckpt.TrainCheckpointer(
            os.path.join(task_dir, "state"),
            max_to_keep=tc.checkpoints_total_limit,
            async_save=bool(getattr(args, "async_checkpoint", False)),
        )
    if resume_full and step_ckpt is not None:
        restored, at_step = step_ckpt.restore(state)
        if restored is not None:
            state = restored
            first_epoch = int(at_step) // max(steps_per_epoch, 1)
            logger.info("restored full train state at step %s", at_step)
    tx = make_optimizer(tc, total_steps)
    n_dev = jax.device_count()
    mesh = None
    if n_dev > 1:
        from i2v_adapter_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, SEQ_AXIS

        candidate = create_mesh(tc.mesh)
        batch_ways = candidate.shape[DATA_AXIS] * candidate.shape[FSDP_AXIS]
        seq_ways = candidate.shape[SEQ_AXIS]
        if (
            tc.train_batch_size % batch_ways == 0
            and (tc.train_mode == "t2i" or tc.num_frames % seq_ways == 0)
        ):
            mesh = candidate
        else:
            logger.warning(
                "batch %d / frames %d not divisible by mesh (data*fsdp=%d, "
                "seq=%d); running single-device",
                tc.train_batch_size, tc.num_frames, batch_ways, seq_ways,
            )
    state_shardings = None
    if mesh is not None:
        # materialize the ZeRO-style placement: large params/opt-state leaves
        # sharded over the fsdp axis, the rest replicated
        from i2v_adapter_tpu.parallel.mesh import train_state_shardings

        state_shardings = train_state_shardings(
            state, mesh, frozen_replicated=tc.fsdp_frozen == "replicate"
        )
        state = jax.device_put(state, state_shardings)
    step_fn = make_train_step(
        model_config, tc, tx, mesh=mesh, state_shardings=state_shardings
    )

    n_train = sum(x.size for x in jax.tree.leaves(state.trainable))
    n_total = n_train + sum(x.size for x in jax.tree.leaves(state.frozen))
    logger.info("trainable params: %.2fM / %.2fM", n_train / 1e6, n_total / 1e6)

    uncond_ids = pipe.tokenizer([""] * tc.train_batch_size, padding="max_length")
    report_to = getattr(args, "report_to", "tensorboard")
    metrics_log = MetricsLogger(
        os.path.join(task_dir, "logs"),
        use_tensorboard=report_to in ("tensorboard", "all"),
        use_wandb=report_to in ("wandb", "all"),
        wandb_project=getattr(args, "wandb_project", "i2v_adapter_tpu"),
        run_config=tc.to_dict() if hasattr(tc, "to_dict") else None,
    )
    timer = StepTimer()
    rng = jax.random.PRNGKey(tc.seed)
    global_step = int(first_epoch * steps_per_epoch)

    def put(batch):
        if mesh is None:
            return batch
        # pixel_values' frame dim rides the seq axis in video mode — must
        # match make_train_step's in_shardings or every step reshards
        video = tc.train_mode != "t2i"
        return {
            k: jax.device_put(
                v,
                batch_sharding(
                    mesh, np.asarray(v).ndim,
                    frame_axis=1 if (video and k == "pixel_values") else None,
                ),
            )
            for k, v in batch.items()
        }

    for epoch in range(first_epoch, tc.num_train_epochs):
        epoch_loss, n_steps = 0.0, 0
        for batch in loader:
            if args.profile_steps and global_step == 2:
                jax.profiler.start_trace(os.path.join(task_dir, "profile"))
            # The reference trains with padding='longest'
            # (/root/reference/src/train_image_to_video.py:818) while its own
            # inference pads to max_length — so its UNet sees different
            # cross-attn context lengths at train vs serve time.  The default
            # here pads to max_length: the jitted step compiles once
            # (jit-static shapes) AND the conditioning tensor matches
            # inference exactly (pad-position hidden states included, as at
            # serve time).  --text_padding longest reproduces the reference
            # recipe with lengths bucketed to multiples of 8 so the step
            # retraces once per bucket, not per batch.  Recorded in
            # docs/PARITY.md.
            if args.text_padding == "longest":
                text_ids = pipe.tokenizer(batch.pop("text"), padding="longest")
                ctx = uncond_ids.shape[1]
                bucket = min(ctx, max(8, -(-text_ids.shape[1] // 8) * 8))
                if text_ids.shape[1] < bucket:
                    text_ids = np.pad(
                        text_ids,
                        ((0, 0), (0, bucket - text_ids.shape[1])),
                        constant_values=pipe.tokenizer.eos,
                    )
                u_ids = uncond_ids[: text_ids.shape[0], :bucket]
            else:
                text_ids = pipe.tokenizer(batch.pop("text"), padding="max_length")
                u_ids = uncond_ids[: text_ids.shape[0]]
            device_batch = put({
                "pixel_values": batch["pixel_values"],
                "clip_image": batch["clip_image"],
                "text_ids": text_ids,
                "uncond_ids": u_ids,
            })
            rng, step_rng = jax.random.split(rng)
            with timer:
                state, metrics = step_fn(state, device_batch, step_rng)
            loss = float(metrics["loss"])
            epoch_loss += loss
            n_steps += 1
            global_step += 1
            if args.profile_steps and global_step == 2 + args.profile_steps:
                jax.profiler.stop_trace()
            if global_step % 10 == 0:
                metrics_log.log(global_step, {
                    "train_loss": loss,
                    "grad_norm": float(metrics["grad_norm"]),
                    "step_time_s": timer.last,
                    "steps_per_sec": timer.rate,
                })
            if (
                step_ckpt is not None
                and args.checkpointing_steps
                and global_step % args.checkpointing_steps == 0
            ):
                # async mode hands Orbax the live (possibly sharded) jax
                # arrays — it snapshots device->host itself and writes on
                # a background thread; the sync path keeps the explicit
                # host materialization
                step_ckpt.save(
                    global_step,
                    state if step_ckpt.async_save
                    else jax.tree.map(np.asarray, state),
                )
            if tc.max_train_steps and global_step >= tc.max_train_steps:
                break
        logger.info(
            "epoch %d: mean loss %.4f (%d steps, %.2f s/step)",
            epoch + 1, epoch_loss / max(n_steps, 1), n_steps, timer.mean,
        )

        is_ckpt_epoch = (epoch + 1) % tc.checkpoint_epoch == 0
        if is_ckpt_epoch and jax.process_index() == 0:
            out = os.path.join(task_dir, f"epoch_{epoch + 1}")
            # With --use_ema the checkpoint that downstream consumers load is
            # the EMA average (the reference's ema_unet.copy_to-before-save,
            # train_text_to_image.py:887-889); the live weights go to a
            # non_ema/ sibling so training can be continued from them.
            export_tree = (
                state.ema_unet_params if tc.use_ema else state.unet_params
            )
            unet_np = {"params": jax.tree.map(np.asarray, export_tree["params"])}
            if tc.train_mode == "t2i":
                # full-UNet finetune: export the whole UNet
                ckpt.export_pipeline({"unet": unet_np}, model_config, out, tc)
            else:
                ckpt.save_adapter_checkpoint(
                    unet_np, model_config.unet, out,
                    save_motion=tc.update_motion_modules,
                )
                if tc.use_ema:
                    raw_np = {"params": jax.tree.map(
                        np.asarray, state.unet_params["params"])}
                    ckpt.save_adapter_checkpoint(
                        raw_np, model_config.unet,
                        os.path.join(out, "non_ema"),
                        save_motion=tc.update_motion_modules,
                    )
            logger.info("saved checkpoint: %s", out)

        if (
            args.validation_epoch
            and (epoch + 1) % args.validation_epoch == 0
            and args.eval_csv_path
            and jax.process_index() == 0
        ):
            _run_validation(args, pipe, state, model_config, task_dir, epoch)

        if tc.max_train_steps and global_step >= tc.max_train_steps:
            break

    # final whole-pipeline export (reference :942-963); EMA weights when
    # --use_ema (reference train_text_to_image.py:887-889)
    if jax.process_index() == 0:
        final_tree = state.ema_unet_params if tc.use_ema else state.unet_params
        final_params = dict(pipe.params)
        final_params["unet"] = {
            "params": jax.tree.map(np.asarray, final_tree["params"])
        }
        ckpt.export_pipeline(
            final_params, model_config,
            os.path.join(task_dir, "pipeline"), tc,
        )
    if step_ckpt is not None:
        # commit any in-flight async save before declaring training done
        step_ckpt.wait()
    metrics_log.finish()
    return {"global_step": global_step, "last_loss": epoch_loss / max(n_steps, 1)}


def _run_validation(args, pipe, state, model_config, task_dir, epoch):
    """Periodic qualitative sampling (reference log_validation,
    train_image_to_video.py:146-206)."""
    import csv as csv_mod

    from PIL import Image

    with open(args.eval_csv_path, newline="") as f:
        rows = list(csv_mod.DictReader(f))[:4]
    pipe.params = dict(pipe.params)
    # sample with the EMA weights when they exist (reference swaps EMA in for
    # validation, train_text_to_image.py:566-596)
    pipe.params["unet"] = state.ema_unet_params
    out_dir = os.path.join(task_dir, f"samples_epoch_{epoch + 1}")
    os.makedirs(out_dir, exist_ok=True)
    for i, row in enumerate(rows):
        image = Image.open(row["image_path"])
        video = pipe(
            row["prompt"], condition_image=image,
            num_frames=args.n_frames, height=args.resolution,
            width=args.resolution, num_inference_steps=25, seed=i,
        )
        pipe.export_gifs(video, os.path.join(out_dir, f"sample_{i}"))
    logger.info("validation GIFs -> %s", out_dir)


def bench_scaling(args, model_config: Optional[I2VModelConfig] = None) -> list:
    """Weak-scaling harness (VERDICT r2 #7): time the pjit train step across
    mesh shapes on whatever devices exist and append JSONL records.

    Weak scaling: the global batch is ``train_batch_size`` PER (data x fsdp)
    way, so per-device work is constant and the ideal curve is flat step
    time.  Run on the CPU-sim mesh (tiny model) to prove the tooling; on
    real v5e-8 with ``--bench_model sd15`` for the production number.
    Reference analogue: `accelerate launch` multi-GPU timing
    (/root/reference/src/train_image_to_video.py:734-736), which the
    reference never instruments."""
    from i2v_adapter_tpu.config import tiny_test_config
    from i2v_adapter_tpu.models import (
        AutoencoderKL,
        CLIPTextEncoder,
        CLIPVisionEncoder,
        VideoUNet,
    )
    from i2v_adapter_tpu.parallel.mesh import train_state_shardings

    logging.basicConfig(level=logging.INFO)
    if getattr(args, "bench_cpu_sim", 0):
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.bench_cpu_sim)
        except Exception:  # pragma: no cover - backend already initialized
            logger.warning("bench_cpu_sim: backend already initialized")
    tc0 = args_to_train_config(args)
    if args.bench_model == "tiny":
        mc = tiny_test_config()
        res, frames = 32, 4
    else:
        mc = model_config or I2VModelConfig()
        res, frames = tc0.resolution, tc0.num_frames

    devices = jax.devices()
    shapes = []
    for part in args.bench_mesh_shapes.split(";"):
        d, f, s = (int(x) for x in part.split(","))
        if d * f * s <= len(devices):
            shapes.append((d, f, s))

    rng = jax.random.PRNGKey(0)
    lat = res // mc.vae.spatial_scale_factor
    unet = VideoUNet(mc.unet)
    vae = AutoencoderKL(mc.vae)
    text_enc = CLIPTextEncoder(mc.text_encoder)
    img_enc = CLIPVisionEncoder(mc.image_encoder)
    img_size = mc.image_encoder.image_size
    tok_len = 8 if args.bench_model == "tiny" else 77

    sample = jnp.zeros((1, frames, lat, lat, 4))
    text = jnp.zeros((1, tok_len, mc.unet.cross_attention_dim))
    img = jnp.zeros((1, mc.unet.image_embed_dim))
    # master params live on HOST: device-resident fp32 masters (8.9 GB at
    # SD1.5 scale) would otherwise stay alive across the whole sweep and
    # OOM the 16 GB chip alongside the step's own working set
    host = lambda t: jax.tree.map(np.asarray, t)
    unet_params = host(unet.init(rng, sample, jnp.zeros((1,)), text, img,
                                 enable_cross_frame_attn=True))
    vae_params = host(vae.init(rng, jnp.zeros((1, res, res, 3))))
    text_params = host(text_enc.init(rng, jnp.zeros((1, tok_len), jnp.int32)))
    img_params = host(img_enc.init(rng, jnp.zeros((1, img_size, img_size, 3))))

    records = []
    rng_np = np.random.default_rng(0)
    for d, fshard, s in shapes:
        n = d * fshard * s
        mesh = create_mesh(
            MeshConfig(data=d, fsdp=fshard, seq=s), devices[:n]
        )
        batch_size = tc0.train_batch_size * d * fshard  # weak scaling
        if frames % s != 0:
            logger.warning("skip mesh %s: frames %d %% seq %d", (d, fshard, s),
                           frames, s)
            continue
        tc = tc0.replace(
            resolution=res, num_frames=frames, train_batch_size=batch_size,
            gradient_accumulation_steps=1,
            mesh=MeshConfig(data=d, fsdp=fshard, seq=s),
            mixed_precision="none" if args.bench_model == "tiny"
            else tc0.mixed_precision,
        )
        # host masters are immune to the pjit step's buffer donation, and
        # create_train_state's per-leaf casts only materialize one fp32
        # device leaf at a time
        state, _ = create_train_state(
            unet_params, tc, 100, vae_params=vae_params,
            text_params=text_params, image_params=img_params,
        )
        tx = make_optimizer(tc, 100)
        shardings = train_state_shardings(
            state, mesh, frozen_replicated=tc.fsdp_frozen == "replicate"
        )
        state = jax.device_put(state, shardings)
        step_fn = make_train_step(mc, tc, tx, mesh=mesh,
                                  state_shardings=shardings)
        batch = {
            "pixel_values": rng_np.standard_normal(
                (batch_size, frames, res, res, 3)).astype(np.float32),
            "text_ids": rng_np.integers(
                0, 100, (batch_size, tok_len)).astype(np.int32),
            "uncond_ids": np.zeros((batch_size, tok_len), np.int32),
            "clip_image": rng_np.standard_normal(
                (batch_size, img_size, img_size, 3)).astype(np.float32),
        }
        with mesh:
            dev_batch = {
                k: jax.device_put(
                    v,
                    batch_sharding(
                        mesh, v.ndim,
                        frame_axis=1 if k == "pixel_values" else None,
                    ),
                )
                for k, v in batch.items()
            }
            t0 = time.time()
            state, metrics = step_fn(state, dev_batch, jax.random.PRNGKey(1))
            _ = float(metrics["loss"])  # readback = sync (block_until_ready
            # is a no-op on the axon tunnel)
            compile_s = time.time() - t0
            t0 = time.time()
            for i in range(args.bench_steps):
                state, metrics = step_fn(
                    state, dev_batch, jax.random.PRNGKey(2 + i)
                )
            loss = float(metrics["loss"])
            total = time.time() - t0
        step_s = total / args.bench_steps
        rec = {
            "mesh": {"data": d, "fsdp": fshard, "seq": s},
            "devices": n,
            "model": args.bench_model,
            "resolution": res,
            "num_frames": frames,
            "global_batch": batch_size,
            "step_time_s": round(step_s, 4),
            "clips_per_s": round(batch_size / step_s, 3),
            "clips_per_s_per_device": round(batch_size / step_s / n, 3),
            "compile_s": round(compile_s, 1),
            "loss": loss,
        }
        records.append(rec)
        logger.info("bench_scaling: %s", rec)
        with open(args.bench_output, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return records


def main(argv=None):
    args = parse_args(argv)
    if args.bench_scaling:
        records = bench_scaling(args)
        print(json.dumps(records))
        return
    result = train(args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
