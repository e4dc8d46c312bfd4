"""Offline video -> latent encoder.

Equivalent of /root/reference/src/tools/encode_video.py: walk a video
folder, VAE-encode frames in fixed-size slices, and write one flat
``latents.npy`` + ``frames_per_video.npy`` + ``prompts.txt``.  Decoding is
OpenCV on the host; encoding is a jitted VAE apply on the accelerator, and
``--shard/--num_shards`` split the folder across processes (the reference's
multi-GPU TODO, encode_video.py:125).

Run: ``python -m i2v_adapter_tpu.tools.encode_video --video_folder ...
--vae_path <dir with diffusion_pytorch_model.safetensors> --output_dir ...``
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def encode_videos(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video_folder", required=True)
    p.add_argument("--vae_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--slice_frames", type=int, default=16)
    p.add_argument("--max_frames_per_video", type=int, default=64)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--scaled", action="store_true",
                   help="multiply latents by 0.18215 before saving")
    args = p.parse_args(argv)

    from i2v_adapter_tpu.config import VAEConfig
    from i2v_adapter_tpu.data.webvid import _read_video_frames, video_length
    from i2v_adapter_tpu.models.vae import AutoencoderKL
    from i2v_adapter_tpu.utils import convert
    from i2v_adapter_tpu.utils.image import resize_center_crop

    logging.basicConfig(level=logging.INFO)
    cfg = VAEConfig()
    vae = AutoencoderKL(cfg)
    weights = glob.glob(os.path.join(args.vae_path, "*.safetensors")) + glob.glob(
        os.path.join(args.vae_path, "*.bin")
    )
    params = {"params": convert.convert_vae(convert.load_state_dict(weights[0]), cfg)}

    @jax.jit
    def encode(frames):  # (N, H, W, 3) in [-1, 1] -> mean latents
        return vae.apply(params, frames, method=vae.encode)

    videos = sorted(
        glob.glob(os.path.join(args.video_folder, "**", "*.mp4"), recursive=True)
    )[args.shard :: args.num_shards]
    os.makedirs(args.output_dir, exist_ok=True)

    all_latents, frames_per_video, prompts = [], [], []
    for path in videos:
        try:
            n = min(video_length(path), args.max_frames_per_video)
            if n <= 0:
                raise IOError("empty video")
            frames = _read_video_frames(path, np.arange(n))
            frames = np.stack([
                resize_center_crop(
                    f.astype(np.float32) / 255.0, args.sample_size, args.sample_size
                )
                for f in frames
            ]) * 2.0 - 1.0
            latents = []
            for i in range(0, n, args.slice_frames):
                z = encode(jnp.asarray(frames[i : i + args.slice_frames]))
                latents.append(np.asarray(z))
            z = np.concatenate(latents)
            if args.scaled:
                z = z * cfg.scaling_factor
            all_latents.append(z.astype(np.float16))
            frames_per_video.append(n)
            prompts.append(os.path.splitext(os.path.basename(path))[0])
        except Exception as e:  # noqa: BLE001 — per-video skip, ref :126-132
            logger.warning("skipping %s: %s", path, e)

    np.save(
        os.path.join(args.output_dir, "latents.npy"), np.concatenate(all_latents)
    )
    np.save(
        os.path.join(args.output_dir, "frames_per_video.npy"),
        np.asarray(frames_per_video),
    )
    with open(os.path.join(args.output_dir, "prompts.txt"), "w") as f:
        f.write("\n".join(prompts))
    logger.info(
        "encoded %d videos (%d frames) -> %s",
        len(frames_per_video), sum(frames_per_video), args.output_dir,
    )


if __name__ == "__main__":
    encode_videos()
