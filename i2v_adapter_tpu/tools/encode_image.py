"""Offline image-folder -> latent encoder (reference tools/encode_image.py).

VAE-encodes every image under a folder to one ``latents.npy`` plus a
``captions.txt`` of file stems.
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

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def encode_images(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_folder", required=True)
    p.add_argument("--vae_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sample_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(argv)

    from PIL import Image

    from i2v_adapter_tpu.config import VAEConfig
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
    def encode(frames):
        return vae.apply(params, frames, method=vae.encode)

    paths = sorted(
        p for p in glob.glob(os.path.join(args.image_folder, "**", "*"),
                             recursive=True)
        if p.lower().endswith(IMAGE_EXTS)
    )
    os.makedirs(args.output_dir, exist_ok=True)
    latents, captions = [], []
    batch = []
    for path in paths:
        try:
            img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
            img = resize_center_crop(img, args.sample_size, args.sample_size)
            batch.append(img * 2.0 - 1.0)
            captions.append(os.path.splitext(os.path.basename(path))[0])
        except Exception as e:  # noqa: BLE001
            logger.warning("skipping %s: %s", path, e)
        if len(batch) == args.batch_size:
            latents.append(np.asarray(encode(jnp.asarray(np.stack(batch)))))
            batch = []
    if batch:
        latents.append(np.asarray(encode(jnp.asarray(np.stack(batch)))))
    np.save(os.path.join(args.output_dir, "latents.npy"),
            np.concatenate(latents).astype(np.float16))
    with open(os.path.join(args.output_dir, "captions.txt"), "w") as f:
        f.write("\n".join(captions))
    logger.info("encoded %d images -> %s", len(captions), args.output_dir)


if __name__ == "__main__":
    encode_images()
