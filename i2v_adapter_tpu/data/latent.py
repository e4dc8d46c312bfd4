"""Pre-encoded latent datasets.

Equivalents of the reference's ``LatentImageDataset`` / ``LatentVideoDataset``
(/root/reference/src/data.py:27-62,144-220): flat ``.npy`` latent arrays
produced by the offline encoders (tools/), a ``frames_per_video.npy`` index,
and caption/text-embedding sidecars.  Raw VAE-unit latents are clamped to
``+-2/0.18215`` and divided by that bound, normalizing to [-1, 1]
(reference :29-33) — the input range the from-scratch latent trainers expect.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

LATENT_SCALE = 0.18215
STD_LATENT = 2.0 / LATENT_SCALE  # clamp bound, reference data.py:29


class LatentImageDataset:
    def __init__(self, latent_path: str, caption_path: str):
        self.latents = np.load(latent_path, mmap_mode="r")
        with open(caption_path) as f:
            self.captions = [l.rstrip("\n") for l in f]
        if len(self.captions) < len(self.latents):
            raise ValueError(
                f"{len(self.latents)} latents vs {len(self.captions)} captions"
            )

    def __len__(self):
        return len(self.latents)

    def __getitem__(self, idx: int) -> dict:
        z = np.asarray(self.latents[idx], dtype=np.float32)
        z = np.clip(z, -STD_LATENT, STD_LATENT) / STD_LATENT
        return {"latents": z, "text": self.captions[idx]}


class ImageFolderDataset:
    """Image-folder dataset with flip + [-1,1] normalization — the
    ``obtain_dataloader``/torchvision ImageFolder equivalent
    (/root/reference/src/data.py:16-25).  Images are resized/center-cropped
    to ``sample_size``; caption = the containing folder name."""

    IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")

    def __init__(self, root: str, sample_size: int = 256, flip: bool = True,
                 seed: Optional[int] = None):
        import glob

        self.paths = sorted(
            p
            for p in glob.glob(os.path.join(root, "**", "*"), recursive=True)
            if p.lower().endswith(self.IMAGE_EXTS)
        )
        if not self.paths:
            raise ValueError(f"no images under {root}")
        self.sample_size = sample_size
        self.flip = flip
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        from PIL import Image

        from i2v_adapter_tpu.utils.image import resize_center_crop

        path = self.paths[idx]
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        img = resize_center_crop(img, self.sample_size, self.sample_size)
        if self.flip and self.rng.random() < 0.5:
            img = img[:, ::-1]
        return {
            "pixel_values": np.ascontiguousarray(img * 2.0 - 1.0),
            "text": os.path.basename(os.path.dirname(path)),
        }


class LatentVideoDataset:
    """Flat (sum_frames, h, w, c) latent array + frames_per_video index.

    ``sample_n_frames`` consecutive-bucket sampling as in the reference:
    videos shorter than the clip length are filtered out; a random aligned
    window is taken per fetch (:158-205).
    """

    def __init__(
        self,
        latent_path: str,
        frames_per_video_path: str,
        caption_path: Optional[str] = None,
        sample_n_frames: int = 16,
        seed: Optional[int] = None,
    ):
        self.latents = np.load(latent_path, mmap_mode="r")
        frames_per_video = np.load(frames_per_video_path)
        offsets = np.concatenate([[0], np.cumsum(frames_per_video)])
        captions = None
        if caption_path is not None and os.path.exists(caption_path):
            with open(caption_path) as f:
                captions = [l.rstrip("\n") for l in f]
        self.sample_n_frames = sample_n_frames
        self.rng = random.Random(seed)
        self.videos = []
        for i, n in enumerate(frames_per_video):
            if n >= sample_n_frames:
                self.videos.append(
                    (int(offsets[i]), int(n), captions[i] if captions else "")
                )

    def __len__(self):
        return len(self.videos)

    def __getitem__(self, idx: int) -> dict:
        start, n, caption = self.videos[idx]
        lo = self.rng.randint(0, n - self.sample_n_frames)
        z = np.asarray(
            self.latents[start + lo : start + lo + self.sample_n_frames],
            dtype=np.float32,
        )
        return {"latents": z, "text": caption}
