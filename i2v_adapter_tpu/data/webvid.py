"""WebVid-style video/caption dataset (host-side decode).

Equivalent of the reference's ``WebVid10M``
(/root/reference/src/data.py:65-142): CSV rows (videoid, name, page_dir)
pointing at ``<video_folder>/<page_dir>/<videoid>.mp4``; stride-sampled
clips; random horizontal flip; resize + center crop; [-1, 1] normalization;
the clip's FIRST frame additionally CLIP-preprocessed for the IP-Adapter
branch; infinite retry with a random substitute on decode failure.

TPU-first: decode happens on the host with OpenCV (decord's GPU decode has
no TPU analogue — SURVEY.md §2.4), and ``shard``/``num_shards`` slice the
dataset per host for multi-host input sharding (the role Accelerate's
rank-split DataLoader plays in the reference).
"""

from __future__ import annotations

import csv
import logging
import os
import random
from typing import Optional

import numpy as np

from i2v_adapter_tpu.utils.image import CLIP_MEAN, CLIP_STD, resize_center_crop

logger = logging.getLogger(__name__)


# Decode sequentially through gaps up to this size; seek for larger jumps.
# Seeking costs a keyframe rewind + decode-forward inside ffmpeg, so tiny
# gaps (stride sampling) are cheaper to read through.
_SEEK_GAP = 32


def _read_video_frames(path: str, indices: np.ndarray) -> np.ndarray:
    """Decode the given frame indices as (N, H, W, 3) uint8 RGB.

    Indexed reads (the role decord's ``VideoReader.get_batch`` plays in the
    reference, /root/reference/src/data.py:100-106): seek to the first wanted
    frame and across any gap larger than _SEEK_GAP instead of decoding every
    frame from 0 — with stride-4 clips sampled deep inside long videos the
    sequential version decodes thousands of unused frames per sample."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    try:
        want = sorted(set(int(i) for i in indices))
        decoded = {}
        pos = 0

        def seek(target: int) -> int:
            cap.set(cv2.CAP_PROP_POS_FRAMES, target)
            landed = int(cap.get(cv2.CAP_PROP_POS_FRAMES))
            # some containers land short of the target; decoding forward from
            # wherever we landed is always correct.  If the backend reports
            # landing *past* the target, rewind to 0 (rare, but exact).
            if landed > target:
                cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
                landed = 0
            return landed

        if want[0] > _SEEK_GAP:
            pos = seek(want[0])
        for idx in want:
            if idx - pos > _SEEK_GAP:
                pos = seek(idx)
            while pos <= idx:
                ok, frame = cap.read()
                if not ok:
                    raise IOError(f"decode failed at frame {pos} of {path}")
                pos += 1
            decoded[idx] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        return np.stack([decoded[int(i)] for i in indices])
    finally:
        cap.release()


def video_length(path: str) -> int:
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


class WebVidDataset:
    def __init__(
        self,
        csv_path: str,
        video_folder: str,
        sample_size: int = 256,
        sample_stride: int = 4,
        sample_n_frames: int = 16,
        is_image: bool = False,
        clip_image_size: int = 224,
        shard: int = 0,
        num_shards: int = 1,
        seed: Optional[int] = None,
    ):
        with open(csv_path, newline="") as f:
            rows = list(csv.DictReader(f))
        # per-host sharding: contiguous stripes
        self.rows = rows[shard::num_shards]
        logger.info("WebVid: %d rows (shard %d/%d)", len(self.rows), shard, num_shards)
        self.video_folder = video_folder
        self.sample_size = sample_size
        self.sample_stride = sample_stride
        self.sample_n_frames = sample_n_frames
        self.is_image = is_image
        self.clip_image_size = clip_image_size
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.rows)

    def _get_clip(self, idx: int):
        row = self.rows[idx]
        path = os.path.join(
            self.video_folder, row["page_dir"], f"{row['videoid']}.mp4"
        )
        n = video_length(path)
        if n <= 0:
            raise IOError(f"empty video {path}")
        if self.is_image:
            indices = np.array([self.rng.randint(0, n - 1)])
        else:
            clip_len = min(n, (self.sample_n_frames - 1) * self.sample_stride + 1)
            start = self.rng.randint(0, n - clip_len)
            indices = np.linspace(
                start, start + clip_len - 1, self.sample_n_frames
            ).astype(int)
        frames = _read_video_frames(path, indices)
        return frames, row["name"]

    def __getitem__(self, idx: int) -> dict:
        # fault tolerance: resample a random index on any decode error
        # (reference data.py:122-129)
        while True:
            try:
                frames, caption = self._get_clip(idx)
                break
            except Exception as e:  # noqa: BLE001
                logger.warning("decode error on idx %d (%s); resampling", idx, e)
                idx = self.rng.randint(0, len(self.rows) - 1)

        from i2v_adapter_tpu.data import native

        size = self.sample_size
        if native.available():
            # C++ fast path: fused u8->f32 resize/crop/normalize kernels
            clip_image = native.preprocess_frames_clip(
                frames[:1], self.clip_image_size
            )[0]
            out = native.preprocess_frames_pm1(frames, size)
            if self.rng.random() < 0.5:
                out = native.hflip_frames(out)
            frames = out
        else:
            frames = frames.astype(np.float32) / 255.0
            # CLIP image from the raw (un-normalized, un-flipped) first frame
            clip_image = (
                resize_center_crop(
                    frames[0], self.clip_image_size, self.clip_image_size
                )
                - CLIP_MEAN
            ) / CLIP_STD
            if self.rng.random() < 0.5:  # random horizontal flip
                frames = frames[:, :, ::-1]
            frames = np.stack([resize_center_crop(f, size, size) for f in frames])
            frames = frames * 2.0 - 1.0  # [-1, 1]

        if self.is_image:
            frames = frames[0]
        return {
            "pixel_values": np.ascontiguousarray(frames),
            "clip_image": clip_image.astype(np.float32),
            "text": caption,
        }
