"""Image pre/post-processing and video export.

Equivalents of the reference's VaeImageProcessor preprocess/postprocess and
``export_to_gif`` usage (/root/reference/src/pipelines/pipeline_i2v_adapter.py:
111,625,706-711,806-807) plus the CLIP image normalization the WebVid
dataset applies to condition frames (/root/reference/src/data.py:132-134).
Host-side numpy/PIL — none of this runs on the TPU.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def _to_numpy(image) -> np.ndarray:
    """PIL.Image or ndarray -> float32 HWC in [0, 1]."""
    if hasattr(image, "convert"):  # PIL
        image = np.asarray(image.convert("RGB"))
    image = np.asarray(image)
    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    return image.astype(np.float32)


def _resize_bilinear(img: np.ndarray, height: int, width: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        from PIL import Image

        pil = Image.fromarray((img * 255).astype(np.uint8))
        return np.asarray(pil.resize((width, height), Image.BILINEAR)).astype(
            np.float32
        ) / 255.0


def resize_center_crop(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Aspect-preserving resize so the short side covers, then center crop —
    torchvision Resize(short)+CenterCrop semantics (reference data.py:87-92)."""
    h, w = img.shape[:2]
    scale = max(height / h, width / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = _resize_bilinear(img, nh, nw)
    top = (nh - height) // 2
    left = (nw - width) // 2
    return img[top : top + height, left : left + width]


def preprocess_image(
    image, height: int, width: int
) -> np.ndarray:
    """Condition image -> (H, W, 3) float32 in [-1, 1] (VaeImageProcessor
    convention: plain resize to target, then scale)."""
    img = _to_numpy(image)
    img = _resize_bilinear(img, height, width)
    return img * 2.0 - 1.0


def preprocess_batch(images, height: int, width: int) -> np.ndarray:
    if not isinstance(images, (list, tuple)):
        images = [images]
    return np.stack([preprocess_image(im, height, width) for im in images])


def clip_preprocess(image, size: int = 224) -> np.ndarray:
    """CLIP vision preprocessing: resize short side, center crop, normalize
    with CLIP mean/std. Returns (size, size, 3) float32."""
    img = _to_numpy(image)
    img = resize_center_crop(img, size, size)
    return (img - CLIP_MEAN) / CLIP_STD


def postprocess_video(video: np.ndarray) -> np.ndarray:
    """(B, F, H, W, 3) in [-1, 1] -> uint8 (the tensor2vid + postprocess
    path, reference :53-65)."""
    video = np.clip(np.asarray(video, dtype=np.float32) / 2.0 + 0.5, 0.0, 1.0)
    return (video * 255.0).round().astype(np.uint8)


def export_to_gif(
    frames: Union[np.ndarray, Sequence[np.ndarray]],
    path: str,
    fps: int = 8,
) -> str:
    """Save (F, H, W, 3) uint8 frames as a GIF."""
    frames = [np.asarray(f) for f in frames]
    try:
        import imageio

        imageio.mimsave(path, frames, duration=1000 / fps, loop=0)
    except ImportError:  # pragma: no cover
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            path, save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
    return path


def export_to_mp4(frames: np.ndarray, path: str, fps: int = 8) -> str:
    """Save (F, H, W, 3) uint8 frames as an MP4 via OpenCV."""
    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        writer.write(cv2.cvtColor(np.asarray(f), cv2.COLOR_RGB2BGR))
    writer.release()
    return path


def save_image_grid(
    images: np.ndarray, path: str, ncols: int = 4
) -> str:
    """(N, H, W, 3) uint8 -> tiled grid image (reference src/util.py:5-21)."""
    n, h, w, c = images.shape
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.zeros((nrows * h, ncols * w, c), dtype=np.uint8)
    for i, img in enumerate(images):
        r, col = divmod(i, ncols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = img
    from PIL import Image

    Image.fromarray(grid).save(path)
    return path
