"""Temporal tiling: generate more frames than the motion modules' positional
cap (32) by denoising overlapping windows and blending predictions.

The reference has no long-video path — its frame count is hard-capped by
``motion_max_seq_length`` (SURVEY.md §5.7).  This implements the standard
windowed-diffusion scheme (FreeNoise-style uniform window blending): each
DDIM step evaluates the UNet on overlapping temporal windows (the clip's
true first frame is prepended to every window so cross-frame adapter
routing still conditions on the real condition image), and per-frame noise
predictions are averaged with linear cross-fade weights in the overlaps.

All window indices are static Python ints -> one jit-compiled graph.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def temporal_windows(num_frames: int, window: int, stride: int) -> List[Tuple[int, int]]:
    """Static (start, end) windows covering [0, num_frames)."""
    if num_frames <= window:
        return [(0, num_frames)]
    starts = list(range(0, num_frames - window + 1, stride))
    if starts[-1] + window < num_frames:
        starts.append(num_frames - window)
    return [(s, s + window) for s in starts]


def window_weights(window: int, overlap: int) -> np.ndarray:
    """Linear ramp-in/ramp-out weights for cross-fading window overlaps."""
    w = np.ones(window, np.float32)
    if overlap > 0:
        ramp = (np.arange(overlap) + 1) / (overlap + 1)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def tiled_unet_call(
    unet_apply,
    latents: jnp.ndarray,  # (B, F, H, W, C) — CFG-doubled batch allowed
    window: int,
    stride: int,
    *,
    caches=None,
    collect_caches: bool = False,
):
    """Evaluate ``unet_apply(window_latents, first_frame_global)`` on every
    temporal window and blend the per-frame predictions.

    ``unet_apply(x, anchored)`` takes (B, w[+1], H, W, C): when a window
    does not start at frame 0, the clip's global first frame is prepended
    (``anchored=True``) so the I2V cross-frame attention still routes K/V
    from the true condition frame; the extra frame's prediction is dropped.

    Encoder-cache composition (the pipeline's ``encoder_cache=2`` turbo
    mode at >cap frame counts — per-WINDOW caches, since each window is an
    independent UNet forward):

    * ``collect_caches=True``: ``unet_apply(x, anchored, cache=None)`` must
      return ``(pred, cache)``; returns ``(blended, tuple_of_caches)``.
    * ``caches=<tuple>``: ``unet_apply(x, anchored, cache=caches[i])``
      returns ``pred`` computed from window ``i``'s cached down-path
      features.  The window layout is static, so the tuple lines up by
      construction.
    """
    b, f = latents.shape[:2]
    windows = temporal_windows(f, window, stride)
    overlap = window - stride
    acc = jnp.zeros_like(latents)
    norm = jnp.zeros((1, f, 1, 1, 1), latents.dtype)
    base_w = window_weights(window, overlap)
    out_caches = []

    for wi, (s, e) in enumerate(windows):
        chunk = latents[:, s:e]
        if s == 0:
            x, anchored = chunk, False
        else:
            x = jnp.concatenate([latents[:, :1], chunk], axis=1)
            anchored = True
        if collect_caches:
            pred, cache = unet_apply(x, anchored, cache=None)
            out_caches.append(cache)
        elif caches is not None:
            pred = unet_apply(x, anchored, cache=caches[wi])
        else:
            pred = unet_apply(x, anchored)
        if anchored:
            pred = pred[:, 1:]
        w = base_w.copy()
        if wi == 0:
            w[: max(overlap, 0)] = 1.0  # no fade-in at the clip start
        if wi == len(windows) - 1:
            w[len(w) - max(overlap, 0):] = np.maximum(
                w[len(w) - max(overlap, 0):], base_w[len(w) - max(overlap, 0):]
            )
        wj = jnp.asarray(w).reshape(1, e - s, 1, 1, 1).astype(latents.dtype)
        acc = acc.at[:, s:e].add(pred * wj)
        norm = norm.at[:, s:e].add(wj)
    blended = acc / norm
    if collect_caches:
        return blended, tuple(out_caches)
    return blended
