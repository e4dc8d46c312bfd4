"""FreeU: frequency-domain re-weighting of UNet skip connections.

Equivalent of diffusers' ``apply_freeu`` as exposed by the reference
pipeline/UNet (``enable_freeu``/``disable_freeu``,
/root/reference/src/pipelines/pipeline_i2v_adapter.py:156-181,
/root/reference/src/models/unet_motion_cross_frame_attn.py:1213-1228):
the first half of the backbone channels is scaled by ``b`` and the skip
tensor's low spatial frequencies are scaled by ``s``, on the two coarsest
up-block stages only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FreeUParams(NamedTuple):
    """SD1.5-recommended defaults (the reference CLI uses the same)."""

    s1: float = 0.9
    s2: float = 0.2
    b1: float = 1.2
    b2: float = 1.4


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale the low-frequency box (±threshold around DC) of (B, H, W, C)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    freq = jnp.fft.fftn(x32, axes=(1, 2))
    freq = jnp.fft.fftshift(freq, axes=(1, 2))
    b, h, w, c = x.shape
    ch, cw = h // 2, w // 2
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    low = (
        (jnp.abs(rows - ch) < threshold) & (jnp.abs(cols - cw) < threshold)
    ).astype(jnp.float32)
    mask = low * scale + (1.0 - low)
    freq = freq * mask
    freq = jnp.fft.ifftshift(freq, axes=(1, 2))
    out = jnp.fft.ifftn(freq, axes=(1, 2)).real
    return out.astype(orig_dtype)


def apply_freeu(
    stage: int,
    hidden: jnp.ndarray,
    skip: jnp.ndarray,
    params: FreeUParams,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """stage = up-block index; only stages 0 and 1 are modified."""
    if stage == 0:
        b, s = params.b1, params.s1
    elif stage == 1:
        b, s = params.b2, params.s2
    else:
        return hidden, skip
    half = hidden.shape[-1] // 2
    hidden = jnp.concatenate(
        [hidden[..., :half] * b, hidden[..., half:]], axis=-1
    )
    skip = fourier_filter(skip, threshold=1, scale=s)
    return hidden, skip
