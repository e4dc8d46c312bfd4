"""Gaussian blur on NHWC feature maps.

The reference blurs condition-image latents with
``torchvision.transforms.GaussianBlur(kernel_size=3)`` when building the
PIA-style similarity prior (/root/reference/src/pipelines/
pipeline_i2v_adapter.py:112,648).  torchvision samples sigma ~ U(0.1, 2.0)
per call; here sigma is explicit (pass a sampled value for bug-compatible
behavior, or a fixed one for determinism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    # torchvision convention: softmax of -x^2 / (2 sigma^2) over the window.
    half = (kernel_size - 1) * 0.5
    x = jnp.linspace(-half, half, kernel_size)
    pdf = jnp.exp(-0.5 * (x / sigma) ** 2)
    return pdf / jnp.sum(pdf)


def gaussian_blur(
    image: jnp.ndarray, kernel_size: int = 3, sigma: float = 1.0
) -> jnp.ndarray:
    """Separable depthwise Gaussian blur. image: (..., H, W, C), reflect-pad
    (torchvision uses reflect padding)."""
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    k1 = _gaussian_kernel1d(kernel_size, sigma).astype(image.dtype)
    pad = kernel_size // 2

    batch_shape = image.shape[:-3]
    h, w, c = image.shape[-3:]
    x = image.reshape((-1, h, w, c))
    x = jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )

    # Depthwise separable: rows then columns.
    kh = jnp.tile(k1.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k1.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x.reshape(batch_shape + (h, w, c))
