"""Native C++ preprocessing library vs the numpy/cv2 reference paths."""

import numpy as np
import pytest

from i2v_adapter_tpu.data import native
from i2v_adapter_tpu.utils.image import CLIP_MEAN, CLIP_STD, resize_center_crop


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        try:
            native.build(verbose=False)
            native._load_failed = False
        except Exception:  # noqa: BLE001
            pytest.skip("no C++ toolchain available")
    if not native.available():
        pytest.skip("native library unavailable")


def test_pm1_matches_python(rng):
    frames = (rng.random((3, 40, 60, 3)) * 255).astype(np.uint8)
    out = native.preprocess_frames_pm1(frames, 32)
    assert out.shape == (3, 32, 32, 3)
    ref = np.stack([
        resize_center_crop(f.astype(np.float32) / 255.0, 32, 32) * 2 - 1
        for f in frames
    ])
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_clip_matches_python(rng):
    frames = (rng.random((2, 50, 30, 3)) * 255).astype(np.uint8)
    out = native.preprocess_frames_clip(frames, 28)
    ref = np.stack([
        (resize_center_crop(f.astype(np.float32) / 255.0, 28, 28) - CLIP_MEAN)
        / CLIP_STD
        for f in frames
    ])
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_hflip(rng):
    frames = rng.random((2, 4, 6, 3)).astype(np.float32)
    out = native.hflip_frames(frames.copy())
    np.testing.assert_allclose(out, frames[:, :, ::-1], atol=1e-7)
