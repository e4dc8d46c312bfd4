"""ctypes binding for the native preprocessing library (csrc/).

Build once with ``python -m i2v_adapter_tpu.data.native build`` (or
``make -C csrc``).  All entry points fall back to the numpy/cv2 path when
the shared library is absent, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from i2v_adapter_tpu.utils.image import CLIP_MEAN, CLIP_STD

_LIB_NAME = "libi2vpre.so"


def _csrc_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
    )


def build(verbose: bool = True) -> str:
    """Compile the shared library; returns its path."""
    csrc = _csrc_dir()
    subprocess.run(
        ["make", "-C", csrc],
        check=True,
        capture_output=not verbose,
    )
    return os.path.join(csrc, _LIB_NAME)


_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def load() -> Optional[ctypes.CDLL]:
    """Load (lazily) the native library; None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    path = os.path.join(_csrc_dir(), _LIB_NAME)
    if not os.path.exists(path):
        _load_failed = True
        return None
    lib = ctypes.CDLL(path)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    ci = ctypes.c_int
    lib.preprocess_frames_pm1.argtypes = [u8p, ci, ci, ci, ci, f32p, ci, ci, ci]
    lib.preprocess_frames_clip.argtypes = [
        u8p, ci, ci, ci, ci, f32p, ci, ci, f32p, f32p, ci,
    ]
    lib.hflip_frames.argtypes = [f32p, ci, ci, ci, ci, ci]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _num_threads() -> int:
    return max(1, os.cpu_count() or 1)


def preprocess_frames_pm1(frames: np.ndarray, size: int) -> Optional[np.ndarray]:
    """(N, H, W, C) uint8 -> (N, size, size, C) float32 in [-1, 1] via the
    native path; None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    out = np.empty((n, size, size, c), np.float32)
    lib.preprocess_frames_pm1(frames, n, h, w, c, out, size, size, _num_threads())
    return out


def preprocess_frames_clip(frames: np.ndarray, size: int = 224) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    out = np.empty((n, size, size, c), np.float32)
    lib.preprocess_frames_clip(
        frames, n, h, w, c, out, size, size,
        np.ascontiguousarray(CLIP_MEAN), np.ascontiguousarray(CLIP_STD),
        _num_threads(),
    )
    return out


def hflip_frames(frames: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.float32)
    n, h, w, c = frames.shape
    lib.hflip_frames(frames, n, h, w, c, _num_threads())
    return frames


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build())
    else:
        print("available:", available())
