"""PSNR parity harness (tools/parity.py) compare mode."""

import numpy as np

from i2v_adapter_tpu.tools.parity import compare, psnr


def test_psnr_values():
    a = np.zeros((4, 4), np.float32)
    assert psnr(a, a) == float("inf")
    b = a + 0.01
    # mse = 1e-4, peak^2 = 4 -> 10*log10(4e4) ~ 46 dB
    assert abs(psnr(a, b) - 46.02) < 0.1


def test_compare_pass_and_fail(tmp_path, capsys):
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    np.save(tmp_path / "ref.npy", ref)
    np.save(tmp_path / "good.npy", ref + 1e-4)
    np.save(tmp_path / "bad.npy", ref + 0.5)
    assert compare(str(tmp_path / "ref.npy"), str(tmp_path / "good.npy")) == 0
    assert compare(str(tmp_path / "ref.npy"), str(tmp_path / "bad.npy")) == 1
    out = capsys.readouterr().out
    assert "PASS" in out and "FAIL" in out


def test_compare_shape_mismatch(tmp_path):
    np.save(tmp_path / "a.npy", np.zeros((2, 2), np.float32))
    np.save(tmp_path / "b.npy", np.zeros((3, 2), np.float32))
    assert compare(str(tmp_path / "a.npy"), str(tmp_path / "b.npy")) == 2
