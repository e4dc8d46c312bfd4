"""Tokenizer, image utils, data loader, blur."""

import numpy as np
import pytest

from i2v_adapter_tpu.utils import image as image_utils
from i2v_adapter_tpu.utils.tokenizer import make_test_tokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    return make_test_tokenizer(str(tmp_path_factory.mktemp("tok")))


def test_tokenizer_bpe_merges(tok):
    ids_word = tok.encode("cat")
    assert len(ids_word) == 1  # merged into single token "cat</w>"
    assert tok.decode(ids_word).strip() == "cat"


def test_tokenizer_framing_and_padding(tok):
    out = tok(["a cat", "a"], padding="max_length")
    assert out.shape == (2, tok.context_length)
    assert out[0, 0] == tok.bos
    assert (out[:, -1] == tok.eos).all()
    longest = tok(["a cat", "a"], padding="longest")
    assert longest.shape[1] == 4  # bos a cat eos


def test_tokenizer_unknown_chars_fall_back_to_bytes(tok):
    ids = tok.encode("zebra!")  # not in merge vocab -> per-byte tokens
    assert len(ids) > 3
    assert tok.decode(ids).strip() == "zebra !"


def test_preprocess_range():
    img = (np.random.default_rng(0).random((40, 60, 3)) * 255).astype(np.uint8)
    out = image_utils.preprocess_image(img, 32, 32)
    assert out.shape == (32, 32, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_resize_center_crop_aspect():
    img = np.zeros((100, 200, 3), np.float32)
    out = image_utils.resize_center_crop(img, 64, 64)
    assert out.shape == (64, 64, 3)


def test_postprocess_roundtrip():
    v = np.linspace(-1, 1, 2 * 2 * 4 * 4 * 3, dtype=np.float32).reshape(
        2, 2, 4, 4, 3
    )
    out = image_utils.postprocess_video(v)
    assert out.dtype == np.uint8 and out.min() == 0 and out.max() == 255


def test_gaussian_blur_kernel_matches_torchvision_formula(rng):
    """torchvision builds the 1-D kernel as normalized exp(-(x/sigma)^2/2)
    over linspace(-(k-1)/2, (k-1)/2); verify ours matches that closed form."""
    from i2v_adapter_tpu.ops.blur import _gaussian_kernel1d

    for k, sigma in ((3, 0.7), (5, 1.3)):
        x = np.linspace(-(k - 1) / 2.0, (k - 1) / 2.0, k)
        pdf = np.exp(-0.5 * (x / sigma) ** 2)
        want = pdf / pdf.sum()
        np.testing.assert_allclose(
            np.asarray(_gaussian_kernel1d(k, sigma)), want, rtol=1e-5
        )


def test_gaussian_blur_preserves_mean(rng):
    import jax.numpy as jnp

    from i2v_adapter_tpu.ops.blur import gaussian_blur

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    out = gaussian_blur(x, 3, 1.0)
    assert out.shape == x.shape
    # smoothing reduces variance, roughly preserves mean
    assert abs(float(out.mean()) - float(x.mean())) < 0.05
    assert float(out.std()) < float(x.std())


def test_dataloader_order_and_shapes():
    from i2v_adapter_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32), "text": str(i)}

    dl = DataLoader(DS(), batch_size=4, shuffle=False, num_workers=2)
    batches = list(iter(dl))
    assert len(batches) == 2  # drop_last
    assert batches[0]["x"].shape == (4, 2, 2)
    np.testing.assert_array_equal(batches[0]["x"][:, 0, 0], [0, 1, 2, 3])
    assert batches[0]["text"] == ["0", "1", "2", "3"]


def test_dataloader_shuffles_between_epochs():
    from i2v_adapter_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.array([i], np.float32)}

    dl = DataLoader(DS(), batch_size=16, shuffle=True, num_workers=1)
    e1 = next(iter(dl))["x"].ravel()
    e2 = next(iter(dl))["x"].ravel()
    assert not np.array_equal(e1, e2)
    assert sorted(e1) == sorted(e2)


def test_sharded_batcher():
    from i2v_adapter_tpu.data.loader import DataLoader, ShardedBatcher

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.array([i], np.float32)}

    dl = DataLoader(DS(), batch_size=8, shuffle=False, num_workers=1)
    shard0 = next(iter(ShardedBatcher(dl, 0, 2)))
    shard1 = next(iter(ShardedBatcher(dl, 1, 2)))
    assert shard0["x"].shape == (4, 1)
    np.testing.assert_array_equal(
        np.concatenate([shard0["x"], shard1["x"]]).ravel(), np.arange(8)
    )


def test_latent_dataset(tmp_path):
    from i2v_adapter_tpu.data.latent import LatentVideoDataset, STD_LATENT

    lat = np.random.default_rng(0).standard_normal((20, 4, 4, 4)).astype(np.float32)
    fpv = np.array([12, 3, 5])  # middle video too short for 4 frames? 3 < 4
    np.save(tmp_path / "lat.npy", lat)
    np.save(tmp_path / "fpv.npy", fpv)
    ds = LatentVideoDataset(
        str(tmp_path / "lat.npy"), str(tmp_path / "fpv.npy"),
        sample_n_frames=4, seed=0,
    )
    assert len(ds) == 2  # 3-frame video filtered out
    item = ds[0]
    assert item["latents"].shape == (4, 4, 4, 4)


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    from i2v_adapter_tpu.data.latent import ImageFolderDataset

    d = tmp_path / "cats"
    d.mkdir()
    for i in range(3):
        Image.fromarray(
            (np.random.default_rng(i).random((40, 50, 3)) * 255).astype(np.uint8)
        ).save(d / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), sample_size=32, seed=0)
    assert len(ds) == 3
    item = ds[0]
    assert item["pixel_values"].shape == (32, 32, 3)
    assert item["text"] == "cats"
    assert -1.01 <= item["pixel_values"].min() <= item["pixel_values"].max() <= 1.01


def test_metrics_logger_trackers(tmp_path):
    """JSONL is always written; wandb/TB trackers activate only if their
    packages import (reference --report_to surface,
    train_image_to_video.py:406-414) — absent packages degrade to None
    without affecting the log."""
    from i2v_adapter_tpu.utils.metrics import MetricsLogger

    ml = MetricsLogger(
        str(tmp_path), use_tensorboard=False, use_wandb=True,
        run_config={"lr": 1e-4},
    )
    ml.log(1, {"loss": 0.5})
    ml.log(2, {"loss": 0.25, "grad_norm": 1.0})
    ml.finish()  # no-op when wandb never initialized
    recs = ml.read()
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[1]["grad_norm"] == 1.0
