"""Training driver end-to-end: synthesized checkpoint dir + tiny videos ->
two real train steps -> epoch checkpoint on disk -> resume (reference
train_image_to_video.py main() flow, SURVEY.md §3.2)."""

import csv
import json
import os

import numpy as np
import pytest

from i2v_adapter_tpu.config import tiny_test_config
from i2v_adapter_tpu.training.driver import parse_args, train
from tests.synth import write_pretrained_dir

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("driver")
    rng = np.random.default_rng(0)
    ckpt_dir = write_pretrained_dir(str(root / "pretrained"), rng)
    video_dir = root / "videos" / "p0"
    video_dir.mkdir(parents=True)
    rows = []
    for vid in ("v0", "v1", "v2", "v3"):
        path = str(video_dir / f"{vid}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 48))
        if not w.isOpened():
            pytest.skip("no mp4 writer")
        for i in range(10):
            w.write((rng.random((48, 48, 3)) * 255).astype(np.uint8))
        w.release()
        rows.append({"videoid": vid, "name": f"a {vid}", "page_dir": "p0"})
    csv_path = str(root / "train.csv")
    with open(csv_path, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=["videoid", "name", "page_dir"])
        wtr.writeheader()
        wtr.writerows(rows)
    return {"root": str(root), "pretrained": ckpt_dir, "csv": csv_path,
            "videos": str(root / "videos")}


def _args(env, **over):
    base = dict(
        task_name="t", pretrained_model_path=env["pretrained"],
        csv_path=env["csv"], video_folder=env["videos"],
        output_dir=os.path.join(env["root"], "checkpoint"),
        resolution=32, n_frames=4, train_batch_size=2,
        gradient_accumulation_steps=1, num_train_epochs=1,
        checkpoint_epoch=1, num_workers=2, mixed_precision="none",
        max_train_steps=2, seed=0,
    )
    base.update(over)
    argv = []
    for k, v in base.items():
        if isinstance(v, bool):
            if v:
                argv.append(f"--{k}")
        else:
            argv.extend([f"--{k}", str(v)])
    return parse_args(argv)


def test_i2v_driver_end_to_end(env):
    cfg = tiny_test_config()
    result = train(_args(env), model_config=cfg)
    assert result["global_step"] == 2
    assert np.isfinite(result["last_loss"])
    epoch_dir = os.path.join(env["root"], "checkpoint", "t", "epoch_1")
    assert os.path.exists(
        os.path.join(epoch_dir, "i2v_adapter", "diffusion_pytorch_model.safetensors")
    )
    # adapter config json written
    with open(os.path.join(epoch_dir, "i2v_adapter", "config.json")) as f:
        assert json.load(f)["_class_name"] == "I2VAdapterModule"
    # final pipeline export
    assert os.path.exists(
        os.path.join(env["root"], "checkpoint", "t", "pipeline", "unet",
                     "flax_model.safetensors")
    )


def test_i2v_driver_resumes_from_epoch(env):
    """Second run discovers epoch_1 and resumes (start epoch bumps)."""
    cfg = tiny_test_config()
    args = _args(env, num_train_epochs=2, max_train_steps=4)
    result = train(args, model_config=cfg)
    assert result["global_step"] >= 3  # resumed past epoch 1


def test_text_padding_longest(env):
    """--text_padding longest reproduces the reference's training
    tokenization (train_image_to_video.py:818): the jitted step runs with
    bucketed (multiple-of-8) prompt lengths shorter than context_length
    and still converges to a finite loss."""
    cfg = tiny_test_config()
    args = _args(env, task_name="longest_task", text_padding="longest")
    result = train(args, model_config=cfg)
    assert result["global_step"] == 2
    assert np.isfinite(result["last_loss"])


def test_ema_checkpoint_exports_ema_tree(env):
    """With --use_ema the epoch adapter checkpoint holds the EMA average
    (not the raw weights), and the raw tree lands in non_ema/ (VERDICT r1 #3;
    reference train_text_to_image.py:566-596,887-889)."""
    from safetensors.numpy import load_file

    cfg = tiny_test_config()
    args = _args(env, task_name="ema_task", use_ema=True,
                 learning_rate=1e-2)
    train(args, model_config=cfg)
    epoch_dir = os.path.join(env["root"], "checkpoint", "ema_task", "epoch_1")
    ema_sd = load_file(os.path.join(
        epoch_dir, "i2v_adapter", "diffusion_pytorch_model.safetensors"))
    raw_sd = load_file(os.path.join(
        epoch_dir, "non_ema", "i2v_adapter",
        "diffusion_pytorch_model.safetensors"))
    assert set(ema_sd) == set(raw_sd)
    # after 2 steps at decay<1 the EMA average must differ from the live
    # weights on the trained projections
    diffs = [
        float(np.abs(ema_sd[k] - raw_sd[k]).max())
        for k in ema_sd
        if "to_q" in k or "to_out" in k
    ]
    assert max(diffs) > 0.0
    # and the final pipeline export equals the EMA tree, not the raw one
    pipe_sd = load_file(os.path.join(
        env["root"], "checkpoint", "ema_task", "pipeline", "unet",
        "flax_model.safetensors"))
    ema_leaf = next(k for k in ema_sd if "to_q" in k)
    flax_matches = [
        v for k, v in pipe_sd.items()
        if "i2v_adapter" in k and "to_q" in k
        and v.shape == ema_sd[ema_leaf].T.shape
    ]
    assert any(
        np.allclose(v, ema_sd[ema_leaf].T, atol=1e-6) for v in flax_matches
    )


def test_t2i_driver_end_to_end(env):
    cfg = tiny_test_config()
    args = _args(env, task_name="t2i_task", train_mode="t2i")
    result = train(args, model_config=cfg)
    assert result["global_step"] == 2
    assert np.isfinite(result["last_loss"])
    assert os.path.exists(
        os.path.join(env["root"], "checkpoint", "t2i_task", "epoch_1", "unet",
                     "flax_model.safetensors")
    )
