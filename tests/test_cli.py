"""Inference CLI end-to-end: synthetic pretrained dir + eval CSV -> GIFs
(reference pipeline __main__ flow, pipeline_i2v_adapter.py:721-809)."""

import csv
import os

import numpy as np
import pytest

from i2v_adapter_tpu.config import tiny_test_config
from i2v_adapter_tpu.pipelines import cli
from tests.synth import write_pretrained_dir

PIL = pytest.importorskip("PIL")


def test_cli_generates_gifs(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    pretrained = write_pretrained_dir(str(tmp_path / "ckpt"), rng)

    img_path = str(tmp_path / "cond.png")
    Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(img_path)
    eval_csv = str(tmp_path / "eval.csv")
    with open(eval_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["prompt", "image_path"])
        w.writeheader()
        w.writerow({"prompt": "a cat", "image_path": img_path})

    out_dir = str(tmp_path / "samples")
    from i2v_adapter_tpu.config import PipelineConfig
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline

    # drive through the library path the CLI wraps (tiny config injection)
    pc = PipelineConfig(
        num_frames=2, height=32, width=32, num_inference_steps=2,
        dtype="float32", blur_sigma=1.0,
    )
    pipe = I2VAdapterPipeline.from_pretrained(
        pretrained, model_config=tiny_test_config(), pipeline_config=pc
    )
    video = pipe("a cat", condition_image=Image.open(img_path), seed=0)
    assert video.shape == (1, 2, 32, 32, 3)
    os.makedirs(out_dir, exist_ok=True)
    paths = pipe.export_gifs(video, os.path.join(out_dir, "clip"))
    assert os.path.getsize(paths[0]) > 0

    # and the argparse surface itself
    args = cli.parse_args([
        "--task_name", "t", "--pretrained_model_path", pretrained,
        "--eval_csv_path", eval_csv, "--num_frames", "2",
        "--height", "32", "--width", "32", "--num_inference_steps", "2",
        "--dtype", "float32", "--dispatch", "stepwise", "--int8_conv",
    ])
    assert args.guidance_scale == 7.5
    assert args.frame_similarity_sample_ratio == 0.9
    assert args.dispatch == "stepwise" and args.int8_conv

    # the serving toggles the CLI wires: int8 convs rebuild the UNet with
    # the knob recorded in config (param tree unchanged), and the stepwise
    # dispatch still generates
    pipe.enable_int8_conv()
    assert pipe.config.unet.int8_conv
    video_q = pipe("a cat", condition_image=Image.open(img_path), seed=0,
                   dispatch="stepwise")
    assert video_q.shape == (1, 2, 32, 32, 3)
    assert np.isfinite(video_q.astype(np.float32)).all()


def test_from_pretrained_loads_adapter_and_ip(tmp_path):
    """from_pretrained applies the IP weights and the zero-init adapter."""
    from flax.traverse_util import flatten_dict

    from i2v_adapter_tpu.config import PipelineConfig
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline

    rng = np.random.default_rng(1)
    pretrained = write_pretrained_dir(str(tmp_path / "ckpt"), rng)
    pipe = I2VAdapterPipeline.from_pretrained(
        pretrained, model_config=tiny_test_config(),
        pipeline_config=PipelineConfig(dtype="float32"),
    )
    flat = flatten_dict(pipe.params["unet"]["params"], sep="/")
    site = "down_blocks_0/attentions_0/transformer_blocks_0"
    # zero-init adapter out, Q copied from attn1
    assert np.all(np.asarray(flat[f"{site}/i2v_adapter/to_out/kernel"]) == 0)
    np.testing.assert_array_equal(
        np.asarray(flat[f"{site}/i2v_adapter/to_q/kernel"]),
        np.asarray(flat[f"{site}/attn1/to_q/kernel"]),
    )
    # IP K/V installed
    assert f"{site}/attn2/to_k_ip/kernel" in flat


def test_cli_mesh_flag_parses_and_enables(tmp_path):
    """--mesh 'data,tensor,seq' builds a serving mesh and shards the
    pipeline (full CLI path is exercised in test_parallel_infer; here the
    flag plumbing + enable_mesh on a from_pretrained pipeline)."""
    import jax

    from i2v_adapter_tpu.config import MeshConfig, PipelineConfig
    from i2v_adapter_tpu.parallel.mesh import create_mesh
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline

    args = cli.parse_args([
        "--task_name", "t", "--pretrained_model_path", "x",
        "--eval_csv_path", "y", "--mesh", "2,1,2",
    ])
    assert args.mesh == "2,1,2"

    rng = np.random.default_rng(3)
    pretrained = write_pretrained_dir(str(tmp_path / "ckpt"), rng)
    pipe = I2VAdapterPipeline.from_pretrained(
        pretrained, model_config=tiny_test_config(),
        pipeline_config=PipelineConfig(
            num_frames=2, height=32, width=32, num_inference_steps=2,
            dtype="float32", blur_sigma=1.0,
        ),
    )
    d, t, s = (int(x) for x in args.mesh.split(","))
    mesh = create_mesh(
        MeshConfig(data=d, fsdp=1, tensor=t, seq=s),
        jax.devices()[: d * t * s],
    )
    pipe.enable_mesh(mesh)
    video = pipe("a cat", condition_image=np.zeros((32, 32, 3), np.uint8),
                 seed=0)
    assert video.shape == (1, 2, 32, 32, 3)
    pipe.disable_mesh()
