"""Serving daemon: directory queue, atomic claims, poison-request
isolation (the worker must keep serving past a failing request)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2v_adapter_tpu.config import PipelineConfig, tiny_test_config
from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline
from i2v_adapter_tpu.pipelines.serve import serve
from i2v_adapter_tpu.utils.tokenizer import make_test_tokenizer

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def tiny_pipe(tmp_path_factory):
    mc = tiny_test_config()
    pc = PipelineConfig(
        num_frames=2, height=32, width=32, num_inference_steps=2,
        dtype="float32", blur_sigma=1.0,
    )
    tok = make_test_tokenizer(str(tmp_path_factory.mktemp("tok")))
    rng = jax.random.PRNGKey(0)
    lat = 32 // mc.vae.spatial_scale_factor
    from i2v_adapter_tpu.models import (
        AutoencoderKL,
        CLIPTextEncoder,
        CLIPVisionEncoder,
        VideoUNet,
    )

    unet = VideoUNet(mc.unet)
    vae = AutoencoderKL(mc.vae)
    text_enc = CLIPTextEncoder(mc.text_encoder)
    img_enc = CLIPVisionEncoder(mc.image_encoder)
    s = mc.image_encoder.image_size
    params = {
        "unet": unet.init(
            rng, jnp.zeros((1, 2, lat, lat, 4)), jnp.zeros(()),
            jnp.zeros((1, 16, mc.unet.cross_attention_dim)),
            jnp.zeros((1, mc.unet.image_embed_dim)),
            enable_cross_frame_attn=True,
        ),
        "vae": vae.init(rng, jnp.zeros((1, 32, 32, 3))),
        "text_encoder": text_enc.init(rng, jnp.zeros((1, 16), jnp.int32)),
        "image_encoder": img_enc.init(rng, jnp.zeros((1, s, s, 3))),
    }
    return I2VAdapterPipeline(mc, params, tok, pc)


def test_serve_drains_queue_and_isolates_failures(tiny_pipe, tmp_path):
    req_dir = str(tmp_path / "requests")
    out_dir = str(tmp_path / "output")
    os.makedirs(req_dir)
    img_path = str(tmp_path / "cond.png")
    Image.fromarray(
        (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    ).save(img_path)

    # valid request (npy output so we can assert pixels), a poison request
    # (missing image), and a second valid one AFTER the poison — the
    # daemon must process it
    reqs = {
        "a_good": {"prompt": "a cat", "image": img_path, "seed": 3,
                   "format": "npy"},
        "b_poison": {"prompt": "x", "image": str(tmp_path / "missing.png")},
        "c_good": {"prompt": "a dog", "image": img_path, "format": "gif"},
    }
    for rid, req in reqs.items():
        with open(os.path.join(req_dir, rid + ".json"), "w") as f:
            json.dump(req, f)

    n = serve(tiny_pipe, req_dir, out_dir, max_requests=5)
    assert n == 3

    with open(os.path.join(out_dir, "a_good.result.json")) as f:
        r = json.load(f)
    assert r["ok"] and r["shape"] == [1, 2, 32, 32, 3]
    video = np.load(os.path.join(out_dir, "a_good.npy"))
    # daemon output == direct pipeline call (same seed)
    direct = tiny_pipe("a cat", condition_image=Image.open(img_path), seed=3)
    np.testing.assert_array_equal(video, direct)

    with open(os.path.join(out_dir, "b_poison.result.json")) as f:
        r = json.load(f)
    assert not r["ok"] and "error" in r

    with open(os.path.join(out_dir, "c_good.result.json")) as f:
        r = json.load(f)
    assert r["ok"]
    assert os.path.exists(os.path.join(out_dir, "c_good_0.gif"))

    # request files renamed by outcome (atomic-claim lifecycle)
    names = sorted(os.listdir(req_dir))
    assert names == [
        "a_good.json.done", "b_poison.json.failed", "c_good.json.done",
    ]


def test_serve_argparse_surface(tmp_path):
    from i2v_adapter_tpu.pipelines.serve import parse_args

    args = parse_args([
        "--pretrained_model_path", str(tmp_path),
        "--requests_dir", "r", "--output_dir", "o",
        "--max_requests", "2", "--no-int8_conv",
    ])
    assert args.max_requests == 2 and not args.int8_conv
    assert args.poll_interval == 0.5


def test_serve_refuses_over_envelope_without_dying(tiny_pipe, tmp_path):
    """A request over the single-chip HBM envelope is refused via the
    result JSON (the pipeline's pre-dispatch check), not by crashing."""
    req_dir = str(tmp_path / "requests")
    out_dir = str(tmp_path / "output")
    os.makedirs(req_dir)
    img_path = str(tmp_path / "cond.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    with open(os.path.join(req_dir, "huge.json"), "w") as f:
        json.dump({
            "prompt": "x", "image": img_path,
            "height": 512, "width": 512, "num_frames": 128,
        }, f)
    n = serve(tiny_pipe, req_dir, out_dir, max_requests=1)
    assert n == 1
    with open(os.path.join(out_dir, "huge.result.json")) as f:
        r = json.load(f)
    assert not r["ok"]


class _HangingPipe:
    """Fake pipeline simulating a dispatch wedged on the device transport:
    blocks far past any timeout (poison isolation can't catch this — the
    call never raises)."""

    def __call__(self, *a, **k):
        import time

        time.sleep(60)

    def export_gifs(self, *a, **k):  # pragma: no cover - never reached
        raise AssertionError("hanging pipe should never produce output")


def test_serve_request_timeout_recycles_worker(tiny_pipe, tmp_path):
    """VERDICT r3 #5: the per-request wall-clock watchdog.  A hanging
    dispatch fails the request with RequestTimeout, the worker stops
    claiming work (returns for a supervisor restart), later requests stay
    queued, and a restarted worker drains them."""
    req_dir = str(tmp_path / "requests")
    out_dir = str(tmp_path / "output")
    os.makedirs(req_dir)
    img_path = str(tmp_path / "cond.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    import time

    for i, rid in enumerate(["a_hang", "b_good"]):
        with open(os.path.join(req_dir, rid + ".json"), "w") as f:
            json.dump({"prompt": "x", "image": img_path, "format": "npy"}, f)
        # distinct mtimes so the queue order is deterministic
        t = time.time() + i
        os.utime(os.path.join(req_dir, rid + ".json"), (t, t))

    n = serve(_HangingPipe(), req_dir, out_dir, max_requests=5,
              request_timeout=0.5)
    assert n == 1  # recycled after the timed-out request
    with open(os.path.join(out_dir, "a_hang.result.json")) as f:
        r = json.load(f)
    assert not r["ok"] and "RequestTimeout" in r["error"]
    assert sorted(os.listdir(req_dir)) == [
        "a_hang.json.failed", "b_good.json",  # b stays queued, unclaimed
    ]

    # supervisor restart with a healthy worker drains the queue; a request
    # under the timeout is unaffected by the watchdog
    n = serve(tiny_pipe, req_dir, out_dir, max_requests=5,
              request_timeout=600.0)
    assert n == 1
    with open(os.path.join(out_dir, "b_good.result.json")) as f:
        r = json.load(f)
    assert r["ok"]
    assert os.path.exists(os.path.join(out_dir, "b_good.npy"))


def test_serve_request_cfg_cutoff_passthrough(tiny_pipe, tmp_path):
    """The cfg_cutoff request key reaches the pipeline: a cutoff request
    succeeds and matches a direct call with the same kwarg; an invalid
    cutoff fails the REQUEST (poison isolation), not the worker."""
    import json
    import os

    import numpy as np
    from PIL import Image

    from i2v_adapter_tpu.pipelines.serve import serve

    req_dir = str(tmp_path / "req")
    out_dir = str(tmp_path / "out")
    os.makedirs(req_dir)
    img_path = str(tmp_path / "cond.png")
    Image.fromarray(
        (np.random.default_rng(2).random((32, 32, 3)) * 255).astype(np.uint8)
    ).save(img_path)
    reqs = {
        "cut": {"prompt": "a cat", "image": img_path, "seed": 4,
                "format": "npy", "cfg_cutoff": 0.34},
        "bad_cut": {"prompt": "a cat", "image": img_path,
                    "cfg_cutoff": 1.5},
    }
    for rid, req in reqs.items():
        with open(os.path.join(req_dir, rid + ".json"), "w") as f:
            json.dump(req, f)
    n = serve(tiny_pipe, req_dir, out_dir, max_requests=3)
    assert n == 2
    with open(os.path.join(out_dir, "cut.result.json")) as f:
        r = json.load(f)
    assert r["ok"], r
    video = np.load(os.path.join(out_dir, "cut.npy"))
    direct = tiny_pipe(
        "a cat", condition_image=Image.open(img_path), seed=4,
        cfg_cutoff=0.34,
    )
    np.testing.assert_array_equal(video, direct)
    with open(os.path.join(out_dir, "bad_cut.result.json")) as f:
        r = json.load(f)
    assert not r["ok"] and "cfg_cutoff" in r["error"]
