"""Config tree: validation and JSON round-tripping (checkpoint metadata)."""

import json

import pytest

from i2v_adapter_tpu.config import (
    I2VModelConfig,
    PipelineConfig,
    TrainConfig,
    VideoUNetConfig,
    tiny_test_config,
)


def test_nested_json_roundtrip():
    tc = TrainConfig(snr_gamma=5.0, update_motion_modules=True)
    assert TrainConfig.from_dict(json.loads(tc.to_json())) == tc
    mc = I2VModelConfig()
    assert I2VModelConfig.from_dict(json.loads(mc.to_json())) == mc
    tiny = tiny_test_config()
    assert I2VModelConfig.from_dict(json.loads(tiny.to_json())) == tiny


def test_configs_hashable():
    # jit closes over configs as static values — they must hash.
    hash(VideoUNetConfig())
    hash(tiny_test_config())


def test_validation():
    with pytest.raises(ValueError):
        PipelineConfig(frame_similarity_sample_ratio=1.5)
    with pytest.raises(ValueError):
        TrainConfig(first_frame_mode="bogus")
    with pytest.raises(ValueError):
        VideoUNetConfig(down_block_has_attention=(True,))


def test_unet_defaults_are_sd15_shaped():
    cfg = VideoUNetConfig()
    assert cfg.block_out_channels == (320, 640, 1280, 1280)
    assert cfg.time_embed_dim == 1280
    assert cfg.down_block_has_attention == (True, True, True, False)
    assert cfg.up_block_has_attention == (False, True, True, True)
