from i2v_adapter_tpu.models.simple.blocks import (
    AlphaBlender,
    BasicTransformerBlock,
    ResBlock,
    VideoResBlock,
    VideoTransformer,
    positional_emb,
)
from i2v_adapter_tpu.models.simple.unet2d import SimpleUNet
from i2v_adapter_tpu.models.simple.unet3d import SimpleUNet3D
from i2v_adapter_tpu.models.simple.unet_dome import SimpleUNetDome

__all__ = [
    "AlphaBlender",
    "BasicTransformerBlock",
    "ResBlock",
    "VideoResBlock",
    "VideoTransformer",
    "positional_emb",
    "SimpleUNet",
    "SimpleUNet3D",
    "SimpleUNetDome",
]
