from i2v_adapter_tpu.data.webvid import WebVidDataset
from i2v_adapter_tpu.data.latent import LatentImageDataset, LatentVideoDataset
from i2v_adapter_tpu.data.loader import DataLoader

__all__ = [
    "WebVidDataset",
    "LatentImageDataset",
    "LatentVideoDataset",
    "DataLoader",
]
