from i2v_adapter_tpu.data.webvid import WebVidDataset
from i2v_adapter_tpu.data.latent import (
    ImageFolderDataset,
    LatentImageDataset,
    LatentVideoDataset,
)
from i2v_adapter_tpu.data.loader import DataLoader

__all__ = [
    "ImageFolderDataset",
    "WebVidDataset",
    "LatentImageDataset",
    "LatentVideoDataset",
    "DataLoader",
]
