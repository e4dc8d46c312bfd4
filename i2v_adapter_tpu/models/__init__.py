from i2v_adapter_tpu.models.unet_video import VideoUNet
from i2v_adapter_tpu.models.vae import AutoencoderKL
from i2v_adapter_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder

__all__ = ["VideoUNet", "AutoencoderKL", "CLIPTextEncoder", "CLIPVisionEncoder"]
