"""i2v_adapter_tpu: a TPU-native (JAX/Flax/pjit/Pallas) image-to-video
diffusion framework with the capabilities of the PyTorch I2V-Adapter
reference implementation (see SURVEY.md)."""

__version__ = "0.1.0"

from i2v_adapter_tpu import config as config  # noqa: F401
