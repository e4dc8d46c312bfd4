from i2v_adapter_tpu.ops.attention import (
    dot_product_attention,
    flash_attention,
)
from i2v_adapter_tpu.ops.blur import gaussian_blur

__all__ = ["dot_product_attention", "flash_attention", "gaussian_blur"]
