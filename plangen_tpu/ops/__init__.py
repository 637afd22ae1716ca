from plangen_tpu.ops.attention import dot_product_attention
from plangen_tpu.ops.sampling import cfg_combine, sample_categorical

__all__ = ["dot_product_attention", "cfg_combine", "sample_categorical"]
