from plangen_tpu.data.schema import Sample
from plangen_tpu.data.preprocess import (
    resize_image,
    to_model_range,
    from_model_range,
    clip_normalize,
    build_edit_region,
)

__all__ = [
    "Sample",
    "resize_image",
    "to_model_range",
    "from_model_range",
    "clip_normalize",
    "build_edit_region",
]
