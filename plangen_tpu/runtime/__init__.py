from plangen_tpu.runtime.kvcache import init_kv_cache
from plangen_tpu.runtime.generate import (
    generate_image_tokens,
    greedy_decode_text,
    prefill,
)

__all__ = [
    "init_kv_cache",
    "prefill",
    "generate_image_tokens",
    "greedy_decode_text",
]
