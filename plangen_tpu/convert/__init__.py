from plangen_tpu.convert.jax_to_torch import (
    export_state_dict,
    export_trainable_state_dict,
    save_torch_state_dict,
)
from plangen_tpu.convert.torch_to_jax import convert_state_dict, load_janus_checkpoint

__all__ = [
    "convert_state_dict",
    "load_janus_checkpoint",
    "export_state_dict",
    "export_trainable_state_dict",
    "save_torch_state_dict",
]
