from plangen_tpu.convert.torch_to_jax import convert_state_dict, load_janus_checkpoint

__all__ = ["convert_state_dict", "load_janus_checkpoint"]
