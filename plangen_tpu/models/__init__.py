from plangen_tpu.models import llama, projector, siglip, vlm, vq

__all__ = ["llama", "siglip", "vq", "projector", "vlm"]
