from plangen_tpu.utils.visualize import draw_layout, save_image_grid

__all__ = ["draw_layout", "save_image_grid"]
