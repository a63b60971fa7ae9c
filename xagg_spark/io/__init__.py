from .weightmap_io import read_wm, save_weightmap, resume_pixel_overlaps

__all__ = ["read_wm", "save_weightmap", "resume_pixel_overlaps"]
