from .weightmap_io import read_wm, save_weightmap, resume_pixel_overlaps

__all__ = ["read_wm", "save_weightmap", "resume_pixel_overlaps"]

from .weightmap_io import read_wm_xagg  # noqa: E402

__all__.append("read_wm_xagg")
