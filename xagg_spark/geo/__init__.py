from .ellipsoid import (A, E2, K0, QP, EPSG_GLOBAL, EPSG_NORTH, EPSG_SOUTH,
                        cea_band_area, forward, pick_epsg, q_auth)
from .bounds import (canonicalize_axis, crosses_antimeridian, synth_bounds,
                     wrap_lon)
from .clip import (clip_area, clip_polygon_convex, rect_rect_overlap_area_cea,
                   shoelace_area)
from .cells import (cell_id, cell_of, cover_bbox, cover_polygon,
                    pick_resolution)

__all__ = [
    "A", "E2", "K0", "QP", "EPSG_GLOBAL", "EPSG_NORTH", "EPSG_SOUTH",
    "cea_band_area", "forward", "pick_epsg", "q_auth",
    "canonicalize_axis", "crosses_antimeridian", "synth_bounds", "wrap_lon",
    "clip_area", "clip_polygon_convex", "rect_rect_overlap_area_cea",
    "shoelace_area",
    "cell_id", "cell_of", "cover_bbox", "cover_polygon", "pick_resolution",
]
