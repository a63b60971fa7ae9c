from .overlaps import (NoOverlapError, WeightMap, pixel_geometry,
                       pixel_overlaps, tiles_to_pixels)
from .aggregate import aggregate

__all__ = ["NoOverlapError", "WeightMap", "pixel_geometry", "pixel_overlaps",
           "tiles_to_pixels", "aggregate"]
