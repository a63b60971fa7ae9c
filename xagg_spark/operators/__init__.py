from .overlaps import (NoOverlapError, WeightMap, pixel_geometry,
                       pixel_overlaps, tiles_to_pixels)
from .aggregate import (aggregate, aggregate_quantile, aggregate_quantiles,
                        aggregate_stats)

__all__ = ["NoOverlapError", "WeightMap", "pixel_geometry", "pixel_overlaps",
           "tiles_to_pixels", "aggregate", "aggregate_quantile",
           "aggregate_quantiles", "aggregate_stats"]
