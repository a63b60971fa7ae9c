"""xagg_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the query/data-processing capabilities of ks905383/xagg
(pixel_overlaps -> aggregate raster<->vector weighted-overlap reduction) as
distributed DataFrame plans over image-tile tables, plus the training-data
pipeline operators (dedup, similarity search, text analysis) a 100 TB corpus
needs.  Public API mirrors the reference's
(/root/reference/xagg/__init__.py:1-8) where concepts carry over.
"""

from .grid import AxesGrid, GridSpec
from .options import get_options, option_context, set_options
from .polygons import PolygonSet, rect_ring
from .operators import (NoOverlapError, WeightMap, aggregate, pixel_geometry,
                        pixel_overlaps, tiles_to_pixels)
from .io import read_wm, read_wm_xagg, resume_pixel_overlaps, save_weightmap
from .io.sinks import AggResult
from .operators.regrid import process_weights
from .operators.subset import SomeNanWarning, subset_find, warn_if_partial_nan
from .geo.bounds import synth_bounds as get_bnds
from .geo.bounds import wrap_lon
from .diag import diag_fig

__version__ = "0.1.0"

__all__ = [
    "AxesGrid", "GridSpec", "PolygonSet", "rect_ring",
    "NoOverlapError", "WeightMap",
    "pixel_overlaps", "aggregate", "pixel_geometry", "tiles_to_pixels",
    "read_wm", "read_wm_xagg", "save_weightmap", "resume_pixel_overlaps",
    "AggResult", "diag_fig",
    "process_weights", "subset_find", "warn_if_partial_nan", "SomeNanWarning",
    "get_options", "set_options", "option_context",
    "get_bnds", "wrap_lon",
]
