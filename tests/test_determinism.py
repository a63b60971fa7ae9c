"""North-rule determinism: identical tile assignments and results at two
parallelism levels (local[2] vs local[8] here; bench.py evidences 8 vs 32).

Runs each level in a subprocess (one JVM per master) and compares the full
overlap table and aggregate values bit-for-bit-as-written (CSV round-trip).
"""

import subprocess
import sys

import pandas as pd
import pytest

SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
import pandas as pd
from xagg_spark.session import get_spark
from xagg_spark.grid import GridSpec
from xagg_spark.synth import generate_spark
from xagg_spark.operators import pixel_overlaps, tiles_to_pixels, aggregate
from xagg_spark.polygons import PolygonSet, rect_ring
import numpy as np

master, out = sys.argv[1], sys.argv[2]
spark = get_spark("det", master=master, shuffle_partitions=8)
grid = GridSpec(lat_edge=-3.0, lon_edge=-3.0, dlat=0.25, dlon=0.25,
                nlat=24, nlon=24, tile_h=12, tile_w=12)
polys = PolygonSet([rect_ring(-2.3, -2.1, 1.4, 1.2),
                    np.array([[-1.0, -1.0], [2.5, -0.5], [0.5, 2.6]])])
wm = pixel_overlaps(spark, grid, polys)
imgs = generate_spark(spark, grid, ntime=2, fmt="raw32")
agg = aggregate(tiles_to_pixels(imgs, grid), wm)
ov = wm.overlaps.orderBy("poly_idx", "pix_idx").toPandas()
ag = agg.orderBy("poly_idx", "var", "t").toPandas()
ov.to_csv(out + ".ov.csv", index=False)
ag.to_csv(out + ".ag.csv", index=False)
spark.stop()
"""


@pytest.mark.slow
def test_same_results_at_two_parallelism_levels(tmp_path):
    outs = {}
    for master in ("local[2]", "local[8]"):
        out = str(tmp_path / master.replace("[", "_").replace("]", ""))
        r = subprocess.run([sys.executable, "-c", SCRIPT, master, out],
                           capture_output=True, text=True, timeout=420)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[master] = out
    ov2 = pd.read_csv(outs["local[2]"] + ".ov.csv")
    ov8 = pd.read_csv(outs["local[8]"] + ".ov.csv")
    pd.testing.assert_frame_equal(ov2, ov8)  # identical tile assignments
    ag2 = pd.read_csv(outs["local[2]"] + ".ag.csv")
    ag8 = pd.read_csv(outs["local[8]"] + ".ag.csv")
    pd.testing.assert_frame_equal(ag2, ag8)
