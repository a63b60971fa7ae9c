"""Flagship job for spark-submit (tools/submit_example.sh).

Runs the full decode -> overlap-join -> aggregate pipeline on a
deterministic synthetic tile table and prints throughput — the same job
bench.py times at two parallelism levels."""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession


def main():
    spark = SparkSession.builder.appName("xagg_spark_flagship").getOrCreate()
    from xagg_spark.grid import GridSpec
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    from xagg_spark.synth import generate_spark
    import bench

    grid = GridSpec(lat_edge=-20.0, lon_edge=-40.0, dlat=0.1, dlon=0.1,
                    nlat=600, nlon=1200, tile_h=60, tile_w=60)
    imgs = generate_spark(spark, grid, variables=("test",), ntime=3, fmt="raw32")
    polys = bench._bench_polys()
    t0 = time.time()
    pix = tiles_to_pixels(imgs, grid)
    wm = pixel_overlaps(spark, grid, polys)
    out = aggregate(pix, wm, dims=("var", "t"))
    n = out.count()
    dt = time.time() - t0
    print(f"flagship: {n} result rows in {dt:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
