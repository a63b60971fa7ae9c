"""Structured Streaming ingest: decode + per-polygon aggregate per
micro-batch, exactly-once via checkpoint (engine scale extension; the
reference is batch-only, SURVEY §2.10)."""

import os

import numpy as np
import pandas as pd
import pytest

from xagg_spark.grid import GridSpec
from xagg_spark.operators import pixel_overlaps
from xagg_spark.polygons import PolygonSet, rect_ring
from xagg_spark.streaming import stream_aggregate
from xagg_spark.synth import generate_pandas

GRID = GridSpec(lat_edge=-0.5, lon_edge=-0.5, dlat=1.0, dlon=1.0,
                nlat=4, nlon=4, tile_h=4, tile_w=4)


def test_stream_aggregate_availablenow(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    # two "arrivals" of tiles as separate files
    pdf = generate_pandas(GRID, ntime=4, fmt="raw32")
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    spark.createDataFrame(pdf[:2], schema=schema).write.parquet(src + "/a")
    spark.createDataFrame(pdf[2:], schema=schema).write.parquet(src + "/b")

    polys = PolygonSet([rect_ring(0.0, 0.0, 2.0, 2.0)],
                       pd.DataFrame({"name": ["p"]}))
    wm = pixel_overlaps(spark, GRID, polys)

    q = stream_aggregate(spark, src + "/*/", GRID, wm, out, ck,
                         max_files_per_trigger=1)
    q.awaitTermination(120)
    res = spark.read.parquet(out).toPandas()
    # every (t) appears exactly once across batches, values finite
    assert sorted(res["t"].tolist()) == [0, 1, 2, 3]
    assert np.isfinite(res["value"]).all()
    assert res["batch_id"].nunique() >= 2  # really went through >1 micro-batch

    # restart with same checkpoint: no new output (exactly-once)
    n_before = len(spark.read.parquet(out).toPandas())
    q2 = stream_aggregate(spark, src + "/*/", GRID, wm, out, ck)
    q2.awaitTermination(120)
    assert len(spark.read.parquet(out).toPandas()) == n_before


def test_stream_dedup_stateful_across_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates are suppressed within a
    batch, across micro-batches, AND across a full stream restart (state
    restored from the checkpoint)."""
    from xagg_spark.streaming.dedup import stream_dedup_exact

    src = tmp_path / "docs_in"
    out = str(tmp_path / "docs_out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    wave1 = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                          "text": ["alpha", "beta", "alpha", "gamma"]})
    wave1.to_parquet(src / "w1.parquet")
    q = stream_dedup_exact(spark, str(src), out, ck, n_groups=4,
                           max_files_per_trigger=1)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out).toPandas()
    # within-batch dup (alpha x2) suppressed: 3 uniques
    assert sorted(got1["digest"].unique()) == sorted(got1["digest"]) \
        and len(got1) == 3

    # wave 2: one re-sent duplicate + one new doc; RESTART the stream
    wave2 = pd.DataFrame({"doc_id": [5, 6],
                          "text": ["beta", "delta"]})
    wave2.to_parquet(src / "w2.parquet")
    q2 = stream_dedup_exact(spark, str(src), out, ck, n_groups=4,
                            max_files_per_trigger=1)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out).toPandas()
    assert len(got2) == 4                      # only 'delta' added
    assert got2["digest"].is_unique
    kept = set(got2["doc_id"])
    assert 6 in kept and 5 not in kept         # re-sent 'beta' suppressed
