"""Benchmark harness: headline queries + N-vs-4N scaling evidence.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "runs": {name: [[sec, load1m], ...]},
   "sf": ..., "rows_per_sec": {...}, "scaling": {...}, "scaling_4x": {...},
   "calibration": {...}, "resume_4x": {...}, "protocol_violations": [...]}

The geospatial job is the north-rule metric: tiles decoded + PIP-joined
rows/sec with per-polygon aggregate, run at local[8] and local[32] on the
same deterministic input ("two cluster sizes" sandbox protocol —
BASELINE.md).  Table-based queries run at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1).

Protocol (round 4 — after two rounds where the RECORDED run was
load-inflated while BASELINE.md's side tables held the true minimums):
the box shares a host with up to 3x load noise, so
(1) HEADLINE queries run FIRST, in one warm JVM;
(2) every recorded number — headline, scaling levels, 4x levels — is the
    MIN over >=3 consecutive runs, and the per-run times + the 1-minute
    load average at each run's end are recorded in "runs" so a reader can
    see the contention that produced any outlier;
(3) SELF-CHECK: any headline min exceeding 1.3x its round-1 recorded
    value triggers ADAPTIVE extra reps (up to 7 total); if the violation
    survives, it is recorded in "protocol_violations", shouted to stderr,
    and the bench exits non-zero — a loud failure beats a silently
    inflated official artifact (VERDICT r3 "What's wrong #1").
Run bench.py EXCLUSIVELY (no concurrent pytest/sessions).
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

REPS = 3          # min-of-REPS for every recorded number (protocol above)
MAX_REPS = 7      # adaptive ceiling when the self-check trips
VIOLATION_FACTOR = 1.3
# round-1 recorded minimums (BENCH_r01.json) — the self-check baseline;
# queries added after round 1 have no reference and are exempt
R1_REF = {
    "geo_decode": 4.73, "geo_weightmap": 8.2, "geo_aggregate": 35.59,
    "window_normalize": 0.32, "topk_per_group": 2.54, "minhash_lsh": 3.44,
    "simhash": 1.24, "ann_cosine_topk": 1.04, "knn_tiles": 0.99,
}

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


def _knn_centers_10k():
    """10^4 deterministic query centers spread over the bench domain — the
    workload where the r3 nested-loop center join degraded (VERDICT r3
    ask #3); the cell-ring path keeps it a broadcast hash join."""
    rng = np.arange(10_000, dtype=np.int64)
    return pd.DataFrame({
        "q_id": rng,
        "c_lon": -38.0 + (rng % 100) * 1.16 + (rng % 7) * 0.013,
        "c_lat": -18.0 + (rng // 100) * 0.56 + (rng % 5) * 0.011,
    })


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


def _load1m() -> float:
    return round(os.getloadavg()[0], 2)


def _calibration_probes(spark):
    """Compute-bound scaling probes (constant total work): pure-JVM
    whole-stage-codegen arithmetic and a pure-Python mapInPandas numpy
    loop.  They separate 'this box stopped scaling' (probes flat) from
    'the engine stopped scaling' (probes keep scaling) — BASELINE.md's
    memory-bandwidth-ceiling evidence, re-run in the SAME session as each
    scaling level (VERDICT r3 ask #4)."""
    import pyspark.sql.functions as F
    t0 = time.time()
    spark.range(600_000_000, numPartitions=64).selectExpr(
        "sum(sin(id * 1e-6) * cos(id * 1e-6) + sqrt(id)) AS s").collect()
    t_jvm = time.time() - t0

    def pywork(batches):
        for pdf in batches:
            x = np.arange(2_000_000, dtype=np.float64) * 1e-6
            s = 0.0
            for _ in range(10):
                s += float(np.sin(x + s).sum())
            yield pd.DataFrame({"s": [s + float(len(pdf))]})

    t0 = time.time()
    spark.range(64, numPartitions=64).mapInPandas(pywork, "s double") \
         .agg(F.sum("s")).collect()
    t_py = time.time() - t0
    return {"jvm_compute_sec": round(t_jvm, 2),
            "python_compute_sec": round(t_py, 2)}


def run():
    from xagg_spark.options import set_options
    set_options(silent=True)      # keep the one-JSON-line stdout contract
    os.makedirs(CACHE, exist_ok=True)
    grid = _bench_grid()
    polys = _bench_polys()
    queries = {}
    runs = {}                      # name -> [[sec, load1m at rep end], ...]
    rows_per_sec = {}
    violations = []

    def _record(name, secs):
        queries[name] = round(min(secs), 2)

    def _violates(name):
        ref = R1_REF.get(name)
        return ref is not None and queries[name] > VIOLATION_FACTOR * ref

    # ---- headline queries FIRST: per-stage geo splits + table queries,
    # one warm local[CPUS] JVM, min-of-REPS each with the adaptive
    # self-check against round 1
    spark = _session(f"local[{CPUS}]", CPUS)
    imgs = _ensure_images(spark, grid)
    _warmup(spark)

    geo_runs = []
    while True:
        t, nrows = _geo_job(spark, grid, polys)
        geo_runs.append((t, _load1m()))
        for stage in ("decode", "weightmap", "aggregate"):
            name = f"geo_{stage}"
            runs[name] = [[round(tt[stage], 2), ld] for tt, ld in geo_runs]
            _record(name, [tt[stage] for tt, _ in geo_runs])
        if len(geo_runs) >= REPS and not any(
                _violates(f"geo_{s}") for s in ("decode", "weightmap",
                                                "aggregate")):
            break
        if len(geo_runs) >= MAX_REPS:
            break
    n_geo = nrows
    rows_per_sec["pip_join_agg"] = round(
        (n_geo["pixel_values"] + n_geo["overlap_rows"])
        / sum(queries[f"geo_{s}"] for s in ("decode", "weightmap", "aggregate")), 0)

    # geo_decode_bbox: the P2 payoff — prefilter tiles to a sub-bbox
    # BEFORE decode (the predicate gates the Arrow decode UDF; over
    # Iceberg it prunes files).  1/4 of the domain -> decode cost drops
    # with it (compare to geo_decode).
    from xagg_spark.io.tables import prefilter_images_bbox
    from xagg_spark.operators import tiles_to_pixels
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        sub = prefilter_images_bbox(imgs, grid, -40.0, -20.0, 20.0, 10.0)
        nbb = tiles_to_pixels(sub, grid).count()
        ts.append(time.time() - t0)
        runs.setdefault("geo_decode_bbox", []).append(
            [round(ts[-1], 2), _load1m()])
    _record("geo_decode_bbox", ts)
    rows_per_sec["geo_decode_bbox"] = round(nbb / max(queries["geo_decode_bbox"], 1e-3), 0)

    # kNN at 10^4 centers over the 2.88M-pixel grid (cell-ring path)
    from xagg_spark.operators.knn import knn_pixels
    from xagg_spark.operators.overlaps import pixel_geometry
    bench_pixels = pixel_geometry(spark, grid).select("pix_idx", "lat", "lon")
    centers10k = _knn_centers_10k()
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        cnt = knn_pixels(spark, bench_pixels, centers10k, k=5,
                         radius_deg=0.2).count()
        ts.append(time.time() - t0)
        runs.setdefault("knn_10k_centers", []).append(
            [round(ts[-1], 2), _load1m()])
    _record("knn_10k_centers", ts)
    rows_per_sec["knn_10k_centers"] = round(cnt / max(queries["knn_10k_centers"], 1e-3), 0)

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
        while True:
            t0 = time.time()
            cnt = fn(spark, SF_DIR).count()
            ts.append(time.time() - t0)
            runs.setdefault(name, []).append([round(ts[-1], 2), _load1m()])
            _record(name, ts)
            if len(ts) >= REPS and not _violates(name):
                break
            if len(ts) >= MAX_REPS:
                break
        rows_per_sec[name] = round(cnt / max(queries[name], 1e-3), 0)
    spark.stop()

    for name in queries:
        if _violates(name):
            violations.append({"query": name, "recorded_min": queries[name],
                               "r1": R1_REF[name],
                               "reps": len(runs.get(name, []))})

    # ---- N -> 4N scaling evidence: the SAME full-size end-to-end job
    # (decode -> overlap join -> weighted aggregate) at local[2], local[8]
    # (the N->4N pair) and local[32] (whole machine), MIN-OF-REPS per level
    # with the calibration probes re-run in the same session.  The box's
    # memory bandwidth caps highly-parallel scaling (probes scale at
    # ~0.9-1.05; byte-heavy stages do not) — BASELINE.md.
    scaling = {}
    calibration = {}
    for ncores in (2, 8, CPUS):
        spark = _session(f"local[{ncores}]", max(ncores, 8))
        imgs = _ensure_images(spark, grid)
        from xagg_spark.operators import (aggregate, pixel_overlaps,
                                          tiles_to_pixels)
        _warmup(spark)
        level_ts = []
        for _ in range(REPS):
            t0 = time.time()
            wm = pixel_overlaps(spark, grid, _bench_polys())
            pix = tiles_to_pixels(imgs, grid)
            nres = aggregate(pix, wm, dims=("var", "t")).count()
            nov = wm.overlaps.count()   # checkpointed — no recompute
            level_ts.append(time.time() - t0)
            runs.setdefault(f"scaling_local[{ncores}]", []).append(
                [round(level_ts[-1], 2), _load1m()])
            wm.unpersist()              # free checkpoint blocks (else
                                        # repeated builds accumulate
                                        # storage and degrade)
        calibration[f"local[{ncores}]"] = _calibration_probes(spark)
        npx = grid.nlat * grid.nlon * NTIME
        spark.stop()
        tsec = min(level_ts)
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

    # ---- 4x flagship: same job on the 0.025-deg grid (23M pixel values,
    # ~15M overlap rows — weightmap above the broadcast threshold, so the
    # aggregate takes the shuffle-join scale path) at the official N->4N
    # pair local[8] / local[32], min-of-REPS per level
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
        level_ts = []
        for _ in range(REPS):
            t0 = time.time()
            wm = pixel_overlaps(spark, big, _bench_polys())
            pix = tiles_to_pixels(imgs, big)
            nres = aggregate(pix, wm, dims=("var", "t")).count()
            nov = wm.n_rows
            level_ts.append(time.time() - t0)
            runs.setdefault(f"scaling4x_local[{ncores}]", []).append(
                [round(level_ts[-1], 2), _load1m()])
            wm.unpersist()
        spark.stop()
        tsec = min(level_ts)
        npx = big.nlat * big.nlon * NTIME
        scaling_4x[f"local[{ncores}]"] = {
            "sec": round(tsec, 2),
            "rows": {"pixel_values": npx, "overlap_rows": nov,
                     "result_rows": nres},
            "rows_per_sec": round((npx + nov) / tsec, 0)}
    scaling_4x["efficiency_8_to_32"] = round(
        (scaling_4x["local[8]"]["sec"] / scaling_4x[f"local[{CPUS}]"]["sec"])
        / (CPUS / 8), 3)

    # ---- per-stage 4x splits + copart + resume in their OWN fresh JVM:
    # piggybacking a just-timed session contaminates the numbers
    # (measured: decode 18-29s in-session vs 1-3s isolated — GC / async
    # block-cleanup pressure from the timed run's 15M-row weightmap blocks)
    spark = _session(f"local[{CPUS}]", 64)
    imgs = _ensure_images(spark, big, tag="_big")
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    _warmup(spark)
    geo4x_runs = []
    for _ in range(REPS):
        t, _n4 = _geo_job(spark, big, polys, tag="_big")
        geo4x_runs.append((t, _load1m()))
    for stage in ("decode", "weightmap", "aggregate"):
        name = f"geo4x_{stage}"
        runs[name] = [[round(tt[stage], 2), ld] for tt, ld in geo4x_runs]
        _record(name, [tt[stage] for tt, _ in geo4x_runs])
    # the write-time scale path: bucket fact + overlaps on pix_idx once,
    # then every aggregate joins exchange-free (measured 12s vs 22-152s
    # for the shuffle join at this size)
    import shutil as _sh
    from xagg_spark.io.tables import read_copartitioned, save_copartitioned
    wm_c = pixel_overlaps(spark, big, _bench_polys())
    pix_c = tiles_to_pixels(imgs, big)
    ts_w = []
    for _ in range(REPS):
        for tbl in ("bench4x_fact", "bench4x_overlaps"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            _sh.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
        t0 = time.time()
        save_copartitioned(pix_c, wm_c, "bench4x", n_buckets=64)
        ts_w.append(time.time() - t0)
        runs.setdefault("geo4x_copart_write", []).append(
            [round(ts_w[-1], 2), _load1m()])
    _record("geo4x_copart_write", ts_w)
    wm_c.unpersist()
    fact_c, wm_b = read_copartitioned(spark, "bench4x", polys, big, wm_c.epsg)
    ts_a = []
    for _ in range(REPS):
        t0 = time.time()
        aggregate(fact_c, wm_b, dims=("var", "t"),
                  broadcast_overlaps=False).count()
        ts_a.append(time.time() - t0)
        runs.setdefault("geo4x_agg_copart", []).append(
            [round(ts_a[-1], 2), _load1m()])
    _record("geo4x_agg_copart", ts_a)

    # resume-path validation AT 4x: kill the bucketed build after 5/12
    # buckets, resume, and verify the stitched weightmap is row- and
    # value-identical to the straight-through build — per-(poly,pixel)
    # areas are deterministic, per-polygon totals may differ in the last
    # ulp from summation order, hence the 1e-12 relative gate.  The
    # kill+resume pair is timed min-of-REPS (it was the ONE single-shot
    # number left in r3) and compared to the straight build: the r4 wave
    # commits target <= 3x (r3 shape: 18x).
    import pyspark.sql.functions as FF
    from xagg_spark.io.weightmap_io import resume_pixel_overlaps
    resume_ts = []
    for _ in range(REPS):
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
        resume_ts.append(time.time() - t0)
        runs.setdefault("geo4x_resume_build", []).append(
            [round(resume_ts[-1], 2), _load1m()])
        if len(resume_ts) < REPS:
            wm_r.unpersist()              # value check uses the last build
    queries["geo4x_resume_build"] = round(min(resume_ts), 2)
    # straight build AFTER the timed resume reps (its 15M-row checkpoint
    # blocks would otherwise pressure the timed runs), for the value check
    wm_straight = pixel_overlaps(spark, big, _bench_polys())
    a = wm_straight.overlaps.select("poly_idx", "pix_idx",
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
    # reldiff is NULL when the join is empty (the very mismatch this gate
    # exists to catch) — report null (inf would make json.dumps emit
    # non-RFC 'Infinity'), equal stays false
    reldiff = (float(stats["reldiff"])
               if stats["reldiff"] is not None else None)
    resume_check = {
        "rows_straight": int(wm_straight.n_rows),
        "rows_resumed": int(wm_r.n_rows),
        "rows_joined": int(stats["n"]),
        "buckets_recomputed_after_kill": int(n_resumed),
        "max_rel_diff": reldiff,
        "equal": bool(wm_straight.n_rows == wm_r.n_rows == stats["n"]
                      and reldiff is not None and reldiff < 1e-12),
        "overhead_vs_straight_build": round(
            queries["geo4x_resume_build"]
            / max(queries["geo4x_weightmap"], 1e-3), 2)}
    _sh.rmtree(os.path.join(CACHE, "resume4x_ck"), ignore_errors=True)
    for tbl in ("bench4x_fact", "bench4x_overlaps"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.stop()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "tiles+PIP-joined rows/sec with per-polygon aggregate; "
                  "scaling local[8]->local[32]",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "protocol": f"min-of->={REPS} everywhere (headline, scaling, 4x, "
                     f"resume), warm JVM, headline first, per-run load_avg "
                     f"recorded, self-check vs r1 at {VIOLATION_FACTOR}x "
                     f"with adaptive reps to {MAX_REPS}",
        "queries": queries,
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows_per_sec": rows_per_sec,
        "scaling": scaling,
        "calibration": calibration,
        "scaling_4x": scaling_4x,
        "resume_4x": resume_check,
        "protocol_violations": violations,
    }
    print(json.dumps(out))
    if violations:
        print(f"BENCH SELF-CHECK FAILED: {len(violations)} recorded min(s) "
              f"exceed {VIOLATION_FACTOR}x their round-1 value even after "
              f"adaptive reps: {violations} — the machine was contended or "
              "a real regression landed; do not trust the inflated entries",
              file=sys.stderr)
        sys.exit(3)


if __name__ == "__main__":
    run()
