"""Targeted optimization-round measurements (round 6).

bench.py is FROZEN for the official artifact; this file isolates individual
bench entries in fresh sessions (guide §1.4: noop-sink/count isolation, job
labels) so per-operator before/after numbers and .explain("formatted")
captures can be taken without running the whole 25-minute battery.

Usage:  python bench_extra.py <target> [reps] [--plan NAME]
Targets: geo, geo4x, median, knn1m, knn100k, copart, resume, ivf, skew,
         components, small
--plan NAME writes .explain("formatted") of the target's main query to
plans/r06/<NAME>.txt instead of (before) timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

import bench as B  # reuse the frozen harness' fixtures (grids, polys, caches)


def _session(shuffle=None, ncores=None):
    from xagg_spark.session import get_spark
    return get_spark("bench_extra", master=f"local[{ncores or CPUS}]",
                     shuffle_partitions=shuffle or (ncores or CPUS))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _dump_plan(df, name):
    os.makedirs("plans/r06", exist_ok=True)
    with open(f"plans/r06/{name}.txt", "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print(f"wrote plans/r06/{name}.txt")


def _timeit(fn, reps, label):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        ts.append(time.time() - t0)
        print(f"  {label}: {ts[-1]:.2f}s  (load {os.getloadavg()[0]:.1f})")
    print(json.dumps({label: round(min(ts), 2), "samples":
                      [round(t, 2) for t in ts]}))
    return out


def run_geo(reps, plan, big=False):
    grid = B._bench_grid_big() if big else B._bench_grid()
    tag = "_big" if big else ""
    spark = _session(shuffle=64 if big else None)
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    imgs = B._ensure_images(spark, grid, tag=tag)
    B._warmup(spark)
    polys = B._bench_polys()
    if plan:
        wm = pixel_overlaps(spark, grid, polys)
        out = aggregate(tiles_to_pixels(imgs, grid), wm, dims=("var", "t"))
        _dump_plan(out, plan)
        return
    for _ in range(reps):
        t = {}
        t0 = time.time()
        pix = tiles_to_pixels(imgs, grid)
        pix.count()
        t["decode"] = time.time() - t0
        t0 = time.time()
        wm = pixel_overlaps(spark, grid, polys, salt=0)
        wm.overlaps.count()
        t["weightmap"] = time.time() - t0
        t0 = time.time()
        aggregate(pix, wm, dims=("var", "t")).count()
        t["aggregate"] = time.time() - t0
        wm.unpersist()
        print(json.dumps({k: round(v, 2) for k, v in t.items()}),
              f"load {os.getloadavg()[0]:.1f}")


def run_median(reps, plan):
    grid = B._bench_grid()
    spark = _session()
    from xagg_spark.operators import pixel_overlaps, tiles_to_pixels
    from xagg_spark.operators.aggregate import aggregate_quantile
    imgs = B._ensure_images(spark, grid)
    B._warmup(spark)
    polys = B._bench_polys()
    wm = pixel_overlaps(spark, grid, polys)
    if plan:
        _dump_plan(aggregate_quantile(tiles_to_pixels(imgs, grid), wm,
                                      q=0.5, dims=("var", "t")), plan)
        return
    _timeit(lambda: aggregate_quantile(tiles_to_pixels(imgs, grid), wm,
                                       q=0.5, dims=("var", "t")).count(),
            reps, "geo_median")


def run_knn(reps, plan, n):
    grid = B._bench_grid()
    spark = _session()
    from xagg_spark.operators.knn import knn_pixels
    from xagg_spark.operators.overlaps import pixel_geometry
    pixels = pixel_geometry(spark, grid).select("pix_idx", "lat", "lon")
    centers = {10_000: B._knn_centers_10k, 100_000: B._knn_centers_100k,
               1_000_000: B._knn_centers_1m}[n]()
    if plan:
        _dump_plan(knn_pixels(spark, pixels, centers, k=5, radius_deg=0.2),
                   plan)
        return
    _timeit(lambda: knn_pixels(spark, pixels, centers, k=5,
                               radius_deg=0.2).count(),
            reps, f"knn_{n}_centers")


def run_copart(reps, plan):
    big = B._bench_grid_big()
    spark = _session(shuffle=64)
    import shutil as _sh

    from xagg_spark.io.tables import read_copartitioned, save_copartitioned
    from xagg_spark.operators import aggregate, pixel_overlaps, tiles_to_pixels
    imgs = B._ensure_images(spark, big, tag="_big")
    B._warmup(spark)
    polys = B._bench_polys()
    wm_c = pixel_overlaps(spark, big, polys)
    pix_c = tiles_to_pixels(imgs, big)
    ts_w = []
    for _ in range(reps):
        for tbl in ("bx_fact", "bx_overlaps"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            _sh.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
        t0 = time.time()
        save_copartitioned(pix_c, wm_c, "bx", n_buckets=64,
                           single_file_buckets=os.environ.get(
                               "BX_SINGLE_FILE", "1") == "1")
        ts_w.append(time.time() - t0)
        print(f"  copart_write: {ts_w[-1]:.2f}s (load {os.getloadavg()[0]:.1f})")
    print(json.dumps({"geo4x_copart_write": round(min(ts_w), 2)}))
    wm_c.unpersist()
    fact_c, wm_b = read_copartitioned(spark, "bx", polys, big, wm_c.epsg)
    agg = lambda: aggregate(fact_c, wm_b, dims=("var", "t"),
                            broadcast_overlaps=False)
    if plan:
        # the aggregate()'s own plan truncates at the _merge_attrs
        # checkpoint — capture the inner fact ⨝ overlaps join + numerator
        # aggregate, which is where the bucketed layout matters
        from xagg_spark.operators.aggregate import _weighted_fact_join
        import pyspark.sql.functions as FQ
        j = _weighted_fact_join(fact_c, wm_b, broadcast_overlaps=False)
        num = (j.groupBy("poly_idx", "var", "t")
                .agg(FQ.sum(FQ.col("value") * FQ.col("_w")).alias("_s")))
        _dump_plan(num, plan)
        return
    _timeit(lambda: agg().count(), reps, "geo4x_agg_copart")
    nf = len([f for f in spark.table("bx_fact").inputFiles()])
    no = len([f for f in spark.table("bx_overlaps").inputFiles()])
    print(f"files: fact={nf} overlaps={no}")


def run_resume(reps, plan):
    big = B._bench_grid_big()
    spark = _session(shuffle=64)
    import shutil as _sh

    from xagg_spark.io.weightmap_io import resume_pixel_overlaps
    from xagg_spark.operators import pixel_overlaps
    B._ensure_images(spark, big, tag="_big")
    B._warmup(spark)
    for _ in range(reps):
        ckpt = os.path.join(CACHE, "resume_extra_ck")
        _sh.rmtree(ckpt, ignore_errors=True)
        t0 = time.time()
        try:
            resume_pixel_overlaps(spark, big, B._bench_polys(), ckpt,
                                  n_buckets=12, _fail_after=5, wave_size=6)
        except RuntimeError:
            pass
        wm_r, _ = resume_pixel_overlaps(spark, big, B._bench_polys(), ckpt,
                                        n_buckets=12, wave_size=6)
        t_res = time.time() - t0
        t0 = time.time()
        wm_s = pixel_overlaps(spark, big, B._bench_polys())
        t_str = time.time() - t0
        print(json.dumps({"resume_build": round(t_res, 2),
                          "straight": round(t_str, 2),
                          "ratio": round(t_res / t_str, 2)}),
              f"load {os.getloadavg()[0]:.1f}")
        wm_r.unpersist()
        wm_s.unpersist()
        _sh.rmtree(ckpt, ignore_errors=True)


def run_ivf(reps, plan):
    spark = _session()
    from xagg_spark.operators.similarity import train_ivf_centroids
    emb = B._ensure_embeddings(spark)
    _timeit(lambda: train_ivf_centroids(emb, k=256, n_iters=3,
                                        sample_one_in=16).count(),
            reps, "ivf_train_k256")


def run_skew(reps, plan):
    grid = B._bench_grid()
    spark = _session()
    from xagg_spark.operators import pixel_overlaps
    from xagg_spark.operators.overlaps import _overlap_prep
    B._ensure_images(spark, grid)
    B._warmup(spark)
    skew_polys = B._skew_polys_bench()
    prep = _overlap_prep(spark, grid, skew_polys)
    for name, salt in (("unsalted", 0), ("salted", 4)):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            wm = pixel_overlaps(spark, grid, skew_polys, salt=salt,
                                _prep=prep)
            ts.append(time.time() - t0)
            wm.unpersist()
        print(json.dumps({f"geo_skew_{name}": round(min(ts), 2),
                          "samples": [round(t, 2) for t in ts]}))


def run_components(reps, plan):
    spark = _session()
    import pyspark.sql.functions as FQ

    from xagg_spark.operators.dedup import (connected_components,
                                            lsh_candidate_pairs,
                                            minhash_signatures)

    def q(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        keyed = docs.withColumn("text2", FQ.substring("text", 1, 24))
        sigs = minhash_signatures(keyed, "text2", "doc_id")
        return connected_components(lsh_candidate_pairs(sigs, "doc_id"),
                                    nodes=docs.select("doc_id"))

    B._warmup(spark)
    _timeit(lambda: q(spark, SF_DIR).count(), reps, "dedup_components")


def run_small(reps, plan):
    spark = _session()
    from xagg_spark.driver_queries import (q_ann_cosine_topk,
                                           q_corpus_pipeline,
                                           q_dedup_minhash_lsh, q_knn_tiles,
                                           q_simhash, q_topk_per_group,
                                           q_window_normalize)
    B._warmup(spark)
    for name, fn in [("window_normalize", q_window_normalize),
                     ("topk_per_group", q_topk_per_group),
                     ("minhash_lsh", q_dedup_minhash_lsh),
                     ("simhash", q_simhash),
                     ("ann_cosine_topk", q_ann_cosine_topk),
                     ("corpus_pipeline", q_corpus_pipeline),
                     ("knn_tiles", q_knn_tiles)]:
        _timeit(lambda fn=fn: fn(spark, SF_DIR).count(), reps, name)


TARGETS = {
    "geo": lambda r, p: run_geo(r, p, big=False),
    "geo4x": lambda r, p: run_geo(r, p, big=True),
    "median": run_median,
    "knn1m": lambda r, p: run_knn(r, p, 1_000_000),
    "knn100k": lambda r, p: run_knn(r, p, 100_000),
    "knn10k": lambda r, p: run_knn(r, p, 10_000),
    "copart": run_copart,
    "resume": run_resume,
    "ivf": run_ivf,
    "skew": run_skew,
    "components": run_components,
    "small": run_small,
}


if __name__ == "__main__":
    target = sys.argv[1]
    reps = 3
    plan = None
    args = sys.argv[2:]
    if args and args[0].isdigit():
        reps = int(args[0])
        args = args[1:]
    if len(args) >= 2 and args[0] == "--plan":
        plan = args[1]
    TARGETS[target](reps, plan)
