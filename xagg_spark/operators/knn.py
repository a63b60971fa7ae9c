"""kNN join: polygon centroid -> k nearest pixel/tile centers (SURVEY J6/O3).

Not in the reference; required by BASELINE.json north_star ("kNN queries:
polygon-centroid to nearest tiles via ring expansion + secondary sort").

Distance is Euclidean in the equal-area CRS picked from the query centers'
latitude bbox by the same rule as the overlap join (J2: strictly-north ->
EPSG:6931 LAEA, strictly-south -> 6932, else 6933 CEA) — the same q/K0/QP
math as the overlap join, so the oracle can reproduce it analytically.

Scale path (the actual cell-index ring expansion): each iteration covers
every still-unconfirmed center's search box with equal-angle CELLS
(geo.cells — the H3 ``grid_disk`` analogue) at a radius-matched resolution,
pixels get the same cell id as a JVM column expression, and candidates come
from an equi-join on cell_id — never a nested-loop range join, so cost is
O(pixels_in_rings), not O(pixels x centers) per iteration (VERDICT r3 ask
#3: 10^6 query points no longer degrade to an all-pairs scan).  The cover
side adapts to the center count: below the broadcast budget it is built on
the driver (vectorized numpy) and shipped as a Broadcast HASH join, with at
most MAX_COARSEN_LEVELS of resolution coarsening to fit; past that (10^6+
pending centers, where no resolution fits — the per-center cover floors at
~4 cells) it is built ON THE CLUSTER with JVM sequence/explode at the
radius-matched resolution and joined on cell_id — the PIXEL side is
broadcast when it fits PIXEL_BROADCAST_MAX_ROWS (exchange-free), else a
plain shuffle join (AQE picks the strategy and splits skewed cells).
Candidates are then clipped to the exact search region and ranked with ONE
per-query top-k aggregate (sorted-array slice, map-side partials — no
candidate-set window shuffles); a query is CONFIRMED (and leaves the
loop) when its k-th distance is inside the verified radius — the distance
to the nearest boundary of the region actually searched (the standard
ring-expansion termination rule).  Unconfirmed queries double their radius.

Search-region geometry per CRS:
- EPSG:6933 (CEA): x is LINEAR in the given lon (the projection plane is a
  cylinder cut at +-180), so the lat/lon box maps to an axis-aligned
  rectangle and the box is intentionally NOT lon-wrapped — two pixels
  across the cut are genuinely far apart in-plane, exactly as the oracle's
  analytic distance computes them.
- EPSG:6931/6932 (polar LAEA): lam enters through sin/cos, so the plane has
  NO cut — the lon predicate is WRAPPED (compare |pmod(lon-c_lon+540,360)
  -180| <= radius; ADVICE r3: the unwrapped form silently truncated the
  sector at +-180 for centers near the antimeridian).  The wrapped box maps
  exactly to an annular sector (rho monotone in lat, lam == lon), so the
  verified radius is the closed-form distance to the sector boundary: two
  arcs (|rho_c - rho_bound|, dropped when the bound sits AT the pole) and
  two radial edges (rho_c * sin(dlon), capped at rho_c, dropped for
  radius >= 180 deg where the wrapped sector closes into a full annulus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..geo import cells as _cells
from ..geo import ellipsoid as _ell

# per-iteration broadcast budget: (q_id, cell_id) rows shipped to executors.
# ~24 B/row -> 1M rows ~ 24 MB, well under Spark's broadcast comfort zone;
# the resolution auto-coarsens (bigger cells, same candidates after the
# exact region filter) until the cover fits.
COVER_ROW_BUDGET = 1_000_000

# how many levels below the radius-matched resolution the broadcast path may
# coarsen before the candidate slop (cells grow 2x per axis per level while
# the exact region stays fixed) outweighs the broadcast saving.  Past this,
# knn_pixels switches to the SHUFFLE cover path: the cover is built on the
# cluster at the radius-matched resolution (JVM sequence/explode — never
# collected to the driver) and equi-joined on cell_id without a broadcast.
# Found the hard way: at 10^6 pending centers the per-center cover floors at
# ~4 cells, the budget loop walked res to 0, and the "hash join" became a
# single-key cartesian (n_pixels x n_centers rows behind one cell_id).
MAX_COARSEN_LEVELS = 3


def _proj_cols(lon_col, lat_col, epsg: int):
    """Spark-side EASE forward projection (same Snyder formulas as
    geo.ellipsoid.forward, JVM expressions — no UDF)."""
    lam = F.radians(lon_col)
    e = _ell.E
    e2 = _ell.E2
    s = F.sin(F.radians(lat_col))
    q = F.lit(1.0 - e2) * (s / (F.lit(1.0) - F.lit(e2) * s * s)
                           - F.lit(1.0 / (2.0 * e))
                           * F.log((F.lit(1.0) - F.lit(e) * s)
                                   / (F.lit(1.0) + F.lit(e) * s)))
    if epsg == _ell.EPSG_GLOBAL:
        x = F.lit(_ell.A * _ell.K0) * lam
        y = F.lit(_ell.A) * q / F.lit(2.0 * _ell.K0)
        return x, y
    if epsg == _ell.EPSG_NORTH:
        rho = F.lit(_ell.A) * F.sqrt(F.greatest(F.lit(_ell.QP) - q, F.lit(0.0)))
        return rho * F.sin(lam), -rho * F.cos(lam)
    if epsg == _ell.EPSG_SOUTH:
        rho = F.lit(_ell.A) * F.sqrt(F.greatest(F.lit(_ell.QP) + q, F.lit(0.0)))
        return rho * F.sin(lam), rho * F.cos(lam)
    raise ValueError(f"unsupported EPSG:{epsg}")


def _cell_id_col(lon_col, lat_col, res: int) -> F.Column:
    """geo.cells.cell_of as a JVM column expression — identical packing
    ((res<<58)|(ix<<29)|iy, lon wrapped, lat clamped) so driver-side covers
    and executor-side assignments meet on an equi-join key."""
    n = F.lit(1 << res)
    ix = F.floor((lon_col + F.lit(180.0)) / F.lit(360.0) * n).cast("long")
    iy = F.floor((lat_col + F.lit(90.0)) / F.lit(180.0) * n).cast("long")
    ix = ((ix % n) + n) % n
    iy = F.greatest(F.least(iy, n - F.lit(1)), F.lit(0))
    return (F.lit(res).cast("long") * F.lit(1 << 58).cast("long")
            + F.shiftleft(ix, 29) + iy)


def _matched_resolution(radius_deg: float) -> int:
    """Radius-matched resolution: ~4 cells across the search box in lon
    (~45 cells per center with lat at 2x density and boundary rounding)."""
    return int(np.clip(np.floor(np.log2(720.0 / max(radius_deg, 1e-9))),
                       0, _cells.MAX_RES))


def _per_center_cells(radius_deg: float, res: int) -> float:
    """Estimated (q_id, cell) cover rows per center at this resolution."""
    n = 1 << res
    return ((2.0 * radius_deg * n / 360.0 + 2.0)
            * (2.0 * radius_deg * n / 180.0 + 2.0))


def _ring_resolution(radius_deg: float, n_pending: int) -> int:
    """Cell resolution for the BROADCAST cover: the radius-matched
    resolution, coarsened until the whole (q_id, cell) cover fits the
    broadcast row budget — but never more than MAX_COARSEN_LEVELS below
    matched.  Candidate count is set by pixel density inside the exact
    search region, not by cell size — moderate coarsening only adds slop
    that the exact region filter removes, while unbounded coarsening
    degenerates to a few global cells and a single-key cartesian (the
    10^6-center failure).  When even the clamped resolution cannot meet
    the budget, knn_pixels uses the shuffle cover path instead."""
    res = _matched_resolution(radius_deg)
    floor_res = max(res - MAX_COARSEN_LEVELS, 0)
    while res > floor_res:
        if n_pending * _per_center_cells(radius_deg, res) <= COVER_ROW_BUDGET:
            break
        res -= 1
    return res


def _cover_rows(pending: pd.DataFrame, radius_deg: float, res: int) -> pd.DataFrame:
    """(q_id, cell_id, c_lat, c_lon) cover of every pending center's search
    box (the ring union up to this radius), FULLY VECTORIZED over centers —
    no per-center Python loop, so 10^6 pending centers cost one ragged
    numpy expansion instead of minutes of driver time.  Same semantics as
    geo.cells.cover_bbox per center: lon cell indices wrap through the
    modulus (antimeridian boxes cover cells on both sides), lat indices
    clamp to the grid."""
    n = 1 << res
    clon = pending["c_lon"].to_numpy(dtype=np.float64)
    clat = pending["c_lat"].to_numpy(dtype=np.float64)
    qid = pending["q_id"].to_numpy(dtype=np.int64)
    x0 = np.floor((clon - radius_deg + 180.0) / 360.0 * n).astype(np.int64)
    x1 = np.ceil((clon + radius_deg + 180.0) / 360.0 * n).astype(np.int64) - 1
    x1 = np.maximum(x1, x0)
    nx = x1 - x0 + 1
    full = nx >= n                    # full lon circle: cover each physical
    x0[full] = 0                      # cell exactly once (cover_bbox's
    nx[full] = n                      # np.unique equivalent)
    lat_lo = np.maximum(clat - radius_deg, -90.0)
    lat_hi = np.minimum(clat + radius_deg, 90.0)
    y0 = np.clip(np.floor((lat_lo + 90.0) / 180.0 * n).astype(np.int64),
                 0, n - 1)
    y1 = np.clip(np.ceil((lat_hi + 90.0) / 180.0 * n).astype(np.int64) - 1,
                 0, n - 1)
    ny = np.maximum(y1, y0) - y0 + 1
    cnt = nx * ny
    # ragged expansion: one row per (center, cell) without a Python loop
    rep = np.repeat(np.arange(len(qid)), cnt)
    off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    loc = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(off, cnt)
    ix = (x0[rep] + loc // ny[rep]) % n
    iy = y0[rep] + loc % ny[rep]
    return pd.DataFrame({"q_id": qid[rep],
                         "cell_id": _cells.cell_id(res, ix, iy),
                         "c_lat": clat[rep], "c_lon": clon[rep]})


def _with_proj(df: DataFrame, lon: str, lat: str, x: str, y: str,
               epsg: int) -> DataFrame:
    """Attach the EASE projection as columns ONCE per entity row.  The
    projection (sin/log per Snyder q) is the expensive part of the
    candidate pipeline; evaluating it per pixel (~10^6 rows) and per
    center instead of per candidate PAIR (~10^8 rows) removes >90% of the
    join's transcendental work (guide §2.3 — narrow/precompute before the
    fan-out).  Same JVM expressions as before, so dist2 is bit-identical."""
    px, py = _proj_cols(F.col(lon), F.col(lat), epsg)
    return df.withColumn(x, px).withColumn(y, py)


def _clip_and_dist(j: DataFrame, radius: float, wrap_lon: bool) -> DataFrame:
    """Exact search-region clip (the cell cover is a conservative
    superset; region geometry per CRS in the module docstring) + the
    projected squared distance from the PRE-COMPUTED projection columns
    (_px/_py per pixel, _cx/_cy per center) — shared by both cover
    paths."""
    if wrap_lon:
        dlon = F.abs(F.pmod(F.col("lon") - F.col("c_lon") + F.lit(540.0),
                            F.lit(360.0)) - F.lit(180.0))
    else:
        dlon = F.abs(F.col("lon") - F.col("c_lon"))
    j = j.filter((dlon <= F.lit(radius))
                 & (F.abs(F.col("lat") - F.col("c_lat")) <= F.lit(radius)))
    return (j.withColumn("dist2",
                         (F.col("_px") - F.col("_cx")) ** 2
                         + (F.col("_py") - F.col("_cy")) ** 2)
             .drop("_px", "_py", "_cx", "_cy"))


def _ring_candidates(spark: SparkSession, pixels: DataFrame,
                     pending: pd.DataFrame, radius: float, res: int,
                     epsg: int, wrap_lon: bool) -> DataFrame:
    """One expansion iteration's candidate set: Broadcast HASH join of
    pixels against the (q_id, cell_id) ring cover — never a nested-loop
    range join — then the exact region clip and distance."""
    # blocks before broadcasting: the broadcast build otherwise scans the
    # pandas-backed plan (measured ~10x slower than a block scan)
    from ..session import pandas_to_spark_blocks
    cover = F.broadcast(_with_proj(
        pandas_to_spark_blocks(spark, _cover_rows(pending, radius, res)),
        "c_lon", "c_lat", "_cx", "_cy", epsg))
    j = (_with_proj(pixels, "lon", "lat", "_px", "_py", epsg)
         .withColumn("cell_id",
                     _cell_id_col(F.col("lon"), F.col("lat"), res))
         .join(cover, "cell_id"))
    return _clip_and_dist(j, radius, wrap_lon)


def _cover_df_jvm(spark: SparkSession, pending: pd.DataFrame,
                  radius: float, res: int, epsg: int) -> DataFrame:
    """The (q_id, cell_id, c_lat, c_lon) ring cover as a DISTRIBUTED
    DataFrame: per-center cell ranges with JVM arithmetic, expanded with
    sequence/explode on the executors — the cover never materializes on
    the driver, so center counts where even the radius-matched cover
    exceeds the broadcast budget (10^6+) stay out of driver memory.
    Mirrors _cover_rows' numpy arithmetic exactly (both are float64, same
    floor/ceil/pmod formulas), property-tested for set equality in
    tests/test_knn.py."""
    n = 1 << res
    # materialize the centers as checkpointed blocks BEFORE the explode
    # pipeline consumes them: scanning the pandas-backed plan inside the
    # Generate stage measured ~10x slower than scanning materialized
    # blocks (22s vs <1s for the 10^6-center cover at bench scale) — the
    # python-sourced scan defeats whole-stage codegen for everything
    # above it.  pandas_to_spark_blocks does the conversion through a
    # native parquet roundtrip (another ~4x on the conversion itself).
    from ..session import pandas_to_spark_blocks
    c = _with_proj(pandas_to_spark_blocks(
                       spark, pending[["q_id", "c_lat", "c_lon"]]),
                   "c_lon", "c_lat", "_cx", "_cy", epsg)
    x0 = F.floor((F.col("c_lon") - F.lit(radius) + F.lit(180.0))
                 / F.lit(360.0) * F.lit(n)).cast("long")
    x1 = F.ceil((F.col("c_lon") + F.lit(radius) + F.lit(180.0))
                / F.lit(360.0) * F.lit(n)).cast("long") - F.lit(1)
    x1 = F.greatest(x1, x0)
    nx = x1 - x0 + F.lit(1)
    full = nx >= F.lit(n)              # full lon circle: each physical cell
    x0 = F.when(full, F.lit(0)).otherwise(x0)   # exactly once
    nx = F.when(full, F.lit(n)).otherwise(nx)
    lat_lo = F.greatest(F.col("c_lat") - F.lit(radius), F.lit(-90.0))
    lat_hi = F.least(F.col("c_lat") + F.lit(radius), F.lit(90.0))
    y0 = F.greatest(F.least(
        F.floor((lat_lo + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
         .cast("long"), F.lit(n - 1)), F.lit(0))
    y1 = F.greatest(F.least(
        F.ceil((lat_hi + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
         .cast("long") - F.lit(1), F.lit(n - 1)), F.lit(0))
    ny = F.greatest(y1, y0) - y0 + F.lit(1)
    c = (c.withColumn("_x0", x0).withColumn("_nx", nx)
          .withColumn("_y0", y0).withColumn("_ny", ny))
    c = c.withColumn("_lx", F.explode(F.sequence(
        F.lit(0).cast("long"), F.col("_nx") - F.lit(1))))
    c = c.withColumn("_ly", F.explode(F.sequence(
        F.lit(0).cast("long"), F.col("_ny") - F.lit(1))))
    ix = F.pmod(F.col("_x0") + F.col("_lx"), F.lit(n))
    iy = F.col("_y0") + F.col("_ly")
    cell = (F.lit(res).cast("long") * F.lit(1 << 58).cast("long")
            + F.shiftleft(ix, 29) + iy)
    return c.select("q_id", cell.alias("cell_id"), "c_lat", "c_lon",
                    "_cx", "_cy")


def _ring_candidates_shuffle(spark: SparkSession, pixels: DataFrame,
                             pending: pd.DataFrame, radius: float,
                             res: int, epsg: int,
                             wrap_lon: bool) -> DataFrame:
    """Shuffle-cover variant for center counts beyond the broadcast
    budget: the radius-matched cover is built on the cluster
    (_cover_df_jvm) and equi-joined on cell_id as a plain shuffle join
    (AQE picks the physical strategy and splits skewed cells).  Cost is
    O(pixels_in_covers) candidate rows through one shuffle — linear in
    centers and pixels, never the single-key cartesian the over-coarsened
    broadcast path degenerated to at 10^6 centers.  (Broadcasting the
    pixel side instead was measured at bench scale and lost: the ~300 MB
    hash-relation build exceeded the exchange it saved.)"""
    cover = _cover_df_jvm(spark, pending, radius, res, epsg)
    pix2 = (_with_proj(pixels, "lon", "lat", "_px", "_py", epsg)
            .withColumn("cell_id",
                        _cell_id_col(F.col("lon"), F.col("lat"), res)))
    return _clip_and_dist(pix2.join(cover, "cell_id"), radius, wrap_lon)


def _topk_struct_agg(j: DataFrame, k: int) -> DataFrame:
    """Aggregation-based per-query top-k for the kNN loop: ONE hash
    aggregate ``slice(array_sort(collect_list(struct(dist2, pix_idx))),
    1, k)`` per q_id — ascending (dist2, pix_idx), exactly row_number's
    order with ties on pix_idx.  Replaces the two-window form (r5), which
    paid TWO full shuffles + sorts of the raw candidate set (the windows
    repartition by (q_id, pid) and then q_id); here partial aggregation
    reduces map-side and only per-group arrays cross the exchange — and
    when the candidate join keeps each q_id partition-local (the
    broadcast-pixels cover path), the aggregate completes map-side
    entirely.  Per-group transient state is the group's candidate structs
    (16 B each); the sort-based aggregation fallback (>128 groups) keeps
    the input sort spillable, so a domain-radius group degrades to disk,
    not OOM.  Returns (q_id, _t: array<struct<dist2, pix_idx>> sorted,
    len <= k)."""
    s = F.struct(F.col("dist2"), F.col("pix_idx"))
    return (j.groupBy("q_id")
             .agg(F.slice(F.array_sort(F.collect_list(s)), 1, k)
                   .alias("_t")))


def knn_pixels(spark: SparkSession, pixels: DataFrame, centers: pd.DataFrame,
               k: int, radius_deg: float | None = None,
               max_radius_deg: float = 360.0,
               epsg: int | None = None,
               _force_shuffle_cover: bool = False) -> DataFrame:
    """pixels: (pix_idx, lat, lon).  centers: pandas (q_id, c_lat, c_lon).
    Returns (q_id, rank, pix_idx, dist2) — rank 1..k by equal-area-CRS
    distance, ties on pix_idx.  epsg defaults to the J2 pick from the
    centers' latitude bbox.  Queries the expansion cannot complete by
    max_radius_deg (k exceeds the pixel count) return every pixel found,
    fully ranked; a query whose rings held NO pixel at all by
    max_radius_deg is OMITTED from the output (no q_id row) — both cases
    emit a UserWarning listing the under-k q_ids, so callers joining the
    result back by q_id get a loud signal instead of silent row loss.

    Scale bounds: the candidate join is distributed at any center count
    (broadcast cover below COVER_ROW_BUDGET, cluster-built shuffle cover
    past it — measured at 10^6 centers x 2.88M pixels), but the loop's
    per-iteration bookkeeping (pending table, confirmation counts,
    verified radii) is driver-side pandas/numpy, O(n_query) memory —
    practical to ~10^7 centers.  Past that, split the centers into
    batches and union the results: every query's k-NN set is independent
    of every other query, so query-set batching is EXACT, not an
    approximation."""
    if len(centers) == 0:
        raise ValueError("knn_pixels: empty centers table")
    if centers["q_id"].duplicated().any():
        # q_id keys the whole expansion (confirmation counts, verified
        # radii, the accepted-rows semi-join): duplicates used to be
        # silently collapsed by a dict lookup, which made the duplicated
        # queries' termination arbitrary — fail loud instead
        dup = centers["q_id"][centers["q_id"].duplicated()].iloc[0]
        raise ValueError(
            f"knn_pixels: duplicate q_id values in centers (e.g. {dup}) "
            "— q_id must uniquely identify each query")
    if epsg is None:
        epsg = _ell.pick_epsg(float(centers["c_lat"].min()),
                              float(centers["c_lat"].max()))
    wrap_lon = epsg != _ell.EPSG_GLOBAL
    pending = centers[["q_id", "c_lat", "c_lon"]].copy()
    radius = radius_deg or 2.0
    chunks = []
    while len(pending):
        res = _ring_resolution(radius, len(pending))
        if not _force_shuffle_cover and (
                len(pending) * _per_center_cells(radius, res)
                <= COVER_ROW_BUDGET):
            j = _ring_candidates(spark, pixels, pending, radius, res,
                                 epsg, wrap_lon)
        else:
            # even MAX_COARSEN_LEVELS of coarsening can't fit the cover in
            # the broadcast budget (10^6+ pending centers): build the cover
            # on the cluster at the radius-MATCHED resolution and shuffle
            # — coarser cells would only multiply candidate slop here.
            # (_force_shuffle_cover pins this path at any center count —
            # oracle replays — without mutating the module budget.)
            j = _ring_candidates_shuffle(spark, pixels, pending, radius,
                                         _matched_resolution(radius),
                                         epsg, wrap_lon)
        # ONE aggregate produces the ranked top-k array per query
        # (ascending (dist2, pix_idx) — row_number's exact order); the
        # confirmation counts AND the accepted rows are cheap projections
        # of the checkpointed arrays, so the candidate join executes
        # exactly once per iteration with no window shuffles (r5 paid two
        # full candidate shuffles + sorts in the two-phase window, a
        # separate count aggregate, and a second checkpoint).
        top = _topk_struct_agg(j, k).localCheckpoint(eager=True)
        # confirmation: the k-th distance must be inside the verified radius
        # (distance to the searched region's boundary), else a closer pixel
        # could lie outside.  <= n_pending rows — loop control, not data.
        verified_m = _min_edge_distance_m(pending, radius, epsg)
        counts = top.select(
            "q_id", F.size("_t").alias("n"),
            F.element_at(F.col("_t"), -1)["dist2"].alias("maxd2")).toPandas()
        last = radius >= max_radius_deg
        # vectorized confirmation — counts can hold 10^6 rows, so no
        # per-row Python: k-th distance inside the verified radius
        cq = counts["q_id"].to_numpy(dtype=np.int64)
        ok = ((counts["n"].to_numpy() >= k)
              & (np.sqrt(counts["maxd2"].to_numpy())
                 <= verified_m.reindex(cq).to_numpy()))
        done = set(cq[ok].tolist())
        if last:                      # accept whatever exists at max radius
            pq = pending["q_id"].to_numpy(dtype=np.int64)
            done = set(pq.tolist())
            # queries whose expansion found FEWER than k pixels by
            # max_radius_deg (possibly zero — those q_ids are then absent
            # from the output entirely): loud, not silent row loss
            # (ADVICE r4) — callers joining back by q_id must handle it
            got = pd.Series(counts["n"].to_numpy(), index=cq)
            short = sorted(pq[got.reindex(pq).fillna(0).to_numpy()
                              < k].tolist())
            if short:
                import warnings
                warnings.warn(
                    f"knn_pixels: {len(short)} quer{'y' if len(short) == 1 else 'ies'} "
                    f"returned fewer than k={k} rows at max_radius_deg="
                    f"{max_radius_deg} (zero-row q_ids are omitted from the "
                    f"output): q_id(s) {short[:20]}"
                    + (" ..." if len(short) > 20 else ""))
        if done:
            if len(done) == len(pending):
                # done is always a subset of pending, so equal sizes mean
                # EVERY pending query confirmed (the common single-
                # iteration case) and top's q_ids are all in done: the
                # semi-join would be an identity — skip it and its
                # 10^6-row broadcast build
                sel = top
            else:
                ids = spark.createDataFrame(
                    pd.DataFrame({"q_id": np.array(sorted(done),
                                               dtype=np.int64)})
                ).localCheckpoint(eager=True)
                sel = top.join(F.broadcast(ids), "q_id", "semi")
            # accepted rows stay a cheap VIEW over the checkpointed top-k
            # arrays (<= k structs per query) — the checkpoint IS the
            # output's backing store, no second materialization
            chunks.append(
                sel.select("q_id", F.posexplode("_t").alias("_p", "_s"))
                   .select("q_id",
                           (F.col("_p") + 1).cast("int").alias("rank"),
                           F.col("_s")["pix_idx"].alias("pix_idx"),
                           F.col("_s")["dist2"].alias("dist2")))
        pending = pending[~pending["q_id"].astype(int).isin(done)]
        radius *= 2.0
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionByName(c)
    return out


def _min_edge_distance_m(centers: pd.DataFrame, radius_deg: float,
                         epsg: int) -> pd.Series:
    """Projected distance from each center to the nearest boundary of the
    search region actually covered at this radius — the radius within which
    results are provably complete, as a pd.Series indexed by q_id.  A
    boundary piece that vanishes (lat bound clamped at a pole, full wrapped
    lon circle) has no pixels beyond it and drops out of the min; a region
    with no remaining boundary is the whole plane -> +inf (always
    confirmed).  Vectorized over centers — three batched forward() calls
    total, no per-center Python loop."""
    qid = centers["q_id"].to_numpy(dtype=np.int64)
    lon = centers["c_lon"].to_numpy(dtype=np.float64)
    lat = centers["c_lat"].to_numpy(dtype=np.float64)
    lat_lo = np.maximum(lat - radius_deg, -90.0)
    lat_hi = np.minimum(lat + radius_deg, 90.0)
    inf = np.full(len(qid), np.inf)
    if epsg == _ell.EPSG_GLOBAL:
        # x = A*K0*lam is linear in the given (uncut) lon, so both lon
        # edges sit at exactly A*K0*radians(radius); the region is not
        # lon-wrapped (module docstring), and past 360 deg it spans
        # every representable lon.  y depends only on lat.
        _, y_c = _ell.forward(lon, lat, epsg)
        _, y_lo = _ell.forward(lon, lat_lo, epsg)
        _, y_hi = _ell.forward(lon, lat_hi, epsg)
        e_lon = (np.full(len(qid), _ell.A * float(_ell.K0)
                         * np.deg2rad(radius_deg))
                 if radius_deg < 360.0 else inf)
        e_s = np.where(lat - radius_deg > -90.0, y_c - y_lo, np.inf)
        e_n = np.where(lat + radius_deg < 90.0, y_hi - y_c, np.inf)
        dist = np.minimum(np.minimum(e_lon, e_s), e_n)
    else:
        def _rho(la):
            xx, yy = _ell.forward(lon, la, epsg)
            return np.hypot(xx, yy)

        rho_c = _rho(lat)
        pole_lat = 90.0 if epsg == _ell.EPSG_NORTH else -90.0
        # an arc AT the pole degenerates to a point and drops out
        arc_lo = np.where(lat_lo != pole_lat, np.abs(rho_c - _rho(lat_lo)),
                          np.inf)
        arc_hi = np.where(lat_hi != pole_lat, np.abs(rho_c - _rho(lat_hi)),
                          np.inf)
        if radius_deg < 180.0:      # wrapped sector below 180 deg has two
            dlon = np.deg2rad(radius_deg)   # radial edges; at/past 180 it
            radial = (rho_c * np.sin(dlon)  # closes into a full annulus
                      if dlon < np.pi / 2 else rho_c)
        else:
            radial = inf
        dist = np.minimum(np.minimum(arc_lo, arc_hi), radial)
    return pd.Series(dist, index=qid)
