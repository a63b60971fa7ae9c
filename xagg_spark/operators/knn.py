"""kNN join: polygon centroid -> k nearest pixel/tile centers (SURVEY J6/O3).

Not in the reference; required by BASELINE.json north_star ("kNN queries:
polygon-centroid to nearest tiles via ring expansion + secondary sort").

Distance is Euclidean in the equal-area CRS picked from the query centers'
latitude bbox by the same rule as the overlap join (J2: strictly-north ->
EPSG:6931 LAEA, strictly-south -> 6932, else 6933 CEA) — the same q/K0/QP
math as the overlap join, so the oracle can reproduce it analytically.
The scale path prunes with an expanding bbox prefilter (the cell-ring
analogue): start from a radius that would hold ~4k candidates on a uniform
grid, double until every query has >= k neighbors *whose distance is within
the verified radius* (a neighbor found inside the box is only confirmed if
closer than the nearest boundary of the searched region — the standard
ring-expansion termination rule), then window row_number with deterministic
tie-break on pix_idx.  In the polar aspects the lat/lon bbox maps exactly
to an annular sector (rho monotone in lat, lam == lon), so the verified
radius is the closed-form distance to the sector boundary: the two arcs
(|rho_c - rho_bound|) and the two radial edges (rho_c * sin(dlon)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..geo import ellipsoid as _ell


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


def knn_pixels(spark: SparkSession, pixels: DataFrame, centers: pd.DataFrame,
               k: int, radius_deg: float | None = None,
               max_radius_deg: float = 360.0,
               epsg: int | None = None) -> DataFrame:
    """pixels: (pix_idx, lat, lon).  centers: pandas (q_id, c_lat, c_lon).
    Returns (q_id, rank, pix_idx) — rank 1..k by equal-area-CRS distance,
    ties on pix_idx.  The bbox prefilter keeps the cross join bounded; it
    widens until all queries have k confirmed neighbors.  epsg defaults to
    the J2 pick from the centers' latitude bbox."""
    if epsg is None:
        epsg = _ell.pick_epsg(float(centers["c_lat"].min()),
                              float(centers["c_lat"].max()))
    cdf = F.broadcast(spark.createDataFrame(centers[["q_id", "c_lat", "c_lon"]]))
    need = {int(r.q_id) for r in centers.itertuples()}
    radius = radius_deg or 2.0
    result = None
    while True:
        j = pixels.join(
            cdf,
            (F.col("lat") >= F.col("c_lat") - radius)
            & (F.col("lat") <= F.col("c_lat") + radius)
            & (F.col("lon") >= F.col("c_lon") - radius)
            & (F.col("lon") <= F.col("c_lon") + radius))
        px, py = _proj_cols(F.col("lon"), F.col("lat"), epsg)
        cx, cy = _proj_cols(F.col("c_lon"), F.col("c_lat"), epsg)
        j = j.withColumn("dist2", (px - cx) ** 2 + (py - cy) ** 2)
        # skew-safe two-phase top-k: a domain-scale radius can put millions
        # of candidate pixels behind one q_id — never a single-partition
        # window over them (same helper as the ANN paths)
        from .similarity import _topk_skew_safe
        top = _topk_skew_safe(j, "q_id",
                              [F.asc("dist2"), F.asc("pix_idx")], k)
        # confirmation: the k-th distance must be inside the verified radius
        # (distance to the searched region's boundary), else a closer pixel
        # could lie outside
        verified_m = _min_edge_distance_m(centers, radius, epsg)
        counts = (top.groupBy("q_id")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.max("dist2").alias("maxd2")).toPandas())
        ok = True
        for r in counts.itertuples():
            lim = verified_m.get(int(r.q_id), 0.0)
            if r.n < k or np.sqrt(r.maxd2) > lim:
                ok = False
        if len(counts) < len(need):
            ok = False
        if ok or radius >= max_radius_deg:
            result = top.select("q_id", "rank", "pix_idx", F.col("dist2"))
            break
        radius *= 2.0
    return result


def _min_edge_distance_m(centers: pd.DataFrame, radius_deg: float,
                         epsg: int) -> dict:
    """Projected distance from each center to the nearest boundary of the
    lat/lon bbox actually searched — the radius within which bbox results
    are provably complete.

    CEA: the bbox maps to an axis-aligned rectangle (x linear in lon, y
    monotone in lat) — distance is the min over the four edge offsets.
    Polar LAEA: the bbox maps EXACTLY to an annular sector (rho monotone in
    lat, lam == lon), so the boundary pieces are two circular arcs (radial
    offsets |rho_c - rho_bound|) and two radial segments through the pole
    (perpendicular distance rho_c * sin(dlon), capped at rho_c for
    dlon >= 90 deg); a piece that vanishes (bbox swallows the pole / full
    lon circle) drops out of the min."""
    out = {}
    for r in centers.itertuples():
        lon, lat = float(r.c_lon), float(r.c_lat)
        if epsg == _ell.EPSG_GLOBAL:
            x, y = _ell.forward(np.array([lon]), np.array([lat]), epsg)
            xw, _ = _ell.forward(np.array([lon - radius_deg]), np.array([lat]), epsg)
            xe, _ = _ell.forward(np.array([lon + radius_deg]), np.array([lat]), epsg)
            _, ys = _ell.forward(np.array([lon]),
                                 np.array([max(lat - radius_deg, -90.0)]), epsg)
            _, yn = _ell.forward(np.array([lon]),
                                 np.array([min(lat + radius_deg, 90.0)]), epsg)
            out[int(r.q_id)] = float(min(x[0] - xw[0], xe[0] - x[0],
                                         y[0] - ys[0], yn[0] - y[0]))
            continue
        # polar aspects: rho(lat) from the same forward transform
        def _rho(la):
            xx, yy = _ell.forward(np.array([lon]), np.array([la]), epsg)
            return float(np.hypot(xx[0], yy[0]))
        rho_c = _rho(lat)
        lat_lo = max(lat - radius_deg, -90.0)
        lat_hi = min(lat + radius_deg, 90.0)
        pole_lat = 90.0 if epsg == _ell.EPSG_NORTH else -90.0
        cands = []
        for lb in (lat_lo, lat_hi):
            if lb != pole_lat:            # an arc AT the pole degenerates to
                cands.append(abs(rho_c - _rho(lb)))   # a point: if radial
        if radius_deg < 180.0:            # edges exist they end there and
            dlon = np.deg2rad(radius_deg)             # dominate; if not, the
            cands.append(rho_c * np.sin(dlon)         # pole is interior
                         if dlon < np.pi / 2 else rho_c)
        out[int(r.q_id)] = float(min(cands))
    return out
