"""kNN join: polygon centroid -> k nearest pixel/tile centers (SURVEY J6/O3).

Not in the reference; required by BASELINE.json north_star ("kNN queries:
polygon-centroid to nearest tiles via ring expansion + secondary sort").

Distance is Euclidean in the equal-area CRS (same q/K0 math as the overlap
join, so the oracle can reproduce it analytically).  The scale path prunes
with an expanding bbox prefilter (the cell-ring analogue): start from a
radius that would hold ~4k candidates on a uniform grid, double until every
query has >= k neighbors *whose distance is within the verified radius*
(a neighbor found inside the box is only confirmed if closer than the box
edge — the standard ring-expansion termination rule), then window row_number
with deterministic tie-break on pix_idx.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..geo import ellipsoid as _ell


def _proj_cols(lon_col, lat_col, epsg: int):
    if epsg != _ell.EPSG_GLOBAL:
        raise NotImplementedError("knn currently projects with the global CEA")
    x = F.lit(_ell.A * _ell.K0) * F.radians(lon_col)
    e = _ell.E
    e2 = _ell.E2
    s = F.sin(F.radians(lat_col))
    q = F.lit(1.0 - e2) * (s / (F.lit(1.0) - F.lit(e2) * s * s)
                           - F.lit(1.0 / (2.0 * e))
                           * F.log((F.lit(1.0) - F.lit(e) * s)
                                   / (F.lit(1.0) + F.lit(e) * s)))
    y = F.lit(_ell.A) * q / F.lit(2.0 * _ell.K0)
    return x, y


def knn_pixels(spark: SparkSession, pixels: DataFrame, centers: pd.DataFrame,
               k: int, radius_deg: float | None = None,
               max_radius_deg: float = 360.0) -> DataFrame:
    """pixels: (pix_idx, lat, lon).  centers: pandas (q_id, c_lat, c_lon).
    Returns (q_id, rank, pix_idx) — rank 1..k by CEA distance, ties on
    pix_idx.  The bbox prefilter keeps the cross join bounded; it widens
    until all queries have k confirmed neighbors."""
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
        px, py = _proj_cols(F.col("lon"), F.col("lat"), _ell.EPSG_GLOBAL)
        cx, cy = _proj_cols(F.col("c_lon"), F.col("c_lat"), _ell.EPSG_GLOBAL)
        j = j.withColumn("dist2", (px - cx) ** 2 + (py - cy) ** 2)
        w = Window.partitionBy("q_id").orderBy(F.asc("dist2"), F.asc("pix_idx"))
        top = (j.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))
        # confirmation: the k-th distance must be inside the verified radius
        # (distance to the bbox edge), else a closer pixel could lie outside
        verified_m = _min_edge_distance_m(centers, radius)
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


def _min_edge_distance_m(centers: pd.DataFrame, radius_deg: float) -> dict:
    """Projected distance from each center to its bbox's nearest edge —
    the radius within which bbox results are provably complete."""
    out = {}
    for r in centers.itertuples():
        lon, lat = float(r.c_lon), float(r.c_lat)
        x, y = _ell.forward(np.array([lon]), np.array([lat]), _ell.EPSG_GLOBAL)
        xw, _ = _ell.forward(np.array([lon - radius_deg]), np.array([lat]), _ell.EPSG_GLOBAL)
        xe, _ = _ell.forward(np.array([lon + radius_deg]), np.array([lat]), _ell.EPSG_GLOBAL)
        _, ys = _ell.forward(np.array([lon]), np.array([max(lat - radius_deg, -90.0)]), _ell.EPSG_GLOBAL)
        _, yn = _ell.forward(np.array([lon]), np.array([min(lat + radius_deg, 90.0)]), _ell.EPSG_GLOBAL)
        out[int(r.q_id)] = float(min(x[0] - xw[0], xe[0] - x[0],
                                     y[0] - ys[0], yn[0] - y[0]))
    return out
