"""kNN join (J6): polar CRS support + ring-expansion termination.

Ground truth is an independent brute-force numpy ranking with the same
Snyder forward (geo.ellipsoid) — no bbox, no pruning — so these tests
validate that the expanding-bbox search terminates only when its results
are provably complete, including the pole-spanning sector geometry.
"""

import numpy as np
import pandas as pd
import pytest

from xagg_spark.geo import ellipsoid as _ell
from xagg_spark.grid import GridSpec
from xagg_spark.operators.knn import knn_pixels
from xagg_spark.operators.overlaps import pixel_geometry


def _brute(grid, centers, k, epsg):
    lat = np.repeat(grid.lat_axis(), grid.nlon)
    lon = np.tile(grid.lon_axis(), grid.nlat)
    pix = np.arange(grid.nlat * grid.nlon, dtype=np.int64)
    px, py = _ell.forward(lon, lat, epsg)
    rows = []
    for r in centers.itertuples():
        cx, cy = _ell.forward(np.array([r.c_lon]), np.array([r.c_lat]), epsg)
        d2 = (px - cx[0]) ** 2 + (py - cy[0]) ** 2
        order = np.lexsort((pix, d2))[:k]
        for rank, i in enumerate(order, 1):
            rows.append((int(r.q_id), rank, int(pix[i])))
    return sorted(rows)


def _run(spark, grid, centers, k, expect_epsg):
    pixels = pixel_geometry(spark, grid).select("pix_idx", "lat", "lon")
    got = knn_pixels(spark, pixels, centers, k=k)
    got = sorted((int(a), int(b), int(c)) for a, b, c in
                 got.select("q_id", "rank", "pix_idx").collect())
    assert got == _brute(grid, centers, k, expect_epsg)


def test_knn_north_polar_matches_brute_force(spark):
    grid = GridSpec(lat_edge=55.0, lon_edge=-30.0, dlat=1.0, dlon=1.0,
                    nlat=20, nlon=40, tile_h=20, tile_w=20)
    centers = pd.DataFrame({
        "q_id": np.arange(3, dtype=np.int64),
        "c_lon": [-12.25, 0.375, 7.8125],
        "c_lat": [58.125, 63.0625, 71.25],
    })
    _run(spark, grid, centers, k=7, expect_epsg=_ell.EPSG_NORTH)


def test_knn_south_polar_matches_brute_force(spark):
    grid = GridSpec(lat_edge=-75.0, lon_edge=10.0, dlat=1.0, dlon=1.0,
                    nlat=15, nlon=30, tile_h=15, tile_w=15)
    centers = pd.DataFrame({
        "q_id": np.arange(2, dtype=np.int64),
        "c_lon": [16.75, 29.0625],
        "c_lat": [-68.125, -63.4375],
    })
    _run(spark, grid, centers, k=5, expect_epsg=_ell.EPSG_SOUTH)


def test_knn_pole_spanning_bbox_terminates_correctly(spark):
    """Center near the pole: the expanding box swallows the pole, where the
    searched region's inner arc degenerates — the sector-boundary math must
    keep expanding until results are complete (nearest pixels here lie
    ACROSS the pole, outside any small lon window around the center)."""
    grid = GridSpec(lat_edge=84.0, lon_edge=-180.0, dlat=1.0, dlon=10.0,
                    nlat=6, nlon=36, tile_h=6, tile_w=36)
    centers = pd.DataFrame({"q_id": np.array([0], dtype=np.int64),
                            "c_lon": [10.0], "c_lat": [89.5]})
    _run(spark, grid, centers, k=6, expect_epsg=_ell.EPSG_NORTH)


def test_knn_global_unchanged(spark):
    """Equator-straddling centers still use the global CEA (J2 rule)."""
    grid = GridSpec(lat_edge=-10.0, lon_edge=-10.0, dlat=1.0, dlon=1.0,
                    nlat=20, nlon=20, tile_h=20, tile_w=20)
    centers = pd.DataFrame({
        "q_id": np.arange(2, dtype=np.int64),
        "c_lon": [-3.25, 4.0625],
        "c_lat": [-4.125, 6.1875],
    })
    _run(spark, grid, centers, k=4, expect_epsg=_ell.EPSG_GLOBAL)


def test_knn_k_exceeds_pixel_count(spark):
    """k larger than the whole grid: the expansion hits max_radius and
    returns every pixel, fully ranked — no infinite loop, no error."""
    grid = GridSpec(lat_edge=0.0, lon_edge=0.0, dlat=1.0, dlon=1.0,
                    nlat=3, nlon=3, tile_h=3, tile_w=3)
    centers = pd.DataFrame({"q_id": np.array([0], dtype=np.int64),
                            "c_lon": [1.3], "c_lat": [1.2]})
    pixels = pixel_geometry(spark, grid).select("pix_idx", "lat", "lon")
    got = knn_pixels(spark, pixels, centers, k=50).toPandas()
    assert len(got) == 9                          # all pixels returned
    assert sorted(got["rank"]) == list(range(1, 10))


def test_knn_polar_center_near_antimeridian(spark):
    """ADVICE r3: a polar-LAEA center near +-180 — the projected plane has
    no cut there, so the nearest pixels straddle the antimeridian and the
    wrapped lon predicate must find them (the old unwrapped bbox silently
    truncated the sector at lon=180 while the confirmation check passed)."""
    grid = GridSpec(lat_edge=60.0, lon_edge=-180.0, dlat=1.0, dlon=5.0,
                    nlat=20, nlon=72, tile_h=20, tile_w=72)
    centers = pd.DataFrame({
        "q_id": np.arange(2, dtype=np.int64),
        "c_lon": [179.25, -179.5],
        "c_lat": [70.125, 64.0625],
    })
    _run(spark, grid, centers, k=8, expect_epsg=_ell.EPSG_NORTH)


def test_knn_plan_is_cell_hash_join_not_nested_loop(spark):
    """VERDICT r3 ask #3: the candidate join must be a Broadcast HASH join
    on cell_id, never a BroadcastNestedLoopJoin over four range predicates
    (which tests every pixel against every center)."""
    from xagg_spark.operators.knn import _ring_candidates

    grid = GridSpec(lat_edge=-10.0, lon_edge=-10.0, dlat=1.0, dlon=1.0,
                    nlat=20, nlon=20, tile_h=20, tile_w=20)
    pixels = pixel_geometry(spark, grid).select("pix_idx", "lat", "lon")
    pending = pd.DataFrame({"q_id": np.array([0], dtype=np.int64),
                            "c_lon": [1.0], "c_lat": [1.0]})
    j = _ring_candidates(spark, pixels, pending, radius=2.0, res=6,
                         epsg=_ell.EPSG_GLOBAL, wrap_lon=False)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan and "cell_id" in plan


def test_knn_cea_near_antimeridian_keeps_cut_plane_semantics(spark):
    """CEA (EPSG:6933) is a cylinder CUT at +-180: x is linear in the given
    lon, so two pixels across the cut are genuinely far apart in-plane.
    The r4 wrap fix applies ONLY to the polar aspects — this pins that a
    CEA center near +-180 still ranks by the cut-plane metric (the brute
    force uses the same forward transform, so it agrees by construction,
    and the expanding search must still terminate with complete results)."""
    grid = GridSpec(lat_edge=-10.0, lon_edge=-180.0, dlat=1.0, dlon=5.0,
                    nlat=20, nlon=72, tile_h=20, tile_w=72)
    centers = pd.DataFrame({
        "q_id": np.arange(2, dtype=np.int64),
        "c_lon": [177.75, -178.5],
        "c_lat": [2.125, -3.0625],
    })
    _run(spark, grid, centers, k=6, expect_epsg=_ell.EPSG_GLOBAL)


def test_cover_rows_matches_scalar_cover_bbox():
    """The vectorized ragged ring-cover expansion must produce exactly the
    per-center cell sets of geo.cells.cover_bbox (wrap, clamping, full-
    circle dedup included) for a wide sweep of centers, radii, and
    resolutions — pure numpy, no Spark."""
    from xagg_spark.geo import cells as _c
    from xagg_spark.operators.knn import _cover_rows

    rng = np.random.default_rng(20260817)
    for trial in range(25):
        res = int(rng.integers(0, 10))
        n_c = int(rng.integers(1, 9))
        radius = float(rng.choice([0.05, 0.7, 3.0, 20.0, 95.0, 181.0, 360.0]))
        centers = pd.DataFrame({
            "q_id": np.arange(n_c, dtype=np.int64),
            "c_lon": rng.uniform(-200.0, 220.0, n_c),   # raw frames too
            "c_lat": rng.uniform(-89.9, 89.9, n_c),
        })
        got = _cover_rows(centers, radius, res)
        for r in centers.itertuples():
            want = set(_c.cover_bbox(
                float(r.c_lon) - radius, max(float(r.c_lat) - radius, -90.0),
                float(r.c_lon) + radius, min(float(r.c_lat) + radius, 90.0),
                res).tolist())
            mine = set(got[got.q_id == r.q_id].cell_id.tolist())
            assert mine == want, (trial, res, radius, r)
        # no duplicate (q, cell) pairs (a dup would double-rank a pixel)
        assert not got.duplicated(["q_id", "cell_id"]).any()


def test_knn_warns_on_under_k_and_zero_row_queries(spark):
    """ADVICE r4: a query whose rings hold no pixel by max_radius_deg is
    OMITTED from the output — that must be loud.  q0 sits on the grid
    (full k), q1 is far away with a max radius too small to reach any
    pixel (zero rows, omitted); the warning names exactly q1."""
    grid = GridSpec(lat_edge=0.0, lon_edge=0.0, dlat=1.0, dlon=1.0,
                    nlat=4, nlon=4, tile_h=4, tile_w=4)
    centers = pd.DataFrame({"q_id": np.array([0, 1], dtype=np.int64),
                            "c_lon": [1.6, 120.0], "c_lat": [1.4, 1.0]})
    pixels = pixel_geometry(spark, grid).select("pix_idx", "lat", "lon")
    with pytest.warns(UserWarning, match=r"fewer than k=3 .*q_id\(s\) \[1\]"):
        got = knn_pixels(spark, pixels, centers, k=3,
                         radius_deg=2.0, max_radius_deg=16.0).toPandas()
    assert set(got["q_id"]) == {0}                # q1 omitted, documented
    assert len(got[got.q_id == 0]) == 3


def test_knn_driver_side_scales_to_1m_centers():
    """VERDICT r4 ask #5 (driver half): at 10^6 pending centers the
    per-iteration driver work — coarsening decision, verified-radius
    computation — must stay around a second, and the mode decision must
    pick the SHUFFLE cover path: the per-center cover floors at ~4 cells,
    so no resolution fits 10^6 centers in the broadcast budget, and the
    old unbounded coarsening walked res to 0 (one global cell — a
    single-key cartesian of every pixel against every center).  Pure
    numpy; the cluster half is the bench's knn_100k_centers entry and
    test_knn_shuffle_cover_path_matches_brute_force."""
    import time

    from xagg_spark.operators.knn import (COVER_ROW_BUDGET,
                                          MAX_COARSEN_LEVELS, _cover_rows,
                                          _matched_resolution,
                                          _min_edge_distance_m,
                                          _per_center_cells,
                                          _ring_resolution)

    n = 1_000_000
    rng = np.arange(n, dtype=np.int64)
    centers = pd.DataFrame({
        "q_id": rng,
        "c_lon": -175.0 + (rng % 2000) * 0.175,
        "c_lat": -85.0 + (rng // 2000) * 0.34,
    })
    radius = 0.2
    res = _ring_resolution(radius, n)
    # coarsening is CLAMPED (no walk to res 0) ...
    assert res == _matched_resolution(radius) - MAX_COARSEN_LEVELS
    # ... and the budget is still unreachable -> knn_pixels goes shuffle
    assert n * _per_center_cells(radius, res) > COVER_ROW_BUDGET
    # at 10^5 (the bench entry) the broadcast path still applies
    res100k = _ring_resolution(radius, 100_000)
    assert 100_000 * _per_center_cells(radius, res100k) <= COVER_ROW_BUDGET
    # warm-up: the first numpy call pays one-off page-allocation costs
    # (1.5-3s cold under memory pressure) that have nothing to do with
    # the per-row scaling this test pins
    _cover_rows(centers[:1000], radius, res100k)
    _min_edge_distance_m(centers[:1000], radius, _ell.EPSG_GLOBAL)
    t0 = time.time()
    cover = _cover_rows(centers[:100_000], radius, res100k)
    t_cover = time.time() - t0
    assert len(cover) <= COVER_ROW_BUDGET
    assert cover["q_id"].nunique() == 100_000   # every center covered
    t0 = time.time()
    verified = _min_edge_distance_m(centers, radius, _ell.EPSG_GLOBAL)
    t_verified = time.time() - t0
    assert len(verified) == n
    # wall bounds separate REGIMES, not speeds: the vectorized paths run
    # ~0.1-0.3s warm; a per-row Python regression would take minutes
    assert t_cover < 10.0, t_cover
    assert t_verified < 10.0, t_verified


def test_cover_df_jvm_matches_cover_rows(spark):
    """The distributed (JVM sequence/explode) cover must produce exactly
    the same (q_id, cell_id) set as the driver-side numpy cover — both
    are float64 with the same floor/ceil/pmod formulas — including
    antimeridian-wrapping boxes and pole-clamped lats."""
    from xagg_spark.operators.knn import _cover_df_jvm, _cover_rows

    centers = pd.DataFrame({
        "q_id": np.arange(6, dtype=np.int64),
        "c_lon": [179.8, -179.9, 0.25, -38.0, 100.0, -0.125],
        "c_lat": [10.0, -5.5, 89.95, -89.9, 0.0, 45.125],
    })
    for radius, res in ((0.2, 11), (0.7, 8), (3.0, 5), (20.0, 2)):
        want = _cover_rows(centers, radius, res)
        got = _cover_df_jvm(spark, centers, radius, res, 6933).toPandas()
        w = set(zip(want.q_id.tolist(), want.cell_id.tolist()))
        g = set(zip(got.q_id.tolist(), got.cell_id.tolist()))
        assert g == w, (radius, res)
        # no duplicate (q, cell) pairs (a dup would double-rank a pixel)
        assert not got.duplicated(["q_id", "cell_id"]).any()


def test_knn_shuffle_cover_path_matches_brute_force(spark, monkeypatch):
    """End-to-end through the SHUFFLE cover path (broadcast budget forced
    to 0 so every iteration takes it): results must equal the independent
    brute-force ranking — same contract as the broadcast path."""
    from xagg_spark.operators import knn as _knn

    monkeypatch.setattr(_knn, "COVER_ROW_BUDGET", 0)
    grid = GridSpec(lat_edge=-10.0, lon_edge=-10.0, dlat=1.0, dlon=1.0,
                    nlat=20, nlon=20, tile_h=20, tile_w=20)
    centers = pd.DataFrame({
        "q_id": np.arange(3, dtype=np.int64),
        "c_lon": [1.0, -7.25, 8.5],
        "c_lat": [1.0, 6.125, -9.0],
    })
    _run(spark, grid, centers, k=7, expect_epsg=_ell.EPSG_GLOBAL)
    # and the polar wrapped-lon geometry through the same path
    pgrid = GridSpec(lat_edge=55.0, lon_edge=-30.0, dlat=1.0, dlon=1.0,
                     nlat=20, nlon=40, tile_h=20, tile_w=20)
    pcenters = pd.DataFrame({
        "q_id": np.arange(2, dtype=np.int64),
        "c_lon": [-12.25, 7.8125],
        "c_lat": [58.125, 71.25],
    })
    _run(spark, pgrid, pcenters, k=5, expect_epsg=_ell.EPSG_NORTH)


def test_knn_duplicate_q_id_rejected(spark):
    """Code-review r5: duplicate q_id used to be silently collapsed by a
    dict lookup (arbitrary termination for the duplicates) and would now
    crash the vectorized Series reindex — reject loudly instead."""
    grid = GridSpec(lat_edge=0.0, lon_edge=0.0, dlat=1.0, dlon=1.0,
                    nlat=4, nlon=4, tile_h=4, tile_w=4)
    pixels = pixel_geometry(spark, grid).select("pix_idx", "lat", "lon")
    centers = pd.DataFrame({"q_id": np.array([0, 0], dtype=np.int64),
                            "c_lon": [1.0, 2.0], "c_lat": [1.0, 2.0]})
    with pytest.raises(ValueError, match="duplicate q_id"):
        knn_pixels(spark, pixels, centers, k=2)
