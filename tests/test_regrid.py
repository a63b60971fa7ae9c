"""process_weights parity with /root/reference/tests/test_core.py:30-146."""

import numpy as np
import pandas as pd
import pytest

from xagg_spark.grid import AxesGrid
from xagg_spark.operators.regrid import process_weights

DATA = AxesGrid(lat=np.array([0.0, 1.0]), lon=np.array([0.0, 1.0]))


def _as_grid(pdf, nlat=2, nlon=2):
    out = np.zeros((nlat, nlon))
    for r in pdf.itertuples():
        out[r.pix_idx // nlon, r.pix_idx % nlon] = r.weight
    return out


def test_same_grid_fast_path():
    # test_process_weights_basic (:42-62)
    w = process_weights(DATA, np.array([[0, 1], [2, 3]]),
                        np.array([0.0, 1.0]), np.array([0.0, 1.0]))
    assert np.allclose(_as_grid(w), [[0, 1], [2, 3]])


def test_close_grid_snaps():
    # test_process_weights_close_weights (:97-116): allclose coords snap
    rng = np.random.default_rng(0)
    w = process_weights(DATA, np.array([[0, 1], [2, 3]]),
                        np.array([0.0, 1.0]) + rng.random(2) * 1e-10,
                        np.array([0.0, 1.0]) + rng.random(2) * 1e-10)
    assert np.allclose(_as_grid(w), [[0, 1], [2, 3]])


def test_conservative_regrid_golden():
    # test_process_weights_regrid_weights (:66-92): double-res offset grid
    # regrids back to [[0,1],[2,3]] (atol 1e-4 in the reference)
    weights = np.array([[-0.5, 0.5, 0.5, 1.5],
                        [0.5, -0.5, 1.5, 0.5],
                        [1.5, 2.5, 2.5, 3.5],
                        [2.5, 1.5, 3.5, 2.5]])
    coords = np.array([-0.25, 0.25, 0.75, 1.25])
    w = process_weights(DATA, weights, coords, coords)
    assert np.allclose(_as_grid(w), [[0, 1], [2, 3]], atol=1e-4)


def test_coverage_warning():
    # test_process_weights_missingoverlap_warning (:122-146)
    big = AxesGrid(lat=np.arange(-5.0, 5.0), lon=np.arange(-5.0, 5.0))
    with pytest.warns(UserWarning):
        process_weights(big, np.array([[0, 1], [2, 3]]),
                        np.array([0.0, 1.0]), np.array([0.0, 1.0]))


def test_reverse_target_raises():
    # R3 parity (core.py:206-207)
    with pytest.raises(NotImplementedError):
        process_weights(DATA, np.array([[0, 1], [2, 3]]),
                        np.array([0.0, 1.0]), np.array([0.0, 1.0]),
                        target="weights")


def test_bilinear_identity_on_same_centers():
    w = process_weights(DATA, np.array([[0, 1], [2, 3]]),
                        np.array([0.0, 1.0]) + 1e-3, np.array([0.0, 1.0]) + 1e-3,
                        rgrd_alg="bilinear")
    assert np.allclose(_as_grid(w), [[0, 1], [2, 3]], atol=5e-3)


def test_nan_to_zero():
    w = process_weights(DATA, np.array([[np.nan, 1], [2, 3]]),
                        np.array([0.0, 1.0]), np.array([0.0, 1.0]))
    assert np.allclose(_as_grid(w), [[0, 1], [2, 3]])
