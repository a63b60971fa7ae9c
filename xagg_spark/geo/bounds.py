"""Grid canonicalization + pixel-bounds synthesis, pure numpy.

Mirrors the reference semantics:

- lon wrap 0:360 -> -180:180 and ascending sort
  (/root/reference/xagg/auxfuncs.py:287-309, fix_ds)
- half-spacing pixel bounds with antimeridian wrap detection, grid-break
  detection, lat clamping and antimeridian edge alignment
  (/root/reference/xagg/auxfuncs.py:315-509, get_bnds)

These run on the driver (grids are 1-D axes, tiny) and inside codegen'd
column expressions / Arrow UDFs when bounds are derived per-tile.
"""

from __future__ import annotations

import numpy as np


def wrap_lon(lon):
    """0:360 -> -180:180 (reference: (lon + 180) % 360 - 180)."""
    lon = np.asarray(lon, dtype=np.float64)
    return (lon + 180.0) % 360.0 - 180.0


def canonicalize_axis(coords, is_lon: bool):
    """Wrap (lon only, if any value >180) then sort ascending.

    Returns (sorted_coords, order) where order maps sorted position ->
    original index.  Idempotent, like fix_ds.
    """
    coords = np.asarray(coords, dtype=np.float64)
    if is_lon and coords.max() > 180.0:
        coords = wrap_lon(coords)
    order = np.argsort(coords, kind="stable")
    return coords[order], order


def synth_bounds(coords, is_lon: bool,
                 wrap_around_thresh="dynamic",
                 break_window_width: int = 3,
                 break_thresh_x: float = 2.0) -> np.ndarray:
    """Synthesize (n, 2) pixel bounds for a sorted 1-D coordinate axis.

    Exact port of the *semantics* of get_bnds
    (/root/reference/xagg/auxfuncs.py:315-509): half-spacing bounds using the
    preceding gap, antimeridian wrap detection via edge signs + threshold,
    rolling-window break detection, lon re-wrap, lat clamp, wrap alignment.
    """
    c = np.asarray(coords, dtype=np.float64)
    n = len(c)
    if n == 0:
        return np.zeros((0, 2))
    if is_lon and c.max() > 180.0:
        raise ValueError("Longitude seems to be in the 0:360 format; canonicalize first.")
    if n == 1:
        # Degenerate single-coordinate axis: reference diff() would be empty;
        # treat as 1-degree pixel (documented engine extension).
        d = np.array([1.0])
        diffs = d
        wrap_flag = False
    else:
        diffs = np.diff(c)
        if wrap_around_thresh == "dynamic":
            wat = float(np.median(diffs)) * 2.0
        else:
            wat = float(wrap_around_thresh)
        e0, e1 = c[0], c[-1]
        wrap_flag = bool(
            is_lon
            and (np.sign(e0) * np.sign(e1) == -1)
            and abs(abs(e0) - 180.0) < wat
            and abs(abs(e1) - 180.0) < wat
        )
        if wrap_flag:
            ec = np.array([e0, e1])
            ec[ec < 0] += 360.0
            first = abs(ec[1] - ec[0])
        else:
            first = diffs[0]
        diffs = np.concatenate([[first], diffs])

        # Break detection: step / mean(neighboring steps, center excluded) > thresh
        w = np.ones(break_window_width)
        w[int(np.floor(break_window_width / (break_window_width - 1)))] = 0.0
        w = w / w.sum()
        half = break_window_width // 2
        neigh = np.full(n, np.nan)
        for i in range(half, n - half):
            neigh[i] = np.dot(diffs[i - half:i + half + 1], w)
        with np.errstate(invalid="ignore"):
            breaks = (diffs / neigh) > break_thresh_x
        breaks = np.where(np.isnan(neigh), False, breaks)
        idx = np.where(breaks)[0]
        if len(idx):
            orig = diffs.copy()
            diffs[idx] = orig[idx - 1]

        # one-pixel-beyond-the-antimeridian special case
        # (/root/reference/xagg/auxfuncs.py:467-470)
        if wrap_flag and (c > 0).sum() == 1:
            ec = np.array([e0, e1])
            ec[ec < 0] += 360.0
            diffs[-1] = abs(ec[1] - ec[0])

    bnds = np.stack([c - 0.5 * diffs, c + 0.5 * diffs], axis=1)

    if is_lon:
        over = bnds > 180.0
        bnds = np.where(over, bnds - 360.0, bnds)
        under = bnds < -180.0
        bnds = np.where(under, bnds + 360.0, bnds)
    else:
        bnds = np.clip(bnds, -90.0, 90.0)

    if n > 1 and is_lon and wrap_flag:
        if bnds[0, 0] != bnds[-1, -1] and not (bnds[0, 0] == -180.0 and bnds[-1, -1] == 180.0):
            bnds[-1, -1] = bnds[0, 0]
    return bnds


def crosses_antimeridian(lon0, lon1, thresh: float = 5.0):
    """Pixel-crossing flag, reference rule (/root/reference/xagg/core.py:359-364):
    vertex lons within `thresh` of BOTH -180 and +180."""
    lon0 = np.asarray(lon0, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    near_w = (np.abs(lon0 + 180.0) < thresh) | (np.abs(lon1 + 180.0) < thresh)
    near_e = (np.abs(lon0 - 180.0) < thresh) | (np.abs(lon1 - 180.0) < thresh)
    return near_w & near_e
