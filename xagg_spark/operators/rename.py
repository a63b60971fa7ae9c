"""Column-name canonicalization for pixel DataFrames (reference fix_ds
rename cipher, /root/reference/xagg/auxfuncs.py:201-283).

The reference renames xarray dims (latitude/Latitude/Lat/latitude_1/
nav_lat/Y/y + lon counterparts) to lat/lon, including *_bnds variables with
an 'o'/'a' substring heuristic fallback.  Spark form: rename DataFrame
columns the same way."""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

VAR_CIPHER = {
    "latitude": {"latitude": "lat", "longitude": "lon"},
    "Latitude": {"Latitude": "lat", "Longitude": "lon"},
    "Lat": {"Lat": "lat", "Lon": "lon"},
    "latitude_1": {"latitude_1": "lat", "longitude_1": "lon"},
    "nav_lat": {"nav_lat": "lat", "nav_lon": "lon"},
    "Y": {"Y": "lat", "X": "lon"},
    "y": {"y": "lat", "x": "lon"},
}


def rename_latlon(df: DataFrame, chg_bnds: bool = True) -> DataFrame:
    """Rename lat/lon (+bounds) columns to canonical names.  Raises
    NameError when no recognizable pair exists (reference auxfuncs.py:262)."""
    cols = set(df.columns)
    if "lat" in cols and "lon" in cols:
        return df
    hits = [k for k in VAR_CIPHER if k in cols]
    if not hits:
        raise NameError("No valid lat/lon variables found in the dataset.")
    mapping = dict(VAR_CIPHER[hits[0]])
    if chg_bnds:
        bnd_cols = [c for c in cols if "bnds" in c and "time" not in c]
        for src, dst in list(mapping.items()):
            if f"{src}_bnds" in bnd_cols:
                mapping[f"{src}_bnds"] = f"{dst}_bnds"
        missing = [c for c in bnd_cols if c not in mapping]
        if missing:
            lon_guess = [c for c in missing if "o" in c.replace("_bnds", "")]
            lat_guess = [c for c in missing if "a" in c.replace("_bnds", "")
                         and c not in lon_guess]
            if lon_guess and lat_guess:
                warnings.warn(
                    f"Assuming {lon_guess[0]} is longitude bounds and "
                    f"{lat_guess[0]} is latitude bounds.")
                mapping[lon_guess[0]] = "lon_bnds"
                mapping[lat_guess[0]] = "lat_bnds"
            elif missing:
                warnings.warn(
                    "Could not identify which of the following bounds "
                    "variables corresponds to lat/lon grid: "
                    + ", ".join(missing) + "; no bound variables renamed.")
    out = df
    for src, dst in mapping.items():
        if src in cols:
            out = out.withColumnRenamed(src, dst)
    return out
