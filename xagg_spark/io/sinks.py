"""Export layer: the reference's aggregated-result sinks, Spark-native.

Reference (/root/reference/xagg/export.py + classes.py:73-173):
  .to_dataset()/.to_netcdf()  — xarray; here: a plain dict-of-arrays
                                ("dataset dict") + parquet (no netCDF4 lib)
  .to_dataframe()/.to_csv()   — long form (our native shape)
  .to_csv() wide / .to_shp()  — wide expansion var0,var1,... with the
                                reference's 1-extra-dim limit; geometry sink
                                is GeoJSON (pure stdlib; no GDAL here)

The long DataFrame IS the engine's native output, so "export" is mostly a
driver-side reshape of an already-small per-polygon result.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class AggResult:
    """Wraps the tidy aggregate output (poly_idx, attrs..., dims..., value)
    with the reference's export surface."""

    def __init__(self, df: DataFrame, polys, dims=("var", "t"),
                 value_col: str = "value"):
        self.df = df
        self.polys = polys
        self.dims = list(dims)
        self.value_col = value_col

    # ---- long form ----
    def to_dataframe(self) -> pd.DataFrame:
        """Long pandas frame (reference .to_dataframe, export.py:278-291)."""
        return self.df.orderBy("poly_idx", *self.dims).toPandas()

    def to_csv(self, fn: str, wide: bool = True) -> None:
        if wide:
            self.to_wide().to_csv(fn, index=False)
        else:
            self.to_dataframe().to_csv(fn, index=False)

    def write_parquet(self, path: str, mode: str = "error") -> None:
        """The distributed-scale sink (primary at 100 TB)."""
        self.df.write.mode(mode).parquet(path)

    # ---- wide form ----
    def to_wide(self) -> pd.DataFrame:
        """prep_for_csv semantics (export.py:144-231): one column per
        non-location coordinate step, named var0, var1, ...; raises
        NotImplementedError for >1 extra dim per variable."""
        pdf = self.to_dataframe()
        extra = [d for d in self.dims if d != "var"]
        if "var" in self.dims:
            nd = {v: sum(pdf[pdf["var"] == v][d].nunique() > 1 for d in extra)
                  for v in pdf["var"].unique()}
        else:
            nd = {"value": sum(pdf[d].nunique() > 1 for d in extra)}
        if nd and max(nd.values()) > 1:
            raise NotImplementedError(
                "variables with more than 1 non-location dimension cannot be "
                "expanded wide; use to_dataframe() instead (reference parity: "
                "/root/reference/xagg/export.py:182-189; offending: "
                f"{ {v: n for v, n in nd.items() if n > 1} })")
        attr_cols = [c for c in pdf.columns
                     if c not in self.dims + [self.value_col]]
        out = pdf[attr_cols].drop_duplicates("poly_idx").set_index("poly_idx")
        varnames = pdf["var"].unique() if "var" in self.dims else ["value"]
        for v in varnames:
            sub = pdf[pdf["var"] == v] if "var" in self.dims else pdf
            steps = []
            for d in extra:
                u = np.sort(sub[d].unique())
                if len(u) > 1:
                    steps = list(u)
            if not steps:
                col = sub.set_index("poly_idx")[self.value_col]
                out[v] = col
            else:
                for i, s in enumerate(steps):
                    col = sub[sub[extra[-1]] == s].set_index("poly_idx")[self.value_col]
                    out[f"{v}{i}"] = col
        return out.reset_index()

    # ---- dataset dict (xarray-free .to_dataset analog) ----
    def to_dataset_dict(self) -> dict:
        """{var: ndarray(poly, *extra), 'coords': {...}} — the reference's
        .to_dataset() reshaped without xarray (export.py:71-141)."""
        pdf = self.to_dataframe()
        extra = [d for d in self.dims if d != "var"]
        polys = np.sort(pdf["poly_idx"].unique())
        coords = {"poly_idx": polys}
        for d in extra:
            coords[d] = np.sort(pdf[d].unique())
        out = {"coords": coords}
        varnames = pdf["var"].unique() if "var" in self.dims else ["value"]
        for v in varnames:
            sub = pdf[pdf["var"] == v] if "var" in self.dims else pdf
            shape = [len(polys)] + [len(coords[d]) for d in extra]
            arr = np.full(shape, np.nan)
            pidx = {p: i for i, p in enumerate(polys)}
            didx = [{c: i for i, c in enumerate(coords[d])} for d in extra]
            for r in sub.itertuples():
                loc = [pidx[r.poly_idx]] + [didx[k][getattr(r, d)]
                                            for k, d in enumerate(extra)]
                arr[tuple(loc)] = getattr(r, self.value_col)
            out[v] = arr
        return out

    # ---- true NetCDF sink ----
    def to_netcdf(self, fn: str) -> None:
        """Write a REAL .nc file (reference agg.to_netcdf,
        /root/reference/xagg/export.py:264-276 via prep_for_nc): data
        variables dimensioned (poly_idx, *extra), coordinate variables, and
        the polygon attribute fields as per-poly variables.  NetCDF3
        classic, written by the engine's own stdlib codec (io.netcdf3) —
        this environment has no netCDF4; classic files open in any NetCDF
        reader."""
        from .netcdf3 import write_netcdf3

        def _char_matrix(strings, dim_base, dims, variables, vname, vdims):
            enc = [str(s).encode() for s in strings]
            width = max(1, max((len(s) for s in enc), default=1))
            dims[f"{dim_base}_strlen"] = width
            chars = np.zeros((len(enc), width), dtype="S1")
            for i, s in enumerate(enc):
                chars[i, :len(s)] = np.frombuffer(s, dtype="S1")
            variables[vname] = (vdims + [f"{dim_base}_strlen"], chars)

        ds = self.to_dataset_dict()
        coords = ds["coords"]
        dims = {k: len(np.asarray(v)) for k, v in coords.items()}
        variables = {}
        for k, v in coords.items():
            arr = np.asarray(v)
            if arr.dtype.kind in "OU":
                _char_matrix(arr, k, dims, variables, k, [k])
            else:
                variables[k] = ([k], arr)
        extra = [d for d in self.dims if d != "var"]
        for vname, arr in ds.items():
            if vname == "coords":
                continue
            variables[vname] = (["poly_idx"] + extra, np.asarray(arr))
        # polygon attribute fields ride along (prep_for_nc keeps them)
        attrs_pdf = (self.polys.attrs.set_index("poly_idx")
                     .loc[coords["poly_idx"]])
        for c in attrs_pdf.columns:
            col = attrs_pdf[c].to_numpy()
            if c in variables:
                c_out = f"attr_{c}"
            else:
                c_out = c
            if col.dtype.kind in "OU":
                _char_matrix(col, c_out, dims, variables, c_out, ["poly_idx"])
            else:
                variables[c_out] = (["poly_idx"], col)
        write_netcdf3(fn, dims, variables,
                      global_attrs={"source": "xagg_spark aggregated"})

    # ---- geometry sink ----
    def to_geojson(self, fn: str | None = None) -> dict:
        """Wide values + polygon geometry as GeoJSON (the .to_shp analog,
        export.py:293-312 — GDAL-free)."""
        wide = self.to_wide()
        feats = []
        for r in wide.itertuples():
            pi = int(r.poly_idx)
            rings = [[[float(x), float(y)] for x, y in
                      np.vstack([ring, ring[:1]])] for ring in self.polys.rings[pi]]
            geom = ({"type": "Polygon", "coordinates": rings}
                    if len(rings) == 1 else
                    {"type": "MultiPolygon", "coordinates": [[r_] for r_ in rings]})
            props = {c: (None if isinstance(getattr(r, c), float)
                         and np.isnan(getattr(r, c)) else
                         (getattr(r, c).item()
                          if hasattr(getattr(r, c), "item") else getattr(r, c)))
                     for c in wide.columns}
            feats.append({"type": "Feature", "geometry": geom, "properties": props})
        gj = {"type": "FeatureCollection", "features": feats}
        if fn:
            with open(fn, "w") as f:
                json.dump(gj, f)
        return gj
