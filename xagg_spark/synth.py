"""Deterministic synthetic image+caption table (input_hint schema).

Schema: (image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long) — BASELINE.json input_hint.  All content is a
pure function of (grid, var, t, ty, tx): no RNG state crosses rows, so
generation is embarrassingly parallel and identical at any parallelism.

Pixel value function (kept SQL-expressible so the DuckDB oracle can recompute
it analytically without decoding):

    v(ix, iy, t, var_salt) = ((ix*7 + iy*13 + t*31 + var_salt*17) % 97) + 1
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .codecs import encode_tile, phash64
from .grid import GridSpec

VALUE_MOD = 97


def value_fn(ix, iy, t: int, var_salt: int = 0):
    """Deterministic pixel value; exact in float32 (integers < 2^24)."""
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    return ((ix * 7 + iy * 13 + t * 31 + var_salt * 17) % VALUE_MOD + 1).astype(np.float32)


def value_sql(ix_expr: str, iy_expr: str, t_expr: str, var_salt: int = 0) -> str:
    """The same function as ANSI SQL (used by oracle_sql)."""
    return (f"(CAST((({ix_expr})*7 + ({iy_expr})*13 + ({t_expr})*31 + {var_salt}*17) % {VALUE_MOD} "
            f"AS DOUBLE) + 1.0)")


def image_id(var: str, t: int, ty: int, tx: int) -> str:
    return f"tile_{var}_{t:04d}_{ty:05d}_{tx:05d}"


def caption_for(var: str, t: int, ty: int, tx: int, grid: GridSpec) -> str:
    return (f"{var} tile ({ty},{tx}) at t={t} of a {grid.nlat}x{grid.nlon} grid, "
            f"origin ({grid.lat_edge},{grid.lon_edge}), step ({grid.dlat},{grid.dlon})")


def make_tile_array(grid: GridSpec, var_salt: int, t: int, ty: int, tx: int) -> np.ndarray:
    iy, ix = grid.tile_pixel_indices(ty, tx)
    return value_fn(ix, iy, t, var_salt)


def generate_rows(grid: GridSpec, variables=("test",), ntime: int = 1,
                  fmt: str = "raw32", with_phash: bool = True):
    """Yield image-table rows; deterministic order (var, t, ty, tx)."""
    for vi, var in enumerate(variables):
        for t in range(ntime):
            for ty in range(grid.ntiles_y):
                for tx in range(grid.ntiles_x):
                    arr = make_tile_array(grid, vi, t, ty, tx)
                    h, w = arr.shape
                    yield {
                        "image_id": image_id(var, t, ty, tx),
                        "bytes": encode_tile(arr, fmt),
                        "w": int(w),
                        "h": int(h),
                        "fmt": fmt,
                        "caption": caption_for(var, t, ty, tx, grid),
                        "phash": phash64(arr) if with_phash else 0,
                    }


def generate_pandas(grid: GridSpec, variables=("test",), ntime: int = 1,
                    fmt: str = "raw32") -> pd.DataFrame:
    return pd.DataFrame(list(generate_rows(grid, variables, ntime, fmt)))


def generate_spark(spark, grid: GridSpec, variables=("test",), ntime: int = 1,
                   fmt: str = "raw32", num_partitions: int | None = None):
    """Distributed generation: spark.range over (var,t,ty,tx) index space,
    encode inside mapInPandas — scales to any tile count."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    nv, nt, nty, ntx = len(variables), ntime, grid.ntiles_y, grid.ntiles_x
    total = nv * nt * nty * ntx
    schema = StructType([
        StructField("image_id", StringType()), StructField("bytes", BinaryType()),
        StructField("w", IntegerType()), StructField("h", IntegerType()),
        StructField("fmt", StringType()), StructField("caption", StringType()),
        StructField("phash", LongType()),
    ])
    gd, vars_t = grid.to_dict(), tuple(variables)

    def gen(batches):
        g = GridSpec.from_dict(gd)
        for pdf in batches:
            rows = []
            for k in pdf["id"].to_numpy():
                tx = int(k % ntx); k //= ntx
                ty = int(k % nty); k //= nty
                t = int(k % nt); vi = int(k // nt)
                arr = make_tile_array(g, vi, t, ty, tx)
                h, w = arr.shape
                rows.append((image_id(vars_t[vi], t, ty, tx),
                             encode_tile(arr, fmt), w, h, fmt,
                             caption_for(vars_t[vi], t, ty, tx, g),
                             phash64(arr)))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                              "fmt", "caption", "phash"])

    rng = spark.range(total, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema)
