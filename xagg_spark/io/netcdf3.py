"""Minimal NetCDF-3 "classic" (CDF-1) writer + reader, pure stdlib.

Implements the on-disk format from the public NetCDF classic-format spec
(https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html):
big-endian header (magic 'CDF\\x01', numrecs, dim/gatt/var lists) followed by
4-byte-aligned fixed-size variable data.  No external libs — this container
has neither netCDF4 nor scipy, but the reference's first export call is
``agg.to_netcdf()`` (/root/reference/xagg/export.py:264-276) and its
weightmap directory stores the source grid as per-axis .nc files
(/root/reference/xagg/core.py:30-98), so the engine ships its own codec.

Writer: fixed-size dims only (numrecs=0) — everything the engine exports is
rectangular.  Reader: fixed-size and record variables of the classic types.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"CDF\x01"
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

# nc_type -> (numpy dtype, size)
_TYPES = {1: ("i1", 1), 2: ("S1", 1), 3: (">i2", 2), 4: (">i4", 4),
          5: (">f4", 4), 6: (">f8", 8)}
_REV = {"int8": 1, "|S1": 2, "int16": 3, "int32": 4,
        "float32": 5, "float64": 6}


def _coerce(arr: np.ndarray) -> np.ndarray:
    """Map to a classic-representable dtype (int64 has no classic type)."""
    arr = np.asarray(arr)
    if arr.dtype.kind in "iu" and arr.dtype.itemsize > 4:
        if arr.size == 0 or (arr.min() >= -2**31 and arr.max() < 2**31):
            return arr.astype(np.int32)
        return arr.astype(np.float64)
    if arr.dtype.kind == "u":
        return arr.astype(np.int32)
    if arr.dtype.kind == "b":
        return arr.astype(np.int8)
    if arr.dtype.kind in "if" or arr.dtype.char == "S":
        return arr
    raise TypeError(f"cannot store dtype {arr.dtype} in NetCDF3 classic")


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + _pad4(b)


def _att_value(v) -> bytes:
    if isinstance(v, str):
        b = v.encode()
        return struct.pack(">ii", 2, len(b)) + _pad4(b)
    arr = _coerce(np.atleast_1d(v))
    t = _REV[str(arr.dtype)] if str(arr.dtype) in _REV else _REV[arr.dtype.name]
    dt, sz = _TYPES[t]
    return (struct.pack(">ii", t, arr.size)
            + _pad4(arr.astype(dt).tobytes()))


def _att_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        out += _name(k) + _att_value(v)
    return out


def write_netcdf3(path: str, dims: dict, variables: dict,
                  global_attrs: dict | None = None) -> None:
    """dims: {name: size}.  variables: {name: (dim_names, array[, attrs])}.
    Arrays must match the dim sizes; int64 is narrowed to int32/float64."""
    dim_names = list(dims)
    dim_ids = {d: i for i, d in enumerate(dim_names)}

    pv = {}
    for vname, spec in variables.items():
        vdims, arr = spec[0], _coerce(spec[1])
        vattrs = spec[2] if len(spec) > 2 else {}
        shape = tuple(dims[d] for d in vdims)
        arr = np.asarray(arr).reshape(shape)
        t = _REV[arr.dtype.name if arr.dtype.char != "S" else "|S1"]
        pv[vname] = (list(vdims), arr, vattrs, t)

    header = _MAGIC + struct.pack(">i", 0)          # numrecs = 0
    if dims:
        header += struct.pack(">ii", _NC_DIMENSION, len(dim_names))
        for d in dim_names:
            header += _name(d) + struct.pack(">i", dims[d])
    else:
        header += struct.pack(">ii", 0, 0)
    header += _att_list(global_attrs or {})

    # var list: compute sizes first, then begins after the full header
    var_meta = []
    for vname, (vdims, arr, vattrs, t) in pv.items():
        dt, sz = _TYPES[t]
        vsize = len(_pad4(b"\x00" * (arr.size * sz)))
        meta = (_name(vname) + struct.pack(">i", len(vdims))
                + b"".join(struct.pack(">i", dim_ids[d]) for d in vdims)
                + _att_list(vattrs) + struct.pack(">ii", t, vsize))
        var_meta.append((vname, meta, vsize, arr, dt))

    fixed = sum(len(m) + 4 for _, m, _, _, _ in var_meta)  # +4 per begin
    body_header = struct.pack(">ii", _NC_VARIABLE if var_meta else 0,
                              len(var_meta))
    out = [header, body_header]
    begin = len(header) + len(body_header) + fixed
    for vname, meta, vsize, arr, dt in var_meta:
        out.append(meta + struct.pack(">i", begin))
        begin += vsize
    for vname, meta, vsize, arr, dt in var_meta:
        out.append(_pad4(arr.astype(dt).tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(out))


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def i4(self):
        v = struct.unpack_from(">i", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def name(self):
        n = self.i4()
        s = self.buf[self.pos:self.pos + n].decode()
        self.pos += n + (-n % 4)
        return s

    def att_value(self):
        t, n = self.i4(), self.i4()
        dt, sz = _TYPES[t]
        raw = self.buf[self.pos:self.pos + n * sz]
        self.pos += n * sz + (-(n * sz) % 4)
        if t == 2:
            return raw.decode(errors="replace")
        return np.frombuffer(raw, dtype=dt).copy()

    def att_list(self):
        tag, n = self.i4(), self.i4()
        return {self.name(): self.att_value() for _ in range(n)}


def read_netcdf3(path: str):
    """Returns (dims: {name: size}, variables: {name: (dim_names, array,
    attrs)}, global_attrs).  Record variables are materialized."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path} is not a NetCDF3 classic file "
                         f"(magic {buf[:4]!r}; NetCDF4/HDF5 needs h5py)")
    off64 = buf[3] == 2
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.i4()
    tag, n = r.i4(), r.i4()
    dim_names, dim_sizes = [], []
    for _ in range(n if tag == _NC_DIMENSION else 0):
        dim_names.append(r.name())
        dim_sizes.append(r.i4())
    gatts = r.att_list()
    tag, n = r.i4(), r.i4()
    vars_meta = []
    for _ in range(n if tag == _NC_VARIABLE else 0):
        vname = r.name()
        nd = r.i4()
        vdims = [r.i4() for _ in range(nd)]
        vattrs = r.att_list()
        t, vsize = r.i4(), r.i4()
        begin = struct.unpack_from(">q" if off64 else ">i", buf, r.pos)[0]
        r.pos += 8 if off64 else 4
        vars_meta.append((vname, vdims, vattrs, t, vsize, begin))

    variables = {}
    for vname, vdims, vattrs, t, vsize, begin in vars_meta:
        dt, sz = _TYPES[t]
        names = [dim_names[d] for d in vdims]
        shape = [dim_sizes[d] for d in vdims]
        is_rec = bool(vdims) and dim_sizes[vdims[0]] == 0
        if not is_rec:
            cnt = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(buf, dtype=dt, count=cnt, offset=begin).copy()
            arr = arr.reshape(shape) if shape else arr[0]
        else:
            # record variable: numrecs slabs, interleaved across rec vars
            slab = int(np.prod(shape[1:])) if len(shape) > 1 else 1
            recsize = sum(_recsize(v2, dim_sizes) for v2 in vars_meta
                          if v2[1] and dim_sizes[v2[1][0]] == 0)
            parts = [np.frombuffer(buf, dtype=dt, count=slab,
                                   offset=begin + i * recsize)
                     for i in range(numrecs)]
            arr = np.stack(parts).reshape([numrecs] + shape[1:])
            shape[0] = numrecs
        variables[vname] = (names, arr, vattrs)
    dims = dict(zip(dim_names, [s if s else numrecs for s in dim_sizes]))
    return dims, variables, gatts


def _recsize(v, dim_sizes):
    """Bytes one record of a record variable occupies (its stored vsize)."""
    return v[4]
