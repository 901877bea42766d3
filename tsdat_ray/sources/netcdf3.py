"""NetCDF classic (CDF-1 / CDF-2) reader + writer in pure numpy.

The reference's ``NetCDFReader`` (/root/reference/tsdat/io/readers/
netcdf_reader.py:8-18) and ``NetCDFWriter`` load/save via xarray+netCDF4,
which aren't in this container.  The classic NetCDF format, however, is a
small public specification (the NetCDF Classic Format Specification,
Unidata; also Appendix B of the NetCDF User's Guide), so the engine
implements it directly:

* big-endian header: magic ``CDF\\x01``/``CDF\\x02``, numrecs, dim list,
  global attributes, variable list (name, dimids, attributes, nc_type,
  vsize, begin offset — int64 begins for CDF-2)
* fixed variables stored contiguously at ``begin``; record variables
  interleaved per record, each slab padded to 4 bytes
* types NC_BYTE/CHAR/SHORT/INT/FLOAT/DOUBLE

Scope: everything a classic file can hold.  NetCDF-4 (HDF5-backed) files
are NOT parseable without h5py and raise a clear error on their magic.

``read_netcdf3_table`` flattens to the engine's long/tall layout: 1-D
variables over the unlimited (record) dimension become columns; 2-D
(record × d2) variables expand to one row per (record, d2) cell, matching
the twod module's encoding.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

_TYPES = {
    1: np.dtype(">i1"),  # NC_BYTE
    2: np.dtype("S1"),   # NC_CHAR
    3: np.dtype(">i2"),  # NC_SHORT
    4: np.dtype(">i4"),  # NC_INT
    5: np.dtype(">f4"),  # NC_FLOAT
    6: np.dtype(">f8"),  # NC_DOUBLE
}
_REV_TYPES = {np.dtype("int8"): 1, np.dtype("S1"): 2, np.dtype("int16"): 3,
              np.dtype("int32"): 4, np.dtype("float32"): 5, np.dtype("float64"): 6}
_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.buf[self.pos: self.pos + n].decode("utf-8")
        self.pos += (n + 3) // 4 * 4  # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, n: int):
        size = _SIZES[nc_type]
        raw = self.buf[self.pos: self.pos + size * n]
        self.pos += (size * n + 3) // 4 * 4
        if nc_type == 2:
            return raw.decode("utf-8", "replace")
        return np.frombuffer(raw, dtype=_TYPES[nc_type], count=n)

    def attrs(self) -> dict:
        tag = self.i4()
        count = self.i4()
        assert tag in (_NC_ATTRIBUTE, 0), f"bad attr tag {tag}"
        out = {}
        for _ in range(count):
            nm = self.name()
            t = self.i4()
            n = self.i4()
            v = self.values(t, n)
            if isinstance(v, np.ndarray):
                v = v.tolist() if n > 1 else v[0].item()
            out[nm] = v
        return out


def parse_netcdf3(buf: bytes) -> dict:
    """Parse a classic NetCDF byte buffer → {dims, attrs, vars} where each
    var is {dims, attrs, data (numpy, native endian)}."""
    if buf[:4] == b"\x89HDF":
        # NetCDF-4/HDF5 (the reference's own test fixture is this format):
        # the pure-python HDF5-subset reader returns the identical dict
        # shape, so downstream (read_netcdf3_table, VAP ingest) is shared.
        from .hdf5 import parse_hdf5

        return parse_hdf5(buf)
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF classic file (bad magic)")
    version = buf[3]
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.i4()
    # dimensions
    tag = r.i4()
    ndims = r.i4()
    assert tag in (_NC_DIMENSION, 0)
    dims: list[tuple[str, int]] = []
    rec_dim = -1
    for i in range(ndims):
        nm = r.name()
        sz = r.i4()
        if sz == 0:
            rec_dim = i
        dims.append((nm, sz))
    gattrs = r.attrs()
    tag = r.i4()
    nvars = r.i4()
    assert tag in (_NC_VARIABLE, 0)
    headers = []
    for _ in range(nvars):
        nm = r.name()
        nd = r.i4()
        dimids = [r.i4() for _ in range(nd)]
        vattrs = r.attrs()
        t = r.i4()
        vsize = r.i4()
        begin = r.i8() if version == 2 else r.i4()
        headers.append((nm, dimids, vattrs, t, vsize, begin))

    # record size = sum of padded record-var slab sizes (spec: vsize already
    # includes padding; single record var is special-cased as unpadded)
    rec_vars = [h for h in headers if rec_dim in h[1][:1]]
    recsize = sum(h[4] for h in rec_vars)
    if len(rec_vars) == 1:
        h = rec_vars[0]
        shape1 = [dims[d][1] for d in h[1][1:]]
        recsize = int(np.prod(shape1, dtype=np.int64)) * _SIZES[h[3]]

    out_vars = {}
    for nm, dimids, vattrs, t, vsize, begin in headers:
        dt = _TYPES[t]
        shape = [dims[d][1] for d in dimids]
        if dimids and dimids[0] == rec_dim:
            shape[0] = numrecs
            per_rec = int(np.prod(shape[1:], dtype=np.int64))
            arr = np.empty(shape, dtype=dt)
            slab = per_rec * _SIZES[t]
            for rec in range(numrecs):
                off = begin + rec * recsize
                arr[rec] = np.frombuffer(buf, dtype=dt, count=per_rec, offset=off).reshape(shape[1:])
        else:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(buf, dtype=dt, count=n, offset=begin).reshape(shape)
        if dt == np.dtype("S1"):
            data = arr
        else:
            data = arr.astype(dt.newbyteorder("="))
        out_vars[nm] = {"dims": [dims[d][0] for d in dimids], "attrs": vattrs, "data": data}
    return {"dims": dict(dims) | ({dims[rec_dim][0]: numrecs} if rec_dim >= 0 else {}),
            "attrs": gattrs, "vars": out_vars}


def _decode_time(var: dict) -> np.ndarray | None:
    """CF 'units: <u> since <epoch>' decode → datetime64[us] (parity with
    the reference's decode_cf usage, utils/decode_cf.py:5)."""
    units = str(var["attrs"].get("units", ""))
    if " since " not in units:
        return None
    u, _, epoch = units.partition(" since ")
    per = {"seconds": 1_000_000, "minutes": 60_000_000, "hours": 3_600_000_000,
           "days": 86_400_000_000, "milliseconds": 1_000, "microseconds": 1}.get(u.strip())
    if per is None:
        return None
    base = np.datetime64(epoch.strip().replace(" ", "T").rstrip("Z"), "us")
    vals = np.asarray(var["data"], dtype=np.float64)
    return base + (vals * per).astype("timedelta64[us]")


def read_netcdf3_table(buf: bytes, record_dim: str | None = None) -> pa.Table:
    """Classic NetCDF bytes → long/tall Arrow table.

    1-D record variables become columns; 2-D (record × d2) variables expand
    to one row per cell with the second coordinate in a ``<dim>`` column
    (the twod module's layout).  CF time units decode to timestamp[us];
    global attrs land in the schema metadata."""
    nc = parse_netcdf3(buf)
    rec = record_dim
    if rec is None:
        rec = next((n for n, v in nc["vars"].items() if v["dims"] == [n]), None)
        rec = rec or (list(nc["dims"])[0] if nc["dims"] else None)
    if rec is None:
        raise ValueError("no record/coordinate dimension found")
    nrec = nc["dims"][rec]
    d2_names = [d for d in nc["dims"] if d != rec]
    two_d = {n: v for n, v in nc["vars"].items()
             if len(v["dims"]) == 2 and v["dims"][0] == rec}
    d2 = two_d and next(iter(two_d.values()))["dims"][1] or None
    n_d2 = nc["dims"][d2] if d2 else 1

    cols: dict = {}
    for n, v in nc["vars"].items():
        t = _decode_time(v)
        data = t if t is not None else v["data"]
        if v["dims"] == [rec]:
            cols[n] = np.repeat(data, n_d2) if d2 else data
        elif d2 and v["dims"] == [d2]:
            cols[n] = np.tile(data, nrec)
        elif d2 and n in two_d:
            cols[n] = data.reshape(nrec * n_d2)
    tbl = pa.table({k: pa.array(v) for k, v in cols.items()})
    md = {str(k).encode(): str(v).encode() for k, v in nc["attrs"].items()}
    return tbl.replace_schema_metadata(md)


# --------------------------------------------------------------------------- #
# writer (classic CDF-2: 64-bit offsets)
# --------------------------------------------------------------------------- #

def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _w_name(s: str) -> bytes:
    e = s.encode()
    return struct.pack(">i", len(e)) + _pad4(e)


def _w_attrs(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = [struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))]
    for k, v in attrs.items():
        out.append(_w_name(str(k)))
        if isinstance(v, str):
            e = v.encode()
            out.append(struct.pack(">ii", 2, len(e)) + _pad4(e))
        else:
            arr = np.atleast_1d(np.asarray(v))
            if arr.dtype.kind == "f":
                arr = arr.astype(">f8")
                t = 6
            else:
                arr = arr.astype(">i4")
                t = 4
            out.append(struct.pack(">ii", t, len(arr)) + _pad4(arr.tobytes()))
    return b"".join(out)


def write_netcdf3(dims: dict[str, int], variables: dict[str, dict],
                  attrs: dict | None = None, record_dim: str | None = None) -> bytes:
    """Build a classic CDF-2 NetCDF byte buffer.

    ``variables``: name → {dims: [names], data: np.ndarray, attrs: {}}.
    ``record_dim``: written as the unlimited dimension (its length comes
    from numrecs, spec-style)."""
    dim_names = list(dims)
    dim_idx = {n: i for i, n in enumerate(dim_names)}
    numrecs = dims[record_dim] if record_dim else 0

    var_entries = []
    for name, v in variables.items():
        arr = np.asarray(v["data"])
        if arr.dtype.kind == "M":
            # microsecond units keep float64 values integral → exact roundtrip
            epoch = np.datetime64("1970-01-01T00:00:00", "us")
            arr = (arr.astype("datetime64[us]") - epoch).astype(np.int64).astype(np.float64)
            v = {**v, "attrs": {**v.get("attrs", {}),
                                "units": "microseconds since 1970-01-01 00:00:00"}}
        dt = arr.dtype.newbyteorder("=")
        if dt not in _REV_TYPES:
            if dt.kind == "i":
                arr, dt = arr.astype(np.int32), np.dtype("int32")
            elif dt.kind in "fu":
                arr, dt = arr.astype(np.float64), np.dtype("float64")
            else:
                raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        t = _REV_TYPES[dt]
        is_rec = record_dim is not None and v["dims"][:1] == [record_dim]
        per_rec_shape = [dims[d] for d in v["dims"][1:]] if is_rec else [dims[d] for d in v["dims"]]
        n_per = int(np.prod(per_rec_shape, dtype=np.int64)) if per_rec_shape else 1
        slab = n_per * _SIZES[t]
        vsize = (slab + 3) // 4 * 4
        var_entries.append([name, v, arr.astype(_TYPES[t]), t, is_rec, n_per, slab, vsize])

    # header with placeholder begins, then fix up offsets
    def build(begins: list[int]) -> bytes:
        out = [b"CDF\x02", struct.pack(">i", numrecs)]
        out.append(struct.pack(">ii", _NC_DIMENSION, len(dim_names)) if dim_names
                   else struct.pack(">ii", 0, 0))
        for n in dim_names:
            out.append(_w_name(n) + struct.pack(">i", 0 if n == record_dim else dims[n]))
        out.append(_w_attrs(attrs or {}))
        out.append(struct.pack(">ii", _NC_VARIABLE, len(var_entries)) if var_entries
                   else struct.pack(">ii", 0, 0))
        for (name, v, arr, t, is_rec, n_per, slab, vsize), begin in zip(var_entries, begins):
            out.append(_w_name(name))
            out.append(struct.pack(">i", len(v["dims"])))
            for d in v["dims"]:
                out.append(struct.pack(">i", dim_idx[d]))
            out.append(_w_attrs(v.get("attrs", {})))
            out.append(struct.pack(">ii", t, vsize))
            out.append(struct.pack(">q", begin))
        return b"".join(out)

    header_len = len(build([0] * len(var_entries)))
    fixed = [e for e in var_entries if not e[4]]
    recs = [e for e in var_entries if e[4]]
    begins_map = {}
    off = header_len
    for e in fixed:
        begins_map[e[0]] = off
        off += (e[5] * _SIZES[e[3]] + 3) // 4 * 4
    rec_start = off
    recsize = sum(e[7] for e in recs)
    if len(recs) == 1:
        recsize = recs[0][6]  # single record var: unpadded (spec note)
    roff = rec_start
    for e in recs:
        begins_map[e[0]] = roff
        roff += e[7] if len(recs) > 1 else e[6]

    header = build([begins_map[e[0]] for e in var_entries])
    body = bytearray(rec_start - header_len)
    for e in fixed:
        raw = _pad4(e[2].tobytes())
        s = begins_map[e[0]] - header_len
        body[s: s + len(raw)] = raw
    rec_bytes = bytearray(numrecs * recsize)
    for e in recs:
        name, _v, arr, t, _is_rec, n_per, slab, vsize = e
        stride = vsize if len(recs) > 1 else slab
        base = begins_map[name] - rec_start
        flat = arr.reshape(numrecs, n_per)
        for r_i in range(numrecs):
            s = base + r_i * recsize
            rec_bytes[s: s + slab] = flat[r_i].tobytes()
    return header + bytes(body) + bytes(rec_bytes)


def read_netcdf3_file(path: str, record_dim: str | None = None) -> pa.Table:
    from ..state.uri import StorageFS

    sfs = StorageFS(path)
    return read_netcdf3_table(sfs.read_bytes(sfs.path), record_dim=record_dim)
