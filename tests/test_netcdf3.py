"""NetCDF classic (CDF-2) reader/writer roundtrips + spec checks."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.sources.netcdf3 import (
    parse_netcdf3,
    read_netcdf3_table,
    write_netcdf3,
)


def _sample(n=5, nh=3, two_d=True, extra_rec_var=True):
    dims = {"time": n}
    variables = {
        "time": {
            "dims": ["time"],
            "data": np.arange(n, dtype=np.float64) * 60,
            "attrs": {"units": "seconds since 2024-01-01 00:00:00"},
        },
    }
    if extra_rec_var:
        variables["temp"] = {
            "dims": ["time"],
            "data": np.linspace(10, 14, n),
            "attrs": {"units": "degC"},
        }
    if two_d:
        dims["height"] = nh
        variables["height"] = {"dims": ["height"],
                               "data": np.array([0.0, 10.0, 20.0])}
        variables["wind"] = {
            "dims": ["time", "height"],
            "data": np.arange(n * nh, dtype=np.float32).reshape(n, nh),
        }
    variables["site_lat"] = {"dims": [], "data": np.array(45.5)}
    return dims, variables


def test_roundtrip_multi_record_vars():
    dims, variables = _sample()
    buf = write_netcdf3(dims, variables, attrs={"title": "t", "level": 2},
                        record_dim="time")
    nc = parse_netcdf3(buf)
    assert nc["attrs"] == {"title": "t", "level": 2}
    assert nc["dims"]["time"] == 5 and nc["dims"]["height"] == 3
    np.testing.assert_allclose(nc["vars"]["temp"]["data"], np.linspace(10, 14, 5))
    np.testing.assert_allclose(nc["vars"]["wind"]["data"],
                               np.arange(15, dtype=np.float32).reshape(5, 3))
    np.testing.assert_allclose(nc["vars"]["height"]["data"], [0, 10, 20])
    assert nc["vars"]["site_lat"]["data"] == pytest.approx(45.5)
    assert nc["vars"]["temp"]["attrs"]["units"] == "degC"


def test_roundtrip_single_record_var_unpadded():
    # single record variable: slabs are unpadded per the spec's special case
    dims = {"time": 3}
    variables = {"time": {"dims": ["time"], "data": np.array([1, 2, 3], np.int16)}}
    buf = write_netcdf3(dims, variables, record_dim="time")
    nc = parse_netcdf3(buf)
    np.testing.assert_array_equal(nc["vars"]["time"]["data"], [1, 2, 3])


def test_header_bytes_match_spec():
    dims, variables = _sample(two_d=False, extra_rec_var=False)
    buf = write_netcdf3(dims, variables, record_dim="time")
    assert buf[:4] == b"CDF\x02"
    (numrecs,) = struct.unpack_from(">i", buf, 4)
    assert numrecs == 5
    tag, ndims = struct.unpack_from(">ii", buf, 8)
    assert tag == 0x0A and ndims == 1
    # dim name "time" + size 0 (record dim)
    (nlen,) = struct.unpack_from(">i", buf, 16)
    assert buf[20:24] == b"time"
    (sz,) = struct.unpack_from(">i", buf, 24)
    assert sz == 0


def test_long_table_2d_expansion():
    dims, variables = _sample()
    buf = write_netcdf3(dims, variables, attrs={"datastream": "x.y.z"},
                        record_dim="time")
    t = read_netcdf3_table(buf)
    assert t.num_rows == 5 * 3  # (time × height) cells
    assert set(t.column_names) == {"time", "temp", "height", "wind"}
    assert pa.types.is_timestamp(t.schema.field("time").type)
    ts = t["time"].cast(pa.int64()).to_numpy()
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    np.testing.assert_array_equal(ts[:4], [base, base, base, base + 60_000_000])
    np.testing.assert_allclose(t["wind"].to_numpy(), np.arange(15, dtype=np.float32))
    np.testing.assert_allclose(t["temp"].to_numpy()[:4], [10, 10, 10, 11])
    assert t.schema.metadata[b"datastream"] == b"x.y.z"


def test_long_table_1d_only():
    dims, variables = _sample(two_d=False)
    buf = write_netcdf3(dims, variables, record_dim="time")
    t = read_netcdf3_table(buf)
    assert t.num_rows == 5
    assert set(t.column_names) == {"time", "temp"}


def test_netcdf4_magic_raises():
    with pytest.raises(ValueError, match="NetCDF-4"):
        parse_netcdf3(b"\x89HDF\r\n\x1a\n" + b"\x00" * 100)
    with pytest.raises(ValueError, match="magic"):
        parse_netcdf3(b"NOPE" + b"\x00" * 100)
