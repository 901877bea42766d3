"""Zarr-lite v2 store: roundtrips + partitioned tier store parity."""

import json

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.sources.zarr_store import (
    read_array,
    read_group,
    read_zarr_partitioned,
    write_array,
    write_group,
    write_zarr_partitioned,
)

US = 1_000_000


@pytest.mark.parametrize("compressor", ["zlib", None])
def test_array_roundtrip_dtypes(tmp_path, compressor):
    cases = {
        "f64": np.array([1.5, np.nan, -3.25e300]),
        "i64": np.array([1, -2, 2**62], dtype=np.int64),
        "i32": np.array([1, -2, 3], dtype=np.int32),
        "ts": np.array([0, 10**15, -5], dtype="datetime64[us]"),
        "str": np.array(["a", "bb", "ccc"], dtype=object),
    }
    for name, arr in cases.items():
        root = str(tmp_path / f"{name}.zarr")
        write_array(root, arr, chunks=2, compressor=compressor or "null")
        back, _ = read_array(root)
        if arr.dtype == object:
            assert back.tolist() == arr.tolist()
        else:
            np.testing.assert_array_equal(back, arr)


def test_zarray_metadata_is_spec_valid(tmp_path):
    root = str(tmp_path / "a.zarr")
    write_array(root, np.arange(10, dtype=np.float64), chunks=4)
    meta = json.loads((tmp_path / "a.zarr" / ".zarray").read_text())
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [10] and meta["chunks"] == [4]
    assert meta["dtype"] == "<f8"
    assert meta["compressor"] == {"id": "zlib", "level": 5}
    # 3 chunk files: 0, 1, 2
    assert sorted(p.name for p in (tmp_path / "a.zarr").iterdir()
                  if not p.name.startswith(".")) == ["0", "1", "2"]


def test_group_roundtrip(tmp_path):
    t = pa.table(
        {
            "ts": pa.array(np.arange(5, dtype=np.int64) * US).cast(pa.timestamp("us")),
            "v": pa.array([1.0, 2.0, np.nan, 4.0, 5.0]),
            "k": pa.array(["a", "b", "a", "b", "c"]),
        }
    )
    root = str(tmp_path / "g.zarr")
    write_group(root, t, chunks=3)
    back = read_group(root)
    assert set(back.column_names) == {"ts", "v", "k"}
    np.testing.assert_array_equal(back["v"].to_numpy(), t["v"].to_numpy())
    assert back["k"].to_pylist() == t["k"].to_pylist()
    assert back["ts"].cast(pa.int64()).to_pylist() == t["ts"].cast(pa.int64()).to_pylist()


def test_partitioned_store_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 400
    t = pa.table(
        {
            "source": pa.array(rng.choice(["web", "app"], n)),
            "day": pa.array(rng.choice(["2024-01-01", "2024-01-02"], n)),
            "ts": pa.array(np.sort(rng.integers(0, 10**9, n)).astype(np.int64)).cast(pa.timestamp("us")),
            "v": pa.array(rng.normal(size=n)),
        }
    )
    root = str(tmp_path / "store")
    rows = write_zarr_partitioned(rd.from_arrow(t).repartition(3), root, ts_col="ts")
    assert rows == n
    back = read_zarr_partitioned(root).to_pandas()
    assert len(back) == n
    a = t.to_pandas().sort_values(["ts", "v"]).reset_index(drop=True)
    b = back[["source", "day", "ts", "v"]].sort_values(["ts", "v"]).reset_index(drop=True)
    np.testing.assert_allclose(a["v"], b["v"])
    assert (a["source"].to_numpy() == b["source"].to_numpy()).all()
    # idempotent rerun: deterministic group names overwrite, not duplicate
    rows2 = write_zarr_partitioned(rd.from_arrow(t).repartition(3), root, ts_col="ts")
    assert rows2 == n
    assert len(read_zarr_partitioned(root).to_pandas()) == n
