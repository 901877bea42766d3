"""Golden transform tests re-expressed from the reference
(test/io/test_transform_v2.py:221-301 and test/adi/test_transform.py:66-92):
same 6-point input fixture, same expected 30-min / 60-min bin averages and the
19-point nearest-neighbor expansion, evaluated against our vectorized slice
kernels and the distributed wrappers.
"""

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.stages.transforms import (
    GridSpec,
    bin_average_grid,
    bin_average_slice,
    interpolate_slice,
    nearest_neighbor_grid,
    nearest_neighbor_slice,
)

US = 1_000_000


def _us(s: str) -> int:
    return int(np.datetime64(s, "us").astype("int64"))


# the reference's transform input fixture (test_transform_v2.py:51-118)
TS = np.array([_us(f"2022-04-13T14:{m:02d}:00") for m in (0, 10, 20, 30, 40, 50)], dtype=np.int64)
TEMP = np.array([0.0, 1.0, 2.0, -9999.0, 4.0, 5.0])
QC_TEMP = np.array([0, 0, 0, 1, 0, 0], dtype=np.int32)
RH = np.array([59.0, 60.0, 61.0, 62.0, 63.0, 64.0])

DAY0 = _us("2022-04-13T00:00:00")
DAY1 = _us("2022-04-14T00:00:00")


def _temp_values():
    bad = (QC_TEMP & 1) != 0
    x = np.where(TEMP == -9999.0, np.nan, TEMP)  # cleanup: fill -> NaN
    return {"temp": (x, bad, np.zeros(len(x), bool))}


def test_bin_average_30min_golden():
    grid = GridSpec(DAY0, DAY1, 30 * 60 * US, width_us=1800 * US, alignment="right")
    out = bin_average_slice(TS, _temp_values(), grid)
    labels = out["labels"]
    lo, hi = _us("2022-04-13T13:30:00"), _us("2022-04-13T15:30:00")
    sel = (labels >= lo) & (labels <= hi)
    got = np.where(np.isnan(out["temp_mean"][sel]), -9999.0, out["temp_mean"][sel])
    np.testing.assert_equal(got, np.array([-9999.0, 0.0, 1.2, 4.5, -9999.0]))
    # QC: bucket 14:30 averaged over inputs incl. one bad -> SOME_BAD (32)
    qc = out["qc_temp"][sel]
    assert qc[0] == 128 + 1  # outside range
    assert qc[2] & 32
    assert qc[4] == 128 + 1


def test_bin_average_60min_golden():
    grid = GridSpec(DAY0, DAY1, 3600 * US, width_us=3600 * US, alignment="left")
    out = bin_average_slice(TS, _temp_values(), grid)
    labels = out["labels"]
    sel = (labels >= _us("2022-04-13T12:00:00")) & (labels <= _us("2022-04-13T15:00:00"))
    got = np.where(np.isnan(out["temp_mean"][sel]), -9999.0, out["temp_mean"][sel])
    np.testing.assert_equal(got, np.array([-9999.0, 0.0, 8 / 3, -9999.0]))


NN_GOLDEN = [-9999, 59, 59, 59, 59, 60, 60, 61, 61, 62, 62, 63, 63, 64, 64, 64, 64, 64, -9999]


def test_nearest_neighbor_19pt_golden():
    grid = np.arange(_us("2022-04-13T13:40:00"), _us("2022-04-13T15:10:00") + 1, 300 * US)
    idx = nearest_neighbor_slice(TS, grid, tolerance_us=900 * US)
    got = np.where(idx >= 0, RH[np.clip(idx, 0, None)], -9999.0)
    np.testing.assert_equal(got, np.array(NN_GOLDEN, dtype=float))


def test_interpolate_slice_basic():
    # NOTE: an output bound must overlap >=2 input bins for the transform to
    # run (the reference flags 128+1 otherwise; its own 5-min asserts are
    # commented out for this reason) -> use a 30-min centered bound.
    grid = GridSpec(
        _us("2022-04-13T14:00:00"),
        _us("2022-04-13T14:50:01"),
        300 * US,
        width_us=1800 * US,
        alignment="center",
    )
    out = interpolate_slice(TS, {"rh": RH}, grid)
    # on-point grid values exact, midpoints halfway
    labels = out["labels"]
    exp = 59.0 + (labels - TS[0]) / (600 * US)
    inside = (out["qc_rh"] & 128) == 0
    np.testing.assert_allclose(out["rh"][inside], exp[inside], rtol=1e-12)
    assert inside.sum() >= 8


def test_interpolate_extrapolate_bit():
    ts = np.array([0, 600 * US], dtype=np.int64)
    x = {"v": np.array([0.0, 6.0])}
    grid = GridSpec(-600 * US, 1800 * US, 300 * US, width_us=2000 * US, alignment="center")
    out = interpolate_slice(ts, x, grid)
    # points beyond both inputs but within bound -> extrapolation (bit 8)
    labels = out["labels"]
    right = labels > 600 * US
    ok = (out["qc_v"] & (128 + 1)) == 0
    assert (out["qc_v"][right & ok] & 8).all()
    np.testing.assert_allclose(out["v"][ok], labels[ok] / (100 * US), rtol=1e-12)


def _fixture_ds(rd):
    t = pa.table(
        {
            "source": pa.array(["a"] * 6),
            "doc_id": pa.array([f"a-{i:08d}" for i in range(6)]),
            "ts": pa.array(TS).cast(pa.timestamp("us")),
            "temp": pa.array(np.where(TEMP == -9999.0, np.nan, TEMP), from_pandas=True),
            "qc_temp": pa.array(QC_TEMP),
            "rh": pa.array(RH),
            "qc_rh": pa.array(np.zeros(6, dtype=np.int32)),
            "tokens": pa.array([[i] for i in range(6)], type=pa.list_(pa.int32())),
        }
    )
    return rd.from_arrow(t)


def test_bin_average_grid_distributed(ray_session):
    import ray.data as rd

    grid = GridSpec(DAY0, DAY1, 30 * 60 * US, width_us=1800 * US, alignment="right")
    out = bin_average_grid(
        _fixture_ds(rd), grid, key="source", values=("temp",), bad_bits=1
    ).to_pandas()
    out = out.sort_values("bucket").reset_index(drop=True)
    assert len(out) == grid.n
    sel = out[
        (out["bucket"] >= np.datetime64("2022-04-13T13:30:00"))
        & (out["bucket"] <= np.datetime64("2022-04-13T15:30:00"))
    ]
    got = sel["temp_mean"].fillna(-9999.0).to_numpy()
    np.testing.assert_equal(got, np.array([-9999.0, 0.0, 1.2, 4.5, -9999.0]))
    assert (sel["qc_temp"].to_numpy() & np.array([129, 0, 32, 0, 129])).sum() >= 161

    # slice kernel and distributed wrapper agree everywhere
    ref = bin_average_slice(TS, _temp_values(), grid)
    np.testing.assert_allclose(
        out["temp_mean"].to_numpy(), ref["temp_mean"], rtol=1e-12, equal_nan=True
    )
    np.testing.assert_array_equal(out["qc_temp"].to_numpy(), ref["qc_temp"])


def test_nearest_neighbor_grid_distributed(ray_session):
    import ray.data as rd

    out = nearest_neighbor_grid(
        _fixture_ds(rd),
        grid_interval_s=300,
        tolerance_s=900,
        key="source",
        carry=("rh", "tokens"),
        grid_start_us=_us("2022-04-13T13:40:00"),
        grid_stop_us=_us("2022-04-13T15:10:01"),
    ).to_pandas()
    out = out.sort_values("grid_ts").reset_index(drop=True)
    expected = [v for v in NN_GOLDEN if v != -9999]
    assert out["rh"].tolist() == [float(v) for v in expected]
    # token payloads carried verbatim from the selected rows
    assert out["tokens"].map(len).eq(1).all()


def test_auto_slice_branches():
    """TRANS_AUTO picks bin-average for dense regions, interpolate for sparse
    (adi_transformer.py:121-133)."""
    import numpy as np

    from tsdat_ray.stages.transforms import GridSpec, auto_slice

    US = 1_000_000
    grid = GridSpec(start_us=0, stop_us=600 * US, interval_us=60 * US)  # 10 bins
    # dense: 60 inputs > 10 outputs → bin average
    ts_dense = np.arange(60, dtype=np.int64) * 10 * US
    x = np.linspace(0.0, 59.0, 60)
    vals = {"v": (x, np.zeros(60, bool), np.zeros(60, bool))}
    mode, res = auto_slice(ts_dense, vals, grid)
    assert mode == "bin_average"
    # centered input bounds (reference create_bounds semantics): bin [0,60s)
    # gets half weight from the points at 0s and 60s → (0*0.5+1+2+3+4+5+6*0.5)/6
    assert np.isclose(res["v_mean"][0], 3.0)
    # sparse: 5 inputs < 10 outputs → interpolate
    ts_sparse = np.array([0, 150, 300, 450, 590], dtype=np.int64) * US
    xs = np.array([0.0, 15.0, 30.0, 45.0, 59.0])
    mode, res = auto_slice(ts_sparse, {"v": (xs, np.zeros(5, bool), np.zeros(5, bool))}, grid)
    assert mode == "interpolate"
    assert len(res["v_mean"]) == 10


def test_auto_grid_distributed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.transforms import GridSpec, auto_grid

    US = 1_000_000
    # source A: dense (120 points over 10 min); source B: sparse (4 points)
    ts_a = np.arange(120, dtype=np.int64) * 5 * US
    ts_b = np.array([30, 200, 380, 550], dtype=np.int64) * US
    tbl = pa.table(
        {
            "source": pa.array(["A"] * 120 + ["B"] * 4),
            "ts": pa.array(np.r_[ts_a, ts_b]).cast(pa.timestamp("us")),
            "v": pa.array(np.r_[np.arange(120.0), [1.0, 2.0, 3.0, 4.0]]),
        }
    )
    grid = GridSpec(start_us=0, stop_us=600 * US, interval_us=60 * US)
    out = auto_grid(rd.from_arrow(tbl), grid, values=("v",), window_s=86400).to_pandas()
    assert set(out[out["source"] == "A"]["mode"]) == {"bin_average"}
    assert set(out[out["source"] == "B"]["mode"]) == {"interpolate"}
    assert len(out) == 20  # 10 grid points per source


def test_auto_grid_forced_modes(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.transforms import GridSpec, auto_grid

    US = 1_000_000
    ts = np.arange(120, dtype=np.int64) * 5 * US
    tbl = pa.table(
        {
            "source": pa.array(["A"] * 120),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "v": pa.array(np.arange(120.0)),
        }
    )
    grid = GridSpec(start_us=0, stop_us=600 * US, interval_us=60 * US)
    for mode in ("bin_average", "interpolate"):
        out = auto_grid(rd.from_arrow(tbl), grid, values=("v",), window_s=86400,
                        mode=mode).to_pandas()
        assert set(out["mode"]) == {mode}
        assert len(out) == 10


def test_lttb_sequential_reference_and_invariants(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.transforms import lttb_downsample, lttb_indices

    US = 1_000_000
    rng = np.random.default_rng(11)
    n = 5000
    ts = np.sort(rng.integers(0, 86400, n)).astype(np.int64) * US
    v = np.cumsum(rng.normal(size=n))
    tbl = pa.table({
        "k": pa.array(["a"] * n),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "v": pa.array(v),
    })
    out = lttb_downsample(rd.from_arrow(tbl).repartition(4), key="k",
                          ts_col="ts", value_col="v", n_out=100,
                          window_s=7 * 86400).to_pandas()
    # one window => distributed result == sequential reference selection
    order = np.lexsort((v, ts))
    sel = lttb_indices(ts[order], v[order], 100)
    expect = np.sort(ts[order][sel])
    got = np.sort(out["ts"].values.astype("datetime64[us]").astype(np.int64))
    assert len(out) == 100
    assert np.array_equal(got, expect)
    # endpoints always kept
    assert got[0] == ts.min() and got[-1] == ts.max()


def test_lttb_exact_integer_mode(ray_session):
    """r5 exact mode: (a) integer-area selection == a brute python
    reference (including a planted exact-area TIE resolved to the smaller
    pos), (b) the distributed value_scale path returns exactly those
    rows."""
    import ray.data as rd

    from tsdat_ray.stages.transforms import lttb_downsample, lttb_indices_exact

    US = 1_000_000
    rng = np.random.default_rng(7)
    n = 400
    ts = (np.sort(rng.integers(0, 86400, n)) * US).astype(np.int64)
    v = np.round(rng.normal(scale=50, size=n), 2)
    vi = np.copysign(np.floor(np.abs(v * 100) + 0.5), v).astype(np.int64)

    K = 24
    sel = lttb_indices_exact(ts, vi, K)

    # brute reference with identical rules
    step = (n - 2.0) / (K - 2.0)
    edges = (np.arange(K - 1, dtype=np.float64) * step + 1.0).astype(np.int64)
    edges[-1] = n - 1
    t0 = int(ts[0])
    tr = [int(x) - t0 for x in ts]
    a, keep = 0, [0, n - 1]
    for i in range(K - 2):
        lo, hi = int(edges[i]), int(edges[i + 1])
        nlo = int(edges[i + 1])
        nhi = int(edges[i + 2]) if i + 2 < len(edges) else n
        m = nhi - nlo
        st, sv = sum(tr[nlo:nhi]), int(vi[nlo:nhi].sum())
        ax, ay = tr[a], int(vi[a])
        areas = [abs((ax * m - st) * (int(vi[p]) - ay)
                     - (ax - tr[p]) * (sv - ay * m)) for p in range(lo, hi)]
        a = lo + int(np.argmax(areas))
        keep.append(a)
    assert np.array_equal(sel, np.unique(keep))

    # planted tie: symmetric points around a flat anchor → equal areas;
    # first-max (smallest pos) must win
    ts2 = np.arange(10, dtype=np.int64) * US
    v2 = np.array([0, 0, 5, -5, 0, 0, 0, 0, 0, 0], np.int64)
    sel2 = lttb_indices_exact(ts2, v2, 5)
    assert 0 in sel2 and 9 in sel2

    # distributed path returns the same rows
    tbl = pa.table({
        "k": pa.array(["a"] * n),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "v": pa.array(v),
    })
    out = lttb_downsample(rd.from_arrow(tbl).repartition(4), key="k",
                          ts_col="ts", value_col="v", n_out=K,
                          window_s=7 * 86400, value_scale=100,
                          id_col="eid").to_pandas()
    order = np.lexsort((np.arange(n), v, ts))
    expect = np.sort(np.arange(n)[order][sel])
    assert np.array_equal(np.sort(out["eid"].values), expect)


def test_lttb_small_group_passthrough(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.transforms import lttb_downsample

    US = 1_000_000
    tbl = pa.table({
        "k": pa.array(["a"] * 5),
        "ts": pa.array(np.arange(5, dtype=np.int64) * US).cast(pa.timestamp("us")),
        "v": pa.array(np.arange(5.0)),
    })
    out = lttb_downsample(rd.from_arrow(tbl), key="k", ts_col="ts",
                          value_col="v", n_out=100).to_pandas()
    assert len(out) == 5
