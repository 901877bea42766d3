"""2-D (time × height) operators vs reference goldens + brute-force checks."""

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.stages.transforms import GridSpec
from tsdat_ray.stages.twod import (
    FloatGrid,
    bin_average_grid_2d,
    check_monotonic_2d,
    float_bounds_from_labels,
    monotonic_2d_failures,
)

US = 1_000_000


def test_float_bounds_from_labels_reference_goldens():
    # /root/reference/test/io/test_transform_v2.py:155-170 (height_3pt)
    h = np.array([0.0, 5.0, 10.0])
    np.testing.assert_equal(float_bounds_from_labels(h, "center"),
                            [[-2.5, 2.5], [2.5, 7.5], [7.5, 12.5]])
    np.testing.assert_equal(float_bounds_from_labels(h, "left"),
                            [[0, 5], [5, 10], [10, 15]])
    np.testing.assert_equal(float_bounds_from_labels(h, "right"),
                            [[-5, 0], [0, 5], [5, 10]])


def test_float_grid_create_bounds_golden():
    # /root/reference/test/io/test_transform_v2.py:129-152 (height axis)
    g = FloatGrid(0.0, 1.0, 0.25, alignment="left")
    np.testing.assert_allclose(g.labels, [0, 0.25, 0.5, 0.75])
    s, e = g.bounds()
    np.testing.assert_allclose(np.stack([s, e], axis=1),
                               [[0, 0.25], [0.25, 0.5], [0.5, 0.75], [0.75, 1.0]])


def test_monotonic_2d_gradient_semantics():
    # reference fixture sample_dataset_2d.py: wind_speed(time, dir) strictly
    # increasing along both axes -> no failures along time
    mat = np.arange(1, 13, dtype=float).reshape(3, 4)
    assert not monotonic_2d_failures(mat, axis=0).any()
    assert not monotonic_2d_failures(mat, axis=1).any()
    # a dip at [1,1]: np.gradient central differences flag the dip's
    # neighborhood (hand-computed: col 1 = [1, 2, 6] -> grads [1, 2.5, 4]
    # all > 0 except... make the dip big enough to flip the central diff)
    mat2 = mat.copy()
    mat2[1, 1] = -10.0
    grads = np.gradient(mat2)[0]  # axis 0
    expected = grads <= 0
    np.testing.assert_equal(monotonic_2d_failures(mat2, axis=0), expected)
    assert expected.any()  # the dip is visible
    # hand-check one cell: d/dt at [0,1] is one-sided: mat2[1,1]-mat2[0,1] < 0
    assert expected[0, 1]


def test_check_monotonic_2d_distributed_matches_dense(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    t = np.repeat(np.arange(6, dtype=np.int64) * 60 * US, 4)
    h = np.tile(np.array([0.0, 10.0, 20.0, 30.0]), 6)
    val = np.cumsum(rng.normal(1.0, 0.1, 24)) + rng.normal(0, 3, 24)  # some dips
    tbl = pa.table(
        {
            "source": pa.array(["a"] * 24),
            "ts": pa.array(t).cast(pa.timestamp("us")),
            "height": pa.array(h),
            "speed": pa.array(val),
        }
    )
    out = (
        check_monotonic_2d(rd.from_arrow(tbl).repartition(3), value_col="speed",
                           key="source", window_s=86400)
        .to_pandas().sort_values(["ts", "height"]).reset_index(drop=True)
    )
    mat = val.reshape(6, 4)
    expected = monotonic_2d_failures(mat, axis=0).reshape(-1)
    got = out["qc_speed"].to_numpy() != 0
    np.testing.assert_equal(got, expected)


def _brute_2d(ts, h, x, bad, tgrid, hgrid, in_w_us, in_w_h):
    """O(n·cells) reference implementation of the separable 2-D bin average."""
    t_s, t_e = ts - in_w_us / 2, ts + in_w_us / 2
    h_s, h_e = h - in_w_h / 2, h + in_w_h / 2
    ot_s, ot_e = tgrid.bounds()
    oh_s, oh_e = hgrid.bounds()
    mean = np.full((tgrid.n, hgrid.n), np.nan)
    for j in range(tgrid.n):
        for k in range(hgrid.n):
            wsum = xsum = 0.0
            for i in range(len(ts)):
                ovt = min(t_e[i], ot_e[j]) - max(t_s[i], ot_s[j])
                ovh = min(h_e[i], oh_e[k]) - max(h_s[i], oh_s[k])
                if ovt <= 0 or ovh <= 0 or bad[i]:
                    continue
                w = (ovt / (t_e[i] - t_s[i])) * (ovh / (h_e[i] - h_s[i]))
                wsum += w
                xsum += w * x[i]
            if wsum > 0:
                mean[j, k] = xsum / wsum
    return mean


def test_bin_average_2d_matches_brute_force(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 120
    ts = np.sort(rng.integers(0, 3600, n)).astype(np.int64) * US
    h = rng.uniform(0, 100, n)
    x = rng.normal(10, 2, n)
    bad = rng.random(n) < 0.1
    tgrid = GridSpec(0, 3600 * US, 600 * US)
    hgrid = FloatGrid(0.0, 100.0, 25.0)
    tbl = pa.table(
        {
            "source": pa.array(["s1"] * n),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "height": pa.array(h),
            "value": pa.array(np.where(bad, np.nan, x)),
        }
    )
    out = (
        bin_average_grid_2d(rd.from_arrow(tbl).repartition(4), tgrid, hgrid,
                            key="source", window_s=86400,
                            input_width_us=60 * US, input_width_h=5.0)
        .to_pandas().sort_values(["bucket", "height"]).reset_index(drop=True)
    )
    expected = _brute_2d(ts.astype(float), h, x, bad, tgrid, hgrid, 60 * US, 5.0)
    got = out["value_mean"].to_numpy().reshape(tgrid.n, hgrid.n)
    np.testing.assert_allclose(got, expected, rtol=1e-9, equal_nan=True)
    # cells with no inputs carry OUTSIDE_RANGE|BAD, others n>0
    qc = out["qc_value"].to_numpy().reshape(tgrid.n, hgrid.n)
    assert (qc[np.isnan(expected)] != 0).all()


def test_monotonic_2d_reference_golden():
    """Exact re-expression of the reference's manipulated-fixture case
    (/root/reference/test/qc/test_monotonic_with_2d_vars.py:23-35)."""
    mat = np.arange(1, 13, dtype=float).reshape(3, 4)
    mat += np.array([[4, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]], dtype=float)
    expected = np.array(
        [
            [True, False, False, False],
            [False, False, False, False],
            [False, False, False, False],
        ]
    )
    np.testing.assert_array_equal(monotonic_2d_failures(mat, axis=0), expected)


# --------------------------------------------------------------------------- #
# N-D (3-D: time × height × range)
# --------------------------------------------------------------------------- #

def _brute_3d(ts, h, r, x, bad, tgrid, hgrid, rgrid, in_w_us, in_w_h, in_w_r):
    """O(n·cells) reference implementation of the separable 3-D bin average."""
    t_s, t_e = ts - in_w_us / 2, ts + in_w_us / 2
    h_s, h_e = h - in_w_h / 2, h + in_w_h / 2
    r_s, r_e = r - in_w_r / 2, r + in_w_r / 2
    ot_s, ot_e = tgrid.bounds()
    oh_s, oh_e = hgrid.bounds()
    or_s, or_e = rgrid.bounds()
    mean = np.full((tgrid.n, hgrid.n, rgrid.n), np.nan)
    for j in range(tgrid.n):
        for k in range(hgrid.n):
            for m in range(rgrid.n):
                wsum = xsum = 0.0
                for i in range(len(ts)):
                    ovt = min(t_e[i], ot_e[j]) - max(t_s[i], ot_s[j])
                    ovh = min(h_e[i], oh_e[k]) - max(h_s[i], oh_s[k])
                    ovr = min(r_e[i], or_e[m]) - max(r_s[i], or_s[m])
                    if ovt <= 0 or ovh <= 0 or ovr <= 0 or bad[i]:
                        continue
                    w = (ovt / (t_e[i] - t_s[i])) * (ovh / (h_e[i] - h_s[i])) \
                        * (ovr / (r_e[i] - r_s[i]))
                    wsum += w
                    xsum += w * x[i]
                if wsum > 0:
                    mean[j, k, m] = xsum / wsum
    return mean


def test_bin_average_3d_matches_brute_force(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.twod import bin_average_grid_nd

    rng = np.random.default_rng(13)
    n = 150
    ts = np.sort(rng.integers(0, 3600, n)).astype(np.int64) * US
    h = rng.uniform(0, 100, n)
    r = rng.uniform(0, 40, n)
    x = rng.normal(5, 1.5, n)
    bad = rng.random(n) < 0.1
    tgrid = GridSpec(0, 3600 * US, 900 * US)
    hgrid = FloatGrid(0.0, 100.0, 50.0)
    rgrid = FloatGrid(0.0, 40.0, 10.0)
    tbl = pa.table(
        {
            "source": pa.array(["s1"] * n),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "height": pa.array(h),
            "range": pa.array(r),
            "value": pa.array(np.where(bad, np.nan, x)),
        }
    )
    out = (
        bin_average_grid_nd(
            rd.from_arrow(tbl).repartition(4), tgrid,
            {"height": hgrid, "range": rgrid}, key="source", window_s=86400,
            input_width_us=60 * US,
            input_widths={"height": 5.0, "range": 4.0})
        .to_pandas().sort_values(["bucket", "height", "range"])
        .reset_index(drop=True)
    )
    expected = _brute_3d(ts.astype(float), h, r, x, bad,
                         tgrid, hgrid, rgrid, 60 * US, 5.0, 4.0)
    got = out["value_mean"].to_numpy().reshape(tgrid.n, hgrid.n, rgrid.n)
    np.testing.assert_allclose(got, expected, rtol=1e-9, equal_nan=True)
    qc = out["qc_value"].to_numpy().reshape(tgrid.n, hgrid.n, rgrid.n)
    assert (qc[np.isnan(expected)] != 0).all()


def test_nd_slice_one_axis_equals_2d_slice():
    from tsdat_ray.stages.twod import bin_average_2d_slice, bin_average_nd_slice

    rng = np.random.default_rng(7)
    n = 80
    ts = np.sort(rng.integers(0, 1800, n)).astype(np.int64) * US
    h = rng.uniform(0, 50, n)
    x = rng.normal(0, 1, n)
    bad = rng.random(n) < 0.2
    tgrid = GridSpec(0, 1800 * US, 600 * US)
    hgrid = FloatGrid(0.0, 50.0, 10.0)
    a = bin_average_2d_slice(ts, h, x, bad, tgrid, hgrid, 30 * US, 5.0)
    b = bin_average_nd_slice(ts, [h], x, bad, tgrid, [hgrid], 30 * US, [5.0])
    for k in ("mean", "std", "goodfraction", "qc", "n", "sum_w", "sum_wx"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    np.testing.assert_array_equal(a["h"], b["c0"])


def test_check_monotonic_nd_planted_3d(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.twod import check_monotonic_nd

    # value strictly increases along time for every (height, range) column,
    # except one planted reversal at (t=2, h=10, r=0)
    ts, hs, rs, vals = [], [], [], []
    for t in range(6):
        for h in (0.0, 10.0):
            for r in (0.0, 5.0):
                v = float(t)
                if t == 2 and h == 10.0 and r == 0.0:
                    v = -5.0  # reversal
                ts.append(t * 60 * US)
                hs.append(h)
                rs.append(r)
                vals.append(v)
    tbl = pa.table(
        {
            "ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("us")),
            "height": pa.array(hs),
            "range": pa.array(rs),
            "wind": pa.array(vals),
        }
    )
    out = (
        check_monotonic_nd(rd.from_arrow(tbl), "wind", ["height", "range"],
                           axis_dim="ts")
        .to_pandas().sort_values(["ts", "height", "range"]).reset_index(drop=True)
    )
    flagged = out[out["qc_wind"] != 0]
    # gradient sign test: for [0,1,-5,3,4,5] the central difference is
    # negative only at index 1 — exactly that cell in exactly that
    # (height, range) column is flagged
    assert set(zip(flagged["height"], flagged["range"])) == {(10.0, 0.0)}
    assert set(flagged["ts"].astype(np.int64)) == {60 * US}
