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
