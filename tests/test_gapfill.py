"""Gap-fill unit tests: ffill/linear, max_gap, cross-window carry."""

import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.stages.gapfill import GapFillConfig, gapfill_tier

US = 1_000_000
MIN = 60 * US


def _tier_table():
    buckets = np.array([0, 1, 2, 6, 7, 20], dtype=np.int64) * MIN
    return pa.table(
        {
            "source": pa.array(["a"] * 6),
            "bucket": pa.array(buckets).cast(pa.timestamp("us")),
            "value_mean": pa.array([0.0, 1.0, 2.0, 6.0, 7.0, 20.0]),
            "qc_value": pa.array(np.zeros(6, dtype=np.int32)),
        }
    )


def _run(ray_session, method, max_gap, window_s=300):
    import ray.data as rd

    out = gapfill_tier(
        rd.from_arrow(_tier_table()),
        GapFillConfig(
            interval_s=60, values=("value",), key="source", method=method,
            max_gap=max_gap, window_s=window_s,
        ),
    ).to_pandas()
    out["bucket_min"] = out["bucket"].astype("int64") // MIN
    return out.sort_values("bucket_min").reset_index(drop=True)


def test_ffill_with_cross_window_carry(ray_session):
    out = _run(ray_session, "ffill", max_gap=2)
    filled = out[out["filled"]]
    # 3,4 filled from bucket 2 (gap<=2); 5 is 3 buckets after 2 -> not filled;
    # 8,9 filled from 7; 10.. beyond max_gap -> not filled
    assert filled["bucket_min"].tolist() == [3, 4, 8, 9]
    assert filled["value_mean"].tolist() == [2.0, 2.0, 7.0, 7.0]
    assert (filled["qc_value"] == 4).all()  # QC_INTERPOLATE
    present = out[~out["filled"]]
    assert present["bucket_min"].tolist() == [0, 1, 2, 6, 7, 20]


def test_linear_with_cross_window_carry(ray_session):
    out = _run(ray_session, "linear", max_gap=3)
    filled = out[out["filled"]]
    # run 3,4,5 (len 3 <= 3) interpolates 2 -> 6 across the window boundary;
    # run 8..19 (len 12) too long
    assert filled["bucket_min"].tolist() == [3, 4, 5]
    np.testing.assert_allclose(filled["value_mean"].to_numpy(), [3.0, 4.0, 5.0])


def test_single_window_no_carry(ray_session):
    out = _run(ray_session, "ffill", max_gap=21, window_s=60 * 60)
    filled = out[out["filled"]]
    # one window holds everything: every interior gap filled
    assert filled["bucket_min"].tolist() == list(range(3, 6)) + list(range(8, 20))


def test_max_gap_window_guard(ray_session):
    import ray.data as rd

    with pytest.raises(AssertionError):
        gapfill_tier(
            rd.from_arrow(_tier_table()),
            GapFillConfig(interval_s=60, values=("value",), key="source", max_gap=10, window_s=300),
        )


def test_natural_cubic_spline_kernel():
    """Spline through known points: exact at knots, smooth between, matches
    the analytic natural spline for a simple parabola-ish case."""
    import numpy as np

    from tsdat_ray.stages.gapfill import natural_cubic_interp

    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = xs**2
    # exact at knots
    assert np.allclose(natural_cubic_interp(xs, ys, xs), ys)
    # interpolated points lie close to x^2 in the interior
    xq = np.array([1.5, 2.5])
    got = natural_cubic_interp(xs, ys, xq)
    assert np.allclose(got, xq**2, atol=0.06)
    # < 3 points → linear fallback
    assert np.allclose(natural_cubic_interp(xs[:2], ys[:2], np.array([0.5])), [0.5])


def test_gapfill_spline(ray_session):
    """Spline fill recovers a smooth signal's missing buckets better than
    linear on curved data."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.gapfill import GapFillConfig, gapfill_tier

    US = 1_000_000
    n = 40
    buckets = np.arange(n, dtype=np.int64) * 60 * US
    vals = np.sin(np.arange(n) / 5.0) * 10
    present = np.ones(n, bool)
    present[[10, 11, 20]] = False  # a 2-run and a 1-run gap
    tbl = pa.table(
        {
            "source": pa.array(np.repeat("web", present.sum())),
            "bucket": pa.array(buckets[present]).cast(pa.timestamp("us")),
            "value_mean": pa.array(vals[present]),
        }
    )
    cfg = GapFillConfig(interval_s=60, values=("value",), key="source",
                        method="spline", max_gap=5, window_s=3600)
    out = gapfill_tier(rd.from_arrow(tbl), cfg).to_pandas()
    filled = out[out["filled"]].sort_values("bucket")
    assert len(filled) == 3
    got = filled["value_mean"].to_numpy()
    exp = vals[[10, 11, 20]]
    assert np.allclose(got, exp, atol=0.05), (got, exp)
