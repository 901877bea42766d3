"""Exact grouped statistics (stages/stats.py)."""

import numpy as np
import pyarrow as pa


def test_grouped_corr_matches_numpy_and_is_deterministic(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import grouped_corr

    rng = np.random.Generator(np.random.Philox(key=np.array([3, 0], dtype=np.uint64)))
    n = 5000
    g = rng.choice(["a", "b", "c"], n)
    x = np.round(rng.uniform(0, 500, n), 2)
    y = (x * 3 + rng.normal(0, 50, n)).round().astype(np.int64)
    tbl = pa.table({"g": pa.array(g), "x": pa.array(x), "y": pa.array(y.astype(np.float64))})

    def run(nblocks):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        return grouped_corr(ds, "g", "x", "y", x_scale=100, y_scale=1).to_pandas()

    out = run(7)
    for _, row in out.iterrows():
        m = g == row["g"]
        want = np.corrcoef(np.round(x[m] * 100), y[m])[0, 1]
        assert abs(row["corr_xy"] - want) < 1e-9
    # bit-determinism under a different block layout
    out2 = run(2)
    assert out.equals(out2)


def test_grouped_corr_zero_variance(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import grouped_corr

    tbl = pa.table({"g": pa.array(["a"] * 4), "x": pa.array([1.0] * 4),
                    "y": pa.array([1.0, 2.0, 3.0, 4.0])})
    out = grouped_corr(rd.from_arrow(tbl), "g", "x", "y").to_pandas()
    assert out["corr_xy"].isna().all()
