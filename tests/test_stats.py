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


def test_grouped_ohlc_merge_across_blocks(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.stats import grouped_ohlc

    US = 1_000_000
    rng = np.random.default_rng(3)
    n = 4000
    ts = rng.integers(0, 5 * 3600, n).astype(np.int64) * US
    k = np.where(rng.random(n) < 0.7, "a", "b")
    v = rng.integers(0, 10000, n) / 100.0
    eid = np.arange(n, dtype=np.int64)
    t = pa.table({"k": pa.array(k), "eid": pa.array(eid),
                  "ts": pa.array(ts).cast(pa.timestamp("us")),
                  "v": pa.array(v)})
    out = (grouped_ohlc(rd.from_arrow(t).repartition(9), key="k",
                        ts_col="ts", value_col="v", id_col="eid",
                        interval_s=3600)
           .to_pandas().set_index(["k", "bucket_ts"]).sort_index())
    hr = (ts // (3600 * US)) * 3600 * US
    import pandas as pd
    for (kk, bb) in out.index:
        b_us = bb.value // 1000
        m = (k == kk) & (hr == b_us)
        order = np.lexsort((eid[m], ts[m]))
        vs = v[m][order]
        row = out.loc[(kk, bb)]
        assert row["open"] == vs[0] and row["close"] == vs[-1]
        assert row["low"] == vs.min() and row["high"] == vs.max()
        assert row["n"] == m.sum()


def test_grouped_mode_tie_breaks_to_smallest(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.stats import grouped_mode

    # key "a": 3.0 ×3 and 1.0 ×3 tie -> 1.0 wins; "b": single value
    t = pa.table({"k": pa.array(["a"] * 6 + ["b"]),
                  "v": pa.array([3.0, 1.0, 3.0, 1.0, 3.0, 1.0, 7.25])})
    out = (grouped_mode(rd.from_arrow(t).repartition(4), key="k",
                        value_col="v").to_pandas().set_index("k"))
    assert out.loc["a", "mode_value"] == 1.0 and out.loc["a", "n_mode"] == 3
    assert out.loc["b", "mode_value"] == 7.25 and out.loc["b", "n_mode"] == 1
