"""pivot/melt and range_count_join vs sequential references."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from tsdat_ray.stages.joins import range_count_join
from tsdat_ray.stages.reshape import melt, pivot_agg

US = 1_000_000


def test_pivot_counts_and_sums(ray_session):
    rng = np.random.default_rng(2)
    n = 2000
    t = pa.table(
        {
            "day": pa.array(rng.choice(["d1", "d2", "d3"], n)),
            "kind": pa.array(rng.choice(["a", "b", "c", "zz"], n)),  # zz ∉ domain
            "v": pa.array(rng.integers(0, 1000, n) / 100.0),
        }
    )
    out = pivot_agg(rd.from_arrow(t).repartition(4), "day", "kind",
                    col_domain=("a", "b", "c")).to_pandas().set_index("day")
    df = t.to_pandas()
    for d in ("d1", "d2", "d3"):
        for k in ("a", "b", "c"):
            assert out.loc[d, f"n_{k}"] == ((df["day"] == d) & (df["kind"] == k)).sum()
    # sum mode: exact cents
    outs = pivot_agg(rd.from_arrow(t).repartition(4), "day", "kind",
                     col_domain=("a", "b"), value_col="v").to_pandas().set_index("day")
    for d in ("d1", "d2", "d3"):
        for k in ("a", "b"):
            m = (df["day"] == d) & (df["kind"] == k)
            exp = np.round(df.loc[m, "v"] * 100).astype(np.int64).sum() / 100.0
            assert outs.loc[d, f"n_{k}"] == exp


def test_melt_roundtrip(ray_session):
    t = pa.table(
        {
            "id": pa.array([1, 2, 3]),
            "x": pa.array([1.0, 2.0, 3.0]),
            "y": pa.array([10.0, 20.0, 30.0]),
        }
    )
    out = melt(rd.from_arrow(t), id_cols=("id",), value_cols=("x", "y")).to_pandas()
    assert len(out) == 6
    wide = out.pivot(index="id", columns="name", values="val")
    np.testing.assert_array_equal(wide["x"], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(wide["y"], [10.0, 20.0, 30.0])


def test_range_count_join_brute_force(ray_session):
    rng = np.random.default_rng(4)
    lts = np.sort(rng.integers(0, 5000, 300)).astype(np.int64) * US
    rts = np.sort(rng.integers(0, 5000, 500)).astype(np.int64) * US
    left = pa.table({"i": pa.array(np.arange(300)),
                     "ts": pa.array(lts).cast(pa.timestamp("us"))})
    right = pa.table({"ts": pa.array(rts).cast(pa.timestamp("us"))})
    out = range_count_join(rd.from_arrow(left).repartition(3),
                           rd.from_arrow(right).repartition(3),
                           left_on="ts", right_on="ts",
                           lo_offset_s=-60, hi_offset_s=30).to_pandas()
    out = out.sort_values("i").reset_index(drop=True)
    for idx in range(0, 300, 17):
        lo, hi = lts[idx] - 60 * US, lts[idx] + 30 * US
        exp = int(((rts >= lo) & (rts <= hi)).sum())
        assert out.loc[idx, "n_in_range"] == exp


def test_cube_levels_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.reshape import cube_levels

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], n)),
        "b": pa.array(rng.choice(["p", "q"], n)),
        "value": pa.array(rng.integers(0, 1000, n) / 100.0),
    })
    got = (cube_levels(rd.from_arrow(t).repartition(5), keys=("a", "b"),
                       value_col="value").to_pandas()
           .fillna("~").sort_values(["a", "b"]).reset_index(drop=True))
    exp = (duckdb.sql("""
        SELECT a, b, count(*) AS n_rows, ROUND(sum(value), 2) AS value_sum
        FROM t GROUP BY CUBE(a, b)""").df()
           .fillna("~").sort_values(["a", "b"]).reset_index(drop=True))
    assert len(got) == len(exp)
    for c in ("a", "b", "n_rows", "value_sum"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
