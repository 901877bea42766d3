"""hash_join: dtype preservation and join semantics (the round-1 red cell was
int32 → float64 corruption via pandas nullable promotion in the bucket join)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from tsdat_ray.stages.joins import hash_join


@pytest.fixture
def sides(ray_session):
    left = pa.table(
        {
            "k": pa.array([1, 2, 2, 3, 5], pa.int64()),
            "ln": pa.array([10, 20, 21, 30, 50], pa.int32()),
            "price": pa.array([1.5, 2.5, 2.6, 3.5, 5.5]),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 2, 4], pa.int64()),
            "prio": pa.array(["a", "b", "d"]),
            "rn": pa.array([7, 8, 9], pa.int16()),
        }
    )
    return rd.from_arrow(left), rd.from_arrow(right)


def _collect(ds) -> pa.Table:
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def test_inner_preserves_dtypes(sides):
    l, r = sides
    out = _collect(hash_join(l, r, on="k", num_buckets=4))
    assert out.schema.field("ln").type == pa.int32()
    assert out.schema.field("rn").type == pa.int16()
    assert out.schema.field("k").type == pa.int64()
    got = sorted(zip(out["k"].to_pylist(), out["ln"].to_pylist(), out["prio"].to_pylist()))
    assert got == [(1, 10, "a"), (2, 20, "b"), (2, 21, "b")]


def test_left_join_nulls_keep_types(sides):
    l, r = sides
    out = _collect(hash_join(l, r, on="k", num_buckets=4, how="left"))
    assert out.num_rows == 5
    assert out.schema.field("rn").type == pa.int16()  # null-padded, still int16
    m = {k: v for k, v in zip(out["k"].to_pylist(), out["prio"].to_pylist())}
    assert m[3] is None and m[5] is None and m[1] == "a"


def test_bloom_semi_join_matches_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.joins import bloom_semi_join
    from tsdat_ray.stages.window_funcs import semi_anti_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 5000, 20_000).astype(np.int64)
    rk = rng.integers(2500, 7500, 8_000).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(lk),
                                   "rid": pa.array(np.arange(20_000,
                                                             dtype=np.int64))}
                                  )).repartition(7)
    right = rd.from_arrow(pa.table({"k2": pa.array(rk)})).repartition(5)
    for anti in (False, True):
        # bits_log2=10 on 5000 distinct keys forces a high FP rate — the
        # exact verify must still produce identical rows
        got = sorted(bloom_semi_join(left, "k", right, "k2", anti=anti,
                                     bits_log2=10).to_pandas()["rid"])
        exp = sorted(semi_anti_join(left, "k", right, "k2",
                                    anti=anti).to_pandas()["rid"])
        assert got == exp, f"anti={anti}"


def test_bloom_semi_join_string_keys_and_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.joins import bloom_semi_join

    left = rd.from_arrow(pa.table({"k": pa.array(["a", "b", "c", "d"]),
                                   "rid": pa.array([1, 2, 3, 4],
                                                   pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array(["b", "d", "zz"])}))
    got = sorted(bloom_semi_join(left, "k", right, "k").to_pandas()["rid"])
    assert got == [2, 4]
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    assert bloom_semi_join(left, "k", empty, "k").count() == 0
    assert sorted(bloom_semi_join(left, "k", empty, "k",
                                  anti=True).to_pandas()["rid"]) == [1, 2, 3, 4]


def test_skew_join_equals_hash_join_on_skewed_keys(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsdat_ray.stages.joins import hash_join, skew_join

    rng = np.random.default_rng(31)
    n = 8000
    # 80% of left rows share ONE key; right has 1-3 rows per key
    keys = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 500, n)).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys), "lv": pa.array(np.arange(n))}))
    rk, rv = [], []
    for kk in range(500):
        for j in range(int(rng.integers(1, 4))):
            rk.append(kk)
            rv.append(kk * 10 + j)
    right = rd.from_arrow(pa.table({"k": pa.array(np.array(rk, np.int64)),
                                    "rv": pa.array(np.array(rv, np.int64))}))
    a = skew_join(left.repartition(4), right.repartition(3), on="k",
                  hot_keys=4).to_pandas()
    b = hash_join(left, right, on="k").to_pandas()
    a = a.sort_values(["k", "lv", "rv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    b = b.sort_values(["k", "lv", "rv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    pd.testing.assert_frame_equal(a, b)
