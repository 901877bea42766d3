"""Unit tests for the round-3 (continuation 6) operators: HRW sharding,
weighted priority sampling, winsorized sums, column profiling, Gini
concentration."""

import hashlib

import numpy as np
import pyarrow as pa


def test_hrw_assign_matches_brute_and_is_stable(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sampling import hrw_assign

    ids = np.arange(200, dtype=np.int64)
    tab = pa.table({"doc_id": pa.array(ids)})
    got = (hrw_assign(rd.from_arrow(tab), n_shards=8)
           .to_pandas().set_index("doc_id")["shard"])

    def brute(i, n):
        return max(range(n),
                   key=lambda s: (hashlib.md5(f"0:{i}:{s}".encode())
                                  .hexdigest(), -s))

    for i in ids:
        assert got[i] == brute(i, 8)

    # consistency property: going 8 -> 9 shards only MOVES rows whose new
    # argmax is the added shard; nobody else changes assignment
    got9 = (hrw_assign(rd.from_arrow(tab), n_shards=9)
            .to_pandas().set_index("doc_id")["shard"])
    moved = got9[got9 != got]
    assert (moved == 8).all()
    assert 0 < len(moved) < len(ids) / 2


def test_weighted_sample_topk_reference_and_bias(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sampling import weighted_sample_topk

    n = 400
    # half the corpus light (w=10), half heavy (w=1000)
    w = np.where(np.arange(n) % 2 == 0, 10, 1000).astype(np.int64)
    tab = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "n_chars": pa.array(w)})
    out = (weighted_sample_topk(rd.from_arrow(tab).repartition(5), k=50)
           .to_pandas())

    keys = {i: int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:12], 16)
            // max(int(w[i]), 1) for i in range(n)}
    want = sorted(keys, key=lambda i: (keys[i], i))[:50]
    assert list(out["doc_id"]) == want
    assert list(out["wkey"]) == [keys[i] for i in want]
    # heavy rows must dominate the sample (weight-monotone inclusion)
    assert (out["n_chars"] == 1000).sum() > 40


def test_winsorized_sums_brute_force(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import winsorized_sums

    rng = np.random.default_rng(2)
    k = np.array(["a", "b"])[rng.integers(0, 2, 500)]
    v = np.round(rng.normal(50, 30, 500), 2)  # cent-quantized w/ outliers
    v[:5] = 10_000.0  # extreme outliers
    tab = pa.table({"event_type": pa.array(k), "value": pa.array(v)})
    out = (winsorized_sums(rd.from_arrow(tab).repartition(4),
                           key="event_type", value_col="value")
           .to_pandas().set_index("event_type"))

    for kk in ("a", "b"):
        vv = np.sort(v[k == kk])
        n = len(vv)
        lo = vv[max(0, int(np.ceil(n * 0.01)) - 1)]
        hi = vv[max(0, int(np.ceil(n * 0.99)) - 1)]
        cents = np.round(np.clip(v[k == kk], lo, hi) * 100).astype(np.int64)
        assert out.loc[kk, "n"] == n
        assert out.loc[kk, "wins_sum"] == cents.sum() / 100


def test_profile_columns_exact(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import profile_columns

    tab = pa.table({
        "s": pa.array(["x", "y", None, "x", "y", "y"]),
        "i": pa.array([1, 1, 2, None, 3, 3], pa.int64()),
        "f": pa.array([0.0, -0.0, 1.5, 1.5, None, 2.25], pa.float64()),
    })
    out = (profile_columns(rd.from_arrow(tab).repartition(3),
                           cols=("s", "i", "f"))
           .to_pandas().set_index("column"))
    assert (out["n_rows"] == 6).all()
    assert out.loc["s", "n_null"] == 1 and out.loc["s", "n_distinct"] == 2
    assert out.loc["i", "n_null"] == 1 and out.loc["i", "n_distinct"] == 3
    # -0.0 folds into 0.0 (SQL equality), so f has 3 distinct non-null
    assert out.loc["f", "n_null"] == 1 and out.loc["f", "n_distinct"] == 3


def test_gini_concentration_known_values(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import gini_concentration

    # all-equal corpus -> G = 0
    eq = pa.table({"n_chars": pa.array([7] * 40, pa.int64())})
    row = (gini_concentration(rd.from_arrow(eq).repartition(4))
           .to_pandas().iloc[0])
    assert row["gini_num"] == 0 and row["gini_den"] == 40 * 7 * 40

    # brute force on random lengths, any order/partitioning
    rng = np.random.default_rng(9)
    x = rng.integers(1, 100, 321).astype(np.int64)
    row = (gini_concentration(
        rd.from_arrow(pa.table({"n_chars": pa.array(x)})).repartition(6))
        .to_pandas().iloc[0])
    xs = np.sort(x)
    n = len(xs)
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * xs).sum())
    assert row["n"] == n and row["sum_x"] == xs.sum()
    assert row["gini_num"] == num and row["gini_den"] == n * int(xs.sum())
