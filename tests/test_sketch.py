"""HyperLogLog sketch: accuracy, mergeability, distributed equivalence."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from tsdat_ray.stages.sketch import approx_distinct, hll_estimate, hll_registers


def test_hll_accuracy_across_cardinalities():
    rng = np.random.default_rng(9)
    for true_n in (50, 1000, 50_000, 500_000):
        vals = rng.integers(0, 10**15, true_n)  # ~all distinct
        est = hll_estimate(hll_registers(np.unique(vals), p=12))
        assert est == pytest.approx(len(np.unique(vals)), rel=0.05), true_n


def test_hll_merge_equals_union():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 10**12, 20000)
    b = rng.integers(0, 10**12, 20000)
    ra, rb = hll_registers(a, p=12), hll_registers(b, p=12)
    merged = np.maximum(ra, rb)
    direct = hll_registers(np.r_[a, b], p=12)
    np.testing.assert_array_equal(merged, direct)  # merge is exact, not approx


def test_hll_duplicates_dont_inflate():
    vals = np.repeat(np.arange(100), 1000)  # 100 distinct, 100k rows
    est = hll_estimate(hll_registers(vals, p=12))
    assert est == pytest.approx(100, rel=0.05)


def test_approx_distinct_vs_exact(ray_session):
    rng = np.random.default_rng(5)
    n = 60000
    t = pa.table(
        {
            "k": pa.array(rng.choice(["x", "y", "z"], n)),
            "u": pa.array(rng.integers(0, 5000, n)),
        }
    )
    out = approx_distinct(rd.from_arrow(t).repartition(6), key="k", value="u",
                          p=12).to_pandas().set_index("k")
    df = t.to_pandas()
    for k in ("x", "y", "z"):
        exact = df[df["k"] == k]["u"].nunique()
        assert out.loc[k, "n_distinct_approx"] == pytest.approx(exact, rel=0.05)


def test_tdigest_accuracy_normal():
    from tsdat_ray.stages.sketch import tdigest_build, tdigest_merge, tdigest_quantile

    rng = np.random.default_rng(7)
    x = rng.normal(100.0, 15.0, 200_000)
    m, w = tdigest_build(x)
    assert len(m) < 400  # bounded state
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = tdigest_quantile(m, w, q)
        exact = np.quantile(x, q)
        # absolute error in quantile SPACE: |F(est) - q| small
        q_of_est = (x <= est).mean()
        assert abs(q_of_est - q) < 0.01, (q, est, exact)


def test_tdigest_merge_matches_whole():
    from tsdat_ray.stages.sketch import tdigest_build, tdigest_merge, tdigest_quantile

    rng = np.random.default_rng(8)
    parts = [rng.exponential(5.0, 30_000) for _ in range(6)]
    whole = np.concatenate(parts)
    merged = tdigest_merge([tdigest_build(p) for p in parts])
    for q in (0.1, 0.5, 0.9, 0.99):
        est = tdigest_quantile(*merged, q)
        q_of_est = (whole <= est).mean()
        assert abs(q_of_est - q) < 0.015, q


def test_approx_quantiles_distributed(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sketch import approx_quantiles

    rng = np.random.default_rng(9)
    n = 80_000
    k = rng.choice(["a", "b"], n)
    v = np.where(k == "a", rng.normal(0, 1, n), rng.lognormal(1, 0.5, n))
    t = pa.table({"k": pa.array(k), "v": pa.array(v)})
    out = approx_quantiles(rd.from_arrow(t).repartition(8), key="k", value="v",
                           qs=(0.5, 0.9)).to_pandas().set_index("k")
    for kk in ("a", "b"):
        vals = v[k == kk]
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            est = out.loc[kk, col]
            assert abs((vals <= est).mean() - q) < 0.02, (kk, q)


def test_misra_gries_guarantee():
    from tsdat_ray.stages.sketch import mg_summary

    rng = np.random.default_rng(11)
    # zipf-ish: a few heavy values among noise
    heavy = np.repeat(np.array([1, 2, 3]), [5000, 3000, 1500])
    noise = rng.integers(1000, 100000, 10000)
    vals = np.r_[heavy, noise]
    rng.shuffle(vals)
    n, k = len(vals), 50
    vv, cc = mg_summary(vals, k=k)
    assert len(vv) <= k
    got = dict(zip(vv.tolist(), cc.tolist()))
    for h, true_c in ((1, 5000), (2, 3000), (3, 1500)):
        assert h in got  # freq > n/k = 390 → must survive
        assert true_c - n / k <= got[h] <= true_c  # undercount bound


def test_heavy_hitters_distributed(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(12)
    heavy = np.repeat(np.array(["the", "of", "and"], dtype=object), [8000, 5000, 2500])
    noise = np.array([f"w{i}" for i in rng.integers(0, 200000, 30000)], dtype=object)
    vals = np.r_[heavy, noise]
    rng.shuffle(vals)
    t = pa.table({"tok": pa.array(vals.tolist())})
    out = heavy_hitters(rd.from_arrow(t).repartition(8), col="tok", k=100).to_pandas()
    top = out.head(3)["tok"].tolist()
    assert set(top) == {"the", "of", "and"}
    n = len(vals)
    m = dict(zip(out["tok"], out["min_count"]))
    # merged MG: undercount ≤ (levels)·n/k; allow 3 levels of slack
    assert 8000 - 3 * n / 100 <= m["the"] <= 8000


def test_cms_error_bound_and_merge():
    """Count-Min guarantees: estimates never UNDERcount; merged sketch of
    two halves equals the whole-set sketch (element-wise add)."""
    import numpy as np

    from tsdat_ray.stages.sketch import cms_query, cms_table

    rng = np.random.default_rng(7)
    # zipf-ish: value v appears ~ 5000/v times
    vals = np.repeat(np.arange(1, 301), (5000 // np.arange(1, 301)).astype(int))
    rng.shuffle(vals)
    t = cms_table(vals, width=2048, depth=4)
    qv = np.arange(1, 301)
    est = cms_query(t, qv)
    exact = 5000 // qv
    assert (est >= exact).all()  # one-sided error
    # eps = e/width bound at the 1-e^-depth confidence; allow the full bound
    eps_n = np.e / 2048 * len(vals)
    assert (est - exact <= eps_n).mean() > 0.98
    ta = cms_table(vals[: len(vals) // 2], width=2048, depth=4)
    tb = cms_table(vals[len(vals) // 2:], width=2048, depth=4)
    np.testing.assert_array_equal(ta + tb, t)


def test_approx_counts_distributed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.sketch import approx_counts

    vals = np.repeat(np.arange(50, dtype=np.int64), 40)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(6)
    out = approx_counts(ds, "v", np.arange(50, dtype=np.int64)).to_pandas()
    assert (out["count_est"] >= 40).all()
    assert (out["count_est"] <= 40 + np.e / 2048 * len(vals) + 1).all()
