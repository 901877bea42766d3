"""Sampling / packing / histogram operators (training-data curation)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from tsdat_ray.stages.sampling import (
    hash_split,
    pack_sequences,
    stratified_sample,
    token_histogram,
)
from tsdat_ray.synth import generate_sequences_table


@pytest.fixture(scope="module")
def seqs() -> pa.Table:
    return generate_sequences_table(3000, seed=5)


def test_stratified_sample_matches_window_sql(ray_session, seqs):
    import ray.data as rd

    out = stratified_sample(rd.from_arrow(seqs), key="source", order_col="doc_id",
                            n_per_key=40).to_pandas()
    con = duckdb.connect()
    con.register("t", seqs.select(["doc_id", "source"]))
    exp = con.sql(
        "SELECT doc_id, source FROM (SELECT doc_id, source,"
        " row_number() OVER (PARTITION BY source ORDER BY doc_id) rn FROM t)"
        " WHERE rn <= 40"
    ).df()
    got = out[["doc_id", "source"]].sort_values(["source", "doc_id"]).reset_index(drop=True)
    exp = exp.sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert got.equals(exp)


def test_hash_split_deterministic_fractions(ray_session, seqs):
    import ray.data as rd

    out = hash_split(rd.from_arrow(seqs), fractions={"train": 0.8, "val": 0.1, "test": 0.1},
                     seed=3).to_pandas()
    again = hash_split(rd.from_arrow(seqs), fractions={"train": 0.8, "val": 0.1, "test": 0.1},
                       seed=3).to_pandas()
    m = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (m["split_a"] == m["split_b"]).all(), "split not deterministic"
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    # different seed → different assignment (mostly)
    other = hash_split(rd.from_arrow(seqs), seed=4).to_pandas()
    m2 = out.merge(other, on="doc_id", suffixes=("_a", "_b"))
    assert (m2["split_a"] != m2["split_b"]).mean() > 0.05


def test_pack_sequences_conserves_tokens(ray_session, seqs):
    import ray.data as rd

    ctx = 512
    sub = seqs.slice(0, 500)
    out = pack_sequences(rd.from_arrow(sub), context_len=ctx).to_pandas()
    # every example except (possibly) per-batch finals is exactly ctx long
    lens = out["n_tok"].to_numpy()
    assert (lens <= ctx).all()
    assert (lens == ctx).sum() >= len(lens) - out["example_id"].eq(out["example_id"].max()).sum()
    # token conservation: total packed == total input
    assert lens.sum() == sum(len(t) for t in sub["tokens"].to_pylist())
    # boundary sanity on the first example of the first batch
    row = out[out["example_id"] == 0].iloc[0]
    toks = row["tokens"]
    first_doc = row["doc_ids"][0]
    orig = dict(zip(sub["doc_id"].to_pylist(), sub["tokens"].to_pylist()))[first_doc]
    k = min(len(orig), len(toks))
    assert list(toks[:k]) == list(orig[:k]) or list(toks[: len(orig)]) == list(orig)


def test_token_histogram_matches_duckdb(ray_session, seqs):
    import ray.data as rd

    got = token_histogram(rd.from_arrow(seqs)).to_pandas().sort_values("token").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", seqs.select(["tokens"]))
    exp = con.sql(
        "SELECT CAST(u AS INTEGER) AS token, count(*) AS n FROM"
        " (SELECT unnest(tokens) u FROM t) GROUP BY 1 ORDER BY 1"
    ).df()
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["token"].to_numpy(), exp["token"].to_numpy())
    np.testing.assert_array_equal(got["n"].to_numpy(), exp["n"].to_numpy())


# --------------------------------------------------------------------------- #
# windowed aggregates
# --------------------------------------------------------------------------- #

def test_sliding_window_small(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.window import sliding_window_agg

    US = 1_000_000
    # events at 0s, 70s, 130s for key "a"; window 120s, slide 60s
    tbl = pa.table(
        {
            "k": pa.array(["a", "a", "a"]),
            "ts": pa.array(np.array([0, 70, 130], dtype=np.int64) * US).cast(pa.timestamp("us")),
            "v": pa.array([1.0, 2.0, 4.0]),
        }
    )
    out = (
        sliding_window_agg(rd.from_arrow(tbl), key="k", ts_col="ts", value_col="v",
                           window_s=120, slide_s=60)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # windows: -60 [only ev0], 0 [ev0, ev1], 60 [ev1, ev2], 120 [ev2]
    assert out["window_start"].astype("int64").tolist() == [-60 * US, 0, 60 * US, 120 * US]
    assert out["n_rows"].tolist() == [1, 2, 2, 1]
    assert out["value_sum"].tolist() == [1.0, 3.0, 6.0, 4.0]
    assert out["value_max"].tolist() == [1.0, 2.0, 4.0, 4.0]


def test_session_window_small(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.window import session_window_agg

    US = 1_000_000
    ts = np.array([0, 10, 25, 100, 111, 300], dtype=np.int64) * US
    tbl = pa.table(
        {
            "k": pa.array(["a"] * 6),
            "eid": pa.array(np.arange(6)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "v": pa.array([1.0] * 6),
        }
    )
    out = (
        session_window_agg(rd.from_arrow(tbl), key="k", ts_col="ts", value_col="v",
                           gap_s=30, id_col="eid")
        .to_pandas()
        .sort_values("session_start")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["n_rows"].tolist() == [3, 2, 1]
    assert out["session_start"].astype("int64").tolist() == [0, 100 * US, 300 * US]
    assert out["session_end"].astype("int64").tolist() == [25 * US, 111 * US, 300 * US]


def test_session_window_spans_salt_partitions(ray_session):
    """One key whose sessions straddle many salt windows must match the
    single-pass reference exactly (VERDICT r1 item 5: salted sessionization
    with boundary merge)."""
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.window import session_window_agg

    US = 1_000_000
    rng = np.random.default_rng(3)
    # bursts separated by > gap, with events that intentionally cross the
    # salt-window edges (salt_window_s=100 → edges at 100s, 200s, ...)
    gaps = rng.integers(1, 20, 200)  # intra-session gaps (< gap_s=25)
    breaks = np.zeros(200, dtype=np.int64)
    breaks[rng.choice(200, 12, replace=False)] = rng.integers(26, 120, 12)
    ts = np.cumsum(gaps + breaks).astype(np.int64) * US
    tbl = pa.table(
        {
            "k": pa.array(["hot"] * 200),
            "eid": pa.array(np.arange(200)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "v": pa.array(rng.normal(size=200)),
        }
    )
    out = (
        session_window_agg(rd.from_arrow(tbl).repartition(8), key="k", ts_col="ts",
                           value_col="v", gap_s=25, id_col="eid", salt_window_s=100)
        .to_pandas().sort_values("session_start").reset_index(drop=True)
    )
    assert ts.max() // (100 * US) >= 4, "test must span >=4 salt windows"
    # single-pass reference
    order = np.argsort(ts, kind="stable")
    tss = ts[order]
    brk = np.r_[True, np.diff(tss) > 25 * US]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], len(tss)]
    assert len(out) == len(starts)
    assert out["session_start"].astype("int64").tolist() == tss[starts].tolist()
    assert out["session_end"].astype("int64").tolist() == tss[ends - 1].tolist()
    assert out["n_rows"].tolist() == (ends - starts).tolist()
    v = tbl["v"].to_numpy()[order]
    np.testing.assert_allclose(out["value_sum"].to_numpy(),
                               np.add.reduceat(v, starts), rtol=1e-12)


def test_approx_global_shuffle(ray_session, seqs):
    import ray.data as rd
    from ray.data import DataContext

    from tsdat_ray.stages.sampling import approx_global_shuffle

    # per-seed stream determinism holds under preserve_order: with the
    # default (False) the executor emits blocks in COMPLETION order, so two
    # runs of the identical plan can interleave differently (observed as a
    # cold-session flake)
    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        ds = rd.from_arrow(seqs).repartition(8)
        out1 = approx_global_shuffle(ds, seed=1).to_pandas()["doc_id"].tolist()
        out2 = approx_global_shuffle(rd.from_arrow(seqs).repartition(8), seed=1).to_pandas()["doc_id"].tolist()
        out3 = approx_global_shuffle(rd.from_arrow(seqs).repartition(8), seed=2).to_pandas()["doc_id"].tolist()
    finally:
        ctx.execution_options.preserve_order = prev
    orig = seqs["doc_id"].to_pylist()
    assert sorted(out1) == sorted(orig)          # permutation, nothing lost
    assert out1 == out2                          # deterministic per seed
    assert out1 != out3 and out1 != orig         # actually shuffles


def test_topk_words_exact(ray_session):
    import collections
    import re

    import ray.data as rd

    from tsdat_ray.stages.text import topk_words

    texts = [f"apple banana cherry word{i % 7} APPLE-banana!!x" for i in range(40)]
    tbl = pa.table({"text": pa.array(texts)})
    got = topk_words(rd.from_arrow(tbl), k=5).to_pandas()
    cnt = collections.Counter(
        w for t in texts for w in re.split(r"[^0-9a-z]+", t.lower()) if w
    )
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(map(tuple, got[["word", "n"]].to_numpy())) == want


def test_mask_repeated_ngrams_sequential_reference(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sampling import mask_repeated_ngrams

    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        n = int(rng.integers(0, 60))
        toks = rng.integers(0, 5, n).astype(np.int32)  # tiny vocab => repeats
        rows.append({"doc_id": f"d{i}", "tokens": toks.tolist()})
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.int32())),
    })
    N = 4
    out = {r["doc_id"]: (r["n_tok"], r["n_masked"])
           for r in mask_repeated_ngrams(rd.from_arrow(tbl).repartition(3), n=N)
           .take_all()}

    for r in rows:
        t = r["tokens"]
        seen, covered = set(), np.zeros(len(t), dtype=bool)
        for s in range(len(t) - N + 1):
            g = tuple(t[s:s + N])
            if g in seen:
                covered[s:s + N] = True
            seen.add(g)
        assert out[r["doc_id"]] == (len(t), int(covered.sum())), r["doc_id"]


def test_length_bucket_stats(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sampling import length_bucket_stats

    tbl = pa.table({
        "source": pa.array(["a", "a", "b", "a"]),
        "n_tok": pa.array([10, 64, 65, 5000], pa.int32()),
    })
    out = {(r["source"], r["bucket"]): (r["n_seqs"], r["n_tokens"])
           for r in length_bucket_stats(rd.from_arrow(tbl)).take_all()}
    # edges (64,128,...,2048), side=right: bucket b holds edges[b-1] <= n < edges[b]
    assert out[("a", 0)] == (1, 10)
    assert out[("a", 1)] == (1, 64)
    assert out[("b", 1)] == (1, 65)
    assert out[("a", 6)] == (1, 5000)


def test_mask_repeated_ngrams_chunked_path(ray_session):
    """> 2048 rows triggers the arena-sized chunking (and hence the
    sliced-ListArray values rebase) inside the kernel — pin it against the
    sequential reference on a corpus large enough to chunk twice."""
    import ray.data as rd

    from tsdat_ray.stages.sampling import mask_repeated_ngrams

    rng = np.random.default_rng(7)
    n_rows = 5000
    lens = rng.integers(0, 30, n_rows)
    toks = [rng.integers(0, 4, n).astype(np.int32).tolist() for n in lens]
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n_rows)]),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
    })
    N = 3
    out = {r["doc_id"]: (r["n_tok"], r["n_masked"])
           for r in mask_repeated_ngrams(rd.from_arrow(tbl), n=N).take_all()}
    assert len(out) == n_rows
    for i in rng.integers(0, n_rows, 300):
        t = toks[i]
        seen, covered = set(), np.zeros(len(t), dtype=bool)
        for s in range(len(t) - N + 1):
            g = tuple(t[s:s + N])
            if g in seen:
                covered[s:s + N] = True
            seen.add(g)
        assert out[f"d{i}"] == (len(t), int(covered.sum())), i


def test_md5_sample_topk_stable_under_layout_and_appends(ray_session):
    """Membership depends only on each row's own id: the same k survivors
    at any partitioning, and appending unrelated rows can only displace by
    hash rank (here: disjoint ids keep the original sample iff their
    digests stay smallest)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.sampling import md5_sample_topk

    ids = np.arange(1000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})
    a = md5_sample_topk(rd.from_arrow(tbl).repartition(3), k=25).to_pandas()
    b = md5_sample_topk(rd.from_arrow(tbl).repartition(17), k=25).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    exp = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:25]
    assert a["doc_id"].tolist() == exp
    assert a["md5_key"].is_monotonic_increasing


def test_pack_sequences_global_matches_bruteforce(ray_session):
    """The global packing plan equals a sequential brute force on the SAME
    total order, for ANY block layout — including duplicate doc_ids with
    distinct payloads and zero-length docs (which occupy no span)."""
    import pandas as pd
    import ray.data as rd

    from tsdat_ray.stages.sampling import pack_sequences_global

    rng = np.random.default_rng(3)
    ids, toks = [], []
    for i in range(500):
        src = ["web", "code"][i % 2]
        ids.append(f"{src}-{i // 2:08d}")
        toks.append(rng.integers(0, 1000, rng.integers(0, 40))
                    .astype(np.int32).tolist())
    ids += [ids[10], ids[10], ids[42]]
    toks += [rng.integers(0, 1000, 17).astype(np.int32).tolist(),
             rng.integers(0, 1000, 17).astype(np.int32).tolist(), []]
    tbl = pa.table({"doc_id": pa.array(ids),
                    "tokens": pa.array(toks, pa.list_(pa.int32()))})
    L = 64

    rows = [(i, t) for i, t in zip(ids, toks) if len(t) > 0]
    rows.sort(key=lambda r: (r[0], len(r[1]) * 2**32 + sum(r[1])))
    s, ex = 0, {}
    for _, t in rows:
        e = s + len(t)
        for x in range(s // L, (e - 1) // L + 1):
            a = ex.setdefault(x, [0, 0])
            a[0] += min(e, (x + 1) * L) - max(s, x * L)
            a[1] += 1
        s = e
    ref = pd.DataFrame([(k, v[0], v[1]) for k, v in sorted(ex.items())],
                       columns=["example_id", "n_tok", "n_docs"]).astype("int64")

    for nparts in (1, 7):
        out = (pack_sequences_global(rd.from_arrow(tbl).repartition(nparts),
                                     context_len=L, docs_per_window=16)
               .to_pandas().sort_values("example_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref)
    # every example is exactly full except possibly the last
    assert (ref["n_tok"][:-1] == L).all() and 0 < ref["n_tok"].iloc[-1] <= L


def test_global_shuffle_rank_is_a_portable_permutation(ray_session):
    """Positions are exactly 0..n-1, identical under re-partitioning, and
    match the single-process md5-order reference; a different seed draws a
    different permutation."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.sampling import global_shuffle_rank

    ids = np.arange(1000, dtype=np.int64)
    tab = pa.table({"doc_id": pa.array(ids)})

    def run(nparts, seed):
        out = global_shuffle_rank(rd.from_arrow(tab).repartition(nparts),
                                  seed=seed).to_pandas()
        return out.sort_values("doc_id")["shuffle_pos"].to_numpy()

    p3 = run(3, 0)
    assert sorted(p3.tolist()) == list(range(1000))
    ref = np.empty(1000, np.int64)
    order = sorted(range(1000), key=lambda i: (hashlib.md5(
        f"0:{i}".encode()).hexdigest(), i))
    for pos, i in enumerate(order):
        ref[i] = pos
    assert (p3 == ref).all()
    assert (run(7, 0) == p3).all()          # layout-independent
    assert (run(3, 1) != p3).any()          # seed draws a new permutation


def test_curriculum_rank_orders_strata_then_shuffles(ray_session):
    """Strata occupy contiguous position ranges in stratum order; within a
    stratum positions follow the md5 permutation (not id order)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.sampling import global_shuffle_rank

    ids = np.arange(600, dtype=np.int64)
    strata = (ids % 3).astype(np.int64)
    tab = pa.table({"doc_id": pa.array(ids), "stratum": pa.array(strata)})
    out = global_shuffle_rank(rd.from_arrow(tab).repartition(5),
                              strata_col="stratum", n_strata=3,
                              carry_cols=("stratum",),
                              pos_col="pos").to_pandas()
    assert sorted(out["pos"]) == list(range(600))
    for s in range(3):
        ps = np.sort(out[out.stratum == s]["pos"].to_numpy())
        assert ps[0] == s * 200 and ps[-1] == s * 200 + 199  # contiguous
    sub = out[out.stratum == 0].sort_values("doc_id")
    assert not np.all(np.diff(sub["pos"].to_numpy()) > 0)  # shuffled inside


def test_oov_rate_hand_counts(ray_session):
    """OOV rate vs a tiny top-k vocabulary, counted by hand: vocab_k=2 keeps
    the two most frequent words (count DESC, word ASC tie-break)."""
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.text import oov_rate

    tab = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["aa bb aa", "aa cc", ""]),
    })
    out = (oov_rate(rd.from_arrow(tab).repartition(2), vocab_k=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # counts: aa=3, bb=1, cc=1 -> vocab {aa, bb} (tie bb<cc)
    assert out["n_words"].tolist() == [3, 2, 0]
    assert out["n_oov"].tolist() == [0, 1, 0]
    assert out["oov_rate"].tolist() == [0.0, 0.5, 0.0]


def test_quantile_gate_per_key_floor(ray_session):
    """P25 floor per key on integer scores: DuckDB quantile_disc convention
    (ceil(n*q)-1), keep >= threshold."""
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.sampling import quantile_gate

    # key 'a': values 1..8 -> P25 = value at ceil(8*.25)-1 = idx 1 -> 2
    # key 'b': values 10,20,30 -> P25 = idx ceil(.75)-1 = 0 -> 10 (keep all)
    tab = pa.table({
        "k": pa.array(["a"] * 8 + ["b"] * 3),
        "v": pa.array(list(range(1, 9)) + [10, 20, 30], pa.int64()),
    })
    out = (quantile_gate(rd.from_arrow(tab).repartition(3), "k", "v", q=0.25)
           .to_pandas())
    a = sorted(out[out.k == "a"]["v"])
    b = sorted(out[out.k == "b"]["v"])
    assert a == [2, 3, 4, 5, 6, 7, 8]
    assert b == [10, 20, 30]
    # ceiling gate: keep the slow quartile instead
    out2 = (quantile_gate(rd.from_arrow(tab).repartition(3), "k", "v",
                          q=0.25, keep="le").to_pandas())
    assert sorted(out2[out2.k == "a"]["v"]) == [1, 2]


def test_gopher_rules_hand_signals(ray_session):
    """Composite quality rule on hand-crafted docs: each sub-rule trips
    independently and the signals are exact."""
    import pyarrow as pa
    import ray.data as rd

    from tsdat_ray.stages.text import gopher_rules

    docs = {
        1: "the cat and the dog have fun with all of that stuff here",  # ok
        2: "short",                                            # too few words
        3: "xx yy zz aa bb cc dd ee ff gg",                    # no stopwords
        4: "the ### and ... of ... that have with ... be to",  # symbol-heavy
    }
    tab = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()))})
    out = (gopher_rules(rd.from_arrow(tab).repartition(2), min_words=5,
                        min_stopwords=2, max_symbol_ratio=0.2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "keep"] and out.loc[1, "n_stop"] >= 4
    assert not out.loc[2, "keep"] and out.loc[2, "n_words"] == 1
    assert not out.loc[3, "keep"] and out.loc[3, "n_stop"] == 0
    # doc 4: '#'*3 + '...'*3 = 6 symbols over 10 words -> ratio 0.6 > 0.2
    assert out.loc[4, "n_sym"] == 6 and not out.loc[4, "keep"]


def test_dsir_logratio_prefers_target_like_docs(ray_session):
    """Importance ratio = score under target LM minus score under raw LM:
    equals the two independent score_bigram_lm passes, and ranks
    target-vocabulary docs above off-target ones."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from tsdat_ray.stages.text import (dsir_logratio, fit_bigram_lm,
                                       score_bigram_lm)

    tgt_texts = [f"alpha beta gamma delta epsilon zeta {i}" for i in range(20)]
    off_texts = [f"uno dos tres cuatro cinco seis {i}" for i in range(20)]
    corpus = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(tgt_texts + off_texts),
    })
    target = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                       "text": pa.array(tgt_texts)})
    ds = rd.from_arrow(corpus).repartition(3)
    m_t = ray.put(fit_bigram_lm(rd.from_arrow(target)))
    m_r = ray.put(fit_bigram_lm(ds))
    out = dsir_logratio(ds, m_t, m_r).to_pandas().set_index("doc_id").sort_index()
    st = score_bigram_lm(ds, m_t).to_pandas().set_index("doc_id").sort_index()
    sr = score_bigram_lm(ds, m_r).to_pandas().set_index("doc_id").sort_index()
    want = (st["avg_logp"] - sr["avg_logp"]).to_numpy()
    np.testing.assert_allclose(out["dsir_weight"].to_numpy(), want, rtol=1e-12)
    # every target doc outranks every off-target doc
    assert out.loc[:19, "dsir_weight"].min() > out.loc[20:, "dsir_weight"].max()
