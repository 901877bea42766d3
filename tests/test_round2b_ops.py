"""Edge cases for the round-2 continuation operators (domain mixing,
co-occurrence, windowed distinct, MAD outliers)."""

import numpy as np
import pyarrow as pa


def test_mix_domains_single_source_half_budget(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.sampling import mix_domains

    t = pa.table({
        "doc_id": pa.array(np.arange(400, dtype=np.int64)),
        "source": pa.array(["only"] * 400),
        "n_chars": pa.array(np.full(400, 10, dtype=np.int64)),
    })
    out = mix_domains(rd.from_arrow(t)).to_pandas()
    # one source: rate = (total//2)//1 / total = ~0.5 => md5 keeps ~half
    assert 120 <= len(out) <= 280
    # determinism: same input -> same sample
    out2 = mix_domains(rd.from_arrow(t)).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_cooccurrence_single_item_baskets_empty(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import cooccurrence_pairs

    t = pa.table({
        "u": pa.array(np.arange(50, dtype=np.int64)),
        "item": pa.array([f"i{j % 7}" for j in range(50)]),
    })
    out = cooccurrence_pairs(rd.from_arrow(t), key_cols=["u"],
                             item_col="item").to_pandas()
    assert len(out) == 0


def test_cooccurrence_counts_brute_force(ray_session):
    import itertools

    import ray.data as rd

    from tsdat_ray.stages.stats import cooccurrence_pairs

    rng = np.random.default_rng(11)
    n = 600
    baskets = rng.integers(0, 40, n)
    items = np.array([f"i{v}" for v in rng.integers(0, 6, n)], dtype=object)
    t = pa.table({"b": pa.array(baskets.astype(np.int64)),
                  "item": pa.array(items.tolist(), pa.string())})
    out = cooccurrence_pairs(rd.from_arrow(t).repartition(5),
                             key_cols=["b"], item_col="item").to_pandas()
    got = {(r.item_a, r.item_b): r.n for r in out.itertuples()}
    exp: dict = {}
    for bk in np.unique(baskets):
        its = sorted(set(items[baskets == bk].tolist()))
        for a, b in itertools.combinations(its, 2):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    assert got == exp


def test_windowed_active_users_brute_force(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.window_funcs import windowed_active_users

    rng = np.random.default_rng(5)
    n = 500
    users = rng.integers(0, 12, n).astype(np.int64)
    days = rng.integers(0, 40, n).astype(np.int64)
    ts = pa.array(days * 86_400_000_000 + 1, pa.timestamp("us"))
    t = pa.table({"user_id": pa.array(users), "ts": ts})
    out = windowed_active_users(rd.from_arrow(t).repartition(4)).to_pandas()
    got = dict(zip(out["day_num"], out["wau"]))
    lo, hi = days.min(), days.max() + 6
    for w in range(lo, hi + 1):
        active = len({u for u, d in zip(users, days) if w - 6 <= d <= w})
        if active:
            assert got.get(w) == active, w
        else:
            assert w not in got
    assert set(got) <= set(range(lo, hi + 1))


def test_mad_outliers_constant_group_flags_nothing(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import mad_outliers

    vals_b = [5.0] * 47 + [1000.0, 2000.0, 3000.0]  # heavy tail: 3 outliers
    t = pa.table({
        "k": pa.array(["a"] * 50 + ["b"] * 50),
        "v": pa.array([3.0] * 50 + vals_b),
    })
    out = mad_outliers(rd.from_arrow(t), key="k", value_col="v").to_pandas()
    # constant group a: dev == 0 == 3*MAD, nothing flagged; group b: MAD=0
    # (median dev 0), so every nonzero deviation flags
    assert (out["k"] == "b").all() and len(out) == 3
    assert sorted(out["v"]) == [1000.0, 2000.0, 3000.0]


def test_fingerprinter_flat_equals_scalar():
    """The flattened batch kernel is bit-identical to the scalar
    winnowing fingerprint across regimes: empty, under-k (zero-padded),
    k..k+window (single min), and long docs (sliding-window minima)."""
    import numpy as np
    import pyarrow as pa

    from tsdat_ray.stages.text import Fingerprinter

    rng = np.random.default_rng(9)
    texts = ["", "ab", "exactly8", "a bit longer than k",
             "x" * 23,  # constant text, duplicate window hashes
             ]
    alpha = np.array(list("abcdefgh "))
    texts += ["".join(rng.choice(alpha, rng.integers(1, 200))) for _ in range(300)]
    texts += [texts[7], texts[8]]  # duplicate docs
    fp = Fingerprinter(k=8, window=16)
    batch = pa.table({"doc_id": pa.array([str(i) for i in range(len(texts))]),
                      "text": pa.array(texts)})
    got = fp(batch)["fingerprint"].to_numpy(zero_copy_only=False)
    ref = np.array([fp.fingerprint(s) for s in texts], dtype=np.uint64)
    assert (got == ref).all()


def test_langid_vectorized_equals_scalar():
    import numpy as np
    import pyarrow as pa

    from tsdat_ray.stages.text import LangId

    rng = np.random.default_rng(4)
    vocab = ["the", "and", "der", "und", "le", "la", "el", "los", "tion",
             "sch", "que", "est", "is", "das", "xyz", "ción"]
    texts = [""] + [" ".join(rng.choice(vocab, rng.integers(0, 60)))
                    for _ in range(800)] + ["THE AND OF TO IS IN", None]
    li = LangId()
    batch = pa.table({"doc_id": pa.array([str(i) for i in range(len(texts))]),
                      "text": pa.array(texts, pa.string())})
    out = li(batch)
    ref = [li.classify(s) for s in texts]
    assert out["lang_pred"].to_pylist() == [r[0] for r in ref]
    assert np.array_equal(np.array(out["lang_conf"].to_pylist()),
                          np.array([r[1] for r in ref]))


def test_bpe_counter_arrow_path_and_fallback():
    """The RE2 kernel path self-verifies against python re on the first
    rows and is dropped permanently on disagreement; the lookahead pattern
    can't compile under RE2 and must fall back."""
    import numpy as np
    import pyarrow as pa

    from tsdat_ray.stages.text import BPEishTokenCounter

    rng = np.random.default_rng(5)
    words = ["hello", "world", "it's", "don't", "42", "x9", "!!", "  "]
    texts = [""] + [" ".join(rng.choice(words, rng.integers(0, 30)))
                    for _ in range(300)] + [None]
    batch = pa.table({"doc_id": pa.array([str(i) for i in range(len(texts))]),
                      "text": pa.array(texts, pa.string())})
    fast = BPEishTokenCounter(pattern=BPEishTokenCounter.PATTERN_RE2)
    out = fast(batch)["n_bpe_tokens"].to_numpy(zero_copy_only=False)
    ref = fast._python_counts([s or "" for s in texts], len(texts))
    assert fast._arrow_ok is True and (out == ref).all()
    slow = BPEishTokenCounter()  # lookahead: RE2 rejects → python path
    out2 = slow(batch)["n_bpe_tokens"].to_numpy(zero_copy_only=False)
    assert slow._arrow_ok is False and (out2 == ref).all()


def test_bpe_encoder_matches_scalar_and_roundtrips(ray_session):
    """BPEEncoder's vectorized batch assembly equals per-word scalar
    encoding, ids live in the trainer's id space, and decoding token names
    reconstructs the normalized text exactly."""
    import re

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import pyarrow.parquet as pq

    from tsdat_ray.stages.text import BPEEncoder, bpe_train

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).slice(0, 400)
    merges = bpe_train(rd.from_arrow(docs.select(["text"])),
                       n_merges=30).take_all()
    enc = BPEEncoder(merges)
    out = enc(docs.select(["doc_id", "text"]))
    texts = docs["text"].to_pylist()
    for i in (0, 1, 57, 200, 399):
        toks = out["tokens"][i].as_py()
        words = [w for w in re.split(r"[^0-9a-z]+", (texts[i] or "").lower()) if w]
        assert "".join(enc.names[t] for t in toks) == \
            "".join(w + "</w>" for w in words)
        # scalar parity per word
        flat = np.concatenate([enc.encode_word(w) for w in words]) \
            if words else np.zeros(0, np.int32)
        assert toks == flat.tolist()
    assert (np.asarray(out["n_tok"].to_pylist())
            == np.asarray([len(t) for t in out["tokens"].to_pylist()])).all()


def test_mix_domains_temperature_laws(ray_session):
    """τ ordering on a skewed two-domain corpus: equal-share keeps the
    most of the small domain, natural the least, sqrt strictly between;
    natural keeps a uniform rate, so domain shares stay ~proportional."""
    import ray.data as rd

    from tsdat_ray.stages.sampling import mix_domains

    n_big, n_small = 3600, 400
    t = pa.table({
        "doc_id": pa.array([f"d{i:05d}" for i in range(n_big + n_small)]),
        "source": pa.array(["big"] * n_big + ["small"] * n_small),
        "n_chars": pa.array(np.full(n_big + n_small, 10, dtype=np.int64)),
    })
    kept = {}
    for temp in ("equal", "sqrt", "natural"):
        # 1/10 budget: at 1/2 the small domain saturates (keeps all rows)
        # under every law and the ordering is unobservable
        out = mix_domains(rd.from_arrow(t), temperature=temp,
                          budget_frac_num=1, budget_frac_den=10).to_pandas()
        kept[temp] = out.groupby("source").size().to_dict()
    # small domain: equal > sqrt > natural keep counts
    se, ss, sn = (kept[t].get("small", 0) for t in ("equal", "sqrt", "natural"))
    assert se > ss > sn, (se, ss, sn)
    # natural: ~uniform keep-rate across domains (1/10 budget ⇒ ~0.1 each)
    be, bs, bn = (kept[t].get("big", 0) for t in ("equal", "sqrt", "natural"))
    assert abs(bn / n_big - (sn / n_small)) < 0.1
    # total kept rows stay near the 1/10 budget under every law
    for temp in ("equal", "sqrt", "natural"):
        assert sum(kept[temp].values()) <= 0.2 * (n_big + n_small)
