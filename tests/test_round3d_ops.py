"""Unit tests for the round-3 (continuation 5) operators: BM25 retrieval,
lift collocations, sharded inverted index, triangle census, corpus
fingerprint."""

import hashlib
import itertools

import numpy as np
import pyarrow as pa


def _docs(rows):
    return pa.table({
        "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "text": pa.array(rows, pa.string()),
    })


def test_bm25_matches_sequential_reference(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.text import bm25_topk

    rng = np.random.default_rng(7)
    vocab = ["data", "table", "query", "spark", "hash", "pad"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(80)] + ["", "pad pad pad"]
    terms = ["data", "spark", "hash"]
    k1, b = 1.5, 0.75

    out = bm25_topk(rd.from_arrow(_docs(texts)), terms, k=10, k1=k1, b=b)
    got = out.to_pandas().set_index("doc_id")

    # independent sequential reference (python floats are IEEE doubles, so
    # the same op order must reproduce scores bit-exactly)
    words = [[w for w in t.split(" ") if w] for t in texts]
    n_docs = len(texts)
    sum_dl = sum(len(ws) for ws in words)
    avgdl = float(sum_dl) / float(n_docs)
    df = {q: sum(1 for ws in words if q in ws) for q in terms}
    scores = {}
    for i, ws in enumerate(words):
        dl = len(ws)
        s, hit = 0.0, False
        for q in terms:
            tf = ws.count(q)
            if tf > 0:
                idf = (float(n_docs - df[q]) + 0.5) / (float(df[q]) + 0.5)
                s = s + idf * ((float(tf) * (k1 + 1.0))
                               / (float(tf) + (k1 * ((1.0 - b)
                                  + (b * (float(dl) / avgdl))))))
                hit = True
        if hit:
            scores[i] = (s, dl)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert list(got.index) == [i for i, _ in top]
    for i, (s, dl) in top:
        assert got.loc[i, "score"] == s  # bit-exact, not approx
        assert got.loc[i, "dl"] == dl


def test_collocations_lift_brute_force(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.text import collocations_lift

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(40)]
    out = collocations_lift(rd.from_arrow(_docs(texts)), k=5, min_count=3)
    got = out.to_pandas()

    from collections import Counter
    uni, bg = Counter(), Counter()
    for t in texts:
        ws = [w for w in t.lower().split(" ") if w]
        uni.update(ws)
        bg.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    n_w, n_bg = float(sum(uni.values())), float(sum(bg.values()))
    cand = []
    for g, cxy in bg.items():
        if cxy < 3:
            continue
        x, y = g.split(" ")
        lift = ((float(cxy) * n_w) * n_w) / ((n_bg * float(uni[x]))
                                             * float(uni[y]))
        cand.append((g, cxy, uni[x], uni[y], lift))
    cand.sort(key=lambda r: (-r[4], r[0]))
    want = cand[:5]
    assert list(got["bigram"]) == [r[0] for r in want]
    assert list(got["lift"]) == [r[4] for r in want]
    assert list(got["c_xy"]) == [r[1] for r in want]


def test_inverted_index_shards_and_postings(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.text import inverted_index

    texts = ["x y", "y", "x x y", "z", "y z"]
    out = inverted_index(rd.from_arrow(_docs(texts)), shard_size=2)
    got = out.to_pandas().sort_values(["word", "shard"]).reset_index(drop=True)

    want = {}  # (word, shard) -> sorted ids
    for i, t in enumerate(texts):
        for w in set(t.split(" ")):
            if w:
                want.setdefault((w, i // 2), set()).add(i)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        ids = sorted(want[(r["word"], r["shard"])])
        assert r["postings"] == ",".join(str(i) for i in ids)
        assert r["df_shard"] == len(ids)


def _brute_triangles(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        if (lo, hi) in es:
            continue
        es.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    tri = 0
    for a, b in es:
        tri += len(adj[a] & adj[b] - {a, b})
    tri //= 3 if False else 1
    # each triangle counted 3x (once per edge)
    return len(es), tri // 3, adj


def test_triangle_count_k4(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.graph import triangle_count

    # K4 plus noise: duplicates, reversed edges, a self-loop
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (1, 0), (3, 2), (2, 2), (0, 1)]
    tab = pa.table({"id_a": pa.array([a for a, _ in e], pa.int64()),
                    "id_b": pa.array([b for _, b in e], pa.int64())})
    out = triangle_count(rd.from_arrow(tab)).to_pandas().iloc[0]
    assert out["n_edges"] == 6
    assert out["n_triangles"] == 4
    # all degrees equal (3) -> orientation by id: outdegs 3,2,1,0 -> C sums
    assert out["n_wedges"] == 3 + 1
    assert out["closure_milli"] == 3000


def test_triangle_count_random_vs_brute(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.graph import triangle_count

    rng = np.random.default_rng(11)
    a = rng.integers(0, 30, size=200).astype(np.int64)
    b = rng.integers(0, 30, size=200).astype(np.int64)
    n_edges, n_tri, adj = _brute_triangles(zip(a.tolist(), b.tolist()))
    out = triangle_count(rd.from_arrow(
        pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
    ).to_pandas().iloc[0]
    assert out["n_edges"] == n_edges
    assert out["n_triangles"] == n_tri
    # oriented wedge identity: sum over triangles of 1 == closure numerator
    deg = {u: len(vs) for u, vs in adj.items()}
    rank = {u: (deg[u], u) for u in adj}
    outdeg = {}
    for x, ys in adj.items():
        for y in ys:
            if rank[x] < rank[y]:
                outdeg[x] = outdeg.get(x, 0) + 1
    want_wedges = sum(d * (d - 1) // 2 for d in outdeg.values())
    assert out["n_wedges"] == want_wedges

    # r5: the broadcast-close fast path and the co-shuffle fallback must
    # agree exactly (budget=0 forces the shuffle path)
    out2 = triangle_count(rd.from_arrow(
        pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})),
        broadcast_budget_bytes=0).to_pandas().iloc[0]
    assert out2.equals(out)


def test_corpus_fingerprint_order_independent(ray_session):
    import ray.data as rd

    from tsdat_ray.stages.stats import corpus_fingerprint

    texts = [f"doc number {i} body" for i in range(50)]
    tab = _docs(texts)
    fp1 = pa.concat_tables(corpus_fingerprint(rd.from_arrow(tab))
                           .iter_batches(batch_format="pyarrow",
                                         batch_size=None)).to_pandas().iloc[0]
    perm = np.random.default_rng(5).permutation(len(texts))
    fp2 = pa.concat_tables(corpus_fingerprint(
        rd.from_arrow(tab.take(pa.array(perm))).repartition(7))
        .iter_batches(batch_format="pyarrow",
                      batch_size=None)).to_pandas().iloc[0]
    want = sum(int(hashlib.md5(f"{i}|{t}".encode()).hexdigest()[:12], 16)
               for i, t in enumerate(texts)) % (1 << 48)
    assert fp1["fp48"] == fp2["fp48"] == want
    assert fp1["n_rows"] == fp2["n_rows"] == 50
