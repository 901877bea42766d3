"""Mergeable sketches for cardinality at 100 TB scale.

``distinct_count`` (dedup.py) is exact but moves every distinct pair; when
distinct values outgrow workers, the right tool is a fixed-size mergeable
sketch.  HyperLogLog (Flajolet et al. 2007, with the small-range linear
counting correction) fits the engine's reduction shape perfectly: per-batch
register arrays (2^p bytes per key), element-wise MAX to merge — associative
and idempotent, so the same ``tree_reduce`` used for histograms applies, and
the shuffle payload per key is constant regardless of corpus size.

Standard error ≈ 1.04/sqrt(2^p) (p=12 → ~1.6%).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .reduce import tree_reduce


def _hash64(values: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.util.hash_array(np.asarray(values))


def hll_registers(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8[2^p]) for one value set, vectorized: bucket =
    top p hash bits; rank = leading-zero count of the remaining 64-p bits,
    +1; register = max rank per bucket."""
    m = 1 << p
    h = _hash64(values)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining bits, left-aligned
    # rank = position of the first 1 bit from the top, 1-based; all-zero
    # rest → 64-p+1
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # count leading zeros via float trick is lossy; use bit scan loop on
        # the log2: float64 mantissa holds 52 bits exactly, and rest's top
        # bit position ≤ 63 → log2 is exact for the leading-bit position
        top = np.zeros(len(h), dtype=np.int64)
        r = rest[nz]
        top_nz = np.floor(np.log2(r.astype(np.float64))).astype(np.int64)
        # guard against float rounding at 2^63 boundaries: verify and fix
        too_hi = (np.uint64(1) << np.clip(top_nz, 0, 63).astype(np.uint64)) > r
        top_nz = top_nz - too_hi.astype(np.int64)
        top[nz] = top_nz
        rank_nz = (63 - top[nz] + 1).astype(np.uint8)
        rank[nz] = rank_nz
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with linear-counting small-range fix."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def tdigest_build(values: np.ndarray, delta: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Build a t-digest (Dunning & Ertl: 'Computing extremely accurate
    quantiles using t-digests') from a value array: sorted centroids
    (means, weights) compressed under the k1 scale function, which bounds
    centroid weight near the median and keeps the tails exact-ish."""
    v = np.sort(values[~np.isnan(values)])
    w = np.ones(len(v))
    return tdigest_compress(v, w, delta)


def tdigest_compress(means: np.ndarray, weights: np.ndarray, delta: int = 200):
    """Merge sorted centroids greedily while each stays under the k1 size
    bound; input must be sorted by mean."""
    n = len(means)
    if n == 0:
        return means, weights
    total = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = means[0], weights[0]
    q0 = 0.0

    def k1(q):  # scale function: fine near 0/1, coarse at the median
        return delta / (2 * np.pi) * np.arcsin(2 * q - 1)

    for i in range(1, n):
        q2 = q0 + (cur_w + weights[i]) / total
        if k1(min(q2, 1.0)) - k1(q0) <= 1.0:
            cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
            cur_w += weights[i]
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            cur_m, cur_w = means[i], weights[i]
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def tdigest_merge(digests: list[tuple[np.ndarray, np.ndarray]], delta: int = 200):
    """Merge digests: concatenate centroids, sort by mean, re-compress —
    associative up to the approximation bound (the mergeable-sketch
    property the tree reduction needs)."""
    if not digests:
        return np.zeros(0), np.zeros(0)
    m = np.concatenate([d[0] for d in digests])
    w = np.concatenate([d[1] for d in digests])
    order = np.argsort(m, kind="stable")
    return tdigest_compress(m[order], w[order], delta)


def tdigest_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate a quantile: linear interpolation between centroid means at
    cumulative-weight midpoints (standard t-digest estimator)."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    cum = np.cumsum(weights) - weights / 2.0
    target = q * weights.sum()
    return float(np.interp(target, cum, means))


def approx_quantiles(ds, key: str, value: str, qs: tuple = (0.5,),
                     delta: int = 200, fanin: int = 8):
    """Approximate per-key quantiles of an ARBITRARY float column via
    t-digests: per-batch digests per key, tree-merged (constant-size state —
    ≤ ~delta centroids per key regardless of rows), estimated at the root.
    Use ``exact_quantiles_quantized`` when the column is decimal-quantized
    and exactness matters.  Output columns ``q<percent>``."""

    def partial(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        if "_tm" in b.column_names:  # merge partials
            order = np.argsort(k, kind="stable")
            ks = k[order]
            tms = [np.asarray(x) for x in b["_tm"].to_pylist()]
            tws = [np.asarray(x) for x in b["_tw"].to_pylist()]
            chg = np.r_[True, ks[1:] != ks[:-1]] if len(ks) else np.zeros(0, bool)
            st = np.flatnonzero(chg)
            en = np.r_[st[1:], len(ks)]
            out_k, out_m, out_w = [], [], []
            for s, e in zip(st, en):
                m, w = tdigest_merge([(tms[order[i]], tws[order[i]])
                                      for i in range(s, e)], delta)
                out_k.append(ks[s])
                out_m.append(m.tolist())
                out_w.append(w.tolist())
        else:
            v = b[value].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            ks, vs = k[order], v[order]
            chg = np.r_[True, ks[1:] != ks[:-1]] if len(ks) else np.zeros(0, bool)
            st = np.flatnonzero(chg)
            en = np.r_[st[1:], len(ks)]
            out_k, out_m, out_w = [], [], []
            for s, e in zip(st, en):
                m, w = tdigest_build(vs[s:e], delta)
                out_k.append(ks[s])
                out_m.append(m.tolist())
                out_w.append(w.tolist())
        return pa.table({key: pa.array(out_k),
                         "_tm": pa.array(out_m, pa.list_(pa.float64())),
                         "_tw": pa.array(out_w, pa.list_(pa.float64()))})

    agg = tree_reduce(ds.select_columns([key, value]), partial, fanin=fanin)

    def finalize(b: pa.Table) -> pa.Table:
        out: dict = {key: b[key]}
        names = [f"q{int(round(q * 100))}" for q in qs]
        tms = [np.asarray(x) for x in b["_tm"].to_pylist()]
        tws = [np.asarray(x) for x in b["_tw"].to_pylist()]
        for nm, q in zip(names, qs):
            out[nm] = pa.array([tdigest_quantile(m, w, q) for m, w in zip(tms, tws)])
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def mg_summary(values: np.ndarray, counts: np.ndarray | None = None,
               k: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries heavy-hitter summary of size ≤ k: every item with true
    frequency > n/k survives, and each reported count undercounts the truth
    by at most n/k (Misra & Gries '82; merge rule per Agarwal et al.,
    'Mergeable Summaries')."""
    if counts is None:
        values, counts = np.unique(values, return_counts=True)
    else:
        order = np.argsort(values, kind="stable")
        v, c = values[order], counts[order]
        chg = np.r_[True, v[1:] != v[:-1]] if len(v) else np.zeros(0, bool)
        st = np.flatnonzero(chg)
        values = v[st]
        counts = np.add.reduceat(c, st) if len(st) else c[:0]
    if len(values) <= k:
        return values, counts
    # keep the k largest, subtract the (k+1)-th count (the MG decrement,
    # applied in one batch step — equivalent to repeated decrements)
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    keep = order[:k]
    out_c = counts[keep] - thresh
    pos = out_c > 0
    return values[keep][pos], out_c[pos]


def heavy_hitters(ds, col: str, k: int = 100, fanin: int = 8):
    """Approximate top-k frequent values of an UNBOUNDED-domain column:
    per-batch Misra-Gries summaries (≤k entries) merged by count addition +
    re-summarization (mergeable-summary property) — constant state, no
    shuffle.  Guarantees: any value with frequency > n/k appears; counts
    undercount by ≤ n/k.  Use ``token_histogram`` when the domain is
    bounded and exactness matters."""

    def partial(b: pa.Table) -> pa.Table:
        if "_cnt" in b.column_names:
            v = b[col].to_numpy(zero_copy_only=False)
            c = b["_cnt"].combine_chunks().to_numpy(zero_copy_only=False)
            vv, cc = mg_summary(v, c, k)
        else:
            vv, cc = mg_summary(b[col].to_numpy(zero_copy_only=False), None, k)
        return pa.table({col: pa.array(vv), "_cnt": pa.array(cc.astype(np.int64))})

    agg = tree_reduce(ds.select_columns([col]), partial, fanin=fanin)

    def finalize(b: pa.Table) -> pa.Table:
        c = b["_cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(-c, kind="stable")
        take = pa.array(order, type=pa.int64())
        return pa.table({col: b[col].take(take),
                         "min_count": b["_cnt"].take(take)})

    return agg.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def approx_distinct(ds, key: str, value: str, p: int = 12, fanin: int = 8):
    """Approximate count(DISTINCT value) per key via per-key HLL registers,
    tree-merged with element-wise max — constant-size state per key, no
    shuffle of distinct values at all.  Output: (key, n_distinct_approx)."""
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        if "_regs" in b.column_names:  # merge: element-wise max per key
            k = b[key].to_numpy(zero_copy_only=False)
            regs = np.stack([np.frombuffer(x, dtype=np.uint8)
                             for x in b["_regs"].to_pylist()])
            order = np.argsort(k, kind="stable")
            ks, rs = k[order], regs[order]
            chg = np.r_[True, ks[1:] != ks[:-1]] if len(ks) else np.zeros(0, bool)
            st = np.flatnonzero(chg)
            en = np.r_[st[1:], len(ks)]
            out_k, out_r = [], []
            for s, e in zip(st, en):
                out_k.append(ks[s])
                out_r.append(np.max(rs[s:e], axis=0).tobytes())
            return pa.table({key: pa.array(out_k),
                             "_regs": pa.array(out_r, pa.binary())})
        k = b[key].to_numpy(zero_copy_only=False)
        v = b[value].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        chg = np.r_[True, ks[1:] != ks[:-1]] if len(ks) else np.zeros(0, bool)
        st = np.flatnonzero(chg)
        en = np.r_[st[1:], len(ks)]
        out_k, out_r = [], []
        for s, e in zip(st, en):
            out_k.append(ks[s])
            out_r.append(hll_registers(vs[s:e], p).tobytes())
        return pa.table({key: pa.array(out_k), "_regs": pa.array(out_r, pa.binary())})

    agg = tree_reduce(ds.select_columns([key, value]), partial, fanin=fanin)

    def finalize(b: pa.Table) -> pa.Table:
        ests = [round(hll_estimate(np.frombuffer(x, dtype=np.uint8)))
                for x in b["_regs"].to_pylist()]
        return pa.table({key: b[key],
                         "n_distinct_approx": pa.array(np.array(ests, dtype=np.int64))})

    return agg.map_batches(finalize, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------------- Count-Min

def cms_table(values: np.ndarray, counts: np.ndarray | None = None,
              width: int = 2048, depth: int = 4) -> np.ndarray:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of one value set:
    ``depth`` rows of ``width`` counters, row r indexed by an independent
    hash (seeded re-hash of the 64-bit value hash).  Vectorized: one
    bincount per row.  Merging = element-wise ADD — associative, so the
    same tree reduction as HLL applies and the shuffle payload per key is
    ``depth × width`` int64 regardless of corpus size.  Point query =
    min over rows: an OVERestimate with err ≤ e·N/width at prob 1−e^−depth."""
    h = _hash64(values)
    c = (np.ones(len(h), np.int64) if counts is None
         else np.asarray(counts, np.int64))
    t = np.zeros((depth, width), np.int64)
    for r in range(depth):
        hr = (h * np.uint64(0x9E3779B97F4A7C15 + 2 * r + 1)
              + np.uint64((0xD1B54A32D192ED03 * (r + 1)) & 0xFFFFFFFFFFFFFFFF))
        idx = (hr >> np.uint64(33)) % np.uint64(width)
        t[r] = np.bincount(idx.astype(np.int64), weights=c, minlength=width
                           ).astype(np.int64)
    return t


def cms_query(t: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point-estimate counts for ``values`` against a (merged) sketch."""
    depth, w = t.shape
    h = _hash64(values)
    est = np.full(len(h), np.iinfo(np.int64).max)
    for r in range(depth):
        hr = (h * np.uint64(0x9E3779B97F4A7C15 + 2 * r + 1)
              + np.uint64((0xD1B54A32D192ED03 * (r + 1)) & 0xFFFFFFFFFFFFFFFF))
        idx = ((hr >> np.uint64(33)) % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, t[r, idx])
    return est


def approx_counts(ds, col: str, query_values: np.ndarray,
                  width: int = 2048, depth: int = 4, fanin: int = 8):
    """Approximate per-value frequencies over a Dataset column via a
    tree-merged Count-Min sketch; returns a Dataset (value, count_est).
    The exact twin is a groupby count — use this when distinct values
    outgrow the shuffle."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        t = cms_table(v, width=width, depth=depth)
        return pa.table({"row": pa.array(np.arange(depth, dtype=np.int64)),
                         "sketch": pa.array(list(t), pa.list_(pa.int64()))})

    def combine(batch: pa.Table) -> pa.Table:
        rows = batch["row"].combine_chunks().to_numpy(zero_copy_only=False)
        vals = batch["sketch"].combine_chunks()
        m = vals.values.to_numpy(zero_copy_only=False).reshape(len(rows), -1)
        t = np.zeros((depth, m.shape[1]), np.int64)
        np.add.at(t, rows, m)
        return pa.table({"row": pa.array(np.arange(depth, dtype=np.int64)),
                         "sketch": pa.array(list(t), pa.list_(pa.int64()))})

    merged = tree_reduce(ds.map_batches(partial, batch_format="pyarrow"),
                         combine, fanin=fanin)
    tab = pa.concat_tables(merged.iter_batches(batch_format="pyarrow",
                                               batch_size=None))
    rows = tab["row"].to_numpy(zero_copy_only=False)
    m = tab["sketch"].combine_chunks().values.to_numpy(
        zero_copy_only=False).reshape(len(rows), -1)
    t = np.zeros_like(m)
    t[rows] = m
    est = cms_query(t, np.asarray(query_values))
    return rd.from_arrow(pa.table({
        "value": pa.array(query_values),
        "count_est": pa.array(est.astype(np.int64)),
    }))


class BloomFilter:
    """Fixed-size mergeable Bloom filter over 64-bit hashes (Bloom 1970;
    double hashing per Kirsch & Mitzenmacher 2006: probe_i = h1 + i·h2).

    The merge is a bitwise OR — associative, commutative, idempotent — so
    per-block filters fold through :func:`tree_reduce` exactly like HLL
    registers, and the shuffle payload is constant (``m_bits/8`` bytes per
    block) regardless of corpus size.  No false negatives ever; false
    positives ≈ (1 - e^{-kn/m})^k (m=2²³ bits = 1 MiB, k=7 → <1% at ~800k
    items).  ``m_bits`` must be a power of two (mask, not modulo)."""

    __slots__ = ("m_bits", "k", "words")

    def __init__(self, m_bits: int = 1 << 23, k: int = 7,
                 words: np.ndarray | None = None):
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.words = (np.zeros(self.m_bits // 64, dtype=np.uint64)
                      if words is None else words)

    def _probes(self, h: np.ndarray):
        """Yield k index arrays for the n hashes (vectorized per probe)."""
        h = np.asarray(h, dtype=np.uint64)
        # splitmix64 finalizer decorrelates h2 from h1; |1 keeps it odd so
        # the k probes never collapse onto one index
        h2 = h * np.uint64(0x9E3779B97F4A7C15)
        h2 ^= h2 >> np.uint64(31)
        h2 = (h2 * np.uint64(0xBF58476D1CE4E5B9)) | np.uint64(1)
        mask = np.uint64(self.m_bits - 1)
        for i in range(self.k):
            yield ((h + np.uint64(i) * h2) & mask).astype(np.int64)

    def add(self, h: np.ndarray) -> "BloomFilter":
        for idx in self._probes(h):
            # bitwise_or.at, NOT fancy-index |=: duplicate indices within
            # one probe batch must all land
            np.bitwise_or.at(self.words, idx >> 6,
                             np.uint64(1) << (idx.astype(np.uint64)
                                              & np.uint64(63)))
        return self

    def test(self, h: np.ndarray) -> np.ndarray:
        """Boolean array: True = MAYBE present, False = definitely absent."""
        out = np.ones(len(np.asarray(h)), dtype=bool)
        for idx in self._probes(h):
            bit = (self.words[idx >> 6]
                   >> (idx.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    def merge_bytes(self, blobs) -> "BloomFilter":
        for b in blobs:
            self.words |= np.frombuffer(b, dtype=np.uint64)
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, m_bits: int, k: int) -> "BloomFilter":
        return cls(m_bits, k, np.frombuffer(b, dtype=np.uint64).copy())


def bloom_build(ds, hash_fn, m_bits: int = 1 << 23, k: int = 7,
                fanin: int = 8) -> bytes:
    """Distributed Bloom build: per-block filters OR-folded through the
    repartition tree; returns the merged filter's bytes (``m_bits/8``).
    ``hash_fn(pa.Table) -> np.ndarray[uint64]`` extracts the keys."""

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k)
        if batch.num_rows:
            bf.add(hash_fn(batch))
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.large_binary())})

    def combine(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k)
        bf.merge_bytes(b.as_py() for b in batch["bloom"].combine_chunks())
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.large_binary())})

    merged = tree_reduce(ds.map_batches(partial, batch_format="pyarrow"),
                         combine, fanin=fanin)
    tabs = [t for t in merged.iter_batches(batch_format="pyarrow",
                                           batch_size=None) if t.num_rows]
    out = BloomFilter(m_bits, k)
    for tab in tabs:
        out.merge_bytes(b.as_py() for b in tab["bloom"].combine_chunks())
    return out.to_bytes()
