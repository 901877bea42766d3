"""Clickstream / event-sequence mining.

Absent from the reference (tsdat has no sequence mining); this is the
standard product-analytics companion to the sessionization family
(window_funcs.session_ids, window.session_window_agg): which ordered
event-type paths do users actually take inside a session?

Scale shape: ONE user-hash-bucketed shuffle (group = bucket, so task count
and group size are bounded by ``n_buckets``, never by user cardinality —
the CLAUDE.md high-cardinality-key law), local sessionize + n-gram count
inside each bucket (every user's rows land wholly in one bucket, so
session boundaries are complete), then a vocab-bounded tree fold of
(path, count) partials — at most ``|event_types|^path_len`` rows ever move
after the bucket stage.  Skew note: one bucket holds ~corpus/n_buckets
rows; a single pathological user bigger than that still fits one task or
warrants a larger ``n_buckets``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US = 1_000_000


def session_paths_topk(ds, key: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id", cat_col: str = "event_type",
                       gap_s: int = 1800, path_len: int = 3, k: int = 25,
                       n_buckets: int = 64, sep: str = ">"):
    """Top-k most frequent length-``path_len`` event-type paths taken
    WITHIN a session (sessions split at ts gaps > ``gap_s``, the
    session_ids_events convention).  Deterministic: ties break by path
    ascending, row order inside (key, ts) ties by ``id_col``.

    SQL twin: sessionize with SUM(gap-indicator) OVER (PARTITION BY key
    ORDER BY ts, id), then LEAD(cat, 1..path_len-1) OVER (PARTITION BY
    key, sess ORDER BY ts, id), concat with ``sep``, GROUP BY + LIMIT."""
    from .reduce import tree_reduce

    gap_us = gap_s * US

    def bucket(b: pa.Table) -> pa.Table:
        u = b[key].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # multiply-shift hash so adjacent ids spread across buckets
        h = (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        t = b.select([key, ts_col, id_col, cat_col])
        return t.append_column("_bkt", pa.array(
            (h % np.uint64(n_buckets)).astype(np.int64)))

    def count_paths(g: pa.Table) -> pa.Table:
        u = g[key].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = g[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cat = g[cat_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, u))
        u, ts, cat = u[order], ts[order], cat[order]
        n = len(u)
        if n < path_len:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_paths": pa.array([], pa.int64())})
        brk = np.r_[True, (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)]
        sess = np.cumsum(brk)  # global session id within the bucket
        m = n - path_len + 1
        ok = sess[:m] == sess[path_len - 1:]  # whole window in one session
        idx = np.flatnonzero(ok)
        if len(idx) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_paths": pa.array([], pa.int64())})
        parts = cat[idx].astype(object)
        for j in range(1, path_len):
            parts = parts + sep + cat[idx + j].astype(object)
        paths, counts = np.unique(parts.astype(str), return_counts=True)
        return pa.table({"path": pa.array(paths.tolist(), pa.string()),
                         "n_paths": pa.array(counts.astype(np.int64))})

    def fold(b: pa.Table) -> pa.Table:
        p = b["path"].to_numpy(zero_copy_only=False)
        c = b["n_paths"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(p, kind="stable")
        ps, cs = p[order], c[order]
        st = (np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
              if len(ps) else np.zeros(0, np.int64))
        return pa.table({"path": pa.array(ps[st] if len(st) else ps[:0]),
                         "n_paths": pa.array(np.add.reduceat(cs, st)
                                             if len(st) else cs[:0])})

    part = (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("_bkt")
            .map_groups(lambda g: count_paths(g.drop_columns(["_bkt"])),
                        batch_format="pyarrow"))
    agg = tree_reduce(part, fold)

    def topk(b: pa.Table) -> pa.Table:
        p = b["path"].to_numpy(zero_copy_only=False)
        c = b["n_paths"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -c))[:k]
        return b.take(pa.array(order, type=pa.int64()))

    return agg.map_batches(topk, batch_format="pyarrow", batch_size=None)
