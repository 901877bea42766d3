"""Windowed aggregates — the engine's streaming-shaped operators.

Ray Data has no event-time windows/watermarks (and neither does the
reference — SURVEY §2.11: re-running a date range is its late-data story).
These operators give the batch-engine equivalents over an ordered,
partitioned log:

* ``sliding_window_agg`` — tumbling (slide == window) or sliding windows
  aligned to the slide grid.  Each row expands to its window_s/slide_s
  member windows (vectorized repeat), partials aggregate per batch, and one
  small groupby combines — the same combiner push-down as the tier rollup,
  so the shuffle carries per-(key, window) partials, not events.
* ``session_window_agg`` — gaps-and-islands sessionization: per key, sorted
  by ts, a new session starts where the gap to the previous event exceeds
  ``gap_s``.  Requires per-key co-location (one ``groupby(key)`` — group
  size is bounded by the key's total history; salt hot keys by coarse time
  range and merge boundary sessions if a key's history outgrows a worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US = 1_000_000


def sliding_window_agg(ds, key: str, ts_col: str, value_col: str,
                       window_s: int, slide_s: int, value_scale: int | None = None):
    """Per (key, window_start): n_rows, value_sum, value_mean, value_min,
    value_max over events with window_start <= ts < window_start+window.
    Windows are aligned to the slide grid; only windows with >=1 event
    appear (SQL twin: unnest(generate_series(...)) per event + GROUP BY).

    ``value_scale``: exact-decimal mode for quantized values (see
    session_window_agg) — partial sums become int64, so the combine is
    bit-deterministic under any block layout."""
    assert window_s % slide_s == 0, "window must be a multiple of slide"
    k = window_s // slide_s
    slide_us = slide_s * US

    vtype = pa.int64() if value_scale else pa.float64()

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({key: pa.array([], batch[key].type),
                             "window_start": pa.array([], pa.timestamp("us")),
                             "n_rows": pa.array([], pa.int64()),
                             "value_sum": pa.array([], vtype),
                             "value_min": pa.array([], vtype),
                             "value_max": pa.array([], vtype)})
        ts = batch[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = batch[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        if value_scale:
            x = np.round(x * value_scale).astype(np.int64)
        last = (ts // slide_us) * slide_us
        # expand: row i → windows last - j*slide for j in 0..k-1
        w = np.repeat(last, k) - np.tile(np.arange(k, dtype=np.int64) * slide_us, n)
        xs = np.repeat(x, k)
        keys = batch[key].take(pa.array(np.repeat(np.arange(n), k), type=pa.int64()))
        # partial-aggregate within the batch per (key, window)
        codes = keys.combine_chunks().dictionary_encode()
        kc = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((w, kc))
        kc_s, w_s, x_s = kc[order], w[order], xs[order]
        change = np.r_[True, (kc_s[1:] != kc_s[:-1]) | (w_s[1:] != w_s[:-1])]
        starts = np.flatnonzero(change)
        counts = np.diff(np.r_[starts, len(w_s)])
        take = pa.array(order[starts], type=pa.int64())
        return pa.table(
            {
                key: keys.take(take),
                "window_start": pa.array(w_s[starts]).cast(pa.timestamp("us")),
                "n_rows": pa.array(counts.astype(np.int64)),
                "value_sum": pa.array(np.add.reduceat(x_s, starts)),
                "value_min": pa.array(np.minimum.reduceat(x_s, starts)),
                "value_max": pa.array(np.maximum.reduceat(x_s, starts)),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        w = g["window_start"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="stable")
        w_s = w[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]]) if len(w_s) else np.zeros(0, np.int64)
        def col(name):
            return g[name].combine_chunks().to_numpy(zero_copy_only=False)[order]
        n = np.add.reduceat(col("n_rows"), starts) if len(starts) else np.zeros(0, np.int64)
        s = np.add.reduceat(col("value_sum"), starts) if len(starts) else np.zeros(0)
        mn = np.minimum.reduceat(col("value_min"), starts) if len(starts) else np.zeros(0)
        mx = np.maximum.reduceat(col("value_max"), starts) if len(starts) else np.zeros(0)
        if value_scale:
            s, mn, mx = s / float(value_scale), mn / float(value_scale), mx / float(value_scale)
        return pa.table(
            {
                key: g[key].take(pa.array(order[starts] if len(starts) else [], type=pa.int64())),
                "window_start": pa.array(w_s[starts] if len(starts) else np.zeros(0, np.int64)).cast(pa.timestamp("us")),
                "n_rows": pa.array(n.astype(np.int64)),
                "value_sum": pa.array(s.astype(np.float64)),
                "value_mean": pa.array(s / np.maximum(n, 1)),
                "value_min": pa.array(mn.astype(np.float64)),
                "value_max": pa.array(mx.astype(np.float64)),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow")
    return part.groupby(key).map_groups(combine, batch_format="pyarrow")


def session_window_agg(ds, key: str, ts_col: str, value_col: str, gap_s: int,
                       id_col: str | None = None, salt_window_s: int | None = None,
                       value_scale: int | None = None):
    """Sessionize per key: a session breaks where the sorted-ts gap exceeds
    ``gap_s``.  Output per session: start/end ts, n_rows, value_sum.

    Scale shape (skew-safe): the event shuffle is salted by coarse time range
    — groupby (key, _window) with ``salt_window_s``-wide windows — so a hot
    or low-cardinality key spreads over many tasks instead of funneling its
    whole history through one.  Windowed sessionization splits exactly at
    window edges; a second, cheap groupby(key) over SESSION partials (not
    events) merges consecutive sessions whose boundary gap is <= ``gap_s``,
    which reconstructs global sessionization exactly: within-window breaks
    are true breaks (gap > gap_s), and window-edge splits are re-joined iff
    the real inter-event gap across the edge is <= gap_s.

    ``value_scale``: for decimal-quantized values (e.g. 100 for cent-
    quantized), sums accumulate as exact int64 of round(value*scale) —
    associative integer addition makes the chunked combine bit-deterministic
    and equal to ROUND(sum(value), log10(scale)) on the SQL side.  Without it
    the merged sum's float grouping depends on the salt-window layout (only
    ulp-level, but not bitwise reproducible)."""
    gap_us = gap_s * US
    salt_window_s = salt_window_s or max(gap_s * 16, 6 * 3600)
    win_us = salt_window_s * US

    def add_window(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("_window", pa.array((ts // win_us) * win_us))

    def sessions(g: pa.Table) -> pa.Table:
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = g[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        if value_scale:
            x = np.round(x * value_scale).astype(np.int64)
        if id_col is not None:
            ids = g[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, ts))
        else:
            order = np.argsort(ts, kind="stable")
        ts_s, x_s = ts[order], x[order]
        brk = np.r_[True, np.diff(ts_s) > gap_us] if len(ts_s) else np.zeros(0, bool)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(ts_s)]
        m = len(starts)
        seg = np.add.reduceat(x_s, starts) if m else x_s[:0]
        return pa.table(
            {
                key: g[key].take(pa.array(order[starts] if m else [], type=pa.int64())),
                "session_start": pa.array(ts_s[starts] if m else np.zeros(0, np.int64)).cast(pa.timestamp("us")),
                "session_end": pa.array(ts_s[ends - 1] if m else np.zeros(0, np.int64)).cast(pa.timestamp("us")),
                "n_rows": pa.array((ends - starts).astype(np.int64)),
                "value_sum": pa.array(seg),
            }
        )

    def local_sessions(g: pa.Table) -> pa.Table:
        return sessions(g.drop_columns(["_window"]))

    def merge_boundary(g: pa.Table) -> pa.Table:
        st = g["session_start"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        en = g["session_end"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = g["n_rows"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["value_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((en, st))
        st, en, n, s = st[order], en[order], n[order], s[order]
        # windowed sessions of one key are time-disjoint and ordered, so a
        # run of sessions merges iff each boundary gap is <= gap_s
        brk = np.r_[True, (st[1:] - en[:-1]) > gap_us] if len(st) else np.zeros(0, bool)
        starts = np.flatnonzero(brk)
        lasts = np.r_[starts[1:], len(st)] - 1
        m = len(starts)
        merged = np.add.reduceat(s, starts) if m else s[:0]
        if value_scale:
            merged = merged / float(value_scale)
        return pa.table(
            {
                key: g[key].take(pa.array(order[starts] if m else [], type=pa.int64())),
                "session_start": pa.array(st[starts] if m else np.zeros(0, np.int64)).cast(pa.timestamp("us")),
                "session_end": pa.array(en[lasts] if m else np.zeros(0, np.int64)).cast(pa.timestamp("us")),
                "n_rows": pa.array(np.add.reduceat(n, starts).astype(np.int64) if m else np.zeros(0, np.int64)),
                "value_sum": pa.array(merged.astype(np.float64)),
            }
        )

    part = ds.map_batches(add_window, batch_format="pyarrow").groupby(
        [key, "_window"]
    ).map_groups(local_sessions, batch_format="pyarrow")
    return part.groupby(key).map_groups(merge_boundary, batch_format="pyarrow")
