"""Reshape operators: pivot (long → wide) and melt (wide → long).

Absent from the reference (xarray holds everything wide already); standard
table ops an engine replacing it needs:

* ``pivot_agg`` — one output row per ``row_key``, one column per declared
  ``col_domain`` value, cells = count or exact-decimal sum.  Combiner
  push-down: per-batch partial aggregation of (row, col) pairs (bounded by
  rows × |domain|), tree-reduced — no keyed shuffle.  The column domain is
  DECLARED (stable output schema, like the reference's dataset-config
  variables); sums accumulate as int64 of round(value*scale) so merges are
  order-independent.
* ``melt`` — pure map: each row explodes to one (id..., name, value) row
  per value column.  No shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .reduce import tree_reduce


def pivot_agg(ds, row_key_col: str, col_key_col: str, col_domain: tuple,
              value_col: str | None = None, value_scale: int = 100,
              prefix: str = "n_", fanin: int = 8):
    """Pivot with count (value_col=None) or exact-decimal sum cells."""
    dom = {v: i for i, v in enumerate(col_domain)}
    ncol = len(col_domain)

    def partial(b: pa.Table) -> pa.Table:
        if "_cell" in b.column_names:  # merging partials
            rk = b[row_key_col].to_numpy(zero_copy_only=False)
            cell = b["_cell"].combine_chunks().to_numpy(zero_copy_only=False)
            agg = b["_agg"].combine_chunks().to_numpy(zero_copy_only=False)
        else:
            rk = b[row_key_col].to_numpy(zero_copy_only=False)
            ck = b[col_key_col].to_numpy(zero_copy_only=False)
            cell = np.array([dom.get(c, -1) for c in ck], dtype=np.int64)
            keep = cell >= 0
            rk, cell = rk[keep], cell[keep]
            if value_col is None:
                agg = np.ones(len(rk), dtype=np.int64)
            else:
                v = b[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)[keep]
                agg = np.round(v * value_scale).astype(np.int64)
        order = np.lexsort((cell, rk))
        rs, cs, ags = rk[order], cell[order], agg[order]
        chg = np.r_[True, (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])] if len(rs) else np.zeros(0, bool)
        st = np.flatnonzero(chg)
        summed = np.add.reduceat(ags, st) if len(st) else ags[:0]
        # index into the FILTERED/sorted arrays, never back into the table
        # (rows outside the column domain were dropped above)
        return pa.table({row_key_col: pa.array(rs[st] if len(st) else rs[:0]),
                         "_cell": pa.array(cs[st] if len(st) else cs[:0]),
                         "_agg": pa.array(summed)})

    agg = tree_reduce(ds, partial, fanin=fanin)

    def widen(b: pa.Table) -> pa.Table:
        rk = b[row_key_col].to_numpy(zero_copy_only=False)
        cell = b["_cell"].combine_chunks().to_numpy(zero_copy_only=False)
        v = b["_agg"].combine_chunks().to_numpy(zero_copy_only=False)
        rlab, rinv = np.unique(rk, return_inverse=True)
        mat = np.zeros((len(rlab), ncol), dtype=np.int64)
        mat[rinv, cell] = v
        out = {row_key_col: pa.array(rlab)}
        for name, j in dom.items():
            col = mat[:, j]
            out[f"{prefix}{name}"] = pa.array(
                col if value_col is None else col / float(value_scale)
            )
        return pa.table(out)

    return agg.map_batches(widen, batch_format="pyarrow", batch_size=None)


def _count_sum_partial(keys: tuple, value_col: str | None, value_scale: int):
    """Associative per-block (count, exact int sum) partial over ``keys`` —
    the shared combiner for ROLLUP / CUBE grouping-set aggregates."""

    def partial(b: pa.Table) -> pa.Table:
        if "_n" in b.column_names:  # merge partials
            cols = [b[k].to_numpy(zero_copy_only=False) for k in keys]
            n = b["_n"].combine_chunks().to_numpy(zero_copy_only=False)
            s = b["_s"].combine_chunks().to_numpy(zero_copy_only=False)
        else:
            cols = [b[k].to_numpy(zero_copy_only=False) for k in keys]
            n = np.ones(b.num_rows, dtype=np.int64)
            if value_col is None:
                s = np.zeros(b.num_rows, dtype=np.int64)
            else:
                v = b[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
                s = np.round(v * value_scale).astype(np.int64)
        order = np.lexsort(tuple(reversed(cols)))
        srt = [c[order] for c in cols]
        ns, ss = n[order], s[order]
        chg = np.zeros(len(ns), dtype=bool)
        if len(ns):
            chg[0] = True
            for c in srt:
                chg[1:] |= c[1:] != c[:-1]
        st = np.flatnonzero(chg)
        out = {k: pa.array(c[st] if len(st) else c[:0]) for k, c in zip(keys, srt)}
        out["_n"] = pa.array(np.add.reduceat(ns, st) if len(st) else ns[:0])
        out["_s"] = pa.array(np.add.reduceat(ss, st) if len(st) else ss[:0])
        return pa.table(out)

    return partial


def rollup_levels(ds, keys: tuple, value_col: str | None = None,
                  value_scale: int = 100, fanin: int = 8):
    """SQL ``GROUP BY ROLLUP(k1, k2, …)``: aggregates at every prefix level
    (k1,k2), (k1), () — count + exact-decimal sum per group, NULL-filled
    coarser levels.  One combiner-push-down tree reduction computes the
    finest level; coarser levels re-aggregate the (tiny) result in the same
    final task — no extra passes over the input."""
    partial = _count_sum_partial(keys, value_col, value_scale)
    agg = tree_reduce(ds, partial, fanin=fanin)

    def levels(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        frames = [df.copy()]
        cur = df
        for lvl in range(len(keys) - 1, -1, -1):
            grp_keys = list(keys[:lvl])
            if grp_keys:
                g = cur.groupby(grp_keys, as_index=False)[["_n", "_s"]].sum()
            else:
                g = pd.DataFrame({"_n": [cur["_n"].sum()], "_s": [cur["_s"].sum()]})
            for k in keys[lvl:]:
                g[k] = None
            frames.append(g[list(keys) + ["_n", "_s"]])
            cur = g
        out = pd.concat(frames, ignore_index=True)
        out = out.rename(columns={"_n": "n_rows"})
        out["value_sum"] = out.pop("_s") / float(value_scale)
        return out

    return agg.map_batches(levels, batch_format="pyarrow", batch_size=None)


def cube_levels(ds, keys: tuple, value_col: str | None = None,
                value_scale: int = 100, fanin: int = 8):
    """SQL ``GROUP BY CUBE(k1, k2, …)``: aggregates at every SUBSET of the
    keys (2^k grouping sets) — count + exact-decimal sum, NULL-filled
    rolled-up dims.  Same shape as :func:`rollup_levels`: one combiner
    push-down tree reduction computes the finest level, and every coarser
    grouping set re-aggregates that tiny result in the final task."""
    from itertools import combinations

    partial = _count_sum_partial(keys, value_col, value_scale)
    agg = tree_reduce(ds, partial, fanin=fanin)

    def levels(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        frames = []
        for r in range(len(keys), -1, -1):
            for kept in combinations(keys, r):
                if len(kept) == len(keys):
                    g = df.copy()
                elif kept:
                    g = df.groupby(list(kept), as_index=False)[["_n", "_s"]].sum()
                else:
                    g = pd.DataFrame({"_n": [df["_n"].sum()],
                                      "_s": [df["_s"].sum()]})
                for k in keys:
                    if k not in kept:
                        g[k] = None
                frames.append(g[list(keys) + ["_n", "_s"]])
        out = pd.concat(frames, ignore_index=True)
        out = out.rename(columns={"_n": "n_rows"})
        out["value_sum"] = out.pop("_s") / float(value_scale)
        return out

    return agg.map_batches(levels, batch_format="pyarrow", batch_size=None)


def melt(ds, id_cols: tuple, value_cols: tuple,
         name_col: str = "name", value_out: str = "val"):
    """Wide → long: one (id..., name, value) row per value column — pure map."""

    def unpivot(b: pa.Table) -> pa.Table:
        n = b.num_rows
        parts = []
        for vc in value_cols:
            cols = {c: b[c] for c in id_cols}
            cols[name_col] = pa.array(np.repeat(vc, n))
            cols[value_out] = b[vc].combine_chunks().cast(pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(unpivot, batch_format="pyarrow")


def grouping_sets(ds, sets: tuple, value_col: str | None = None,
                  value_scale: int = 100, fanin: int = 8):
    """SQL ``GROUP BY GROUPING SETS ((a, b), (a), (b), ())`` — arbitrary
    grouping sets, generalizing :func:`rollup_levels` (prefixes) and
    :func:`cube_levels` (all subsets).  ``sets`` is a tuple of key-column
    tuples.  One combiner push-down tree reduction at the FINEST granularity
    (the union of all referenced keys); each requested set re-aggregates the
    tiny reduced result, with NULL-filled rolled-up dims."""
    keys = tuple(dict.fromkeys(k for s in sets for k in s))  # ordered union

    partial = _count_sum_partial(keys, value_col, value_scale)
    agg = tree_reduce(ds, partial, fanin=fanin)

    def levels(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        frames = []
        for kept in sets:
            kept = tuple(kept)
            if set(kept) == set(keys):
                g = df.copy()
            elif kept:
                g = df.groupby(list(kept), as_index=False)[["_n", "_s"]].sum()
            else:
                g = pd.DataFrame({"_n": [df["_n"].sum()], "_s": [df["_s"].sum()]})
            for k in keys:
                if k not in kept:
                    g[k] = None
            frames.append(g[list(keys) + ["_n", "_s"]])
        out = pd.concat(frames, ignore_index=True)
        out = out.rename(columns={"_n": "n_rows"})
        out["value_sum"] = out.pop("_s") / float(value_scale)
        return out

    return agg.map_batches(levels, batch_format="pyarrow", batch_size=None)


def zorder_code(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """Morton / Z-order interleave of two 16-bit keys → 32-bit code — the
    lakehouse multi-dimensional clustering key (Delta/Iceberg Z-ORDER):
    sorting or range-partitioning by the code co-locates rows close in BOTH
    dimensions, so min/max pruning works for either predicate.  Classic
    magic-number bit spreading, fully vectorized; the same four mask-shift
    steps are expressible in ANSI SQL, so the code itself sits under the
    value-hash oracle."""

    def spread16(x: np.ndarray) -> np.ndarray:
        x = (x & 0xFFFF).astype(np.int64)
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    return spread16(np.asarray(a)) | (spread16(np.asarray(b)) << 1)
