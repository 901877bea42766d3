"""Join / lookup operators.

The reference has no relational joins (SURVEY.md §2.5) — its closest ops are
the outer coordinate merge (xr.merge) and the nearest/as-of grid lookup.
These are the engine equivalents, built on the two scalable patterns:

* broadcast small side (``ray.put`` once, numpy ``searchsorted`` per batch)
* hash-bucketed both-large join via groupby + per-group pandas merge
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_lookup(
    ds,
    right: pa.Table,
    left_on: str,
    right_on: str,
    value_cols: tuple[str, ...],
    by: str | None = None,
    direction: str = "backward",
    suffix: str = "",
):
    """As-of join with a broadcast (small) right table.

    For each left row: the right row with the greatest ``right_on`` <=
    ``left_on`` (direction="backward") or smallest >= (direction="forward"),
    optionally per ``by`` key.  The right table is shipped to the object
    store ONCE and each task reads it zero-copy; per batch the lookup is a
    numpy searchsorted — no shuffle (guide: broadcast-small-side pattern).
    """
    import ray

    rdf = right.to_pandas()
    sort_cols = ([by] if by else []) + [right_on]
    rdf = rdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    right_ref = ray.put(rdf)

    def lookup(batch: pa.Table) -> pa.Table:
        r = ray.get(right_ref)
        lt = batch[left_on].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        out_cols = {name: batch[name] for name in batch.column_names}

        def do_lookup(l_ts: np.ndarray, rsub: pd.DataFrame) -> np.ndarray:
            rts = rsub[right_on].astype("int64").to_numpy()
            if direction == "backward":
                pos = np.searchsorted(rts, l_ts, side="right") - 1
            else:
                pos = np.searchsorted(rts, l_ts, side="left")
                pos = np.where(pos >= len(rts), -1, pos)
            return pos

        if by is None:
            pos = do_lookup(lt, r)
            valid = pos >= 0
            for vc in value_cols:
                vals = r[vc].to_numpy()
                col = np.where(valid, vals[np.clip(pos, 0, None)], None)
                out_cols[vc + suffix] = pa.array(col.tolist())
        else:
            bvals = batch[by].to_numpy(zero_copy_only=False)
            res = {vc: np.full(len(lt), None, dtype=object) for vc in value_cols}
            for k, rsub in r.groupby(by, sort=False):
                sel = np.flatnonzero(bvals == k)
                if not len(sel):
                    continue
                pos = do_lookup(lt[sel], rsub)
                valid = pos >= 0
                for vc in value_cols:
                    vals = rsub[vc].to_numpy()
                    res[vc][sel[valid]] = vals[pos[valid]]
            for vc in value_cols:
                out_cols[vc + suffix] = pa.array(res[vc].tolist())
        return pa.table(out_cols)

    return ds.map_batches(lookup, batch_format="pyarrow")


def hash_join(
    left,
    right,
    on: str,
    num_buckets: int = 64,
    how: str = "inner",
):
    """Explicit partitioned hash join for two large Datasets: both sides get a
    ``bucket = hash(key) % B`` column, one groupby co-locates matching
    buckets, and each bucket joins with pandas merge.  (Salt hot keys by
    raising num_buckets; the bucket count bounds per-task memory.)"""

    def tag(side: str):
        def add(batch: pa.Table) -> pa.Table:
            keys = batch[on].to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(np.asarray(keys)) % num_buckets
            t = batch.append_column("_bucket", pa.array(h.astype(np.int64)))
            return t.append_column("_side", pa.array(np.repeat(side, len(keys))))

        return add

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")

    l_names = left.schema().names
    r_names = right.schema().names

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        df = g.to_pandas()
        ldf = df[df["_side"] == "l"][[c for c in l_names]]
        rdf = df[df["_side"] == "r"][[c for c in r_names]]
        return ldf.merge(rdf, on=on, how=how)

    # union with differing schemas: align by filling missing columns
    all_cols = list(dict.fromkeys(l_names + r_names)) + ["_bucket", "_side"]

    def widen(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in all_cols:
            if c in batch.column_names:
                cols[c] = batch[c]
            else:
                cols[c] = pa.nulls(batch.num_rows)
        return pa.table(cols)

    both = lt.map_batches(widen, batch_format="pyarrow").union(
        rt.map_batches(widen, batch_format="pyarrow")
    )
    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def broadcast_lookup(
    ds,
    right: pa.Table,
    on: str,
    value_cols: tuple[str, ...],
    how: str = "left",
):
    """Map-side hash join with a broadcast (small) right table: the right
    side is ``ray.put`` into the object store ONCE and every batch does a
    vectorized pandas index lookup — no shuffle at all.  The scale pattern
    for dimension-table joins (guide: broadcast-small-side); use
    ``hash_join`` when both sides are large."""
    import ray

    rdf = right.to_pandas().drop_duplicates(subset=[on]).set_index(on)
    right_ref = ray.put(rdf[list(value_cols)])

    def lookup(batch: pa.Table) -> pa.Table:
        r = ray.get(right_ref)
        keys = batch[on].to_numpy(zero_copy_only=False)
        joined = r.reindex(keys)
        out = {name: batch[name] for name in batch.column_names}
        matched = joined.index.isin(r.index)
        for vc in value_cols:
            out[vc] = pa.array(joined[vc].to_numpy())
        t = pa.table(out)
        if how == "inner":
            t = t.filter(pa.array(matched))
        return t

    return ds.map_batches(lookup, batch_format="pyarrow")
