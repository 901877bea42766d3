"""Tree reductions for bounded-cardinality aggregates.

When an aggregation's OUTPUT domain is bounded (vocab histograms, per-key
maxima over a bounded key set, distinct sets, candidate-pair sets), a keyed
``groupby`` pays a full sort/hash shuffle of every partial row.  The right
reduction shape is a repartition tree: apply an associative per-batch
combiner locally, fold blocks ``fanin`` ways, then once more to a single
block (measured 10 s → 0.2 s for the sf0.1 vocab histogram vs either
shuffle strategy).  Raise ``levels``/``fanin`` when a single merged partial
outgrows one worker's memory; if the domain is NOT bounded, use a real
groupby instead.
"""

from __future__ import annotations


def tree_reduce(ds, combine_fn, fanin: int = 8, levels: int = 2):
    """``combine_fn(pa.Table) -> pa.Table`` must be associative and
    idempotent on its own output (combine(combine(x)) == combine(x)).
    Returns a Dataset with a single combined block."""
    out = ds.map_batches(combine_fn, batch_format="pyarrow")
    width = fanin
    for _ in range(max(1, levels) - 1):
        out = out.repartition(width).map_batches(
            combine_fn, batch_format="pyarrow", batch_size=None
        )
        width = max(1, width // fanin)
    return out.repartition(1).map_batches(combine_fn, batch_format="pyarrow", batch_size=None)
