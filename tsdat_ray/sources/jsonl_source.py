"""JSONL / NDJSON sources.

The reference reads tabular files through per-format ``DataReader`` classes
(/root/reference/tsdat/io/base/data_reader.py:14-35); JSON-lines is the
interchange format most large text/LLM corpora actually ship in, so the
engine adds it as a first-class source with the same declared-schema
retrieval rules as CSV/Parquet:

* ``read_jsonl_declared`` — ``ray.data.read_json`` (Arrow's streaming JSON
  reader, newline-delimited) + the declared-schema standardize stage
  (rename / cast / fill, first-match-wins retrieval).
* Nested fields: declare ``a.b`` as a source name and the flatten stage
  lifts ``struct`` children into top-level columns before standardize —
  no Python row loop, just Arrow ``StructArray.field``.
"""

from __future__ import annotations

import pyarrow as pa

from .declared import DeclaredSchema, standardize_declared


def flatten_structs(batch: pa.Table, sep: str = ".") -> pa.Table:
    """Lift every struct column's children to top-level ``parent.child``
    columns (one level; apply repeatedly for deeper nesting).  Zero-copy —
    ``StructArray.field`` returns a view."""
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_struct(col.type):
            combined = col.combine_chunks()
            for f in col.type:
                cols[f"{name}{sep}{f.name}"] = combined.field(f.name)
        else:
            cols[name] = col
    return pa.table(cols)


def read_jsonl_declared(paths, schema: DeclaredSchema,
                        flatten: bool = False,
                        override_num_blocks: int | None = None,
                        **read_json_kwargs):
    """JSONL → standardized Dataset (rename/cast/fill per declared schema)."""
    import ray.data as rd

    kw = dict(read_json_kwargs)
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    ds = rd.read_json(paths, **kw)

    def prep(b: pa.Table) -> pa.Table:
        if flatten:
            b = flatten_structs(b)
        return standardize_declared(b, schema)

    return ds.map_batches(prep, batch_format="pyarrow")
