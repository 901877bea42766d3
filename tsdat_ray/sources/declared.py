"""Declared-schema standardization: the engine's equivalent of tsdat's
DatasetConfig + retrieval rules.

The reference declares every output variable (name, dtype, attrs) in yaml and
standardizes retrieved data against it — rename by rule, drop undeclared
variables, create declared-but-missing ones filled with ``_FillValue``, cast
dtypes, inject static values (/root/reference/tsdat/pipeline/base/
pipeline.py:59-148, io/retrievers/_rename_variables.py:16-91,
perform_data_retrieval.py:36-92 first-match-wins).  Here the same contract is
a small dataclass plus ONE vectorized ``map_batches`` stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FILL_DEFAULT = -9999  # reference default _FillValue (config/variables/variable.py:64-81)


@dataclass(frozen=True)
class DeclaredVar:
    name: str
    dtype: str  # pyarrow type name: int32/int64/float32/float64/string/timestamp[us]
    # input column candidates, first present wins (perform_data_retrieval.py:36-92);
    # defaults to [name]
    retrieve_from: tuple[str, ...] = ()
    fill_value: object = None  # used when no candidate is present
    static: object = None  # constant-valued variable ("data:" in tsdat configs)
    converter: object = None  # optional callable(pa.ChunkedArray) -> pa.Array


@dataclass(frozen=True)
class DeclaredSchema:
    variables: tuple[DeclaredVar, ...]
    attrs: dict = field(default_factory=dict)

    def arrow_schema(self) -> pa.Schema:
        return pa.schema([(v.name, _pa_type(v.dtype)) for v in self.variables])


def _pa_type(name: str) -> pa.DataType:
    if name.startswith("timestamp"):
        unit = name[name.index("[") + 1 : name.index("]")] if "[" in name else "us"
        return pa.timestamp(unit)
    return pa.type_for_alias(name)


def _fill_for(v: DeclaredVar, typ: pa.DataType):
    if v.fill_value is not None:
        return v.fill_value
    if pa.types.is_integer(typ):
        return FILL_DEFAULT
    if pa.types.is_floating(typ):
        return float("nan")
    return None


def standardize_declared(batch: pa.Table, schema: DeclaredSchema) -> pa.Table:
    """Vectorized standardize: rename/select/cast/fill/inject per the declared
    schema.  Undeclared input columns are dropped; declared-but-missing ones
    are created filled; dtypes are cast (safe=False, like the reference's
    astype — pipeline.py:112-122)."""
    n = batch.num_rows
    out: dict[str, pa.Array | pa.ChunkedArray] = {}
    for v in schema.variables:
        typ = _pa_type(v.dtype)
        if v.static is not None:
            out[v.name] = pa.array(np.repeat(v.static, n)).cast(typ)
            continue
        src = None
        for cand in (v.retrieve_from or (v.name,)):
            if cand in batch.column_names:
                src = batch[cand]
                break
        if src is None:
            fill = _fill_for(v, typ)
            out[v.name] = pa.nulls(n, typ) if fill is None else pa.array([fill] * n).cast(typ)
            continue
        if v.converter is not None:
            src = v.converter(src)
        col = src if isinstance(src, (pa.Array, pa.ChunkedArray)) else pa.array(src)
        if col.type != typ:
            col = pc.cast(col, typ, safe=False)
        out[v.name] = col
    return pa.table(out)


def schema_drift(paths, schema: "DeclaredSchema"):
    """Schema-evolution / drift report over a parquet file set: one row per
    (file, column, issue) where issue ∈ {missing, unexpected,
    type_changed}.  The production pre-flight for declared-schema ingest
    (the reference fails at retrieval time deep inside a run — reference
    io/retrievers/storage_retriever.py:213 raises mid-pipeline; this
    surfaces every divergence up front instead).

    Metadata-only and distributed: the FILE LIST is the Dataset, each task
    reads only parquet FOOTERS (`pq.read_schema`) — no row data moves."""
    import ray.data as rd

    declared = {}
    for v in schema.variables:
        cands = v.retrieve_from or (v.name,)
        for c in cands:
            declared[c] = v.dtype

    def check(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        files, cols, issues, details = [], [], [], []
        for p in b["path"].to_pylist():
            s = pq.read_schema(p)
            actual = {f.name: str(f.type) for f in s}
            for name, want in declared.items():
                if name not in actual:
                    files.append(p); cols.append(name)
                    issues.append("missing"); details.append(want)
                elif actual[name] != want:
                    files.append(p); cols.append(name)
                    issues.append("type_changed")
                    details.append(f"{want} -> {actual[name]}")
            for name in actual:
                if name not in declared:
                    files.append(p); cols.append(name)
                    issues.append("unexpected"); details.append(actual[name])
        return pa.table({"path": pa.array(files, pa.string()),
                         "column": pa.array(cols, pa.string()),
                         "issue": pa.array(issues, pa.string()),
                         "detail": pa.array(details, pa.string())})

    if isinstance(paths, str):
        import glob as _glob

        paths = sorted(_glob.glob(f"{paths}/**/*.parquet", recursive=True)) \
            if not paths.endswith(".parquet") else [paths]
    items = [{"path": p} for p in paths]
    return rd.from_items(items, override_num_blocks=max(len(items), 1)).map_batches(
        check, batch_format="pyarrow")


def prune_parquet_files(paths, ts_col: str, lo_us: int, hi_us: int) -> list[str]:
    """File-level data skipping from parquet FOOTER statistics: keep only
    files whose ``ts_col`` min/max row-group range overlaps [lo_us, hi_us).
    Complements hive-partition pruning — inside a partition (or for
    unpartitioned drops) the footers carry per-row-group min/max, so a
    time-range fetch skips whole files without reading a row.  Files with
    no statistics are conservatively kept (skipping is an optimization,
    never a filter)."""
    import glob as _glob

    import numpy as np
    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = sorted(_glob.glob(f"{paths}/**/*.parquet", recursive=True)) \
            if not paths.endswith(".parquet") else [paths]
    keep = []
    for p in paths:
        md = pq.read_metadata(p)
        names = md.schema.to_arrow_schema().names
        if ts_col not in names:
            keep.append(p)
            continue
        ci = names.index(ts_col)
        fmin, fmax = None, None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn = np.datetime64(st.min, "us").astype(np.int64) \
                if not isinstance(st.min, (int, float)) else int(st.min)
            mx = np.datetime64(st.max, "us").astype(np.int64) \
                if not isinstance(st.max, (int, float)) else int(st.max)
            fmin = mn if fmin is None else min(fmin, mn)
            fmax = mx if fmax is None else max(fmax, mx)
        if not ok or fmin is None or (fmax >= lo_us and fmin < hi_us):
            keep.append(p)
    return keep
