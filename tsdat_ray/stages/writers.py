"""Partitioned Parquet writer (hive layout), fast path.

``Dataset.write_parquet(partition_cols=...)`` costs ~4× a plain write at the
same byte count (per-file and per-slice overhead in the generic partitioned
sink).  This writer does the same hive layout — ``root/source=<s>/day=<d>/
part-<ts>.parquet``, partition columns dropped from file contents — as one
vectorized pass: segment each batch by the partition key (dictionary-encode
+ argsort, zero-copy slices), one direct ``pq.write_table`` per partition
per block.

File names are deterministic (min timestamp of the slice), so re-running a
partition — whether a whole-pipeline rerun or a Ray task retry — overwrites
the same file rather than duplicating it (idempotent resume, matching the
reference's overwrite-on-rerun storage —
/root/reference/tsdat/io/storage/file_system.py:161-179).

``root`` may be a plain path (POSIX fast path) or any ``pyarrow.fs`` URI
(``file://``, ``s3://``, ``gs://`` — parity with the reference's
FileSystemS3, io/storage/file_system_s3.py:24+); see state/uri.py for the
atomicity model per backend.

``write_batch_partitioned`` is the per-batch core; calling it inside a
``map_groups``/``map_batches`` stage fuses the write into that stage — the
flagship pipeline writes each tier from the same task that finalizes it, so
no extra materialization pass (and no second trip through the object store)
is spent on writing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def write_batch_partitioned(
    batch: pa.Table,
    root: str,
    partition_cols: tuple[str, ...] = ("source", "day"),
    ts_col: str | None = None,
    compression: str = "snappy",
    metadata: dict | None = None,
) -> pa.Table:
    """Write ONE batch's rows into hive partition dirs under ``root``; returns
    a (path, rows) manifest table.  Deterministic file names → safe under Ray
    task retries (a re-run overwrites the same file)."""
    from ..state.uri import StorageFS

    n = batch.num_rows
    if n == 0:
        return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
    sfs = StorageFS(root)
    codes = np.zeros(n, dtype=np.int64)
    uniques: list[list] = []
    per_col_idx: list[np.ndarray] = []
    for c in partition_cols:
        d = batch[c].combine_chunks().dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques.append(d.dictionary.to_pylist())
        per_col_idx.append(idx)
        codes = codes * (idx.max() + 1) + idx

    order = np.argsort(codes, kind="stable")
    cs = codes[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    ends = np.r_[starts[1:], n]

    sorted_batch = batch.take(pa.array(order, type=pa.int64()))
    body = sorted_batch.drop_columns(list(partition_cols))
    if metadata:
        # global attrs / QC flag meanings land in every file footer (the
        # engine's xr attrs equivalent; reference: NetCDFWriter attrs)
        md = {str(k).encode(): str(v).encode() for k, v in metadata.items()}
        body = body.replace_schema_metadata({**(body.schema.metadata or {}), **md})
    tcol = ts_col if ts_col and ts_col in body.column_names else None
    paths, rows = [], []
    for s, e in zip(starts, ends):
        sub = body.slice(s, e - s)
        row0 = order[s]
        dirname = sfs.join(
            *(f"{c}={uniques[k][per_col_idx[k][row0]]}" for k, c in enumerate(partition_cols)),
        )
        sfs.makedirs(dirname)
        if tcol is not None:
            tmin = int(pc.min(sub[tcol].combine_chunks().cast(pa.int64())).as_py())
        else:
            tmin = int(s)
        path = f"{dirname}/part-{tmin}.parquet"
        sfs.write_table_atomic(sub, path, compression=compression)
        paths.append(path)
        rows.append(sub.num_rows)
    return pa.table({"path": pa.array(paths, pa.string()), "rows": pa.array(rows, pa.int64())})


def write_batch_csv(
    batch: pa.Table,
    root: str,
    partition_cols: tuple[str, ...] = ("source", "day"),
    ts_col: str | None = None,
    metadata: dict | None = None,
    preamble: bool = False,
) -> pa.Table:
    """CSV twin of ``write_batch_partitioned`` (reference parity: CSVWriter,
    /root/reference/tsdat/io/writers/csv_writer.py:14-91 — debug/export
    format).  Same hive layout and deterministic ``part-<min_ts>.csv`` names;
    global attrs land in a ``_header.hdr.csv`` sidecar per partition (the
    reference's ``.hdr.csv`` convention) since CSV has no footer metadata.

    ``preamble=True`` writes A2e-standard files instead (parity:
    A2eCSVWriter, io/writers/a2e_csv_writer.py): ``key,value`` metadata
    lines + a ``header=N`` marker precede the csv body in the SAME file —
    round-trippable with ``sources.csv_source.read_preamble_csv``."""
    import io

    import pyarrow.csv as pacsv

    from ..state.uri import StorageFS

    n = batch.num_rows
    if n == 0:
        return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
    sfs = StorageFS(root)
    codes = np.zeros(n, dtype=np.int64)
    uniques: list[list] = []
    per_col_idx: list[np.ndarray] = []
    for c in partition_cols:
        d = batch[c].combine_chunks().dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques.append(d.dictionary.to_pylist())
        per_col_idx.append(idx)
        codes = codes * (idx.max() + 1) + idx
    order = np.argsort(codes, kind="stable")
    cs = codes[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    ends = np.r_[starts[1:], n]
    sorted_batch = batch.take(pa.array(order, type=pa.int64()))
    body = sorted_batch.drop_columns(list(partition_cols))
    # CSV can't hold nested columns; drop them (csv_writer.py warns the same)
    flat = [f.name for f in body.schema if not pa.types.is_nested(f.type)]
    body = body.select(flat)
    tcol = ts_col if ts_col and ts_col in body.column_names else None
    paths, rows = [], []
    for s, e in zip(starts, ends):
        sub = body.slice(s, e - s)
        row0 = order[s]
        dirname = sfs.join(
            *(f"{c}={uniques[k][per_col_idx[k][row0]]}" for k, c in enumerate(partition_cols)),
        )
        sfs.makedirs(dirname)
        tmin = int(pc.min(sub[tcol].combine_chunks().cast(pa.int64())).as_py()) if tcol else int(s)
        path = f"{dirname}/part-{tmin}.csv"
        buf = io.BytesIO()
        pacsv.write_csv(sub, buf)
        text = buf.getvalue().decode()
        if preamble:
            md = metadata or {}
            lines = [f"{k},{v}" for k, v in md.items()]
            # marker value = first body row index (preamble lines + marker)
            lines.append(f"header={len(lines) + 1}")
            sfs.write_text(path, "\n".join(lines) + "\n" + text)
        else:
            sfs.write_text(path, text)
            if metadata:
                hdr = "".join(f"{k},{v}\n" for k, v in metadata.items())
                sfs.write_text(f"{dirname}/_header.hdr.csv", hdr)
        paths.append(path)
        rows.append(sub.num_rows)
    return pa.table({"path": pa.array(paths, pa.string()), "rows": pa.array(rows, pa.int64())})


def write_csv(ds, root: str, partition_cols: tuple[str, ...] = ("source", "day"),
              ts_col: str | None = None, metadata: dict | None = None) -> int:
    """Stream ``ds`` to hive-partitioned CSV under ``root``; returns rows."""

    def write_batch(batch: pa.Table) -> pa.Table:
        return write_batch_csv(batch, root, partition_cols, ts_col, metadata)

    res = ds.map_batches(write_batch, batch_format="pyarrow").materialize()
    total = 0
    for b in res.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b["rows"]).as_py() or 0)
    return total


def write_partitioned(
    ds,
    root: str,
    partition_cols: tuple[str, ...] = ("source", "day"),
    ts_col: str | None = None,
    compression: str = "snappy",
    metadata: dict | None = None,
) -> int:
    """Write ``ds`` under ``root`` in hive layout; returns rows written.
    Consumes the dataset (one streaming pass)."""

    def write_batch(batch: pa.Table) -> pa.Table:
        return write_batch_partitioned(batch, root, partition_cols, ts_col, compression, metadata)

    res = ds.map_batches(write_batch, batch_format="pyarrow").materialize()
    total = 0
    for b in res.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b["rows"]).as_py() or 0)
    return total


def write_batch_orc(
    batch: pa.Table,
    root: str,
    partition_cols: tuple[str, ...] = ("source", "day"),
    ts_col: str | None = None,
) -> pa.Table:
    """ORC twin of ``write_batch_partitioned``: same hive layout and
    deterministic ``part-<min_ts>.orc`` names (atomic publish via StorageFS),
    columnar + compressed like the Parquet tier but readable by
    Hive/Trino-side consumers.  Nested columns are kept — ORC supports
    lists/structs natively."""
    import io as _io

    from pyarrow import orc as paorc

    from ..state.uri import StorageFS

    n = batch.num_rows
    if n == 0:
        return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
    sfs = StorageFS(root)
    codes = np.zeros(n, dtype=np.int64)
    uniques: list[list] = []
    per_col_idx: list[np.ndarray] = []
    for c in partition_cols:
        d = batch[c].combine_chunks().dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques.append(d.dictionary.to_pylist())
        per_col_idx.append(idx)
        codes = codes * (idx.max() + 1) + idx
    order = np.argsort(codes, kind="stable")
    cs = codes[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    ends = np.r_[starts[1:], n]
    sorted_batch = batch.take(pa.array(order, type=pa.int64()))
    body = sorted_batch.drop_columns(list(partition_cols))
    tcol = ts_col if ts_col and ts_col in body.column_names else None
    paths, rows = [], []
    for s, e in zip(starts, ends):
        sub = body.slice(s, e - s)
        row0 = order[s]
        dirname = sfs.join(
            *(f"{c}={uniques[k][per_col_idx[k][row0]]}" for k, c in enumerate(partition_cols)),
        )
        sfs.makedirs(dirname)
        tmin = int(pc.min(sub[tcol].combine_chunks().cast(pa.int64())).as_py()) if tcol else int(s)
        path = f"{dirname}/part-{tmin}.orc"
        buf = _io.BytesIO()
        paorc.write_table(sub, buf)
        sfs.write_bytes(path, buf.getvalue())
        paths.append(path)
        rows.append(sub.num_rows)
    return pa.table({"path": pa.array(paths, pa.string()), "rows": pa.array(rows, pa.int64())})


def write_orc(ds, root: str, partition_cols: tuple[str, ...] = ("source", "day"),
              ts_col: str | None = None) -> int:
    """Stream ``ds`` to hive-partitioned ORC under ``root``; returns rows."""

    def write_batch(batch: pa.Table) -> pa.Table:
        return write_batch_orc(batch, root, partition_cols, ts_col)

    res = ds.map_batches(write_batch, batch_format="pyarrow").materialize()
    total = 0
    for b in res.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b["rows"]).as_py() or 0)
    return total


def compact_tier(root: str, tier: str, run_id: str = "compact") -> dict:
    """Small-file compaction for a tier store: every committed partition
    with more than one part file is rewritten as ONE ts-sorted part — the
    lakehouse OPTIMIZE/compact operation (each pipeline run adds a part per
    block per partition; reads degrade as parts accumulate).

    Crash-safe against the manifest's recovery invariant (committed
    partitions are never half-rewritten): per partition, (1) the merged
    sorted table is written under a non-``.parquet`` temp name (invisible
    to store readers), (2) the partition's manifest record is pruned
    (reason=compact), (3) old parts are deleted, (4) the temp renames to
    ``part-<min_ts>.parquet`` atomically, (5) the partition re-commits.  A
    crash at ANY point leaves either the fully-committed old state or an
    uncommitted dir that ``wipe_uncommitted`` + resume recomputes — never
    duplicated and never silently missing rows.  One Ray task per
    partition (the file list is the Dataset)."""
    import ray
    import ray.data as rd

    from ..state.manifest import Manifest

    man = Manifest(root)
    done = man.completed(tier)
    todo = []
    for part in man.list_partition_dirs(tier):
        if part not in done:
            continue
        pdir = man.partition_dir(tier, part)
        parts = [f for f in man.sfs.listdir(pdir) if f.endswith(".parquet")]
        if len(parts) > 1:
            todo.append({"part": part})
    if not todo:
        return {"tier": tier, "compacted": 0}

    # step 2 first for ALL partitions (driver-side, manifest is driver-owned)
    for t in todo:
        man.append({"tier": tier, "partition": t["part"], "action": "pruned",
                    "reason": "compact"})

    root_ref = ray.put((root, tier))

    def compact_one(b: pa.Table) -> pa.Table:
        import io as _io

        import pyarrow.parquet as pq

        from ..state.manifest import Manifest as _M

        root_, tier_ = ray.get(root_ref)
        m = _M(root_)
        outs = []
        for part in b["part"].to_pylist():
            pdir = m.partition_dir(tier_, part)
            # recover a previous crash: a lingering .merged temp holds the
            # full merge of the input set recorded in ITS parquet metadata —
            # finish the original operation exactly: delete those inputs
            # (any still present), then publish.  Publishing without the
            # input delete would re-merge the merge with its own inputs and
            # duplicate every surviving row (review r3 finding).
            for f in m.sfs.listdir(pdir):
                if f.endswith(".merged"):
                    tmp_path = f"{pdir}/{f}"
                    meta = pq.read_schema(
                        _io.BytesIO(m.sfs.read_bytes(tmp_path))).metadata or {}
                    for old in (meta.get(b"compact_inputs", b"").decode()
                                .split("\n")):
                        if old and m.sfs.exists(f"{pdir}/{old}"):
                            m.sfs.remove_file(f"{pdir}/{old}")
                    m.sfs.rename(tmp_path, f"{pdir}/{f[:-len('.merged')]}")
            files = sorted(f for f in m.sfs.listdir(pdir) if f.endswith(".parquet"))
            tabs = [pq.read_table(_io.BytesIO(m.sfs.read_bytes(f"{pdir}/{f}")))
                    for f in files]
            merged = pa.concat_tables(tabs)
            if "ts" in merged.column_names:
                merged = merged.sort_by("ts")
                tmin = int(merged["ts"][0].cast(pa.int64()).as_py())
            else:
                tmin = 0
            # step 3: write the full merge (carrying its input list) to a
            # non-.parquet temp name FIRST so a crash at any later point
            # leaves at least one complete copy plus the recovery recipe
            final = f"{pdir}/part-{tmin}.parquet"
            tmp = f"{final}.merged"
            merged = merged.replace_schema_metadata(
                {**(merged.schema.metadata or {}),
                 b"compact_inputs": "\n".join(files).encode()})
            m.sfs.write_table_atomic(merged, tmp)
            for f in files:                       # step 4: clear old parts
                m.sfs.remove_file(f"{pdir}/{f}")
            # step 5: publish under the deterministic name
            m.sfs.rename(tmp, final)
            outs.append((part, len(files), merged.num_rows))
        return pa.table({
            "part": pa.array([o[0] for o in outs]),
            "n_files_before": pa.array([o[1] for o in outs], pa.int64()),
            "rows": pa.array([o[2] for o in outs], pa.int64()),
        })

    res = rd.from_items(todo, override_num_blocks=max(len(todo), 1)).map_batches(
        compact_one, batch_format="pyarrow").materialize()
    n = res.count()
    man.commit_partitions(tier, inputs=["compact"], run_id=run_id)  # step 5
    return {"tier": tier, "compacted": n}


# --------------------------------------------------------------------------- #
# A2e-standard CSV (dim-group split files + attribute preamble)
# --------------------------------------------------------------------------- #

def a2e_filepath(base: str, dims: tuple[str, ...]) -> str:
    """``.{dims}.{len}d.a2e.csv`` suffix naming (parity: A2eCSVWriter.
    get_filepath, io/writers/a2e_csv_writer.py:17-38)."""
    dims_str = ".".join(dims)
    new_suffix = f".{dims_str}.{len(dims)}d.a2e.csv"
    if base.endswith(".a2e.csv"):
        return base[: -len(".a2e.csv")] + new_suffix
    if base.endswith(".csv"):
        return base[: -len(".csv")] + new_suffix
    return base + new_suffix


def a2e_metadata_header(
    tbl: pa.Table,
    coord_cols: tuple[str, ...],
    attrs: dict | None = None,
    var_attrs: dict[str, dict] | None = None,
) -> str:
    """The A2e metadata preamble (parity: A2eCSVWriter.
    get_metadata_header_str, a2e_csv_writer.py:40-79): a ``header=N`` count
    line, global ``name="value"`` lines, then per-variable ``var:dtype=…``
    (non-string vars, coords first) and ``var:attr="value"`` lines."""
    glines: list[str] = []
    vlines: list[str] = []

    def _val(v) -> str:
        return f'"{v}"' if isinstance(v, str) else f"{v}"

    for k, v in (attrs or {}).items():
        glines.append(f"{k}={_val(v)}")
    df_dtypes = {f.name: tbl[f.name].combine_chunks().to_pandas().dtype
                 for f in tbl.schema}
    ordered = [c for c in coord_cols if c in tbl.column_names] + [
        c for c in tbl.column_names if c not in coord_cols
    ]
    import pandas.api.types as ptypes

    for name in ordered:
        if not ptypes.is_string_dtype(df_dtypes[name]):
            vlines.append(f"{name}:dtype={df_dtypes[name]}")
        for k, v in (var_attrs or {}).get(name, {}).items():
            vlines.append(f"{name}:{k}={_val(v)}")
    header = f"header={len(glines) + len(vlines) + 1}"
    return "\n".join(filter(None, [header, "\n".join(glines), "\n".join(vlines)]))


def write_batch_a2e_csv(
    batch: pa.Table,
    base_path: str,
    dims_of: dict[str, tuple[str, ...]],
    attrs: dict | None = None,
    var_attrs: dict[str, dict] | None = None,
    ts_col: str = "ts",
) -> pa.Table:
    """A2e-standard CSV write of one (long-format) table: variables split by
    their declared dim groups — one ``.{dims}.{len}d.a2e.csv`` file per
    group, each with the metadata preamble + csv body (time format
    ``%Y-%m-%d %H:%M:%S.%f`` — parity: A2eCSVWriter.write +
    get_data_as_str, a2e_csv_writer.py:81-105).  Dimensionless variables
    join the (time,) group as in the reference.  For a 1-D group the rows
    dedupe to one per coord tuple; 2-D groups keep the long layout (the
    dataframe the reference's ``to_dataframe().reset_index()`` produces)."""
    from ..state.uri import StorageFS

    groups: dict[tuple[str, ...], list[str]] = {}
    for var, dims in dims_of.items():
        key = dims if dims else (ts_col,)
        groups.setdefault(key, []).append(var)

    parent = base_path.rsplit("/", 1)[0] if "/" in base_path else "."
    fname = base_path.rsplit("/", 1)[-1]
    sfs = StorageFS(parent)
    sfs.makedirs(".")
    paths, rows = [], []
    for dims, vars_ in sorted(groups.items()):
        cols = [d for d in dims] + vars_
        sub = batch.select([c for c in cols if c in batch.column_names])
        df = sub.to_pandas()
        df = df.drop_duplicates(subset=list(dims)).reset_index(drop=True)
        out_name = a2e_filepath(fname, dims)
        header = a2e_metadata_header(sub, dims, attrs, var_attrs)
        body = df.to_csv(date_format="%Y-%m-%d %H:%M:%S.%f", header=True,
                         index=False)
        sfs.write_text(sfs.join(out_name), header + "\n" + body)
        paths.append(sfs.join_root(out_name))
        rows.append(len(df))
    return pa.table({"path": pa.array(paths, pa.string()),
                     "rows": pa.array(rows, pa.int64())})
