"""ORC source: distributed read of an ORC file set / partitioned store.

Ray Data has no native ORC reader, so the classic pattern applies: the FILE
LIST is the Dataset (one row per path), and each task decodes its file with
``pyarrow.orc`` — embarrassingly parallel, no driver-side data movement.
Hive partition keys are not re-derived (the tier writers put them in the
path only); pass ``columns=`` to prune at the read like read_parquet."""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def list_orc_files(root: str) -> list[str]:
    if os.path.isfile(root):
        return [root]
    return sorted(glob.glob(os.path.join(root, "**", "*.orc"), recursive=True))


def read_orc(paths, columns: list[str] | None = None,
             override_num_blocks: int | None = None):
    """paths: ORC file list or a store root directory → Ray Dataset."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = list_orc_files(paths)

    def load(b: pa.Table) -> pa.Table:
        from pyarrow import orc as paorc

        tables = [paorc.read_table(p, columns=columns) for p in b["path"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    items = [{"path": p} for p in paths]
    kw = {"override_num_blocks": override_num_blocks or max(len(items), 1)}
    ds = rd.from_items(items, **kw)
    return ds.map_batches(load, batch_format="pyarrow")
