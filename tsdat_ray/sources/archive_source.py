"""Archive sources: tar/zip of CSV members → one standardized Dataset.

Reference parity: TarReader / ZipReader delegate each archive member to a
nested reader with a regex exclude list
(/root/reference/tsdat/io/readers/tar_reader.py:12-108, zip_reader.py:12-107).
Here the archive bytes stream through ``read_binary_files`` and each batch
expands its members inline (flat-map inside ``map_batches``): open the
archive from the in-memory payload, parse each matching member with Arrow's
CSV reader, standardize against the declared schema, and stamp
``_archive``/``_member`` lineage columns.
"""

from __future__ import annotations

import io
import re
import tarfile
import zipfile

import pyarrow as pa
from pyarrow import csv as pacsv

from .declared import DeclaredSchema, standardize_declared


def _iter_members(payload: bytes, path: str):
    if path.endswith((".zip",)):
        zf = zipfile.ZipFile(io.BytesIO(payload))
        for name in zf.namelist():
            if not name.endswith("/"):
                yield name, zf.read(name)
    else:  # tar / tar.gz / tgz
        mode = "r:gz" if path.endswith((".tar.gz", ".tgz")) else "r"
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode=mode)
        for m in tf.getmembers():
            if m.isfile():
                f = tf.extractfile(m)
                if f is not None:
                    yield m.name, f.read()


def read_archive_csv(
    paths,
    schema: DeclaredSchema,
    member_pattern: str = r".*\.csv$",
    exclude: tuple[str, ...] = (r".*\__MACOSX.*", r".*\.DS_Store.*"),
):
    """tar/zip archives of CSVs → standardized Dataset (one row stream, with
    per-row archive/member lineage).  Archives are split across read tasks by
    file; member expansion is vectorized per archive."""
    import ray.data as rd

    inc = re.compile(member_pattern)
    exc = [re.compile(e) for e in exclude]

    def expand(batch: dict) -> pa.Table:
        tables = []
        for payload, path in zip(batch["bytes"], batch["path"]):
            for name, data in _iter_members(bytes(payload), str(path)):
                if not inc.match(name) or any(e.match(name) for e in exc):
                    continue
                raw = pacsv.read_csv(io.BytesIO(data))
                std = standardize_declared(raw, schema)
                n = std.num_rows
                std = std.append_column("_archive", pa.array([str(path)] * n))
                std = std.append_column("_member", pa.array([name] * n))
                tables.append(std)
        if not tables:
            # typed empty table matching the standardized schema
            sch = schema.arrow_schema()
            cols = {f.name: pa.nulls(0, f.type) for f in sch}
            cols["_archive"] = pa.nulls(0, pa.string())
            cols["_member"] = pa.nulls(0, pa.string())
            return pa.table(cols)
        return pa.concat_tables(tables, promote_options="default")

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(expand, batch_format="numpy")
