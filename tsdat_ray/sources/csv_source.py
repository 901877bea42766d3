"""CSV sources.

* ``read_csv_declared`` — ``ray.data.read_csv`` + the declared-schema
  standardize stage: the engine's ``CSVReader`` + retrieval-rules pipeline
  (/root/reference/tsdat/io/readers/csv_reader.py:10-27).
* ``read_preamble_csv`` — CSV files whose first lines are ``key,value``
  metadata followed by a ``header=N``-style marker line, as in the
  reference's A2eCSVReader (/root/reference/tsdat/io/readers/
  a2e_csv_reader.py:14-83): the preamble is parsed once per file (driver
  side, cheap — it reads only the first KB), attrs are attached to the
  declared schema, and the body streams through ``read_csv`` with
  ``skip_rows``.
"""

from __future__ import annotations

import io

import pyarrow as pa
from pyarrow import csv as pacsv

from .declared import DeclaredSchema, standardize_declared


def read_csv_declared(paths, schema: DeclaredSchema, override_num_blocks: int | None = None,
                      **read_csv_kwargs):
    """CSV → standardized Dataset (rename/cast/fill per declared schema)."""
    import ray.data as rd

    kw = dict(read_csv_kwargs)
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    ds = rd.read_csv(paths, **kw)
    return ds.map_batches(lambda b: standardize_declared(b, schema), batch_format="pyarrow")


def parse_preamble(path: str, marker: str = "header=") -> tuple[dict, int]:
    """Parse a key,value metadata preamble.  Returns (attrs, n_skip_rows)
    where n_skip_rows is the first body row (the marker line's value if a
    ``header=N`` line exists, else the count of ``key,value`` pairs)."""
    attrs: dict[str, str] = {}
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for i, line in enumerate(f):
            line = line.strip()
            if line.startswith(marker):
                return attrs, int(line[len(marker):].split(",")[0])
            parts = line.split(",", 1)
            if len(parts) == 2 and parts[0] and not parts[0][0].isdigit():
                attrs[parts[0]] = parts[1].strip()
            else:
                return attrs, i
    return attrs, 0


def read_preamble_csv(paths, schema: DeclaredSchema, marker: str = "header="):
    """Preamble-CSV → standardized Dataset.  The preamble of the FIRST file
    is parsed for attrs (all files of one datastream share the layout, as the
    reference assumes); every file's body streams through ``read_csv`` with
    the computed skip_rows."""
    import ray.data as rd

    plist = [paths] if isinstance(paths, str) else list(paths)
    attrs, skip = parse_preamble(plist[0], marker=marker)
    merged = DeclaredSchema(variables=schema.variables, attrs={**schema.attrs, **attrs})
    # ``header=N`` declares the body's column-header row index; skip straight
    # to it so read_csv sees an ordinary headered CSV
    ds = rd.read_csv(plist, read_options=pacsv.ReadOptions(skip_rows=skip))
    return ds.map_batches(lambda b: standardize_declared(b, merged), batch_format="pyarrow"), attrs
