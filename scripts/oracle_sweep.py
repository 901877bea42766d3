"""Oracle sweep: run queries() vs oracle_sql() the way the driver does.

Usage:
    python scripts/oracle_sweep.py [query ...]         # default: every oracled query
    GRAFT_SF_DIR=/root/testdata/sf0.001 python scripts/oracle_sweep.py

Compares each Ray query against its DuckDB twin with the driver's contract:
columns sorted by name, rows sorted by all columns, exact value compare.
Exit code 1 if anything mismatches.  Owns its own Ray session (the library
never calls ray.init).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import __ray_entry__ as e

qs, osql = e.queries(), e.oracle_sql()

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

names = sys.argv[1:] or sorted(set(qs) & set(osql))
names = [n for n in names if n in qs]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pa.concat_tables(
        res.iter_batches(batch_format="pyarrow", batch_size=None)).to_pandas()


bad = 0
for name in names:
    try:
        mine = norm(to_df(qs[name](SF)))
        if name not in osql:
            print(f"{name}: rows={len(mine)} (rows-only, no oracle)")
            continue
        # re-fetch AFTER the Ray run: sequences-family oracle strings embed
        # the generated corpus path, which the Ray query just (re)sized —
        # a pre-run snapshot compares against the wrong-scale corpus when
        # GRAFT_SF_DIR != sf0.01 (r4 sweep artifact)
        sql = e.oracle_sql()[name]
        orc = norm(con.execute(sql).fetchdf())
        rows_ok = len(mine) == len(orc)
        cols_ok = list(mine.columns) == list(orc.columns)
        val_ok = False
        if rows_ok and cols_ok:
            try:
                pd.testing.assert_frame_equal(
                    mine, orc, check_dtype=False, check_exact=True)
                val_ok = True
            except AssertionError as ex:
                val_ok = f"VALUES DIFFER: {str(ex)[:150]}"
        status = "OK" if val_ok is True else \
            f"FAIL rows={rows_ok} cols={cols_ok} {val_ok}"
        if val_ok is not True:
            bad += 1
        print(f"{name}: {status} ({len(mine)} rows)")
    except Exception as ex:  # noqa: BLE001 — sweep must report, not die
        bad += 1
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
    finally:
        from tsdat_ray.stages.spill import release_all

        release_all()  # advisor r4: don't accumulate checkpoint scratch
                       # across a 225-query session (atexit is backstop)

ray.shutdown()
print(f"\n{len(names)} queries, {bad} failures")
sys.exit(1 if bad else 0)
