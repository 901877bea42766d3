"""Regenerate QUERIES.md from the query-function docstrings.

Usage: python scripts/gen_queries_md.py   (writes /root/repo/QUERIES.md)
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as e

qs, osql = e.queries(), e.oracle_sql()

MAXLEN = 220


def describe(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return "(see stage docstring)"
    text = re.sub(r"\s+", " ", doc)
    text = text.replace("|", "\\|")
    if len(text) > MAXLEN:
        text = text[:MAXLEN].rsplit(" ", 1)[0] + " ..."
    return text


lines = [
    "# QUERIES — the driver-contract surface, one line per query",
    "",
    f"{len(qs)} `queries()` entries; {len(set(qs) & set(osql))} with DuckDB "
    "`oracle_sql()` twins (hash-exact at sf0.01, see BASELINE.md). "
    "Generated from the query docstrings.",
    "",
    "| query | check | semantics / plan |",
    "|---|---|---|",
]
for name in sorted(qs):
    check = "oracled" if name in osql else "rows-only"
    lines.append(f"| `{name}` | {check} | {describe(qs[name])} |")

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "QUERIES.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out}: {len(qs)} queries, {len(set(qs) & set(osql))} oracled")
