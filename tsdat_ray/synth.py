"""Deterministic synthesizer for the governing `sequences` input table.

Generates the Parquet corpus described in FIXTURES.md §A with seeded anomalies
so every QC / gap-fill / dedup path has work to do:

* per-source sequence index ``i`` with **gaps** (dropped runs of 5-50 indexes),
* **duplicate** rows (same ``i`` emitted twice, ~1%),
* **locally out-of-order** emission (adjacent swaps, ~2%),
* **corrupted n_tok** (~0.5% set to -9999 = missing; ~0.5% mismatched with
  ``len(tokens)`` = range/consistency failure).

Everything is reproducible from ``(seed, source, chunk)`` via the Philox
counter RNG, so any chunk can be regenerated independently (this is also how
generation parallelizes: one Ray task per chunk).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import (
    MAX_TOKENS,
    SEQUENCES_SCHEMA,
    SOURCE_WEIGHTS,
    SOURCES,
    VOCAB,
    FILL_INT,
)

GAP_START_P = 0.004  # expected gap-run starts per index
GAP_LEN_LO, GAP_LEN_HI = 5, 51
DUP_P = 0.01
SWAP_P = 0.02
MISSING_P = 0.005
MISMATCH_P = 0.005
TOKLEN_MU, TOKLEN_SIGMA = 4.5, 1.0  # lognormal params for len(tokens)

CHUNK_ROWS = 100_000


def _chunk_rng(seed: int, source: str, chunk_id: int) -> np.random.Generator:
    src_idx = SOURCES.index(source) if source in SOURCES else hash(source) % 2**31
    key = np.array([seed, src_idx * 2**32 + chunk_id], dtype=np.uint64)
    return np.random.Generator(np.random.Philox(key=key))


def generate_chunk(
    source: str, i_start: int, i_stop: int, seed: int = 42, max_tokens: int = MAX_TOKENS
) -> pa.Table:
    """Generate one deterministic chunk of the sequences table.

    Covers per-source indexes [i_start, i_stop); rows for gapped indexes are
    dropped, duplicated indexes appear twice, and the emission order contains
    local adjacent swaps.
    """
    rng = _chunk_rng(seed, source, i_start)
    n = i_stop - i_start
    idx = np.arange(i_start, i_stop, dtype=np.int64)

    # gaps: drop runs of consecutive indexes
    u = rng.random(n)
    gap_starts = np.flatnonzero(u < GAP_START_P)
    keep = np.ones(n, dtype=bool)
    if len(gap_starts):
        lens = rng.integers(GAP_LEN_LO, GAP_LEN_HI, len(gap_starts))
        for s, ln in zip(gap_starts, lens):
            keep[s : s + ln] = False
    else:
        rng.integers(GAP_LEN_LO, GAP_LEN_HI, 0)
    idx = idx[keep]
    m = len(idx)

    # duplicates: repeat ~1% of surviving indexes
    dup = (rng.random(m) < DUP_P).astype(np.int64) + 1
    idx = np.repeat(idx, dup)
    m = len(idx)

    # local out-of-order: swap non-overlapping adjacent pairs
    swap_at = np.flatnonzero(rng.random(m - 1) < SWAP_P) if m > 1 else np.array([], int)
    if len(swap_at):
        swap_at = swap_at[np.diff(swap_at, prepend=-2) > 1]  # non-overlapping
        order = np.arange(m)
        order[swap_at], order[swap_at + 1] = order[swap_at + 1].copy(), order[swap_at].copy()
        idx = idx[order]

    # token arrays
    lens = np.clip(
        np.round(rng.lognormal(TOKLEN_MU, TOKLEN_SIGMA, m)).astype(np.int64), 1, max_tokens
    )
    total = int(lens.sum())
    values = rng.integers(0, VOCAB, total, dtype=np.int32)
    offsets = np.zeros(m + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))

    # n_tok with injected corruption
    n_tok = lens.astype(np.int32)
    r = rng.random(m)
    n_tok[r < MISSING_P] = FILL_INT
    mism = (r >= MISSING_P) & (r < MISSING_P + MISMATCH_P)
    n_tok[mism] = (lens[mism] + 1 + rng.integers(0, 100, int(mism.sum()))).astype(np.int32)

    doc_id = np.char.add(f"{source}-", np.char.zfill(idx.astype("U8"), 8))

    return pa.table(
        {
            "doc_id": pa.array(doc_id),
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array(np.repeat(np.array(source, dtype=object), m)),
        },
        schema=SEQUENCES_SCHEMA,
    )


def plan_chunks(n_rows: int, chunk_rows: int = CHUNK_ROWS) -> list[dict]:
    """Deterministic chunk plan: per-source index spans covering ~n_rows total."""
    plan = []
    for source, w in zip(SOURCES, SOURCE_WEIGHTS):
        n_s = int(round(n_rows * w))
        for a in range(0, n_s, chunk_rows):
            plan.append({"source": source, "i_start": a, "i_stop": min(a + chunk_rows, n_s)})
    return plan


def generate_sequences_table(n_rows: int, seed: int = 42, max_tokens: int = MAX_TOKENS) -> pa.Table:
    """Driver-side generation (small scales / tests)."""
    tables = [
        generate_chunk(c["source"], c["i_start"], c["i_stop"], seed, max_tokens)
        for c in plan_chunks(n_rows)
    ]
    return pa.concat_tables(tables)


def generate_sequences_parquet(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    chunk_rows: int = CHUNK_ROWS,
    max_tokens: int = MAX_TOKENS,
) -> str:
    """Parallel generation via a Ray pipeline (one task per chunk) → Parquet dir.

    Deterministic per chunk regardless of parallelism; one output file per
    chunk so the read side splits naturally.
    """
    import ray.data as rd

    plan = plan_chunks(n_rows, chunk_rows)

    def gen(batch: pa.Table) -> pa.Table:
        out = [
            generate_chunk(s, a, b, seed, max_tokens)
            for s, a, b in zip(
                batch["source"].to_pylist(),
                batch["i_start"].to_pylist(),
                batch["i_stop"].to_pylist(),
            )
        ]
        return pa.concat_tables(out)

    ds = rd.from_items(plan).map_batches(gen, batch_format="pyarrow", batch_size=1)
    ds.write_parquet(out_dir)
    return out_dir


def generate_embeddings_parquet(
    out_dir: str,
    n_rows: int = 100_000,
    dim: int = 64,
    n_clusters: int = 256,
    seed: int = 77,
    chunk_rows: int = 25_000,
) -> str:
    """Deterministic clustered embedding corpus (for ANN benchmarks): unit
    vectors drawn around ``n_clusters`` seeded centroids, written as chunked
    Parquet (vec_id:int64, embedding:list<float>, cluster:int32)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng0 = np.random.Generator(np.random.Philox(key=np.array([seed, 9], dtype=np.uint64)))
    cents = rng0.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    for c, start in enumerate(range(0, n_rows, chunk_rows)):
        n = min(chunk_rows, n_rows - start)
        rng = np.random.Generator(np.random.Philox(key=np.array([seed, 10 + c], dtype=np.uint64)))
        cl = rng.integers(0, n_clusters, n)
        vecs = cents[cl] + 0.25 * rng.standard_normal((n, dim))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
                "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                                      pa.list_(pa.float32())),
                "cluster": pa.array(cl.astype(np.int32)),
            }
        )
        pq.write_table(tbl, os.path.join(out_dir, f"emb-{start}.parquet"))
    return out_dir


# --------------------------------------------------------------------------- #
# deterministic synthetic partsupp (TPC-H Q2/Q9/Q11/Q16/Q20 over the reduced
# driver schema, which ships no partsupp table)
# --------------------------------------------------------------------------- #

PARTSUPP_FANOUT = 4
_PS_OFFSETS = (0, 13, 26, 39)  # 13*i — pairwise-distinct mod 10/100/1000


def partsupp_arrays(p_partkey: np.ndarray, n_supp: int) -> dict[str, np.ndarray]:
    """Vectorized synthetic ``partsupp`` rows for a block of part keys.

    Pure integer formula — identical on the Ray side (this function) and the
    DuckDB oracle side (:func:`partsupp_cte`), so the derived table needs no
    stored data and generation stays partition-aligned with ``part`` (every
    supplier row of a part is emitted by the block that read the part — no
    shuffle).  ``ps_suppkey = (p_partkey*7 + i*13) % n_supp`` for
    ``i in 0..3``; offsets 13*i are pairwise distinct mod the supplier counts
    used by the testdata (10/100/1000), so (partkey, suppkey) pairs are unique.
    """
    pk = np.repeat(p_partkey.astype(np.int64), PARTSUPP_FANOUT)
    i = np.tile(np.arange(PARTSUPP_FANOUT, dtype=np.int64), len(p_partkey))
    sk = (pk * 7 + i * 13) % np.int64(n_supp)
    availqty = partsupp_availqty(pk, sk)
    cost_cents = 100 + (pk * 37 + sk * 53) % np.int64(99901)
    return {
        "ps_partkey": pk,
        "ps_suppkey": sk,
        "ps_availqty": availqty,
        "ps_supplycost_cents": cost_cents,  # exact int; /100.0 for dollars
    }


def partsupp_availqty(pk: np.ndarray, sk: np.ndarray) -> np.ndarray:
    """ps_availqty for known-member (partkey, suppkey) — the single source
    of the formula (mirrored only in PARTSUPP_CTE)."""
    return 1 + (pk.astype(np.int64) * 31
                + sk.astype(np.int64) * 17) % np.int64(9999)


def partsupp_pair_mask(l_partkey: np.ndarray, l_suppkey: np.ndarray,
                       n_supp: int) -> np.ndarray:
    """True where (partkey, suppkey) is a row of the synthetic partsupp —
    the membership test ``(suppkey - 7*partkey) mod n_supp in {13*i}`` —
    so lineitem⋈partsupp needs no join at all, just this formula."""
    r = (l_suppkey.astype(np.int64) - 7 * l_partkey.astype(np.int64)) % np.int64(n_supp)
    mask = np.zeros(len(r), dtype=bool)
    for off in _PS_OFFSETS:
        mask |= r == (off % n_supp)
    return mask


def partsupp_cost_cents(l_partkey: np.ndarray, l_suppkey: np.ndarray) -> np.ndarray:
    """ps_supplycost (integer cents) for known-member (partkey, suppkey)."""
    pk = l_partkey.astype(np.int64)
    sk = l_suppkey.astype(np.int64)
    return 100 + (pk * 37 + sk * 53) % np.int64(99901)


PARTSUPP_CTE = """
    partsupp AS (
        SELECT p.p_partkey AS ps_partkey,
               (p.p_partkey * 7 + t.i * 13) % s.n AS ps_suppkey,
               1 + (p.p_partkey * 31
                    + ((p.p_partkey * 7 + t.i * 13) % s.n) * 17) % 9999
                   AS ps_availqty,
               (100 + (p.p_partkey * 37
                       + ((p.p_partkey * 7 + t.i * 13) % s.n) * 53) % 99901)
                   / 100.0 AS ps_supplycost
        FROM part p
        CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
        CROSS JOIN (SELECT count(*) AS n FROM supplier) s
    )
"""
