"""Standardize stage: raw sequences batches → declared engine schema.

Ray-Data-first re-expression of the reference's retrieval + standardization
step (rename/cast/fill/derive; see /root/reference/tsdat/pipeline/base/
pipeline.py:59-148 and io/retrievers/_rename_variables.py:16-91): one
vectorized ``map_batches(standardize_batch, batch_format="pyarrow")`` that

* derives the deterministic event time ``ts`` from ``doc_id``
  (``EPOCH + i * interval``),
* computes ``tok_mean`` from the token list arrays (zero-copy numpy over the
  Arrow buffers),
* runs the two cheapest point-wise QC managers inline (CheckMissing and a
  fail-range consistency check on ``n_tok``; semantics per
  /root/reference/tsdat/qc/checkers/check_missing.py:8-27 and
  check_max.py:11-42), bit-packing results into ``qc_n_tok`` in manager order
  (record_quality_results.py:74-83) and nulling failed values
  (RemoveFailedValues, remove_failed_values.py:8-26),
* flags locally out-of-order arrival on ``qc_ts`` (CheckMonotonic semantics,
  check_monotonic.py:74-99, evaluated per (batch, source) run — the
  distributed deviation from the reference's whole-slice view is documented
  in SURVEY.md §4.2).

Stateless: a plain function, not an actor, since there is no per-worker state
to amortize.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import (
    BAD_ASSESSMENT_BITS,
    EPOCH_US,
    FILL_INT,
    MAX_TOKENS,
    NOMINAL_INTERVAL_S,
    QC_BIT_MISSING,
    QC_BIT_MONOTONIC,
    QC_BIT_RANGE,
)


@dataclass(frozen=True)
class StandardizeConfig:
    epoch_us: int = EPOCH_US
    interval_s: int = NOMINAL_INTERVAL_S
    fill_int: int = FILL_INT
    max_tokens: int = MAX_TOKENS
    id_digits: int = 8  # doc_id = f"{source}-{i:0{id_digits}d}"


def list_column_means(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized mean over each list in a list<int32> column (NaN for empty)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr: pa.ListArray = col  # type: ignore[assignment]
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = arr.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offsets)
    # prefix-sum differences: correct for every segment INCLUDING empty
    # lists (reduceat with clamped starts truncated the row before a
    # trailing empty list — review r3 finding); exact for the integer-
    # valued token ids this column carries (sums ≪ 2^53)
    cs = np.concatenate([[0.0], np.cumsum(values)])
    sums = cs[offsets[1:]] - cs[offsets[:-1]]
    nonempty = lens > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        means = np.where(nonempty, sums / np.maximum(lens, 1), np.nan)
    return means


def list_column_lengths(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    return np.diff(offsets)


def list_column_tiebreak(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic content tie-break per list: len(list) * 2**32 +
    sum(values), exact in int64 for token ids < VOCAB and len <= MAX_TOKENS
    (max sum ~1e8 < 2**32).  The corpus injects duplicate rows that share
    doc_id but carry independently generated payloads (synth.py DUP_P), so
    'keep first by id' alone is ambiguous; ordering by this value makes the
    dedup survivor bit-deterministic AND SQL-reproducible
    (len(tokens)*4294967296 + list_sum(tokens) in DuckDB)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr: pa.ListArray = col  # type: ignore[assignment]
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = arr.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offsets)
    # int prefix sums: exact and empty-segment-safe (see list_column_means)
    cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(values)])
    sums = cs[offsets[1:]] - cs[offsets[:-1]]
    return lens * np.int64(2**32) + sums


def list_column_content_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order-SENSITIVE per-row polynomial hash of a list column (uint64
    wraparound Horner: Σ (v_i + 1) · P^i): the engine-internal FINAL dedup
    tie-break.  ``_tb`` (len·2³²+sum) can tie across genuinely different
    payloads; every SQL-checked aggregate is then identical whichever row
    survives, but bit-determinism of the CARRIED payload needs a content
    total order — this supplies it (not part of the SQL contract)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr: pa.ListArray = col  # type: ignore[assignment]
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.uint64)
    offsets = arr.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offsets)
    if not len(lens):
        return np.zeros(0, np.int64)
    P = np.uint64(1099511628211)
    maxlen = int(lens.max()) if len(lens) else 0
    pows = np.ones(max(maxlen, 1), np.uint64)
    np.cumprod(np.full(max(maxlen, 1), P, np.uint64), out=pows)
    pows = np.concatenate([np.ones(1, np.uint64), pows[:-1]]) if maxlen else pows
    # restrict to this (possibly sliced) array's element span
    vals = values[offsets[0]:offsets[-1]]
    rel = offsets - offsets[0]
    pos = (np.arange(len(vals), dtype=np.int64)
           - np.repeat(rel[:-1], lens)) if len(vals) else np.zeros(0, np.int64)
    terms = (vals + np.uint64(1)) * pows[pos] if len(vals) else vals
    cs = np.concatenate([np.zeros(1, np.uint64), np.cumsum(terms)])
    h = cs[rel[1:]] - cs[rel[:-1]]
    return h.view(np.int64)


def standardize_batch(batch: pa.Table, cfg: StandardizeConfig = StandardizeConfig()) -> pa.Table:
    n = batch.num_rows
    # --- derive ts from the per-source sequence index encoded in doc_id
    idx_str = pc.utf8_slice_codeunits(batch["doc_id"], start=-cfg.id_digits)
    i = pc.cast(idx_str, pa.int64())
    ts_us = pc.add(pc.multiply(i, pa.scalar(cfg.interval_s * 1_000_000, type=pa.int64())),
                   pa.scalar(cfg.epoch_us, type=pa.int64()))
    ts = pc.cast(ts_us, pa.timestamp("us"))

    # --- token stats (numpy over Arrow list buffers, no per-row Python)
    actual_len = list_column_lengths(batch["tokens"])
    tok_mean = list_column_means(batch["tokens"])

    n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    null_in = pc.is_null(batch["n_tok"]).to_numpy(zero_copy_only=False)

    # --- manager 1: CheckMissing (fill value or null)  → record bit, remove
    missing = null_in | (n_tok == cfg.fill_int)
    # --- manager 2: fail-range/consistency: n_tok must equal len(tokens) and
    #     lie in [1, max_tokens]; evaluated on non-missing values only
    #     (_FillValue masked out first, as in check_max.py:27-31)
    bad_range = ~missing & ((n_tok != actual_len) | (n_tok < 1) | (n_tok > cfg.max_tokens))

    qc_n_tok = (missing * QC_BIT_MISSING + bad_range * QC_BIT_RANGE).astype(np.int32)
    n_tok_clean = pa.array(
        np.where(missing | bad_range, 0, n_tok).astype(np.int32),
        mask=(missing | bad_range),
    )

    # --- CheckMonotonic on ts per (source) run inside this batch
    ts_np = ts_us.to_numpy(zero_copy_only=False)
    src = batch["source"]
    same_src = np.ones(n, dtype=bool)
    if n > 1:
        same_src[1:] = pc.equal(src.slice(1), src.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    ooo = np.zeros(n, dtype=bool)
    if n > 1:
        ooo[1:] = (np.diff(ts_np) <= 0) & same_src[1:]
    qc_ts = (ooo * QC_BIT_MONOTONIC).astype(np.int32)

    qc_tok_mean = np.zeros(n, dtype=np.int32)

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "tokens": batch["tokens"],
            "n_tok": n_tok_clean,
            "source": batch["source"],
            "ts": ts,
            "tok_mean": pa.array(tok_mean, type=pa.float64()),
            "qc_n_tok": pa.array(qc_n_tok),
            "qc_tok_mean": pa.array(qc_tok_mean),
            "qc_ts": pa.array(qc_ts),
            # dedup tie-breaks for duplicate doc_ids (dropped after dedup):
            # _tb = (len, sum) — SQL-reproducible; _tb2 = order-sensitive
            # content hash — engine-only final total order
            "_tb": pa.array(list_column_tiebreak(batch["tokens"])),
            "_tb2": pa.array(list_column_content_hash(batch["tokens"])),
        }
    )


def bad_mask_from_qc(qc: np.ndarray, bad_bits: int = BAD_ASSESSMENT_BITS) -> np.ndarray:
    """Rows whose QC bits include any 'Bad'-assessed test (parity:
    act get_masked_data(rm_assessments=['Bad']) used by the reference's
    transform input filtering, transform_v2/utils/get_filtered_data.py)."""
    return (qc & bad_bits) != 0
