"""Slow single-process oracle for the engine's rollup semantics.

An independent pandas/python re-implementation of the reference semantics
(standardize → QC → dedup → tier rollup with bin-average weighting per
/root/reference/tsdat/transform_v2/bin_average/ and nearest-neighbor token
carry per transform_v2/nearest_neighbor/) used by the pytest suite to verify
the distributed engine point-for-point: exact equality on buckets / counts /
QC bits / selected token arrays, float tolerance 1e-9 on means and stds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .schema import (
    BAD_ASSESSMENT_BITS,
    EPOCH_US,
    FILL_INT,
    GOODFRAC_BAD_MIN,
    GOODFRAC_IND_MIN,
    MAX_TOKENS,
    NOMINAL_INTERVAL_S,
    QC_ALL_BAD_INPUTS,
    QC_BAD,
    QC_BAD_GOODFRAC,
    QC_BIT_MISSING,
    QC_BIT_RANGE,
    QC_INDETERMINATE,
    QC_INDETERMINATE_GOODFRAC,
    QC_SOME_BAD_INPUTS,
    QC_ZERO_WEIGHT,
)

US = 1_000_000


def oracle_standardize(tbl: pa.Table) -> pd.DataFrame:
    df = pd.DataFrame(
        {
            "doc_id": tbl["doc_id"].to_pylist(),
            "tokens": tbl["tokens"].to_pylist(),
            "n_tok": tbl["n_tok"].to_pylist(),
            "source": tbl["source"].to_pylist(),
        }
    )
    i = df["doc_id"].str[-8:].astype(int)
    df["ts_us"] = EPOCH_US + i * NOMINAL_INTERVAL_S * US
    df["tok_mean"] = [float(np.mean(t)) if len(t) else np.nan for t in df["tokens"]]
    actual = df["tokens"].map(len)
    missing = df["n_tok"].isna() | (df["n_tok"] == FILL_INT)
    bad_rng = ~missing & ((df["n_tok"] != actual) | (df["n_tok"] < 1) | (df["n_tok"] > MAX_TOKENS))
    df["qc_n_tok"] = missing * QC_BIT_MISSING + bad_rng * QC_BIT_RANGE
    df["qc_tok_mean"] = 0
    df.loc[missing | bad_rng, "n_tok"] = np.nan
    # content tie-break chain for duplicate doc_ids (standardize.py
    # list_column_tiebreak / list_column_content_hash): _tb = len·2³²+Σ,
    # then (bad, filled n_tok), then the order-sensitive payload hash
    df["_tb"] = [
        np.int64(len(t)) * np.int64(2**32) + np.int64(sum(t)) for t in df["tokens"]
    ]
    df["_bad"] = (df["qc_n_tok"] & 3) != 0
    df["_ntf"] = df["n_tok"].fillna(0).astype(np.int64)
    def _chash(t) -> np.int64:
        M = (1 << 64) - 1
        h, p = 0, 1
        for v in t:
            h = (h + (int(v) + 1) * p) & M
            p = (p * 1099511628211) & M
        return np.array([h], dtype=np.uint64).view(np.int64)[0]

    df["_tb2"] = [_chash(t) for t in df["tokens"]]
    return df


def oracle_clean(df: pd.DataFrame) -> pd.DataFrame:
    """Sort by (source, ts, doc_id, _tb, _bad, _ntf, _tb2); drop duplicate
    (source, ts) keep first — same deterministic survivor as the engine."""
    df = df.sort_values(
        ["source", "ts_us", "doc_id", "_tb", "_bad", "_ntf", "_tb2"],
        kind="stable")
    return df[~df.duplicated(["source", "ts_us"])].reset_index(drop=True)


def _bucket_qc(n, n_bad, n_ind, sum_w, goodfrac):
    bf = n_bad / n if n else 0.0
    qc = 0
    if n_ind > 0:
        qc |= QC_INDETERMINATE
    if 0 < bf < 1:
        qc |= QC_SOME_BAD_INPUTS
    if sum_w == 0:
        qc |= QC_ZERO_WEIGHT
    if np.isclose(bf, 1.0):
        qc |= QC_ALL_BAD_INPUTS | QC_BAD
    gf = 0.0 if (goodfrac is None or np.isnan(goodfrac)) else goodfrac
    if gf < GOODFRAC_BAD_MIN:
        qc |= QC_BAD_GOODFRAC
    if gf < GOODFRAC_IND_MIN:
        qc |= QC_INDETERMINATE_GOODFRAC
    return qc


def oracle_rollup_raw(
    df: pd.DataFrame,
    interval_s: int,
    values=("n_tok", "tok_mean"),
    bad_bits: int = BAD_ASSESSMENT_BITS,
) -> pd.DataFrame:
    """Per (source, bucket): weighted (w=1) mean/std/goodfraction + QC bits +
    nearest-to-center token carry (ties → later row)."""
    df = oracle_clean(df)
    iv = interval_s * US
    df = df.assign(bucket=(df["ts_us"] // iv) * iv)
    rows = []
    for (src, b), g in df.groupby(["source", "bucket"], sort=True):
        g = g.sort_values(["ts_us", "doc_id"], kind="stable")
        rec = {"source": src, "bucket": b, "n_rows": len(g)}
        for v in values:
            x = g[v].to_numpy(dtype=float)
            qc = g[f"qc_{v}"].to_numpy(dtype=int)
            bad = ((qc & bad_bits) != 0) | np.isnan(x)
            sum_w = sum_wx = sum_wx2 = 0.0
            for xi, bi in zip(x, bad):
                if not bi:
                    sum_w += 1.0
                    sum_wx += xi
                    sum_wx2 += xi * xi
            n, n_bad, n_ind = len(x), int(bad.sum()), 0
            mean = sum_wx / sum_w if sum_w else np.nan
            std = (
                np.sqrt(max(sum_wx2 / sum_w - mean * mean, 0.0)) if sum_w else np.nan
            )
            gfrac = (n - n_bad) / n if n else np.nan
            rec.update(
                {
                    f"{v}_mean": mean,
                    f"{v}_std": std,
                    f"{v}_goodfraction": gfrac,
                    f"qc_{v}": _bucket_qc(n, n_bad, n_ind, sum_w, gfrac),
                    f"{v}_sum_w": sum_w,
                    f"{v}_sum_wx": sum_wx,
                    f"{v}_sum_wx2": sum_wx2,
                    f"{v}_n": n,
                    f"{v}_n_bad": n_bad,
                    f"{v}_n_ind": n_ind,
                }
            )
        center = b + iv // 2
        dist = np.abs(g["ts_us"].to_numpy() - center)
        best = np.flatnonzero(dist == dist.min())[-1]  # tie -> later row
        rec["sel_doc_id"] = g["doc_id"].iloc[best]
        rec["sel_ts"] = g["ts_us"].iloc[best]
        rec["tokens"] = g["tokens"].iloc[best]
        rows.append(rec)
    return pd.DataFrame(rows)


def oracle_rollup_cascade(tier: pd.DataFrame, interval_s: int, values=("n_tok", "tok_mean")) -> pd.DataFrame:
    iv = interval_s * US
    tier = tier.assign(cbucket=(tier["bucket"] // iv) * iv)
    rows = []
    for (src, b), g in tier.groupby(["source", "cbucket"], sort=True):
        g = g.sort_values("bucket", kind="stable")
        rec = {"source": src, "bucket": b, "n_rows": int(g["n_rows"].sum())}
        for v in values:
            sum_w = sum_wx = sum_wx2 = 0.0
            for _, r in g.iterrows():
                sum_w += r[f"{v}_sum_w"]
                sum_wx += r[f"{v}_sum_wx"]
                sum_wx2 += r[f"{v}_sum_wx2"]
            n = int(g[f"{v}_n"].sum())
            n_bad = int(g[f"{v}_n_bad"].sum())
            n_ind = int(g[f"{v}_n_ind"].sum())
            mean = sum_wx / sum_w if sum_w else np.nan
            std = np.sqrt(max(sum_wx2 / sum_w - mean * mean, 0.0)) if sum_w else np.nan
            gfrac = (n - n_bad) / n if n else np.nan
            rec.update(
                {
                    f"{v}_mean": mean,
                    f"{v}_std": std,
                    f"{v}_goodfraction": gfrac,
                    f"qc_{v}": _bucket_qc(n, n_bad, n_ind, sum_w, gfrac),
                    f"{v}_sum_w": sum_w,
                    f"{v}_sum_wx": sum_wx,
                    f"{v}_sum_wx2": sum_wx2,
                    f"{v}_n": n,
                    f"{v}_n_bad": n_bad,
                    f"{v}_n_ind": n_ind,
                }
            )
        center = b + iv // 2
        dist = np.abs(g["sel_ts"].to_numpy() - center)
        best = np.flatnonzero(dist == dist.min())[-1]
        rec["sel_doc_id"] = g["sel_doc_id"].iloc[best]
        rec["sel_ts"] = g["sel_ts"].iloc[best]
        rec["tokens"] = g["tokens"].iloc[best]
        rows.append(rec)
    return pd.DataFrame(rows)
