"""Tiered continuous-aggregate rollup (raw → 1m → 1h → 1d).

Semantics derive from the reference's bin-average transform
(/root/reference/tsdat/transform_v2/bin_average/calculate_bin_average.py:15-111
and _weighted_average.py / _weighted_std.py / _perform_bin_average_qc_checks.py):
for tier buckets the output is the weighted mean / std / goodfraction of the
bucket's inputs with Bad-flagged and missing inputs excluded, plus the fixed
transform-QC bit table.  For aligned tiers with point samples every weight is
1, so the rollup is exactly decomposable into the partial sums
(Σw, Σwx, Σwx², n, n_bad, n_ind) which each tier row carries so the next tier
aggregates **exactly** the same numbers as aggregating raw (window-ordered
summation keeps floats deterministic; SURVEY.md §7.4-2).

The token-array invariant comes from the reference's nearest-neighbor
subsample (transform_v2/nearest_neighbor/calculate_nearest_neighbor.py:8-41):
each bucket selects the one input row whose ``ts`` is closest to the bucket
center (ties → the later row, matching xarray reindex "nearest" tie-breaking
observed in the reference's 19-point golden) and carries its ``tokens`` array
verbatim through every tier.

Physical plan (Ray-Data-first, explicit shuffle):

    map_batches(add bucket/window cols)          # stateless, vectorized
      → groupby([key, _window]).map_groups(...)  # ONE all-to-all exchange
                                                 # window = coarse time range
                                                 # bounding group size (skew)

Group size is bounded by ``window_s`` regardless of source skew (a hot source
becomes many windows, not one giant group), which is the salting strategy the
north rule asks for — the salt is the time range itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import (
    BAD_ASSESSMENT_BITS,
    GOODFRAC_BAD_MIN,
    GOODFRAC_IND_MIN,
    QC_ALL_BAD_INPUTS,
    QC_BAD,
    QC_BAD_GOODFRAC,
    QC_INDETERMINATE,
    QC_INDETERMINATE_GOODFRAC,
    QC_SOME_BAD_INPUTS,
    QC_ZERO_WEIGHT,
)

US = 1_000_000


@dataclass(frozen=True)
class RollupConfig:
    interval_s: int
    key: str = "source"
    ts_col: str = "ts"
    values: tuple[str, ...] = ("n_tok", "tok_mean")
    window_s: int = 86400
    carry_tokens: bool = True
    id_col: str = "doc_id"  # deterministic tiebreak + subsample identity
    carry_cols: tuple[str, ...] = ("tokens",)  # payload carried from selected row
    dedup: bool = True  # drop duplicate (key, ts) rows, keep first by id
    bad_bits: int = BAD_ASSESSMENT_BITS
    ind_bits: int = 0
    goodfrac_bad_min: float = GOODFRAC_BAD_MIN
    goodfrac_ind_min: float = GOODFRAC_IND_MIN


def floor_bucket_us(ts_us: np.ndarray, interval_s: int) -> np.ndarray:
    """Bucket label = ts floored to the interval, anchored at the unix epoch
    (matches SQL date_trunc/time_bucket for 60/3600/86400 s)."""
    iv = np.int64(interval_s * US)
    return (ts_us // iv) * iv


def _segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.flatnonzero(np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]).astype(np.int64)


def _seg_sum(x: np.ndarray, starts: np.ndarray) -> np.ndarray:
    return np.add.reduceat(x, starts) if len(starts) else np.zeros(0, dtype=x.dtype)


def _bucket_qc_bits(
    n: np.ndarray,
    n_bad: np.ndarray,
    n_ind: np.ndarray,
    sum_w: np.ndarray,
    goodfrac: np.ndarray,
    cfg: RollupConfig,
) -> np.ndarray:
    """Transform-QC bits per bucket (parity with the reference's
    _perform_bin_average_qc_checks.py:30-79 bit table, computed from counters)."""
    bad_fraction = np.divide(n_bad, n, out=np.zeros_like(n, dtype=float), where=n > 0)
    qc = np.zeros(len(n), dtype=np.int64)
    qc |= QC_INDETERMINATE * (n_ind > 0)
    qc |= QC_SOME_BAD_INPUTS * ((bad_fraction > 0) & (bad_fraction < 1))
    qc |= QC_ZERO_WEIGHT * (sum_w == 0)
    qc |= (QC_ALL_BAD_INPUTS | QC_BAD) * np.isclose(bad_fraction, 1.0)
    gf = np.where(np.isnan(goodfrac), 0.0, goodfrac)
    qc |= QC_BAD_GOODFRAC * (gf < cfg.goodfrac_bad_min)
    qc |= QC_INDETERMINATE_GOODFRAC * (gf < cfg.goodfrac_ind_min)
    return qc.astype(np.int32)


def _finalize_value(
    out: dict,
    v: str,
    sum_w: np.ndarray,
    sum_wx: np.ndarray,
    sum_wx2: np.ndarray,
    n: np.ndarray,
    n_bad: np.ndarray,
    n_ind: np.ndarray,
    cfg: RollupConfig,
    vmin: np.ndarray | None = None,
    vmax: np.ndarray | None = None,
) -> None:
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(sum_w > 0, sum_wx / sum_w, np.nan)
        var = sum_wx2 / sum_w - mean * mean
        std = np.where(sum_w > 0, np.sqrt(np.maximum(var, 0.0)), np.nan)
        goodfrac = np.where(n > 0, (n - n_bad) / np.maximum(n, 1), np.nan)
    out[f"{v}_mean"] = mean
    out[f"{v}_std"] = std
    out[f"{v}_goodfraction"] = goodfrac
    out[f"qc_{v}"] = _bucket_qc_bits(n, n_bad, n_ind, sum_w, goodfrac, cfg)
    out[f"{v}_sum_w"] = sum_w
    out[f"{v}_sum_wx"] = sum_wx
    out[f"{v}_sum_wx2"] = sum_wx2
    out[f"{v}_n"] = n
    out[f"{v}_n_bad"] = n_bad
    out[f"{v}_n_ind"] = n_ind
    if vmin is not None:
        out[f"{v}_min"] = vmin
        out[f"{v}_max"] = vmax


def _select_nearest(
    bucket: np.ndarray, starts: np.ndarray, counts: np.ndarray, ts_us: np.ndarray, interval_us: int
) -> np.ndarray:
    """Per bucket: index of the row whose ts is nearest the bucket center
    (ties → later row). Input sorted by (bucket, ts)."""
    center = bucket + interval_us // 2
    dist = np.abs(ts_us - center[np.repeat(np.arange(len(starts)), counts)])
    mind = np.minimum.reduceat(dist, starts)
    is_min = dist == np.repeat(mind, counts)
    pos = np.where(is_min, np.arange(len(dist)), -1)
    return np.maximum.reduceat(pos, starts)


def rollup_group_raw(g: pa.Table, cfg: RollupConfig) -> pa.Table:
    """Finalize one (key, window) group of standardized raw rows into tier rows.

    Sorts by (ts, doc_id), drops exact-duplicate timestamps (keep first =
    smallest doc_id; the reference tolerates duplicates silently via xr.merge
    — our engine dedups explicitly, SURVEY.md §2.7), then computes per-bucket
    aggregates with deterministic in-order summation.
    """
    ts_us = g[cfg.ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    row_id = g[cfg.id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((row_id, ts_us))
    ts_us = ts_us[order]

    if cfg.dedup:  # exact dedup on ts within (key, window), keep first by id
        keep = np.r_[True, ts_us[1:] != ts_us[:-1]] if len(ts_us) else np.zeros(0, bool)
        sel_rows = order[keep]
        ts_us = ts_us[keep]
    else:
        sel_rows = order

    iv_us = cfg.interval_s * US
    bucket = floor_bucket_us(ts_us, cfg.interval_s)
    starts = _segment_starts(bucket)
    counts = np.diff(np.r_[starts, len(bucket)])
    blabels = bucket[starts]
    m = len(starts)

    out: dict = {
        cfg.key: pa.array(np.repeat(g[cfg.key][0].as_py(), m)),
        "bucket": pa.array(blabels, type=pa.int64()).cast(pa.timestamp("us")),
        "n_rows": counts.astype(np.int64),
    }

    ones = np.ones(len(ts_us), dtype=np.float64)
    for v in cfg.values:
        x = g[v].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)[sel_rows]
        if f"qc_{v}" in g.column_names:
            qc = g[f"qc_{v}"].combine_chunks().to_numpy(zero_copy_only=False)[sel_rows]
        else:
            qc = np.zeros(len(x), dtype=np.int32)
        bad = ((qc & cfg.bad_bits) != 0) | np.isnan(x)
        ind = ((qc & cfg.ind_bits) != 0) & ~bad if cfg.ind_bits else np.zeros(len(x), bool)
        w = np.where(bad, 0.0, ones)
        xw = np.where(bad, 0.0, x)
        xmin = np.where(bad, np.inf, x)
        xmax = np.where(bad, -np.inf, x)
        vmin = np.minimum.reduceat(xmin, starts) if len(starts) else np.zeros(0)
        vmax = np.maximum.reduceat(xmax, starts) if len(starts) else np.zeros(0)
        _finalize_value(
            out,
            v,
            sum_w=_seg_sum(w, starts),
            sum_wx=_seg_sum(xw * w, starts),
            sum_wx2=_seg_sum(xw * xw * w, starts),
            n=counts.astype(np.int64),
            n_bad=_seg_sum(bad.astype(np.int64), starts),
            n_ind=_seg_sum(ind.astype(np.int64), starts),
            cfg=cfg,
            vmin=np.where(np.isfinite(vmin), vmin, np.nan),
            vmax=np.where(np.isfinite(vmax), vmax, np.nan),
        )

    if cfg.carry_tokens:
        pick = _select_nearest(blabels, starts, counts, ts_us, iv_us)
        take = pa.array(sel_rows[pick], type=pa.int64())
        out[f"sel_{cfg.id_col}"] = g[cfg.id_col].take(take)
        out["sel_ts"] = g[cfg.ts_col].take(take)
        for c in cfg.carry_cols:
            out[c] = g[c].take(take)

    return pa.table(out)


def rollup_group_cascade(g: pa.Table, cfg: RollupConfig) -> pa.Table:
    """Aggregate finer-tier rows into a coarser tier (exact: sums of sums)."""
    b_us = g["bucket"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(b_us, kind="stable")
    b_us = b_us[order]
    take = pa.array(order, type=pa.int64())

    iv_us = cfg.interval_s * US
    bucket = floor_bucket_us(b_us, cfg.interval_s)
    starts = _segment_starts(bucket)
    counts = np.diff(np.r_[starts, len(bucket)])
    blabels = bucket[starts]
    m = len(starts)

    def col(name: str) -> np.ndarray:
        return g[name].combine_chunks().to_numpy(zero_copy_only=False)[order]

    out: dict = {
        cfg.key: pa.array(np.repeat(g[cfg.key][0].as_py(), m)),
        "bucket": pa.array(blabels, type=pa.int64()).cast(pa.timestamp("us")),
        "n_rows": _seg_sum(col("n_rows"), starts),
    }
    for v in cfg.values:
        has_minmax = f"{v}_min" in g.column_names
        vmin = vmax = None
        if has_minmax:
            xmin = np.where(np.isnan(col(f"{v}_min")), np.inf, col(f"{v}_min"))
            xmax = np.where(np.isnan(col(f"{v}_max")), -np.inf, col(f"{v}_max"))
            vmin = np.minimum.reduceat(xmin, starts) if len(starts) else np.zeros(0)
            vmax = np.maximum.reduceat(xmax, starts) if len(starts) else np.zeros(0)
            vmin = np.where(np.isfinite(vmin), vmin, np.nan)
            vmax = np.where(np.isfinite(vmax), vmax, np.nan)
        _finalize_value(
            out,
            v,
            sum_w=_seg_sum(col(f"{v}_sum_w"), starts),
            sum_wx=_seg_sum(col(f"{v}_sum_wx"), starts),
            sum_wx2=_seg_sum(col(f"{v}_sum_wx2"), starts),
            n=_seg_sum(col(f"{v}_n"), starts),
            n_bad=_seg_sum(col(f"{v}_n_bad"), starts),
            n_ind=_seg_sum(col(f"{v}_n_ind"), starts),
            cfg=cfg,
            vmin=vmin,
            vmax=vmax,
        )

    if cfg.carry_tokens and "sel_ts" in g.column_names:
        sel_ts = g["sel_ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)[order]
        pick = _select_nearest(blabels, starts, counts, sel_ts, iv_us)
        ptake = pa.array(order[np.asarray(pick)], type=pa.int64())
        out[f"sel_{cfg.id_col}"] = g[f"sel_{cfg.id_col}"].take(ptake)
        out["sel_ts"] = g["sel_ts"].take(ptake)
        for c in cfg.carry_cols:
            out[c] = g[c].take(ptake)

    return pa.table(out)


def _add_window(ds, ts_col: str, window_s: int, from_tier: bool):
    src = "bucket" if from_tier else ts_col

    def add(batch: pa.Table) -> pa.Table:
        ts_us = batch[src].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return batch.append_column("_window", pa.array(floor_bucket_us(ts_us, window_s)))

    return ds.map_batches(add, batch_format="pyarrow")


def rollup(ds, cfg: RollupConfig, from_tier: bool = False):
    """raw rows (from_tier=False) or finer tier rows (from_tier=True) → tier.

    One explicit shuffle: ``groupby([key, _window]).map_groups``.
    """
    fn = rollup_group_cascade if from_tier else rollup_group_raw
    ds = _add_window(ds, cfg.ts_col, cfg.window_s, from_tier)

    def run(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(["_window"]), cfg)

    return ds.groupby([cfg.key, "_window"]).map_groups(run, batch_format="pyarrow")
