"""Gap-fill over tier bucket grids: forward-fill and linear interpolation.

Semantics model the reference's gap-filling transforms (linear interpolation
per /root/reference/tsdat/transform_v2/interpolate/calculate_linear_interpolation.py
and the CubicSplineInterp handler's max_gap notion,
/root/reference/tsdat/qc/handlers/cubic_spline_interp.py:9-53), recast for
tier tables: the expected grid is every ``interval`` bucket between the
series' first and last present bucket; missing buckets are filled by

* ``ffill``  — the most recent present bucket's value, if the gap distance is
  <= ``max_gap`` buckets,
* ``linear`` — interpolation between the bracketing present buckets, if the
  *total* gap run length is <= ``max_gap``.

Filled rows get ``filled=True`` and transform-QC ``QC_INTERPOLATE`` (bit 4),
zero counters, and (for ffill) the source row's subsample payload.

Distribution: one groupby((key, window)) pass computes per-window summaries
(first/last present bucket + boundary values — a tiny table), the driver
derives cross-window carry-in/out from it (broadcast via ``ray.put``), and a
second groupby pass fills each window exactly, including gaps that span
window boundaries.  Group size stays bounded by ``window_s`` (skew-safe).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..schema import QC_INTERPOLATE
from .rollup import floor_bucket_us

US = 1_000_000


@dataclass(frozen=True)
class GapFillConfig:
    interval_s: int
    values: tuple[str, ...] = ("value",)
    key: str = "source"
    method: str = "ffill"  # "ffill" | "linear" | "spline"
    max_gap: int = 5  # max gap distance in buckets
    window_s: int = 86400
    value_suffix: str = "_mean"  # tier column holding the bucket value


def natural_cubic_interp(xs: np.ndarray, ys: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Natural cubic spline through (xs, ys) evaluated at xq — pure numpy
    (tridiagonal Thomas solve; no scipy in this environment).  Gap-fill
    parity with the reference's CubicSplineInterp handler
    (/root/reference/tsdat/qc/handlers/cubic_spline_interp.py:9-53, which
    delegates to mhkit clean_fill).  Falls back to linear below 3 points."""
    xs = xs.astype(np.float64)
    ys = ys.astype(np.float64)
    n = len(xs)
    if n < 3:
        return np.interp(xq.astype(np.float64), xs, ys)
    h = np.diff(xs)
    rhs = 6.0 * ((ys[2:] - ys[1:-1]) / h[1:] - (ys[1:-1] - ys[:-2]) / h[:-1])
    diag = 2.0 * (h[:-1] + h[1:])
    sub, sup = h[:-1].copy(), h[1:].copy()
    m = n - 2  # unknown second derivatives (natural ends = 0)
    cp = np.zeros(m)
    dp = np.zeros(m)
    cp[0] = sup[0] / diag[0]
    dp[0] = rhs[0] / diag[0]
    for i in range(1, m):
        denom = diag[i] - sub[i] * cp[i - 1]
        cp[i] = sup[i] / denom
        dp[i] = (rhs[i] - sub[i] * dp[i - 1]) / denom
    M = np.zeros(n)
    M[m] = dp[m - 1]
    for i in range(m - 2, -1, -1):
        M[i + 1] = dp[i] - cp[i] * M[i + 2]
    idx = np.clip(np.searchsorted(xs, xq, side="right") - 1, 0, n - 2)
    t = xq.astype(np.float64) - xs[idx]
    hs = h[idx]
    return (
        ys[idx]
        + t * ((ys[idx + 1] - ys[idx]) / hs - hs * (2 * M[idx] + M[idx + 1]) / 6.0)
        + t * t * M[idx] / 2.0
        + t * t * t * (M[idx + 1] - M[idx]) / (6.0 * hs)
    )


def _summaries(ds, cfg: GapFillConfig):
    """Tiny per-(key, window) table: first/last present bucket + values."""

    def summarize(g: pa.Table) -> pa.Table:
        b = g["bucket"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(np.argmin(b)), int(np.argmax(b))
        out = {
            cfg.key: g[cfg.key].slice(0, 1),
            "_window": g["_window"].slice(0, 1),
            "first_bucket": pa.array([b[lo]]),
            "last_bucket": pa.array([b[hi]]),
        }
        for v in cfg.values:
            x = g[f"{v}{cfg.value_suffix}"].combine_chunks().to_numpy(zero_copy_only=False)
            out[f"first_{v}"] = pa.array([float(x[lo])])
            out[f"last_{v}"] = pa.array([float(x[hi])])
        return pa.table(out)

    return ds.groupby([cfg.key, "_window"]).map_groups(summarize, batch_format="pyarrow")


def gapfill_tier(ds, cfg: GapFillConfig):
    """Fill missing buckets of a tier Dataset. Returns the tier rows plus
    filled rows (``filled`` column marks them)."""
    import ray

    window_us = cfg.window_s * US
    iv = cfg.interval_s * US
    assert cfg.window_s % cfg.interval_s == 0
    # a gap spanning a fully-empty window can only be filled if max_gap fits
    # inside one window (empty windows produce no group to fill)
    assert cfg.max_gap <= cfg.window_s // cfg.interval_s, (
        "max_gap must be <= buckets per window"
    )

    def add_window(b: pa.Table) -> pa.Table:
        bus = b["bucket"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("_window", pa.array(floor_bucket_us(bus, cfg.window_s)))

    dsw = ds.map_batches(add_window, batch_format="pyarrow")

    # ---- pass 1: summaries folded DISTRIBUTED (:mod:`.carry`): each
    # window's carry = the previous window's (last bucket, last values) and
    # the next window's (first bucket, first values) — segment shifts over
    # the salted-key shuffle; attached budget-gated (no driver dict)
    from .carry import (attach_carry, fold_carry, shift_back_within_segments,
                        shift_within_segments)

    summary_cols = (["first_bucket", "last_bucket"]
                    + [f"first_{v}" for v in cfg.values]
                    + [f"last_{v}" for v in cfg.values])

    def fold(starts, windows, cols):
        out = {
            "_prev_b": shift_within_segments(
                cols["last_bucket"].astype(np.int64), starts, np.int64(-1)),
            "_next_b": shift_back_within_segments(
                cols["first_bucket"].astype(np.int64), starts, np.int64(-1)),
        }
        for v in cfg.values:
            out[f"_prev_{v}"] = shift_within_segments(
                cols[f"last_{v}"].astype(np.float64), starts, np.nan)
            out[f"_next_{v}"] = shift_back_within_segments(
                cols[f"first_{v}"].astype(np.float64), starts, np.nan)
        return out

    carry_ds = fold_carry(_summaries(dsw, cfg), cfg.key, "_window",
                          summary_cols, fold)
    dsw = attach_carry(dsw, carry_ds, cfg.key, "_window")
    carry_cols = (["_prev_b", "_next_b"]
                  + [f"_prev_{v}" for v in cfg.values]
                  + [f"_next_{v}" for v in cfg.values])

    schema_names = ds.schema().names

    def fill(g: pa.Table) -> pa.Table:
        key_val = g[cfg.key][0].as_py()
        window = int(g["_window"][0].as_py())
        prev_b = int(g["_prev_b"][0].as_py())
        next_b = int(g["_next_b"][0].as_py())
        info = {
            "prev": None if prev_b < 0 else
            (prev_b, {v: float(g[f"_prev_{v}"][0].as_py())
                      for v in cfg.values}),
            "next": None if next_b < 0 else
            (next_b, {v: float(g[f"_next_{v}"][0].as_py())
                      for v in cfg.values}),
        }
        g = g.drop_columns(["_window", *carry_cols])

        b = g["bucket"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        b = b[order]
        g = g.take(pa.array(order, type=pa.int64()))

        # grid range: from window start if a previous window exists (the gap
        # continues across the boundary), else from the first present bucket
        lo = window if info["prev"] is not None else b[0]
        hi = window + window_us - iv if info["next"] is not None else b[-1]
        grid = np.arange(lo, hi + 1, iv, dtype=np.int64)
        present = np.isin(grid, b)
        missing = grid[~present]

        # bracketing present points (including cross-window carry)
        all_b = b
        all_vals = {v: g[f"{v}{cfg.value_suffix}"].combine_chunks().to_numpy(zero_copy_only=False).astype(float) for v in cfg.values}
        if info["prev"] is not None:
            pb, pv = info["prev"]
            all_b = np.r_[pb, all_b]
            for v in cfg.values:
                all_vals[v] = np.r_[pv[v], all_vals[v]]
        if info["next"] is not None:
            nb, nv = info["next"]
            all_b = np.r_[all_b, nb]
            for v in cfg.values:
                all_vals[v] = np.r_[all_vals[v], nv[v]]

        pos = np.searchsorted(all_b, missing)  # next present >= missing
        prev_i = pos - 1
        next_i = pos
        prev_ok = prev_i >= 0
        next_ok = next_i < len(all_b)
        prev_b = np.where(prev_ok, all_b[np.clip(prev_i, 0, None)], 0)
        gap_back = (missing - prev_b) // iv  # buckets since last present

        if cfg.method == "ffill":
            ok = prev_ok & (gap_back <= cfg.max_gap)
        else:  # linear/spline: total run length must fit in max_gap
            next_b = np.where(next_ok, all_b[np.clip(next_i, 0, len(all_b) - 1)], 0)
            run = np.where(next_ok & prev_ok, (next_b - prev_b) // iv - 1, np.iinfo(np.int64).max)
            ok = prev_ok & next_ok & (run <= cfg.max_gap)

        fill_b = missing[ok]
        m = len(fill_b)
        out_rows: dict = {}
        if m:
            pi = np.clip(prev_i[ok], 0, None)
            ni = np.clip(next_i[ok], 0, len(all_b) - 1)
            for v in cfg.values:
                if cfg.method == "ffill":
                    filled_val = all_vals[v][pi]
                elif cfg.method == "spline":
                    good = ~np.isnan(all_vals[v])
                    filled_val = natural_cubic_interp(
                        all_b[good], all_vals[v][good], fill_b
                    )
                else:
                    # interpolate in BUCKET-INDEX units (exact small ints;
                    # buckets are iv-aligned) with the same operation order
                    # as the SQL twin — pv + ((nv-pv)*dd1)/dd2 — so filled
                    # values are bitwise equal to DuckDB's
                    dt = ((fill_b - all_b[pi]) // iv).astype(np.float64)
                    dT = ((all_b[ni] - all_b[pi]) // iv).astype(np.float64)
                    y0, y1 = all_vals[v][pi], all_vals[v][ni]
                    filled_val = y0 + (y1 - y0) * dt / dT
                out_rows[f"{v}{cfg.value_suffix}"] = filled_val

        # assemble: original rows + filled rows, aligned on the full schema
        cols: dict = {}
        for name in schema_names:
            orig = g[name]
            if name == "bucket":
                add = pa.array(fill_b, type=pa.int64()).cast(pa.timestamp("us"))
            elif name == cfg.key:
                add = pa.array(np.repeat(key_val, m))
            elif name in out_rows:
                add = pa.array(out_rows[name])
            elif name.startswith("qc_") and name[3:].rstrip("_") and any(
                name == f"qc_{v}" for v in cfg.values
            ):
                add = pa.array(np.full(m, QC_INTERPOLATE, dtype=np.int32))
            elif pa.types.is_floating(orig.type):
                add = pa.nulls(m, type=orig.type)
            elif pa.types.is_integer(orig.type):
                add = pa.array(np.zeros(m, dtype="int64")).cast(orig.type)
            else:
                add = pa.nulls(m, type=orig.type)
            cols[name] = pa.concat_arrays([orig.combine_chunks(), add.combine_chunks() if isinstance(add, pa.ChunkedArray) else add])
        filled_flag = np.r_[np.zeros(g.num_rows, bool), np.ones(m, bool)]
        cols["filled"] = pa.array(filled_flag)
        return pa.table(cols)

    return dsw.groupby([cfg.key, "_window"]).map_groups(fill, batch_format="pyarrow")
