"""Grid transforms with reference-parity semantics: bin average, nearest
neighbor, linear interpolation.

These regrid a long-form time-series table onto a regular output grid,
matching the reference's transform_v2 numerics
(/root/reference/tsdat/transform_v2/):

* ``create_bounds`` / ``create_bounds_from_labels`` — utils/create_bounds.py
  (labels = arange(start, stop, interval); bounds = [label-a·w, label-a·w+w);
  input bounds inferred center-aligned from label diffs, first diff prepended)
* ``bin_average_slice``   — bin_average/calculate_bin_average.py:15-111:
  overlap-weighted mean (ratio = overlap/input-width), NaN data → NaN weight,
  Bad-flagged and _FillValue inputs excluded (the converter path runs ACT
  ``clean.cleanup`` first, turning fill values into NaN), weighted std per
  _weighted_std.py, goodfraction = weighted mean of ~bad, QC bits per
  _perform_bin_average_qc_checks.py:30-79.  Vectorized: the reference's
  per-output-bin Python loop is replaced by a (row → overlapping-bin)
  expansion + ``np.add.reduceat`` — identical numbers, no Python loop.
* ``nearest_neighbor_slice`` — nearest_neighbor/calculate_nearest_neighbor.py:
  xarray ``reindex(method="nearest", tolerance)``, ties → the **later** input
  (verified against the reference's 19-point golden).
* ``interpolate_slice``   — interpolate/calculate_linear_interpolation.py:
  per output point choose the 2 closest inputs within the output bound,
  two-point linear inter/extrapolation, QC 128+1 when <2 points in bound,
  +8 when both points lie on the same side (extrapolation).

Distributed wrappers (``bin_average_grid``, ``nearest_neighbor_grid``) run the
slice kernels per (key, window) group with a second tiny combine stage for
bins/grid points whose inputs straddle window boundaries, so the operators
scale without loading a whole series in one task.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..schema import (
    GOODFRAC_BAD_MIN,
    GOODFRAC_IND_MIN,
    QC_ALL_BAD_INPUTS,
    QC_BAD,
    QC_BAD_GOODFRAC,
    QC_EXTRAPOLATE,
    QC_INDETERMINATE,
    QC_INDETERMINATE_GOODFRAC,
    QC_OUTSIDE_RANGE,
    QC_SOME_BAD_INPUTS,
    QC_ZERO_WEIGHT,
)

US = 1_000_000

ALIGNMENT = {"left": 0.0, "right": 1.0, "center": 0.5}


@dataclass(frozen=True)
class GridSpec:
    """Regular output grid in µs since the unix epoch."""

    start_us: int
    stop_us: int
    interval_us: int
    width_us: int | None = None  # default: = interval
    alignment: float | str = "left"

    @property
    def align(self) -> float:
        return ALIGNMENT[self.alignment] if isinstance(self.alignment, str) else self.alignment

    @property
    def width(self) -> int:
        return self.interval_us if self.width_us is None else self.width_us

    @property
    def labels(self) -> np.ndarray:
        labels = np.arange(self.start_us, self.stop_us, self.interval_us, dtype=np.int64)
        # parity create_bounds.py:115-119: ending bound is open
        if len(labels) and labels[-1] >= self.stop_us:
            labels = labels[:-1]
        return labels

    @property
    def n(self) -> int:
        return len(self.labels)

    def bounds(self) -> tuple[np.ndarray, np.ndarray]:
        labels = self.labels
        offset = int(round(self.align * self.width))
        starts = labels - offset
        return starts, starts + self.width


def input_bounds_from_labels(ts_us: np.ndarray, width_us: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Center-aligned input bounds; width = label diffs (first prepended) or a
    fixed nominal width (parity: create_bounds_from_labels, alignment="center")."""
    if width_us is not None:
        w = np.full(len(ts_us), width_us, dtype=np.int64)
    else:
        if len(ts_us) < 2:
            w = np.full(len(ts_us), US, dtype=np.int64)
        else:
            d = np.diff(ts_us)
            w = np.append(d[:1], d)
    starts = ts_us - w // 2
    return starts, starts + w


def _expand_overlaps(
    in_start: np.ndarray, in_end: np.ndarray, grid: GridSpec
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (input bin → overlapping output bin) expansion.

    Returns (row_idx, bin_idx, overlap_ratio) triples with overlap > 0,
    equivalent to the reference's get_bound_overlaps dictionaries."""
    base = grid.labels[0] - int(round(grid.align * grid.width)) if grid.n else 0
    if grid.n == 0 or len(in_start) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0)
    # candidate bins: all j with out_start_j < in_end and out_end_j > in_start
    j_lo = np.floor_divide(in_start - base - grid.width, grid.interval_us) + 1
    j_hi = np.floor_divide(in_end - base, grid.interval_us)  # out_start_j < in_end
    on_edge = (in_end - base) % grid.interval_us == 0
    j_hi = j_hi - on_edge.astype(np.int64)
    j_lo = np.clip(j_lo, 0, grid.n - 1)
    j_hi = np.clip(j_hi, -1, grid.n - 1)
    counts = np.maximum(j_hi - j_lo + 1, 0)
    total = int(counts.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0)
    rows = np.repeat(np.arange(len(in_start), dtype=np.int64), counts)
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    j = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts) + np.repeat(j_lo, counts)
    out_start = base + j * grid.interval_us
    out_end = out_start + grid.width
    ov = np.minimum(in_end[rows], out_end) - np.maximum(in_start[rows], out_start)
    ratio = ov / (in_end[rows] - in_start[rows])
    keep = ov > 0
    return rows[keep], j[keep], ratio[keep]


def bin_average_slice(
    ts_us: np.ndarray,
    values: dict[str, tuple[np.ndarray, np.ndarray]],  # name -> (x, bad|ind masks packed)
    grid: GridSpec,
    input_width_us: int | None = None,
    goodfrac_bad_min: float = GOODFRAC_BAD_MIN,
    goodfrac_ind_min: float = GOODFRAC_IND_MIN,
) -> dict[str, np.ndarray]:
    """Reference-parity bin average of one sorted slice onto a grid.

    ``values[name] = (x, bad_mask, ind_mask)`` where x already has missing →
    NaN (the cleanup step).  Returns a dict with per-variable ``<v>_mean``,
    ``<v>_std``, ``<v>_goodfraction``, ``qc_<v>`` arrays of length grid.n,
    plus ``labels``.
    """
    in_start, in_end = input_bounds_from_labels(ts_us, input_width_us)
    rows, j, ratio = _expand_overlaps(in_start, in_end, grid)
    order = np.argsort(j, kind="stable")
    rows, j, ratio = rows[order], j[order], ratio[order]
    starts = np.flatnonzero(np.r_[True, j[1:] != j[:-1]]) if len(j) else np.zeros(0, int)
    seg_bins = j[starts] if len(j) else np.zeros(0, int)

    n_out = grid.n
    out: dict[str, np.ndarray] = {"labels": grid.labels}

    def seg_to_full(seg_vals: np.ndarray, fill=np.nan) -> np.ndarray:
        full = np.full(n_out, fill, dtype=seg_vals.dtype if seg_vals.dtype.kind == "f" else object)
        if seg_vals.dtype.kind != "f":
            full = np.full(n_out, fill, dtype=seg_vals.dtype)
        full[seg_bins] = seg_vals
        return full

    for name, (x, bad, ind) in values.items():
        data = np.where(bad, np.nan, x)  # cleanup + rm Bad
        d = data[rows]
        w = np.where(np.isnan(d), np.nan, ratio)
        raw_w = ratio

        def nseg(arr):
            return np.add.reduceat(np.where(np.isnan(arr), 0.0, arr), starts) if len(starts) else np.zeros(0)

        sum_w = nseg(w)
        sum_wx = nseg(w * d)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg_seg = np.where(sum_w == 0, np.nan, sum_wx / sum_w)
        # weighted std, reference formulation (_weighted_std.py)
        mu_rep = np.repeat(avg_seg, np.diff(np.r_[starts, len(j)])) if len(starts) else np.zeros(0)
        sq = w * (d - mu_rep) ** 2
        with np.errstate(invalid="ignore", divide="ignore"):
            std_seg = np.where(sum_w == 0, np.nan, np.sqrt(nseg(sq) / sum_w))
        # goodfraction = weighted mean of ~bad with NaN-data weights
        gf_num = nseg(w * (~bad[rows]).astype(float))
        with np.errstate(invalid="ignore", divide="ignore"):
            gf_seg = np.where(sum_w == 0, np.nan, gf_num / sum_w)

        # QC bits (counters per _perform_bin_average_qc_checks.py)
        cnts = np.diff(np.r_[starts, len(j)]) if len(starts) else np.zeros(0, int)
        n_bad = nseg(bad[rows].astype(float))
        n_ind = nseg(ind[rows].astype(float))
        sum_raw_w = nseg(raw_w)
        with np.errstate(invalid="ignore", divide="ignore"):
            bad_frac = np.where(cnts > 0, n_bad / cnts, 0.0)
        qc_seg = np.zeros(len(seg_bins), dtype=np.int64)
        qc_seg |= QC_INDETERMINATE * (n_ind > 0)
        qc_seg |= QC_SOME_BAD_INPUTS * ((bad_frac > 0) & (bad_frac < 1))
        qc_seg |= QC_ZERO_WEIGHT * (sum_raw_w == 0)
        qc_seg |= (QC_ALL_BAD_INPUTS | QC_BAD) * np.isclose(bad_frac, 1.0)
        gfv = np.where(np.isnan(gf_seg), 0.0, gf_seg)
        qc_seg |= QC_BAD_GOODFRAC * (gfv < goodfrac_bad_min)
        qc_seg |= QC_INDETERMINATE_GOODFRAC * (gfv < goodfrac_ind_min)

        out[f"{name}_mean"] = seg_to_full(avg_seg)
        out[f"{name}_std"] = seg_to_full(std_seg)
        out[f"{name}_goodfraction"] = seg_to_full(gf_seg)
        qc_full = np.full(n_out, QC_OUTSIDE_RANGE | QC_BAD, dtype=np.int32)
        qc_full[seg_bins] = qc_seg.astype(np.int32)
        out[f"qc_{name}"] = qc_full
    return out


def nearest_neighbor_slice(
    ts_us: np.ndarray,
    grid_us: np.ndarray,
    tolerance_us: int | None,
) -> np.ndarray:
    """Index of the nearest input point per grid point (−1 beyond tolerance);
    equidistant ties resolve to the **later** input point."""
    n = len(ts_us)
    if n == 0:
        return np.full(len(grid_us), -1, dtype=np.int64)
    pos = np.searchsorted(ts_us, grid_us)
    left = np.clip(pos - 1, 0, n - 1)
    right = np.clip(pos, 0, n - 1)
    d_left = np.abs(grid_us - ts_us[left])
    d_right = np.abs(ts_us[right] - grid_us)
    pick_right = d_right <= d_left  # tie -> later
    idx = np.where(pick_right, right, left)
    dist = np.where(pick_right, d_right, d_left)
    if tolerance_us is not None:
        idx = np.where(dist <= tolerance_us, idx, -1)
    return idx


def interpolate_slice(
    ts_us: np.ndarray,
    values: dict[str, np.ndarray],
    grid: GridSpec,
) -> dict[str, np.ndarray]:
    """Reference-parity linear interpolation onto a grid: per output point the
    2 closest inputs within the output bound; 128+1 when <2, +8 when both on
    one side (calculate_linear_interpolation.py:104-172, vectorized)."""
    in_start, in_end = input_bounds_from_labels(ts_us)
    mid = (in_start + in_end) / 2.0
    o_start, o_end = grid.bounds()
    o_mid = (o_start + o_end) / 2.0
    n_out = grid.n

    # for each output bin: inputs whose bounds overlap it; the 2 closest by
    # |midpoint distance|.  With sorted midpoints the 2 closest are adjacent
    # in ts order around the output midpoint, restricted to the overlap set.
    lo = np.searchsorted(in_end, o_start, side="right")
    hi = np.searchsorted(in_start, o_end, side="left")  # inputs lo..hi-1 overlap
    count = hi - lo
    enough = count >= 2

    pos = np.clip(np.searchsorted(mid, o_mid), lo, np.maximum(hi, lo))
    i1 = np.clip(pos - 1, lo, np.maximum(hi - 1, lo))
    i2 = np.clip(pos, lo, np.maximum(hi - 1, lo))
    same = i1 == i2
    i1 = np.where(same & (i1 > lo), i1 - 1, i1)
    i2 = np.where(i1 == i2, np.minimum(i2 + 1, np.maximum(hi - 1, 0)), i2)
    # tie/ordering fix: among candidates pick the two with smallest |mid - o_mid|
    # (adjacent window of 2 around pos is sufficient for sorted mids)
    i1c = np.clip(i1, 0, len(ts_us) - 1) if len(ts_us) else i1
    i2c = np.clip(i2, 0, len(ts_us) - 1) if len(ts_us) else i2

    d1 = mid[i1c] - o_mid
    d2 = mid[i2c] - o_mid
    extrap = ((d1 < 0) & (d2 < 0)) | ((d1 > 0) & (d2 > 0))

    out: dict[str, np.ndarray] = {"labels": grid.labels}
    qc = np.where(enough, np.where(extrap, QC_EXTRAPOLATE, 0), QC_OUTSIDE_RANGE | QC_BAD)
    for name, x in values.items():
        x1, x2 = x[i1c], x[i2c]
        t1, t2 = mid[i1c], mid[i2c]
        with np.errstate(invalid="ignore", divide="ignore"):
            m = (x2 - x1) / (t2 - t1)
            tx = o_mid
            y = np.where(
                tx <= t2, x1 + m * (tx - t1), x2 + m * (tx - t2)
            )  # parity _interpolate_single_point.py
        out[name] = np.where(enough, y, np.nan)
        out[f"qc_{name}"] = qc.astype(np.int32)
    return out


# --------------------------------------------------------------------------- #
# distributed wrappers
# --------------------------------------------------------------------------- #


def _ts_np(col) -> np.ndarray:
    return col.combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)


def bin_average_grid(
    ds,
    grid: GridSpec,
    key: str = "source",
    ts_col: str = "ts",
    values: tuple[str, ...] = ("n_tok", "tok_mean"),
    bad_bits: int = 3,
    ind_bits: int = 0,
    input_width_us: int | None = None,
    window_s: int = 86400,
    key_domain: tuple | list | None = None,
):
    """Distributed reference-parity bin average.

    map_batches expands each input row into its (bin, weight) contributions
    (at most a few per row), then ONE groupby((key, bin-window)) shuffle with
    in-group deterministic summation finalizes every bin.  Bins with no
    contributions are completed from a skeleton so the output covers the full
    grid per key (QC_OUTSIDE_RANGE|QC_BAD, parity with empty_dataset_like +
    qc table).

    ``key_domain``: the declared set of keys the grid covers.  When omitted
    it is derived with a ``unique(key)`` pass over ``ds`` — an extra full
    scan; at scale pass the domain (retrieval configs declare their sources,
    matching the reference's dataset-config coords).
    """
    import ray
    import ray.data as rd

    labels = grid.labels
    window_us = window_s * US

    def expand(batch: pa.Table) -> pa.Table:
        ts_us = _ts_np(batch[ts_col])
        in_start, in_end = input_bounds_from_labels(ts_us, input_width_us)
        rows, j, ratio = _expand_overlaps(in_start, in_end, grid)
        cols = {
            key: batch[key].take(pa.array(rows)),
            "_bin": pa.array(j),
            "_w": pa.array(ratio),
            "_ts": pa.array(ts_us[rows]),
            "_window": pa.array((labels[j] // window_us) * window_us),
        }
        for v in values:
            x = batch[v].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
            qc = (
                batch[f"qc_{v}"].combine_chunks().to_numpy(zero_copy_only=False)
                if f"qc_{v}" in batch.column_names
                else np.zeros(len(x), dtype=np.int32)
            )
            bad = ((qc & bad_bits) != 0) | np.isnan(x)
            ind = ((qc & ind_bits) != 0) & ~bad if ind_bits else np.zeros(len(x), bool)
            cols[f"_x_{v}"] = pa.array(x[rows])
            cols[f"_bad_{v}"] = pa.array(bad[rows])
            cols[f"_ind_{v}"] = pa.array(ind[rows])
        return pa.table(cols)

    # skeleton: one zero-weight marker row per (key, bin) so empty bins appear
    keys = sorted(key_domain) if key_domain is not None else sorted(
        ds.select_columns([key]).unique(key)
    )

    def skeleton(batch: pa.Table) -> pa.Table:
        out = []
        for k in batch["k"].to_pylist():
            t = {
                key: pa.array(np.repeat(k, len(labels))),
                "_bin": pa.array(np.arange(len(labels), dtype=np.int64)),
                "_w": pa.array(np.zeros(len(labels))),
                "_ts": pa.array(labels),
                "_window": pa.array((labels // window_us) * window_us),
            }
            for v in values:
                t[f"_x_{v}"] = pa.array(np.full(len(labels), np.nan))
                t[f"_bad_{v}"] = pa.array(np.zeros(len(labels), bool))
                t[f"_ind_{v}"] = pa.array(np.zeros(len(labels), bool))
            out.append(pa.table(t))
        return pa.concat_tables(out)

    marker = rd.from_items([{"k": k} for k in keys]).map_batches(
        skeleton, batch_format="pyarrow", batch_size=1
    )
    contrib = ds.map_batches(expand, batch_format="pyarrow").union(marker)

    def finalize(g: pa.Table) -> pa.Table:
        j = g["_bin"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        w = g["_w"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, j))
        j, ts, w = j[order], ts[order], w[order]
        real = w > 0
        starts = np.flatnonzero(np.r_[True, j[1:] != j[:-1]])
        seg_bins = j[starts]
        cnt_all = np.diff(np.r_[starts, len(j)])

        out = {
            key: pa.array(np.repeat(g[key][0].as_py(), len(starts))),
            "bucket": pa.array(labels[seg_bins]).cast(pa.timestamp("us")),
        }
        for v in values:
            x = g[f"_x_{v}"].combine_chunks().to_numpy(zero_copy_only=False)[order]
            bad = g[f"_bad_{v}"].combine_chunks().to_numpy(zero_copy_only=False)[order]
            ind = g[f"_ind_{v}"].combine_chunks().to_numpy(zero_copy_only=False)[order]
            data = np.where(bad, np.nan, x)
            wn = np.where(np.isnan(data) | ~real, np.nan, w)

            def nseg(arr):
                return np.add.reduceat(np.where(np.isnan(arr), 0.0, arr), starts)

            sum_w = nseg(wn)
            sum_wx = nseg(wn * data)
            with np.errstate(invalid="ignore", divide="ignore"):
                avg = np.where(sum_w == 0, np.nan, sum_wx / sum_w)
            mu_rep = np.repeat(avg, cnt_all)
            with np.errstate(invalid="ignore", divide="ignore"):
                std = np.where(sum_w == 0, np.nan, np.sqrt(nseg(wn * (data - mu_rep) ** 2) / sum_w))
                gf = np.where(sum_w == 0, np.nan, nseg(wn * (~bad).astype(float)) / sum_w)
            n_real = nseg(real.astype(float))
            n_bad = nseg((bad & real).astype(float))
            n_ind = nseg((ind & real).astype(float))
            sum_raw_w = nseg(np.where(real, w, 0.0))
            with np.errstate(invalid="ignore", divide="ignore"):
                bad_frac = np.where(n_real > 0, n_bad / n_real, 0.0)
            qc = np.zeros(len(starts), dtype=np.int64)
            qc |= QC_INDETERMINATE * (n_ind > 0)
            qc |= QC_SOME_BAD_INPUTS * ((bad_frac > 0) & (bad_frac < 1))
            qc |= QC_ZERO_WEIGHT * ((sum_raw_w == 0) & (n_real > 0))
            qc |= (QC_ALL_BAD_INPUTS | QC_BAD) * (np.isclose(bad_frac, 1.0) & (n_real > 0))
            gfv = np.where(np.isnan(gf), 0.0, gf)
            qc |= QC_BAD_GOODFRAC * ((gfv < GOODFRAC_BAD_MIN) & (n_real > 0))
            qc |= QC_INDETERMINATE_GOODFRAC * ((gfv < GOODFRAC_IND_MIN) & (n_real > 0))
            # bins with no real inputs: exactly OUTSIDE_RANGE|BAD (parity:
            # _perform_bin_average_qc_checks.py:48-50 early return)
            qc = np.where(n_real == 0, QC_OUTSIDE_RANGE | QC_BAD, qc)
            out[f"{v}_mean"] = pa.array(avg, from_pandas=True)
            out[f"{v}_std"] = pa.array(std, from_pandas=True)
            out[f"{v}_goodfraction"] = pa.array(gf, from_pandas=True)
            out[f"qc_{v}"] = pa.array(qc.astype(np.int32))
        return pa.table(out)

    return contrib.groupby([key, "_window"]).map_groups(finalize, batch_format="pyarrow")


def nearest_neighbor_grid(
    ds,
    grid_interval_s: int,
    tolerance_s: int | None,
    key: str = "source",
    ts_col: str = "ts",
    carry: tuple[str, ...] = ("doc_id", "tokens"),
    grid_start_us: int | None = None,
    grid_stop_us: int | None = None,
):
    """Distributed NN subsample onto a regular grid.

    Stage 1 (per batch, sorted within): each batch emits its best candidate
    (distance, payload) per covered grid point; stage 2 groups by
    (key, grid point) and keeps the global minimum distance (tie → later ts).
    Output contains one row per grid point that has a winner within tolerance.
    """
    iv = grid_interval_s * US
    tol = None if tolerance_s is None else tolerance_s * US

    def candidates(batch: pa.Table) -> pa.Table:
        ts = _ts_np(batch[ts_col])
        keys_np = batch[key].to_numpy(zero_copy_only=False)
        all_rows, all_grid, all_dist = [], [], []
        for k in np.unique(keys_np):
            sel = np.flatnonzero(keys_np == k)
            order = sel[np.argsort(ts[sel], kind="stable")]
            ts_s = ts[order]
            lo = ts_s[0] if grid_start_us is None else max(ts_s[0], grid_start_us)
            hi = ts_s[-1] if grid_stop_us is None else min(ts_s[-1], grid_stop_us)
            reach = tol if tol is not None else iv
            g0 = -(-(lo - reach) // iv) * iv  # ceil to grid
            grid_pts = np.arange(g0, hi + reach + 1, iv, dtype=np.int64)
            if grid_start_us is not None:
                grid_pts = grid_pts[grid_pts >= grid_start_us]
            if grid_stop_us is not None:
                grid_pts = grid_pts[grid_pts < grid_stop_us]
            idx = nearest_neighbor_slice(ts_s, grid_pts, tol)
            ok = idx >= 0
            grid_pts, idx = grid_pts[ok], idx[ok]
            all_rows.append(order[idx])
            all_grid.append(grid_pts)
            all_dist.append(np.abs(ts_s[idx] - grid_pts))
        rows = np.concatenate(all_rows) if all_rows else np.zeros(0, np.int64)
        grid_pts = np.concatenate(all_grid) if all_grid else np.zeros(0, np.int64)
        dist = np.concatenate(all_dist) if all_dist else np.zeros(0, np.int64)
        out = {
            key: batch[key].take(pa.array(rows)),
            "grid_ts": pa.array(grid_pts).cast(pa.timestamp("us")),
            "_dist": pa.array(dist),
            "_ts": pa.array(ts[rows]),
        }
        for c in carry:
            out[c] = batch[c].take(pa.array(rows))
        return pa.table(out)

    def combine(g: pa.Table) -> pa.Table:
        d = g["_dist"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        best = np.lexsort((-ts, d))[0]  # min dist, tie -> later ts
        t = g.slice(best, 1)
        return t.drop_columns(["_dist", "_ts"])

    cand = ds.map_batches(candidates, batch_format="pyarrow")
    return cand.groupby([key, "grid_ts"]).map_groups(combine, batch_format="pyarrow")


def auto_slice(
    ts_us: np.ndarray,
    values: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    grid: GridSpec,
    input_width_us: int | None = None,
) -> tuple[str, dict[str, np.ndarray]]:
    """TRANS_AUTO (parity: /root/reference/tsdat/transform/adi/
    adi_transformer.py:121-133): bin-average when the region has more inputs
    than outputs, else interpolate.  Region = this slice.  Returns
    (chosen_mode, result)."""
    if len(ts_us) > grid.n:
        return "bin_average", bin_average_slice(ts_us, values, grid, input_width_us)
    interp_vals = {v: x for v, (x, _b, _i) in values.items()}
    res = interpolate_slice(ts_us, interp_vals, grid)
    for v in interp_vals:  # align output naming with the bin-average branch
        res[f"{v}_mean"] = res.pop(v)
    return "interpolate", res


def auto_grid(
    ds,
    grid: GridSpec,
    key: str = "source",
    ts_col: str = "ts",
    values: tuple[str, ...] = ("n_tok",),
    bad_bits: int = 3,
    window_s: int = 86400,
    mode: str = "auto",
):
    """Distributed grid transform. ``mode``:

    * ``auto`` — TRANS_AUTO: per (key, window) region, bin-average when
      #inputs > #outputs in the region, else linear interpolation
      (adi_transformer.py:121-133)
    * ``bin_average`` / ``interpolate`` — force one branch everywhere
      (TRANS_BIN_AVERAGE / TRANS_INTERPOLATE)
    One groupby shuffle either way."""
    window_us = window_s * US

    def add_window(b: pa.Table) -> pa.Table:
        ts = _ts_np(b[ts_col])
        return b.append_column("_window", pa.array((ts // window_us) * window_us))

    def run_region(g: pa.Table) -> pa.Table:
        win = int(g["_window"][0].as_py())
        sub = GridSpec(
            start_us=max(grid.start_us, win),
            stop_us=min(grid.stop_us, win + window_us),
            interval_us=grid.interval_us,
            width_us=grid.width_us,
            alignment=grid.alignment,
        )
        if sub.n == 0 or g.num_rows == 0:
            empty: dict = {key: pa.array([], pa.string()),
                           "grid_ts": pa.array([], pa.timestamp("us")),
                           "mode": pa.array([], pa.string())}
            for v in values:
                empty[f"{v}_mean"] = pa.array([], pa.float64())
                empty[f"qc_{v}"] = pa.array([], pa.int32())
            return pa.table(empty)
        ts = _ts_np(g[ts_col])
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        vals = {}
        for v in values:
            x = g[v].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)[order]
            qc = (
                g[f"qc_{v}"].combine_chunks().to_numpy(zero_copy_only=False)[order]
                if f"qc_{v}" in g.column_names
                else np.zeros(len(x), np.int32)
            )
            bad = ((qc & bad_bits) != 0) | np.isnan(x)
            vals[v] = (np.where(bad, np.nan, x), bad, np.zeros(len(x), bool))
        if mode == "auto":
            chosen, res = auto_slice(ts, vals, sub, input_width_us=None)
        elif mode == "bin_average":
            chosen, res = "bin_average", bin_average_slice(ts, vals, sub, None)
        else:
            res = interpolate_slice(ts, {v: x for v, (x, _b, _i) in vals.items()}, sub)
            for v in values:
                res[f"{v}_mean"] = res.pop(v)
            chosen = "interpolate"
        out: dict = {
            key: pa.array(np.repeat(g[key][0].as_py(), sub.n)),
            "grid_ts": pa.array(sub.labels).cast(pa.timestamp("us")),
            "mode": pa.array(np.repeat(chosen, sub.n)),
        }
        for v in values:
            out[f"{v}_mean"] = pa.array(res[f"{v}_mean"])
            out[f"qc_{v}"] = pa.array(res[f"qc_{v}"].astype(np.int32))
        return pa.table(out)

    dsw = ds.map_batches(add_window, batch_format="pyarrow")
    return dsw.groupby([key, "_window"]).map_groups(run_region, batch_format="pyarrow")


def lttb_indices(ts: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Largest-Triangle-Three-Buckets point selection (Steinarsson 2013) over
    one ALREADY-SORTED series; returns the sorted indices of the kept points.
    First and last points are always kept; each of the ``n_out - 2`` middle
    buckets keeps the point maximizing the triangle area with the previously
    selected point and the next bucket's centroid.  The loop is over OUTPUT
    points (n_out iterations of vectorized slice math), not input rows."""
    n = len(ts)
    if n <= n_out or n_out < 3:
        return np.arange(n)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    keep = np.empty(n_out, dtype=np.int64)
    keep[0], keep[-1] = 0, n - 1
    a = 0
    tsf = ts.astype(np.float64)
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges) else n)
        cx, cy = tsf[nlo:nhi].mean(), v[nlo:nhi].mean()
        ax, ay = tsf[a], v[a]
        # 2x triangle area of (a, candidate, next-bucket centroid)
        area = np.abs((ax - cx) * (v[lo:hi] - ay) - (ax - tsf[lo:hi]) * (cy - ay))
        a = lo + int(np.argmax(area))  # argmax: first max -> deterministic
        keep[i + 1] = a
    return np.unique(keep)


def lttb_indices_exact(ts: np.ndarray, v_int: np.ndarray,
                       n_out: int) -> np.ndarray:
    """Integer-EXACT LTTB over one already-sorted series (r5): ``ts`` int64
    µs rebased to the series start, ``v_int`` a quantized int64 column.
    The triangle-area argmax multiplies through by the next-bucket count m
    (a positive constant per bucket — argmax-preserving) so the comparison
    ``|(a_x·m − Σt)·(v_p − a_y) − (a_x − t_p)·(Σv − a_y·m)|`` is exact
    integer arithmetic (python ints, no overflow, no float round-off) —
    which makes the selection bit-reproducible and expressible as a
    HUGEINT recursive-CTE SQL twin.  Bucket edges use the explicit form
    ``trunc(i·step + 1.0)`` with ``step = (n−2)/(n_out−2)`` (same grid as
    ``np.linspace`` up to its internal division order — chosen so SQL can
    replay the float edge math operation-for-operation); first/last kept,
    first-max tie-break."""
    n = len(ts)
    if n <= n_out or n_out < 3:
        return np.arange(n)
    step = (n - 2.0) / (n_out - 2.0)
    edges = (np.arange(n_out - 1, dtype=np.float64) * step + 1.0).astype(np.int64)
    edges[-1] = n - 1
    t0 = int(ts[0])
    tr = [int(x) - t0 for x in ts]
    vv = [int(x) for x in v_int]
    keep = np.empty(n_out, dtype=np.int64)
    keep[0], keep[-1] = 0, n - 1
    a = 0
    for i in range(n_out - 2):
        lo, hi = int(edges[i]), int(edges[i + 1])
        nlo = int(edges[i + 1])
        nhi = int(edges[i + 2]) if i + 2 < len(edges) else n
        m = nhi - nlo
        sum_t = sum(tr[nlo:nhi])
        sum_v = sum(vv[nlo:nhi])
        ax, ay = tr[a], vv[a]
        t1 = ax * m - sum_t
        t2 = sum_v - ay * m
        best, bestpos = -1, lo
        for p in range(lo, hi):
            area = abs(t1 * (vv[p] - ay) - (ax - tr[p]) * t2)
            if area > best:
                best, bestpos = area, p
        a = bestpos
        keep[i + 1] = a
    return np.unique(keep)


def lttb_downsample(ds, key: str, ts_col: str, value_col: str,
                    n_out: int = 100, window_s: int = 86400,
                    value_scale: int | None = None,
                    id_col: str | None = None):
    """Distributed LTTB visual downsample: per (key, time-window) groups each
    keep ``n_out`` LTTB-selected rows.  Windowing makes it scale-safe (no
    whole-key history in one task) at the cost of the standard streaming
    approximation: selection is exact WITHIN each window, and window edges
    always emit their boundary points (LTTB keeps first/last), so the joined
    polyline is continuous across windows.  Deterministic: groups sort by
    (ts, value) and argmax takes the first maximum.

    ``value_scale`` (r5): quantize values to ``round(v·scale)`` int64 and
    select with :func:`lttb_indices_exact` — exact integer areas, so the
    selection is bit-reproducible and SQL-oracle-able; ``id_col`` extends
    the sort to (ts, value, id), a TOTAL order that removes the remaining
    block-layout dependence when two rows tie on (ts, value)."""
    from .text_quant import half_away

    US_ = 1_000_000
    win_us = window_s * US_

    def add_window(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("_window", pa.array((ts // win_us) * win_us))

    def per_window(g: pa.Table) -> pa.Table:
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = g[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        if id_col is not None:
            ids = g[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, v, ts))
        else:
            order = np.lexsort((v, ts))
        if value_scale:
            vi = half_away(v[order] * value_scale)
            sel = lttb_indices_exact(ts[order], vi, n_out)
        else:
            sel = lttb_indices(ts[order], v[order], n_out)
        take = pa.array(np.sort(order[sel]), type=pa.int64())
        return g.drop_columns(["_window"]).take(take)

    return (ds.map_batches(add_window, batch_format="pyarrow")
            .groupby([key, "_window"]).map_groups(per_window, batch_format="pyarrow"))
