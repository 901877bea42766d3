"""2-D (time × second-coordinate) variable support.

The reference's flagship instruments (ADCP/lidar profiles) carry variables
with two coordinates — ``wind_speed(time, height)`` etc.
(/root/reference/tsdat/config/dataset/dataset_config.py:39-52,
test/qc/fixtures/sample_dataset_2d.py:8-17).  The engine's long/tall model
encodes these as one row per (time, height) cell; this module supplies the
2-D operators over that encoding:

* ``FloatGrid`` + ``float_bounds`` / ``float_bounds_from_labels`` — the
  numeric-axis twin of transforms.GridSpec, matching the reference's
  create_bounds goldens for height axes
  (/root/reference/test/io/test_transform_v2.py:121-170).
* ``check_monotonic_2d`` — CheckMonotonic's 2-D branch
  (/root/reference/tsdat/qc/checkers/check_monotonic.py:95-99): failures are
  per-cell ``np.gradient`` sign violations along the chosen axis (the
  reference deliberately swaps the 1-D running-max logic for gradient in
  2-D).  Distributed per (key, time-window) group; gradient is local to the
  window, exact except at window-edge cells where one-sided differences see
  only in-window neighbors — size windows ≫ interval (same salting-by-time
  strategy as the rollup).
* ``bin_average_grid_2d`` — separable 2-D bin average onto
  (time grid × second-coord grid): each input cell contributes to every
  overlapped (t-bin, h-bin) with weight ratio_t × ratio_h; weighted
  mean/std/goodfraction + the transform-QC bit table per output cell
  (numerics per transform_v2/bin_average/calculate_bin_average.py:15-111
  applied to the product measure).  One groupby((key, t-window)) shuffle of
  expanded contributions, deterministic in-group summation.
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
    QC_INDETERMINATE,
    QC_INDETERMINATE_GOODFRAC,
    QC_OUTSIDE_RANGE,
    QC_SOME_BAD_INPUTS,
    QC_ZERO_WEIGHT,
)
from .transforms import ALIGNMENT, GridSpec

US = 1_000_000


@dataclass(frozen=True)
class FloatGrid:
    """Regular numeric output grid (height/depth/direction axes)."""

    start: float
    stop: float
    interval: float
    width: float | None = None
    alignment: float | str = "left"

    @property
    def align(self) -> float:
        return ALIGNMENT[self.alignment] if isinstance(self.alignment, str) else self.alignment

    @property
    def w(self) -> float:
        return self.interval if self.width is None else self.width

    @property
    def labels(self) -> np.ndarray:
        n = int(np.ceil((self.stop - self.start) / self.interval - 1e-9))
        return self.start + np.arange(n) * self.interval

    @property
    def n(self) -> int:
        return len(self.labels)

    def bounds(self) -> tuple[np.ndarray, np.ndarray]:
        labels = self.labels
        starts = labels - self.align * self.w
        return starts, starts + self.w


def float_bounds_from_labels(labels: np.ndarray, alignment: str = "center") -> np.ndarray:
    """[n, 2] bounds from existing labels; width = label diffs with the first
    diff prepended (parity: create_bounds_from_labels on numeric axes)."""
    labels = np.asarray(labels, dtype=np.float64)
    if len(labels) < 2:
        w = np.ones(len(labels))
    else:
        d = np.diff(labels)
        w = np.append(d[:1], d)
    a = ALIGNMENT[alignment] if isinstance(alignment, str) else alignment
    starts = labels - a * w
    return np.stack([starts, starts + w], axis=1)


def _expand_overlaps_f(in_start: np.ndarray, in_end: np.ndarray, grid: FloatGrid):
    """(row, bin, ratio) triples for a float grid — the numeric twin of
    transforms._expand_overlaps."""
    if grid.n == 0 or len(in_start) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0)
    base = grid.labels[0] - grid.align * grid.w
    j_lo = np.ceil((in_start - base - grid.w) / grid.interval + 1e-12).astype(np.int64)
    j_hi = np.floor((in_end - base) / grid.interval - 1e-12).astype(np.int64)
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
    out_start = base + j * grid.interval
    out_end = out_start + grid.w
    ov = np.minimum(in_end[rows], out_end) - np.maximum(in_start[rows], out_start)
    ratio = ov / (in_end[rows] - in_start[rows])
    keep = ov > 0
    return rows[keep], j[keep], ratio[keep]


# --------------------------------------------------------------------------- #
# 2-D monotonic check
# --------------------------------------------------------------------------- #

def monotonic_2d_failures(mat: np.ndarray, axis: int = 0,
                          direction: str = "increasing") -> np.ndarray:
    """Per-cell failure mask for a dense (time × coord2) matrix — exact
    re-expression of the reference's 2-D branch (check_monotonic.py:95-99):
    ``np.gradient(data)[axis]`` sign test per cell."""
    diff = np.gradient(mat)[axis]
    return diff <= 0 if direction == "increasing" else diff >= 0


def check_monotonic_2d(ds, value_col: str, ts_col: str = "ts", coord2: str = "height",
                       key: str | None = None, axis_dim: str = "ts",
                       direction: str = "increasing", window_s: int = 86400):
    """Long-format 2-D monotonic QC: rows (ts, coord2, value) pivot to a
    dense matrix per (key, window), the reference's gradient test runs per
    cell, and rows come back with ``qc_<value_col>`` set to QC_BAD where the
    cell fails.  Cells missing from the grid stay unflagged (xarray would
    have NaN-filled them; the long encoding simply has no row)."""
    import pyarrow.compute as pc

    win_us = window_s * US

    def per_window(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_window"])
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = g[coord2].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        x = g[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        t_lab, t_inv = np.unique(ts, return_inverse=True)
        h_lab, h_inv = np.unique(h, return_inverse=True)
        mat = np.full((len(t_lab), len(h_lab)), np.nan)
        mat[t_inv, h_inv] = x
        axis = 0 if axis_dim == ts_col else 1
        if mat.shape[axis] < 2:
            fail_cells = np.zeros(mat.shape, dtype=bool)
        else:
            with np.errstate(invalid="ignore"):
                fail_cells = monotonic_2d_failures(mat, axis=axis, direction=direction)
        fail = fail_cells[t_inv, h_inv]
        qc_name = f"qc_{value_col}"
        prev = (
            g[qc_name].combine_chunks().to_numpy(zero_copy_only=False)
            if qc_name in g.column_names
            else np.zeros(len(ts), dtype=np.int32)
        )
        qc = np.where(fail, prev | QC_BAD, prev).astype(np.int32)
        out = {c: g[c] for c in g.column_names if c != qc_name}
        out[qc_name] = pa.array(qc)
        return pa.table(out)

    def add_window(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("_window", pa.array((ts // win_us) * win_us))

    keys = ([key] if key else []) + ["_window"]
    return ds.map_batches(add_window, batch_format="pyarrow").groupby(keys).map_groups(
        per_window, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------- #
# 2-D bin average
# --------------------------------------------------------------------------- #

def bin_average_nd_slice(
    ts_us: np.ndarray,
    coords: list[np.ndarray],
    x: np.ndarray,
    bad: np.ndarray,
    tgrid: GridSpec,
    grids: list[FloatGrid],
    input_width_us: int | None = None,
    input_widths: list[float | None] | None = None,
) -> dict[str, np.ndarray]:
    """Dense N-D bin average of one slice (single key, all cells in memory):
    time axis + any number of numeric coordinate axes — the reference allows
    arbitrary dims per variable (tsdat/config/variables/variable.py:15-54,
    e.g. time × height × range).  Each extra axis folds into the running
    (row, cell, weight) contribution set exactly like the 2-D height axis:
    per-axis overlap expansion, weight = product of per-axis ratios, cell =
    mixed-radix index over (t, c1, …, ck).  Returns flat arrays over the
    full output grid; the distributed wrapper shards by time window."""
    from .transforms import _expand_overlaps, input_bounds_from_labels

    if input_widths is None:
        input_widths = [None] * len(grids)

    if input_width_us == 0:  # point samples on t: containing bin, weight 1
        base = tgrid.labels[0] - int(round(tgrid.align * tgrid.width))
        jt_all = np.floor_divide(ts_us - base, tgrid.interval_us)
        ok = (jt_all >= 0) & (jt_all < tgrid.n)
        rows, jt = np.flatnonzero(ok), jt_all[ok]
        w = np.ones(len(rows))
    else:
        t_start, t_end = input_bounds_from_labels(ts_us, input_width_us)
        rows, jt, w = _expand_overlaps(t_start, t_end, tgrid)

    cell = jt
    for c, grid, width in zip(coords, grids, input_widths):
        if width == 0:  # point samples on this axis
            cbase = grid.labels[0] - grid.align * grid.w
            jc_all = np.floor((c[rows] - cbase) / grid.interval).astype(np.int64)
            okc = (jc_all >= 0) & (jc_all < grid.n)
            sub, jc = np.flatnonzero(okc), jc_all[okc]
            wc = np.ones(len(sub))
        else:
            if width is None:  # per-row widths from the axis's unique labels
                cu = np.unique(c)
                cb = float_bounds_from_labels(cu)
                pos = np.searchsorted(cu, c)
                c_start, c_end = cb[pos, 0], cb[pos, 1]
            else:
                c_start, c_end = c - width / 2, c + width / 2
            sub, jc, wc = _expand_overlaps_f(c_start[rows], c_end[rows], grid)
        rows = rows[sub]
        cell = cell[sub] * grid.n + jc
        w = w[sub] * wc

    nt = tgrid.n
    ncell = nt
    for grid in grids:
        ncell *= grid.n
    data = np.where(bad[rows], np.nan, x[rows])
    wn = np.where(np.isnan(data), 0.0, w)
    dn = np.where(np.isnan(data), 0.0, data)
    # deterministic order: sort contributions by (cell, ts, c1, …, ck)
    order = np.lexsort(tuple(c[rows] for c in reversed(coords)) + (ts_us[rows], cell))
    cell_s, w_s, d_s = cell[order], wn[order], dn[order]
    bad_s, raw_w = bad[rows][order], w[order]

    sum_w = np.bincount(cell_s, weights=w_s, minlength=ncell)
    sum_wx = np.bincount(cell_s, weights=w_s * d_s, minlength=ncell)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(sum_w > 0, sum_wx / sum_w, np.nan)
    dev = d_s - mean[cell_s]
    sum_wd2 = np.bincount(cell_s, weights=w_s * dev * dev, minlength=ncell)
    good_w = np.bincount(cell_s, weights=w_s * (~bad_s), minlength=ncell)
    n_real = np.bincount(cell_s, minlength=ncell)
    n_bad = np.bincount(cell_s, weights=bad_s.astype(float), minlength=ncell)
    sum_raw_w = np.bincount(cell_s, weights=raw_w, minlength=ncell)
    with np.errstate(invalid="ignore", divide="ignore"):
        std = np.where(sum_w > 0, np.sqrt(sum_wd2 / sum_w), np.nan)
        gf = np.where(sum_w > 0, good_w / sum_w, np.nan)
        bad_frac = np.where(n_real > 0, n_bad / n_real, 0.0)
    qc = np.zeros(ncell, dtype=np.int64)
    qc |= QC_SOME_BAD_INPUTS * ((bad_frac > 0) & (bad_frac < 1))
    qc |= QC_ZERO_WEIGHT * ((sum_raw_w == 0) & (n_real > 0))
    qc |= (QC_ALL_BAD_INPUTS | QC_BAD) * (np.isclose(bad_frac, 1.0) & (n_real > 0))
    gfv = np.where(np.isnan(gf), 0.0, gf)
    qc |= QC_BAD_GOODFRAC * ((gfv < GOODFRAC_BAD_MIN) & (n_real > 0))
    qc |= QC_INDETERMINATE_GOODFRAC * ((gfv < GOODFRAC_IND_MIN) & (n_real > 0))
    qc = np.where(n_real == 0, QC_OUTSIDE_RANGE | QC_BAD, qc)
    # axis labels for every output cell: t repeats over the product of the
    # later axes; axis k tiles over earlier axes and repeats over later ones
    tail = ncell // nt
    out: dict[str, np.ndarray] = {"t": np.repeat(tgrid.labels, tail)}
    lead = nt
    for a, grid in enumerate(grids):
        tail //= grid.n
        out[f"c{a}"] = np.tile(np.repeat(grid.labels, tail), lead)
        lead *= grid.n
    out.update(
        {
            "mean": mean,
            "std": std,
            "goodfraction": gf,
            "qc": qc.astype(np.int32),
            "n": n_real.astype(np.int64),
            "sum_w": sum_w,
            "sum_wx": sum_wx,
        }
    )
    return out


def bin_average_2d_slice(
    ts_us: np.ndarray,
    h: np.ndarray,
    x: np.ndarray,
    bad: np.ndarray,
    tgrid: GridSpec,
    hgrid: FloatGrid,
    input_width_us: int | None = None,
    input_width_h: float | None = None,
) -> dict[str, np.ndarray]:
    """Dense 2-D bin average of one slice — the N-D kernel with one numeric
    axis (kept as the named 2-D API; the reference goldens in test_twod.py
    pin this path and therefore the shared kernel)."""
    out = bin_average_nd_slice(
        ts_us, [h], x, bad, tgrid, [hgrid], input_width_us, [input_width_h]
    )
    out["h"] = out.pop("c0")
    return out


def bin_average_grid_2d(
    ds,
    tgrid: GridSpec,
    hgrid: FloatGrid,
    key: str = "source",
    ts_col: str = "ts",
    h_col: str = "height",
    value_col: str = "value",
    bad_bits: int = 3,
    window_s: int = 86400,
    input_width_us: int | None = None,
    input_width_h: float | None = None,
):
    """Distributed 2-D bin average: one groupby((key, t-window)) over input
    CELLS (each window's time slice carries every height), then the dense
    slice kernel per group.  Output: one row per (key, t-label, h-label)
    within windows that contain data; windows are aligned to the t-grid so a
    cell's contributions never straddle two groups (choose window_s a
    multiple of the grid interval ≫ the input spacing)."""
    import pyarrow.compute as pc

    win_us = window_s * US

    def add_window(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("_window", pa.array((ts // win_us) * win_us))

    def per_window(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_window"])
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = g[h_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        x = g[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        qcol = f"qc_{value_col}"
        qc = (
            g[qcol].combine_chunks().to_numpy(zero_copy_only=False)
            if qcol in g.column_names
            else np.zeros(len(x), dtype=np.int32)
        )
        bad = ((qc & bad_bits) != 0) | np.isnan(x)
        # restrict the t grid to this window (labels are globally aligned);
        # a window with no grid labels contributes nothing (data outside the
        # declared grid range) rather than echoing the full grid
        lo = ts.min()
        lab = tgrid.labels
        sel = (lab >= (lo // win_us) * win_us) & (lab < (lo // win_us) * win_us + win_us)
        if not sel.any():
            empty: dict = {key: pa.array([], pa.string()),
                           "bucket": pa.array([], pa.timestamp("us")),
                           h_col: pa.array([], pa.float64())}
            for suffix, typ in (("_mean", pa.float64()), ("_std", pa.float64()),
                                ("_goodfraction", pa.float64())):
                empty[f"{value_col}{suffix}"] = pa.array([], typ)
            empty[f"qc_{value_col}"] = pa.array([], pa.int32())
            empty[f"{value_col}_n"] = pa.array([], pa.int64())
            empty[f"{value_col}_sum_w"] = pa.array([], pa.float64())
            empty[f"{value_col}_sum_wx"] = pa.array([], pa.float64())
            return pa.table(empty)
        sub = GridSpec(int(lab[sel][0]), int(lab[sel][-1] + tgrid.interval_us),
                       tgrid.interval_us, tgrid.width_us, tgrid.alignment)
        out = bin_average_2d_slice(ts, h, x, bad, sub, hgrid,
                                   input_width_us, input_width_h)
        kv = g[key][0].as_py() if key in g.column_names else ""
        return pa.table(
            {
                key: pa.array(np.repeat(kv, len(out["t"]))),
                "bucket": pa.array(out["t"]).cast(pa.timestamp("us")),
                h_col: pa.array(out["h"]),
                f"{value_col}_mean": pa.array(out["mean"]),
                f"{value_col}_std": pa.array(out["std"]),
                f"{value_col}_goodfraction": pa.array(out["goodfraction"]),
                f"qc_{value_col}": pa.array(out["qc"]),
                f"{value_col}_n": pa.array(out["n"]),
                f"{value_col}_sum_w": pa.array(out["sum_w"]),
                f"{value_col}_sum_wx": pa.array(out["sum_wx"]),
            }
        )

    return ds.map_batches(add_window, batch_format="pyarrow").groupby(
        [key, "_window"]
    ).map_groups(per_window, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# N-D (time × k numeric axes) distributed operators
# --------------------------------------------------------------------------- #

def bin_average_grid_nd(
    ds,
    tgrid: GridSpec,
    coord_grids: dict[str, FloatGrid],
    key: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    bad_bits: int = 3,
    window_s: int = 86400,
    input_width_us: int | None = None,
    input_widths: dict[str, float | None] | None = None,
):
    """Distributed N-D bin average over the long/tall encoding (one row per
    (time, c1, …, ck) cell — the reference's arbitrary-dims variables,
    tsdat/config/variables/variable.py:15-54): one groupby((key, t-window))
    shuffle, then the dense N-D slice kernel per group.  Output: one row per
    (key, t-label, c1-label, …, ck-label) within windows that contain data.
    Windows align to the t-grid so contributions never straddle groups;
    the per-group dense grid is ∏ axis sizes — size windows so that fits a
    worker (the same window-width ∝ cardinality law as the 1-D rollup)."""
    coord_cols = list(coord_grids)
    grids = [coord_grids[c] for c in coord_cols]
    widths = [
        (input_widths or {}).get(c) for c in coord_cols
    ]
    win_us = window_s * US

    def add_window(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("_window", pa.array((ts // win_us) * win_us))

    def per_window(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_window"])
        ts = g[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        coords = [
            g[c].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
            for c in coord_cols
        ]
        x = g[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        qcol = f"qc_{value_col}"
        qc = (
            g[qcol].combine_chunks().to_numpy(zero_copy_only=False)
            if qcol in g.column_names
            else np.zeros(len(x), dtype=np.int32)
        )
        bad = ((qc & bad_bits) != 0) | np.isnan(x)
        lo = ts.min()
        lab = tgrid.labels
        sel = (lab >= (lo // win_us) * win_us) & (lab < (lo // win_us) * win_us + win_us)
        names = ([key] if key else []) + ["bucket", *coord_cols,
                 f"{value_col}_mean", f"{value_col}_std",
                 f"{value_col}_goodfraction", f"qc_{value_col}",
                 f"{value_col}_n", f"{value_col}_sum_w", f"{value_col}_sum_wx"]
        if not sel.any():  # data outside the declared grid range
            types = ([pa.string()] if key else []) + [pa.timestamp("us")] \
                + [pa.float64()] * len(coord_cols) + [pa.float64()] * 3 \
                + [pa.int32(), pa.int64(), pa.float64(), pa.float64()]
            return pa.table({n_: pa.array([], t_) for n_, t_ in zip(names, types)})
        sub = GridSpec(int(lab[sel][0]), int(lab[sel][-1] + tgrid.interval_us),
                       tgrid.interval_us, tgrid.width_us, tgrid.alignment)
        out = bin_average_nd_slice(ts, coords, x, bad, sub, grids,
                                   input_width_us, widths)
        cols: dict = {}
        if key:
            kv = g[key][0].as_py() if key in g.column_names else ""
            cols[key] = pa.array(np.repeat(kv, len(out["t"])))
        cols["bucket"] = pa.array(out["t"]).cast(pa.timestamp("us"))
        for a, c in enumerate(coord_cols):
            cols[c] = pa.array(out[f"c{a}"])
        cols[f"{value_col}_mean"] = pa.array(out["mean"])
        cols[f"{value_col}_std"] = pa.array(out["std"])
        cols[f"{value_col}_goodfraction"] = pa.array(out["goodfraction"])
        cols[f"qc_{value_col}"] = pa.array(out["qc"])
        cols[f"{value_col}_n"] = pa.array(out["n"])
        cols[f"{value_col}_sum_w"] = pa.array(out["sum_w"])
        cols[f"{value_col}_sum_wx"] = pa.array(out["sum_wx"])
        return pa.table(cols)

    keys = ([key] if key else []) + ["_window"]
    return ds.map_batches(add_window, batch_format="pyarrow").groupby(
        keys
    ).map_groups(per_window, batch_format="pyarrow")


def monotonic_nd_failures(arr: np.ndarray, axis: int = 0,
                          direction: str = "increasing") -> np.ndarray:
    """Per-cell failure mask for a dense N-D array: ``np.gradient`` sign test
    along ``axis`` — the reference's 2-D gradient branch
    (check_monotonic.py:95-99) applied at any rank."""
    diff = np.gradient(arr, axis=axis)
    return diff <= 0 if direction == "increasing" else diff >= 0


def check_monotonic_nd(ds, value_col: str, coord_cols: list[str],
                       ts_col: str = "ts", key: str | None = None,
                       axis_dim: str = "ts", direction: str = "increasing",
                       window_s: int = 86400):
    """Long-format N-D monotonic QC: rows (ts, c1, …, ck, value) pivot to a
    dense (time × c1 × … × ck) array per (key, window), the gradient sign
    test runs along ``axis_dim``, and rows come back with ``qc_<value_col>``
    OR'd with QC_BAD where their cell fails (cells absent from the grid stay
    unflagged, as in check_monotonic_2d)."""
    win_us = window_s * US
    dims = [ts_col, *coord_cols]
    axis = dims.index(axis_dim)

    def per_window(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_window"])
        axes_vals = [
            g[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        ] + [
            g[c].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
            for c in coord_cols
        ]
        x = g[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        labs, invs = [], []
        for v in axes_vals:
            lab, inv = np.unique(v, return_inverse=True)
            labs.append(lab)
            invs.append(inv)
        arr = np.full(tuple(len(lb) for lb in labs), np.nan)
        arr[tuple(invs)] = x
        if arr.shape[axis] < 2:
            fail_cells = np.zeros(arr.shape, dtype=bool)
        else:
            with np.errstate(invalid="ignore"):
                fail_cells = monotonic_nd_failures(arr, axis=axis, direction=direction)
        fail = fail_cells[tuple(invs)]
        qc_name = f"qc_{value_col}"
        prev = (
            g[qc_name].combine_chunks().to_numpy(zero_copy_only=False)
            if qc_name in g.column_names
            else np.zeros(len(x), dtype=np.int32)
        )
        qc = np.where(fail, prev | QC_BAD, prev).astype(np.int32)
        out = {c: g[c] for c in g.column_names if c != qc_name}
        out[qc_name] = pa.array(qc)
        return pa.table(out)

    def add_window(b: pa.Table) -> pa.Table:
        ts = b[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("_window", pa.array((ts // win_us) * win_us))

    keys = ([key] if key else []) + ["_window"]
    return ds.map_batches(add_window, batch_format="pyarrow").groupby(keys).map_groups(
        per_window, batch_format="pyarrow"
    )
