"""Config-driven quality-control subsystem (checker/handler registry).

Re-expresses the reference's QC manager loop
(/root/reference/tsdat/qc/base/quality_management.py:16-28,
quality_manager.py:23-65) as vectorized numpy kernels over Arrow batches:
an ordered list of managers, each running one checker (boolean failure mask,
True = fail, None = skip) and feeding the mask to its handlers in order.

Checker semantics are bit-for-bit parity with the reference:

* ``missing``    — NaN/NaT/null, == _FillValue, empty string
  (check_missing.py:8-27)
* ``monotonic``  — strict monotonic order; direction inferred by majority diff
  sign unless required; only *breaks* are flagged (running-prev semantics,
  check_monotonic.py:74-99 — vectorized here as a comparison against the
  running max/min of the successful prefix, which is equivalent)
* ``valid_max`` … ``warn_range_min`` — 18 threshold checks reading the
  variable-attrs table (threshold_checker.py:9-29; list-valued attrs use
  index 0 for min, -1 for max; _FillValue masked out first, check_max.py:27-31)
* ``valid_delta``/``fail_delta``/``warn_delta`` — |diff prepend-first| vs
  threshold (check_delta.py:40-49)
* ``valid_std``/``fail_std``/``warn_std`` — x > mean + k·std (ddof=1 over the
  slice, check_std.py:36-42)

Handler semantics:

* ``record_quality_results`` — set the next free bit on ``qc_<var>`` in
  manager order (record_quality_results.py:74-83)
* ``remove_failed_values``   — failed values → null; failed *coordinate*
  rows are dropped (remove_failed_values.py:17-26)
* ``sort_dataset_by_coordinate`` — sort all rows by the coord if any failure
  (sort_dataset_by_coordinate.py:10-36)
* ``fail_pipeline`` — raise ``DataQualityError`` when the failure fraction
  exceeds ``tolerance`` (fail_pipeline.py:40-81); in the distributed engine
  the error aborts the Ray job (or is quarantined to the manifest by the
  pipeline wrapper)

Point-wise managers can run in any ``map_batches`` stage; order-dependent
checkers (monotonic/delta/std) must run inside per-(key, window) sorted
groups — ``QCStage`` is used from both contexts.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable, Optional

import numpy as np
import pyarrow as pa


class DataQualityError(RuntimeError):
    """Raised by the fail_pipeline handler (parity: tsdat DataQualityError)."""


# --------------------------------------------------------------------------- #
# checkers: (values, attrs, params, columns) -> bool failures | None
# --------------------------------------------------------------------------- #

def _is_datetime(x: np.ndarray) -> bool:
    return np.issubdtype(x.dtype, np.datetime64)


def _isnull(x: np.ndarray) -> np.ndarray:
    if _is_datetime(x):
        return np.isnat(x)
    if np.issubdtype(x.dtype, np.floating):
        return np.isnan(x)
    return np.zeros(len(x), dtype=bool)


def check_missing(x, attrs, params, cols):
    failures = _isnull(x)
    if "_FillValue" in attrs:
        with np.errstate(invalid="ignore"):
            failures = failures | (x == attrs["_FillValue"])
    elif x.dtype.kind in ("U", "S", "O"):
        failures = failures | (x == "")
    return failures


def check_monotonic(x, attrs, params, cols):
    if x.dtype.kind in ("U", "S", "O"):
        return None  # strings unsupported, parity check_monotonic.py:57-64
    if params.get("require_decreasing"):
        direction = "decreasing"
    elif params.get("require_increasing"):
        direction = "increasing"
    else:
        diff = np.diff(x)
        zero = np.timedelta64(0) if _is_datetime(x) else 0
        direction = "increasing" if np.sum(diff > zero) >= np.sum(diff < zero) else "decreasing"
    failures = np.zeros(len(x), dtype=bool)
    if len(x) < 2:
        return failures
    # running-prev semantics: a value fails iff it does not strictly continue
    # from the last successful value == comparison vs running max/min prefix
    if direction == "increasing":
        run = np.maximum.accumulate(x)
        failures[1:] = x[1:] <= run[:-1]
    else:
        run = np.minimum.accumulate(x)
        failures[1:] = x[1:] >= run[:-1]
    return failures


def _masked(x: np.ndarray, attrs: dict) -> np.ndarray:
    """_FillValue → NaN (floats only), parity check_max.py:27-31."""
    if "_FillValue" in attrs and np.issubdtype(x.dtype, np.floating):
        return np.where(x == attrs["_FillValue"], np.nan, x)
    return x


def _threshold(attrs: dict, attribute_name: str, min_: bool):
    t = attrs.get(attribute_name)
    if isinstance(t, (list, tuple)):
        t = t[0] if min_ else t[-1]
    return t


def make_check_max(attribute_name: str):
    def run(x, attrs, params, cols):
        t = _threshold(attrs, attribute_name, min_=False)
        if t is None:
            return None
        x = _masked(x, attrs)
        with np.errstate(invalid="ignore"):
            return np.greater(x, t) if params.get("allow_equal", True) else np.greater_equal(x, t)
    return run


def make_check_min(attribute_name: str):
    def run(x, attrs, params, cols):
        t = _threshold(attrs, attribute_name, min_=True)
        if t is None:
            return None
        x = _masked(x, attrs)
        with np.errstate(invalid="ignore"):
            return np.less(x, t) if params.get("allow_equal", True) else np.less_equal(x, t)
    return run


def make_check_delta(attribute_name: str):
    def run(x, attrs, params, cols):
        t = _threshold(attrs, attribute_name, min_=True)
        if t is None:
            return None
        x = _masked(x, attrs)
        diff = np.abs(np.diff(x, prepend=x[:1]))
        with np.errstate(invalid="ignore"):
            return diff > t if params.get("allow_equal", True) else diff >= t
    return run


def make_check_std(attribute_name: str):
    def run(x, attrs, params, cols):
        t = _threshold(attrs, attribute_name, min_=True)
        if t is None:
            return None
        x = _masked(x, attrs)
        mean = np.nanmean(x)
        n = np.count_nonzero(~np.isnan(x))
        std = np.nanstd(x, ddof=1) if n > 1 else 0.0
        with np.errstate(invalid="ignore"):
            return x > mean + std * t
    return run


_COMPARATORS = {
    "<": np.less, "<=": np.less_equal, ">": np.greater, ">=": np.greater_equal,
    "==": np.equal, "!=": np.not_equal,
}


def check_array_mask_threshold(x, attrs, params, cols):
    """Compare the whole array to a scalar with a configurable comparator
    (parity: tsdat CheckArrayMaskThreshold,
    /root/reference/tsdat/qc/checkers/check_array_mask_threshold.py:18-78).
    params: {"threshold": value, "comparator": "<"|"<="|">"|">="|"=="|"!="}."""
    thr = params.get("threshold", 0)
    comp = _COMPARATORS[params.get("comparator", "<")]
    with np.errstate(invalid="ignore"):
        out = comp(x, thr)
    return np.asarray(out, dtype=bool) & ~_isnull(np.asarray(x))


def check_despike_gn2002(x, attrs, params, cols):
    """Goring & Nikora (2002) phase-space despiking (parity target:
    tsdat CheckGoringNikora2002, which delegates to mhkit —
    /root/reference/tsdat/qc/checkers/oceanography/check_goring_nikora_2002.py:9-22.
    mhkit isn't in this container; this is the published algorithm in numpy):
    points outside the universal-threshold ellipsoid in (u, ∂u, ∂²u) phase
    space are spikes.  params: {"n_iter": 3}."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 5:
        return np.zeros(n, dtype=bool)
    failures = np.zeros(n, dtype=bool)
    for _ in range(int(params.get("n_iter", 3))):
        u = np.where(failures, np.nan, x)
        u = u - np.nanmean(u)
        du = np.gradient(u)
        d2u = np.gradient(du)
        lam = np.sqrt(2.0 * np.log(np.count_nonzero(~np.isnan(u))))
        su, sdu, sd2u = (np.nanstd(v) for v in (u, du, d2u))
        if 0.0 in (su, sdu, sd2u):
            break
        # rotation angle of the u–d2u ellipse principal axis
        theta = np.arctan2(np.nansum(u * d2u), np.nansum(u * u))
        ct, st = np.cos(theta), np.sin(theta)
        a, b = lam * su, lam * sd2u
        with np.errstate(invalid="ignore", divide="ignore"):
            e1 = (u / (lam * su)) ** 2 + (du / (lam * sdu)) ** 2
            e2 = (du / (lam * sdu)) ** 2 + (d2u / (lam * sd2u)) ** 2
            ur, d2r = u * ct + d2u * st, -u * st + d2u * ct
            e3 = (ur / a) ** 2 + (d2r / b) ** 2
        new = (e1 > 1.0) | (e2 > 1.0) | (e3 > 1.0)
        new &= ~np.isnan(x)
        if not (new & ~failures).any():
            break
        failures |= new
    return failures


CHECKERS: dict[str, Callable] = {
    "missing": check_missing,
    "monotonic": check_monotonic,
    "array_mask_threshold": check_array_mask_threshold,
    "despike_gn2002": check_despike_gn2002,
}
for kind in ("valid", "fail", "warn"):
    CHECKERS[f"{kind}_max"] = make_check_max(f"{kind}_max")
    CHECKERS[f"{kind}_min"] = make_check_min(f"{kind}_min")
    CHECKERS[f"{kind}_range_max"] = make_check_max(f"{kind}_range")
    CHECKERS[f"{kind}_range_min"] = make_check_min(f"{kind}_range")
    CHECKERS[f"{kind}_delta"] = make_check_delta(f"{kind}_delta")
    CHECKERS[f"{kind}_std"] = make_check_std(f"{kind}_std")


# --------------------------------------------------------------------------- #
# config + stage
# --------------------------------------------------------------------------- #

@dataclass(frozen=True)
class Manager:
    name: str
    checker: str
    # variable names, or the keywords "COORDS" / "DATA_VARS" (resolved against
    # the first batch's columns — parity quality_manager.py:23-29,52-65)
    apply_to: tuple[str, ...]
    exclude: tuple[str, ...] = ()
    parameters: dict = dc_field(default_factory=dict)
    handlers: tuple[dict, ...] = (({"name": "record_quality_results"}),)
    assessment: str = "Bad"  # recorded assessment of this test


@dataclass(frozen=True)
class QCConfig:
    managers: tuple[Manager, ...]
    attrs: dict = dc_field(default_factory=dict)  # per-variable threshold attrs
    coords: tuple[str, ...] = ("ts",)


class QCReport(dict):
    """Per-run QC counters: {(manager, var): n_failed}; feeds the manifest."""


class QCStage:
    """Callable class for actor-pool ``map_batches``/``map_groups``: holds the
    compiled config once per worker (SURVEY.md §2.4)."""

    def __init__(self, config: QCConfig):
        self.config = config
        self._has_keywords = any(
            v in ("COORDS", "DATA_VARS")
            for m in config.managers
            for v in tuple(m.apply_to) + tuple(m.exclude)
        )
        self._resolved: dict[str, tuple[str, ...]] | None = None
        if not self._has_keywords:
            self._build_bits({m.name: tuple(m.apply_to) for m in config.managers})

    def _build_bits(self, apply_map: dict[str, tuple[str, ...]]) -> None:
        # bit number per (var, manager) assigned in manager order, parity
        # record_quality_results.py:74-83 (next free bit = #existing tests + 1)
        self._resolved = apply_map
        self._bits: dict[tuple[str, str], int] = {}
        counts: dict[str, int] = {}
        self.meanings: dict[str, list[tuple[int, str, str]]] = {}
        for m in self.config.managers:
            recorded = any(h["name"] == "record_quality_results" for h in m.handlers)
            for var in apply_map[m.name]:
                if recorded:
                    counts[var] = counts.get(var, 0) + 1
                    self._bits[(var, m.name)] = counts[var]
                    self.meanings.setdefault(var, []).append(
                        (1 << (counts[var] - 1), m.name, m.assessment)
                    )

    def _resolve(self, columns: list[str]) -> None:
        """Expand COORDS/DATA_VARS keywords against an actual schema (stable
        across batches, so the bit table is deterministic)."""
        if self._resolved is not None:
            return
        apply_map: dict[str, tuple[str, ...]] = {}
        coords = tuple(self.config.coords)
        data_vars = tuple(
            c for c in columns
            if c not in coords and not c.startswith("qc_") and not c.startswith("_")
        )
        for m in self.config.managers:
            out: list[str] = []
            for v in m.apply_to:
                if v == "COORDS":
                    out.extend(c for c in coords if c in columns)
                elif v == "DATA_VARS":
                    out.extend(data_vars)
                else:
                    out.append(v)
            excl = set()
            for v in m.exclude:
                if v == "COORDS":
                    excl.update(coords)
                elif v == "DATA_VARS":
                    excl.update(data_vars)
                else:
                    excl.add(v)
            apply_map[m.name] = tuple(v for v in dict.fromkeys(out) if v not in excl)
        self._build_bits(apply_map)

    def bad_bits(self, var: str) -> int:
        return sum(b for b, _, a in self.meanings.get(var, []) if a == "Bad")

    def ind_bits(self, var: str) -> int:
        return sum(b for b, _, a in self.meanings.get(var, []) if a == "Indeterminate")

    def __call__(self, batch: pa.Table, report: Optional[QCReport] = None) -> pa.Table:
        cols: dict[str, np.ndarray] = {}
        passthrough: dict[str, pa.ChunkedArray] = {}
        for name in batch.column_names:
            col = batch[name]
            if pa.types.is_nested(col.type):
                passthrough[name] = col
            else:
                cols[name] = col.combine_chunks().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        keep = np.ones(n, dtype=bool)

        self._resolve(batch.column_names)
        for m in self.config.managers:
            fn = CHECKERS[m.checker]
            for var in self._resolved[m.name]:
                if var not in cols:
                    continue
                attrs = self.config.attrs.get(var, {})
                failures = fn(cols[var], attrs, m.parameters, cols)
                if failures is None:
                    continue
                if report is not None:
                    report[(m.name, var)] = report.get((m.name, var), 0) + int(failures.sum())
                for h in m.handlers:
                    hname = h["name"]
                    if hname == "record_quality_results":
                        bit = 1 << (self._bits[(var, m.name)] - 1)
                        qc_name = f"qc_{var}"
                        if qc_name not in cols:
                            cols[qc_name] = np.zeros(n, dtype=np.int32)
                        cols[qc_name] = cols[qc_name] | (failures * bit).astype(np.int32)
                    elif hname == "remove_failed_values":
                        if var in self.config.coords:
                            keep &= ~failures
                        else:
                            x = cols[var]
                            if not np.issubdtype(x.dtype, np.floating):
                                x = x.astype(np.float64)
                            cols[var] = np.where(failures, np.nan, x)
                    elif hname == "sort_dataset_by_coordinate":
                        if failures.any():
                            order = np.argsort(cols[var], kind="stable")
                            if h.get("ascending", True) is False:
                                order = order[::-1]
                            for k in list(cols):
                                cols[k] = cols[k][order]
                            for k in list(passthrough):
                                passthrough[k] = passthrough[k].take(pa.array(order))
                            keep = keep[order]
                    elif hname == "fail_pipeline":
                        tol = h.get("tolerance", 0.0)
                        frac = failures.mean() if n else 0.0
                        if frac > tol:
                            bad_idx = np.flatnonzero(failures)[:5]
                            raise DataQualityError(
                                f"Quality check '{m.name}' failed for variable "
                                f"'{var}': {failures.sum()}/{n} "
                                f"({100 * frac:.2f}%) failing (tolerance "
                                f"{100 * tol:.2f}%). First failing indexes: "
                                f"{bad_idx.tolist()}"
                            )
                    else:
                        raise KeyError(f"unknown QC handler: {hname}")

        out: dict[str, pa.Array | pa.ChunkedArray] = {}
        drop_any = not keep.all()
        for name in batch.column_names:
            if name in passthrough:
                arr = passthrough[name]
                out[name] = arr.filter(pa.array(keep)) if drop_any else arr
            else:
                x = cols[name][keep] if drop_any else cols[name]
                if np.issubdtype(x.dtype, np.floating) and np.isnan(x).any():
                    out[name] = pa.array(x, from_pandas=True)  # NaN -> null
                else:
                    out[name] = pa.array(x)
        for name in cols:
            if name not in batch.column_names:  # new qc_ columns
                out[name] = pa.array(cols[name][keep] if drop_any else cols[name])
        return pa.table(out)


def check_std_global(ds, var: str, key: str = "source", n_std: float = 3.0,
                     qc_bit: int | None = None):
    """Distributed two-pass CheckStd (SURVEY §7.4-3): pass 1 computes each
    key's mean/std (ddof=1) with one small groupby-aggregate, the per-key
    table is broadcast once (``ray.put``), pass 2 flags x > mean + n_std·std
    per batch — the whole-slice statistics the in-group checker can't see
    when a key's history spans many partitions (reference semantics:
    check_std.py:21-42 over the full retrieved slice).

    Adds/ORs ``qc_<var>`` with ``qc_bit`` (default: next power of two above
    any bit used by the batch's existing qc column, fixed at 1<<30 for
    stability) and returns the transformed Dataset."""
    import ray
    from ray.data.aggregate import Mean, Std

    bit = np.int32(qc_bit if qc_bit is not None else (1 << 30))
    stats = ds.groupby(key).aggregate(
        Mean(var, alias_name="_mean"), Std(var, ddof=1, alias_name="_std")
    ).to_pandas()
    table = {
        r[key]: (float(r["_mean"]), float(r["_std"]) if np.isfinite(r["_std"]) else 0.0)
        for _, r in stats.iterrows()
    }
    ref = ray.put(table)

    def flag(batch: pa.Table) -> pa.Table:
        t = ray.get(ref)
        keys = batch[key].to_numpy(zero_copy_only=False)
        x = batch[var].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(keys, return_inverse=True)
        means = np.array([t.get(k, (np.nan, 0.0))[0] for k in uniq])[inv]
        stds = np.array([t.get(k, (np.nan, 0.0))[1] for k in uniq])[inv]
        with np.errstate(invalid="ignore"):
            fails = x > means + n_std * stds
        qc_name = f"qc_{var}"
        if qc_name in batch.column_names:
            qc = batch[qc_name].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int32)
            qc = qc | np.where(fails, bit, 0).astype(np.int32)
            idx = batch.column_names.index(qc_name)
            return batch.set_column(idx, qc_name, pa.array(qc))
        return batch.append_column(qc_name, pa.array(np.where(fails, bit, 0).astype(np.int32)))

    return ds.map_batches(flag, batch_format="pyarrow")
