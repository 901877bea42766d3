"""The flagship pipeline: sequences Parquet → raw tier → 1m → 1h → 1d,
partitioned by (source, day), resumable from the lineage manifest, with
retention pruning per tier.

Recasts the reference's ingest + transformation pipeline lifecycle
(/root/reference/tsdat/pipeline/pipelines/ingest_pipeline.py:34-49,
transformation_pipeline.py:29-75) as a chain of Ray Data jobs with one
explicit shuffle each:

    read_parquet(inputs)                                   # pruned columns
      → map_batches(standardize)                           # stateless
      → [skip completed (source, day) partitions]          # resume filter
      → groupby(source, day).map_groups(clean)             # sort+dedup+QC
      → write_parquet(raw/, partition_cols=[source, day])  # atomic + manifest
    raw → rollup(1m) → write t1m/ → manifest               # one shuffle
    t1m → rollup(1h) → write t1h/ → manifest
    t1h → rollup(1d) → write t1d/ → manifest
    retention: prune day partitions older than the per-tier horizon

Each tier job skips (source, day) partitions already committed to the
manifest and wipes partial uncommitted partition dirs before writing, so a
killed run resumes idempotently mid-rollup (north rule).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import DEFAULT_RETENTION_S, TIERS
from ..stages.qc import QCConfig, QCStage
from ..stages.rollup import RollupConfig, rollup
from ..stages.standardize import StandardizeConfig, standardize_batch
from ..state.manifest import Manifest

US = 1_000_000
DAY_US = 86400 * US


def _day_str_from_us(ts_us: np.ndarray) -> pa.Array:
    days = (ts_us // DAY_US) * DAY_US
    return pc.strftime(pa.array(days, type=pa.int64()).cast(pa.timestamp("us")), format="%Y-%m-%d")


def _add_day(batch: pa.Table, ts_col: str) -> pa.Table:
    ts_us = batch[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    return batch.append_column("day", _day_str_from_us(ts_us))


def _skip_completed(batch: pa.Table, ts_col: str, done: frozenset, key: str) -> pa.Table:
    if not done:
        return batch
    ts_us = batch[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    day = _day_str_from_us(ts_us).to_numpy(zero_copy_only=False)
    src = batch[key].to_numpy(zero_copy_only=False)
    parts = np.char.add(np.char.add(np.char.add("source=", src.astype(str)), "/day="), day.astype(str))
    keep = ~np.isin(parts, list(done))
    return batch.filter(pa.array(keep))


def clean_group(g: pa.Table, qc_stage: Optional[QCStage]) -> pa.Table:
    """Per (source, day): sort by (ts, doc_id), drop duplicate ts (keep first),
    then run the order-dependent QC managers on the sorted slice."""
    ts_us = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    doc_id = g["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((doc_id, ts_us))
    ts_s = ts_us[order]
    keep = np.r_[True, ts_s[1:] != ts_s[:-1]] if len(ts_s) else np.zeros(0, bool)
    t = g.take(pa.array(order[keep], type=pa.int64()))
    if qc_stage is not None:
        t = qc_stage(t)
    return t


@dataclass
class PipelineConfig:
    out_root: str
    std: StandardizeConfig = field(default_factory=StandardizeConfig)
    qc: Optional[QCConfig] = None
    values: tuple[str, ...] = ("n_tok", "tok_mean")
    carry_tokens: bool = True
    tiers: tuple[str, ...] = ("1m", "1h", "1d")
    window_s: dict = field(default_factory=lambda: {"1m": 3600 * 6, "1h": 86400, "1d": 86400 * 16})
    retention_s: dict = field(default_factory=lambda: dict(DEFAULT_RETENTION_S))
    resume: bool = True
    run_id: str = ""


def ingest_raw(input_paths, cfg: PipelineConfig) -> dict:
    """sequences Parquet → standardized, deduped, QC'd raw tier."""
    import ray.data as rd

    t0 = time.time()
    man = Manifest(cfg.out_root)
    done = frozenset(man.completed("raw")) if cfg.resume else frozenset()
    if cfg.resume:
        man.wipe_uncommitted("raw")

    qc_stage = QCStage(cfg.qc) if cfg.qc else None
    std_cfg = cfg.std

    ds = rd.read_parquet(input_paths)
    ds = ds.map_batches(lambda b: standardize_batch(b, std_cfg), batch_format="pyarrow")
    ds = ds.map_batches(lambda b: _skip_completed(b, "ts", done, "source"), batch_format="pyarrow")
    ds = ds.map_batches(lambda b: _add_day(b, "ts"), batch_format="pyarrow")
    ds = ds.groupby(["source", "day"]).map_groups(
        lambda g: clean_group(g, qc_stage), batch_format="pyarrow"
    )
    ds.write_parquet(man.tier_dir("raw"), partition_cols=["source", "day"])
    inputs = list(input_paths) if isinstance(input_paths, (list, tuple)) else [input_paths]
    recs = man.commit_partitions("raw", inputs, cfg.run_id, time.time() - t0)
    return {"tier": "raw", "new_partitions": len(recs), "skipped": len(done), "wall_s": time.time() - t0}


def rollup_tier(tier: str, cfg: PipelineConfig) -> dict:
    """Aggregate the previous tier into ``tier`` (raw→1m, 1m→1h, 1h→1d)."""
    import ray.data as rd

    t0 = time.time()
    man = Manifest(cfg.out_root)
    order = ("raw",) + cfg.tiers
    src_tier = order[order.index(tier) - 1]
    done = frozenset(man.completed(f"t{tier}")) if cfg.resume else frozenset()
    if cfg.resume:
        man.wipe_uncommitted(f"t{tier}")

    src_dir = man.tier_dir("raw" if src_tier == "raw" else f"t{src_tier}")
    ds = rd.read_parquet(src_dir)
    if "day" in ds.schema().names:
        ds = ds.drop_columns(["day"])
    ts_col = "ts" if src_tier == "raw" else "bucket"
    ds = ds.map_batches(lambda b: _skip_completed(b, ts_col, done, "source"), batch_format="pyarrow")
    rcfg = RollupConfig(
        interval_s=TIERS[tier],
        values=cfg.values,
        window_s=cfg.window_s.get(tier, 86400),
        carry_tokens=cfg.carry_tokens,
    )
    out = rollup(ds, rcfg, from_tier=(src_tier != "raw"))
    out = out.map_batches(lambda b: _add_day(b, "bucket"), batch_format="pyarrow")
    out.write_parquet(man.tier_dir(f"t{tier}"), partition_cols=["source", "day"])
    recs = man.commit_partitions(f"t{tier}", [src_dir], cfg.run_id, time.time() - t0)
    return {"tier": tier, "new_partitions": len(recs), "skipped": len(done), "wall_s": time.time() - t0}


def prune_retention(cfg: PipelineConfig, now_us: int) -> dict:
    """Delete day partitions older than each tier's retention horizon; every
    prune is recorded in the manifest (so `completed` drops the partition and
    a later backfill run could legitimately recreate it)."""
    import shutil

    man = Manifest(cfg.out_root)
    pruned: dict[str, list[str]] = {}
    tier_names = ["raw"] + [f"t{t}" for t in cfg.tiers]
    for tname in tier_names:
        horizon = cfg.retention_s.get(tname.lstrip("t") if tname != "raw" else "raw")
        if horizon is None:
            continue
        cutoff_day = ((now_us - horizon * US) // DAY_US) * DAY_US
        cutoff = np.datetime64(cutoff_day // US, "s").astype("datetime64[D]")
        for part in man.list_partition_dirs(tname):
            day = np.datetime64(part.split("day=")[1], "D")
            if day < cutoff:
                shutil.rmtree(man.partition_dir(tname, part))
                man.append({"tier": tname, "partition": part, "action": "pruned", "run_id": cfg.run_id})
                pruned.setdefault(tname, []).append(part)
    return {"pruned": {k: len(v) for k, v in pruned.items()}}


def run_pipeline(input_paths, cfg: PipelineConfig, now_us: Optional[int] = None) -> dict:
    """Full cascade: ingest + every tier + retention. Returns per-stage stats."""
    stats = {"raw": ingest_raw(input_paths, cfg)}
    for tier in cfg.tiers:
        stats[tier] = rollup_tier(tier, cfg)
    if now_us is not None:
        stats["retention"] = prune_retention(cfg, now_us)
    return stats
