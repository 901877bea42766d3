"""Per-partition lineage + checkpoint manifest.

The engine's resume story (north rule): every completed output partition
(tier, source, day) gets one JSONL record with its input fragments, row/byte
counts, QC counters and a content checksum.  On restart, completed partitions
are skipped and un-manifested partition directories are wiped before rewrite,
making the whole pipeline idempotently re-runnable mid-rollup.

This generalizes the reference's two incremental-processing mechanisms —
deterministic overwrite-on-rerun output paths
(/root/reference/tsdat/io/storage/file_system.py:161-179) and
``last_modified``/``modified_since`` mtime scans (file_system.py:85-141) —
into an explicit commit log, which is what a distributed, partially-failing
job needs.

Appends are atomic at the record level (single JSON line, O_APPEND write from
the driver only — workers never touch the manifest)."""

from __future__ import annotations

import json
import os
import shutil
import zlib
from dataclasses import asdict, dataclass, field
from typing import Iterable


@dataclass
class PartitionRecord:
    tier: str
    partition: str  # "source=web/day=2022-04-05"
    inputs: list[str] = field(default_factory=list)
    rows: int = 0
    bytes: int = 0
    files: list[str] = field(default_factory=list)
    checksum: str = ""
    qc_counts: dict = field(default_factory=dict)
    run_id: str = ""
    wall_s: float = 0.0


class Manifest:
    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "_manifest.jsonl")

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def completed(self, tier: str) -> set[str]:
        done = set()
        for r in self.records():
            if r["tier"] == tier:
                if r.get("action") == "pruned":
                    done.discard(r["partition"])
                else:
                    done.add(r["partition"])
        return done

    def append(self, record: PartitionRecord | dict) -> None:
        import time as _time

        os.makedirs(self.root, exist_ok=True)
        rec = asdict(record) if isinstance(record, PartitionRecord) else dict(record)
        rec.setdefault("committed_at", _time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # ------------------------------------------------------------------ utils
    def tier_dir(self, tier: str) -> str:
        return os.path.join(self.root, tier)

    def partition_dir(self, tier: str, partition: str) -> str:
        return os.path.join(self.root, tier, partition)

    def list_partition_dirs(self, tier: str) -> list[str]:
        """Existing 'source=<s>/day=<d>' partition dirs under a tier."""
        base = self.tier_dir(tier)
        out = []
        if not os.path.isdir(base):
            return out
        for s in sorted(os.listdir(base)):
            sdir = os.path.join(base, s)
            if not (os.path.isdir(sdir) and s.startswith("source=")):
                continue
            for d in sorted(os.listdir(sdir)):
                if d.startswith("day=") and os.path.isdir(os.path.join(sdir, d)):
                    out.append(f"{s}/{d}")
        return out

    def wipe_uncommitted(self, tier: str) -> list[str]:
        """Delete partition dirs that exist on disk but have no manifest record
        (partial output from an interrupted run)."""
        done = self.completed(tier)
        wiped = []
        for part in self.list_partition_dirs(tier):
            if part not in done:
                shutil.rmtree(self.partition_dir(tier, part))
                wiped.append(part)
        # clean up empty source dirs
        base = self.tier_dir(tier)
        if os.path.isdir(base):
            for s in os.listdir(base):
                sdir = os.path.join(base, s)
                if os.path.isdir(sdir) and not os.listdir(sdir):
                    os.rmdir(sdir)
        return wiped

    def commit_partitions(
        self, tier: str, inputs: Iterable[str], run_id: str = "", wall_s: float = 0.0
    ) -> list[PartitionRecord]:
        """Scan newly-written partition dirs and append one record each.

        Row/byte counts come from parquet footers (no data read); the checksum
        is a crc32 over (file name, size) pairs — enough to detect partial or
        clobbered partitions on the next resume."""
        import pyarrow.parquet as pq

        done = self.completed(tier)
        new = []
        for part in self.list_partition_dirs(tier):
            if part in done:
                continue
            pdir = self.partition_dir(tier, part)
            files, rows, nbytes, crc = [], 0, 0, 0
            qc_counts: dict = {}
            for fn in sorted(os.listdir(pdir)):
                if fn == "_qc.json":  # QC counter sidecar → lineage record
                    with open(os.path.join(pdir, fn)) as f:
                        qc_counts = json.load(f)
                    continue
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(pdir, fn)
                size = os.path.getsize(fp)
                rows += pq.ParquetFile(fp).metadata.num_rows
                nbytes += size
                crc = zlib.crc32(f"{fn}:{size}".encode(), crc)
                files.append(fn)
            rec = PartitionRecord(
                tier=tier,
                partition=part,
                inputs=sorted(inputs),
                qc_counts=qc_counts,
                rows=rows,
                bytes=nbytes,
                files=files,
                checksum=f"{crc:08x}",
                run_id=run_id,
                wall_s=wall_s,
            )
            self.append(rec)
            new.append(rec)
        return new


    def last_modified(self, tier: str) -> float | None:
        """Latest commit wall-clock for a tier (parity: Storage.last_modified,
        /root/reference/tsdat/io/storage/file_system.py:85-141 — but from the
        commit log, not an mtime scan over every file)."""
        times = [
            r["committed_at"]
            for r in self.records()
            if r["tier"] == tier and r.get("action") != "pruned" and "committed_at" in r
        ]
        return max(times) if times else None

    def modified_since(self, tier: str, since: float) -> list[str]:
        """Partitions (re)committed after ``since`` — the incremental-
        processing hook (parity: Storage.modified_since): a downstream
        consumer re-processes exactly these."""
        out: dict[str, float] = {}
        for r in self.records():
            if r["tier"] != tier:
                continue
            if r.get("action") == "pruned":
                out.pop(r["partition"], None)
            elif "committed_at" in r:
                out[r["partition"]] = r["committed_at"]
        return sorted(p for p, t in out.items() if t > since)
