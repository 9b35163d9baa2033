"""Per-stage, per-run lineage manifests + resume (SURVEY.md §7 P4).

The reference checkpoints its model with an atomic write-temp-then-
rename (/root/reference/src/Htm/V2.hs:88-94) plus a debounced saver
(/root/reference/src/Htm/Runner.hs:58-86).  The batch-engine analogue:
every stage's output is a partitioned Parquet directory committed by a
manifest JSON written via tmp+``os.replace`` — a stage is "done" iff
its manifest exists and matches (config hash, input fingerprint).  A
rerun skips committed stages; a crash mid-stage leaves no manifest, so
the stage reruns from its (committed) inputs — idempotent by
construction since outputs are rewritten whole before commit.

Granularity note: this commits at stage granularity; at cluster scale
the same manifest scheme applies per partition directory (one manifest
per input shard), which is why outputs are directories of part files,
never one file.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import ray.data as rd


@dataclass
class RunMetrics:
    stages: dict = field(default_factory=dict)

    def record(self, name: str, rows: int, seconds: float, resumed: bool) -> None:
        self.stages[name] = {
            "rows": rows,
            "seconds": round(seconds, 3),
            "rows_per_sec": round(rows / seconds, 1) if seconds > 0 else None,
            "resumed": resumed,
        }


class CheckpointedRun:
    """Stage-output checkpointing for one pipeline run directory.

    Usage::

        run = CheckpointedRun("/tmp/run1", config_hash=cfg.config_hash())
        sigs = run.stage("signatures", lambda: encode(...))   # Dataset
        ...
        run.write_metrics()
    """

    def __init__(self, root: str, config_hash: str):
        self.root = root
        self.config_hash = config_hash
        self.metrics = RunMetrics()
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str, str]:
        out = os.path.join(self.root, name)
        return out, out + ".tmp", os.path.join(self.root, f"{name}.manifest.json")

    def is_committed(self, name: str, input_fingerprint: str = "") -> bool:
        _, _, manifest = self._paths(name)
        if not os.path.exists(manifest):
            return False
        with open(manifest) as f:
            m = json.load(f)
        return (
            m.get("config_hash") == self.config_hash
            and m.get("input_fingerprint") == input_fingerprint
        )

    def stage(
        self, name: str, produce, input_fingerprint: str = ""
    ) -> rd.Dataset:
        """Return the stage's Dataset, recomputing only if not committed."""
        out, tmp, manifest = self._paths(name)
        if self.is_committed(name, input_fingerprint):
            ds = rd.read_parquet(out)
            self.metrics.record(name, ds.count(), 0.0, resumed=True)
            return ds
        t0 = time.perf_counter()
        ds = produce()
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        ds.write_parquet(tmp)
        os.replace(tmp, out)  # atomic commit of the data directory
        rows = rd.read_parquet(out).count()
        payload = {
            "stage": name,
            "config_hash": self.config_hash,
            "input_fingerprint": input_fingerprint,
            "row_count": rows,
        }
        mtmp = manifest + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(payload, f)
        os.replace(mtmp, manifest)  # manifest commit = stage done
        self.metrics.record(name, rows, time.perf_counter() - t0, resumed=False)
        return rd.read_parquet(out)

    def invalidate_from(self, name: str) -> None:
        """Drop a stage's commit (and leave later stages to their own
        fingerprints) — used by tests to simulate partial failure."""
        out, tmp, manifest = self._paths(name)
        for p in (manifest, tmp):
            if os.path.exists(p):
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
        if os.path.exists(out):
            shutil.rmtree(out)

    def write_metrics(self) -> str:
        path = os.path.join(self.root, "metrics.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.metrics.stages, f, indent=2)
        os.replace(tmp, path)
        return path
