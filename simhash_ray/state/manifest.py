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

Two granularities:

- ``stage``: one manifest per stage output directory (round 1).
- ``sharded_stage``: one manifest per SHARD of a stage — the
  cluster-scale analogue of the reference's debounced saver
  (/root/reference/src/Htm/Runner.hs:58-86): at 100 TB a stage is
  hours, so a killed run must resume at the first uncommitted shard,
  not recompute the stage.  Each shard commits (data dir, then
  manifest) atomically and independently; the stage is done when every
  shard manifest matches (config hash, input fingerprint).
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

    def _drop_shard_manifests(self, name: str) -> None:
        prefix = f"{name}.shard_"
        for f in os.listdir(self.root):
            if f.startswith(prefix) and f.endswith(".manifest.json"):
                os.remove(os.path.join(self.root, f))

    def is_committed(self, name: str, input_fingerprint: str = "") -> bool:
        out, _, manifest = self._paths(name)
        if not os.path.exists(manifest) or not os.path.isdir(out):
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
        # a prior SHARDED run of this stage left per-shard manifests
        # (+ shard dirs inside `out`, removed above): drop them so a
        # later sharded rerun can't trust stale shard commits
        self._drop_shard_manifests(name)
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

    def _shard_paths(self, name: str, i: int) -> tuple[str, str, str]:
        out = os.path.join(self.root, name, f"shard_{i:05d}")
        return out, out + ".tmp", os.path.join(
            self.root, f"{name}.shard_{i:05d}.manifest.json"
        )

    def shard_is_committed(
        self, name: str, i: int, input_fingerprint: str = "", n_shards: int = 0
    ) -> bool:
        """A shard manifest matches only if the whole decomposition
        matches: the same config, input AND total shard count.  A rerun
        with a different ``n_shards`` changes every shard's row range,
        so manifests committed under the old decomposition must not be
        trusted — skipping them would silently duplicate and/or drop
        rows in the unioned stage output."""
        out, _, manifest = self._shard_paths(name, i)
        if not os.path.exists(manifest) or not os.path.isdir(out):
            return False
        with open(manifest) as f:
            m = json.load(f)
        return (
            m.get("config_hash") == self.config_hash
            and m.get("input_fingerprint") == input_fingerprint
            and m.get("n_shards") == n_shards
        )

    def sharded_stage(
        self, name: str, shard_fns, input_fingerprint: str = ""
    ) -> rd.Dataset:
        """Per-partition checkpointing: ``shard_fns[i]() -> Dataset``
        produces shard i's rows; each shard commits its Parquet dir +
        manifest independently, so a kill after k of n shards resumes
        at shard k — committed shards are never recomputed or
        rewritten.  Returns the union read of all shard directories.

        Shard decomposition must be deterministic w.r.t. (input,
        shard count) — e.g. one shard per input file / row-group range.
        The shard count is folded into every shard manifest, so a rerun
        with a different ``len(shard_fns)`` recomputes all shards
        rather than silently mixing two decompositions."""
        from .progress import ProgressEstimator

        # a prior NON-sharded run of this stage committed parquet files
        # directly in the stage dir (where shard dirs nest): drop its
        # manifest and loose files, else a later stage-mode read of the
        # directory would double-count rows from both layouts
        out_stage, _, stage_manifest = self._paths(name)
        if os.path.exists(stage_manifest):
            os.remove(stage_manifest)
        if os.path.isdir(out_stage):
            for f in os.listdir(out_stage):
                fp = os.path.join(out_stage, f)
                if os.path.isfile(fp):
                    os.remove(fp)

        t0 = time.perf_counter()
        n_resumed = 0
        progress = ProgressEstimator(total=len(shard_fns), name=f"stage {name}")
        for i, fn in enumerate(shard_fns):
            out, tmp, manifest = self._shard_paths(name, i)
            if self.shard_is_committed(name, i, input_fingerprint, len(shard_fns)):
                n_resumed += 1
                progress.update()
                continue
            ds = fn()
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            if os.path.exists(out):
                shutil.rmtree(out)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            ds.write_parquet(tmp)
            os.replace(tmp, out)  # atomic shard-data commit
            payload = {
                "stage": name,
                "shard": i,
                "n_shards": len(shard_fns),
                "config_hash": self.config_hash,
                "input_fingerprint": input_fingerprint,
                "row_count": rd.read_parquet(out).count(),
            }
            mtmp = manifest + ".tmp"
            with open(mtmp, "w") as f:
                json.dump(payload, f)
            os.replace(mtmp, manifest)  # shard done
            progress.update()
            progress.maybe_emit()  # throttled shard-level ETA narration
        # read_parquet takes files, not a list of directories — expand
        files: list[str] = []
        for i in range(len(shard_fns)):
            d = self._shard_paths(name, i)[0]
            files.extend(
                sorted(
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
            )
        ds = rd.read_parquet(files)
        self.metrics.record(
            name, ds.count(), time.perf_counter() - t0,
            resumed=(n_resumed == len(shard_fns)),
        )
        self.metrics.stages[name]["shards_resumed"] = n_resumed
        self.metrics.stages[name]["shards_total"] = len(shard_fns)
        return ds

    def invalidate_from(self, name: str) -> None:
        """Drop a stage's commit (and leave later stages to their own
        fingerprints) — used by tests to simulate partial failure."""
        out, tmp, manifest = self._paths(name)
        for p in (manifest, tmp):
            if os.path.exists(p):
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
        if os.path.exists(out):
            shutil.rmtree(out)
        self._drop_shard_manifests(name)

    def write_metrics(self) -> str:
        path = os.path.join(self.root, "metrics.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.metrics.stages, f, indent=2)
        os.replace(tmp, path)
        return path
