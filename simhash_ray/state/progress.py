"""Human progress/ETA formatting (SURVEY.md §2.2 M8).

Re-expresses the reference's progress estimator: percentage with two
decimals (/root/reference/src/Htm/Model.hs:130-131 ``prettyProc``),
``h m s`` wall formatting (/root/reference/src/Htm/Utils.hs:66-74
``prettyTime``), and the linear-extrapolation remaining-time rule
``spent / processed * total − spent``
(/root/reference/src/Htm/Model.hs:186-188 ``calcSpent``), throttled to
once per interval like the reference's 60-second timer gate
(/root/reference/src/Htm/Model.hs:153-157).

Driver-side by design: Ray Data's own per-operator progress bars cover
the streaming stages; this estimator narrates multi-stage *pipelines*
(one ``update`` per stage or shard, e.g. from sharded_stage loops).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


def pretty_time(seconds: float) -> str:
    """``1h 2m 3s`` — integer-second resolution like the reference."""
    t0 = max(0, int(seconds))
    s = t0 % 60
    t1 = t0 // 60
    m = t1 % 60
    h = t1 // 60
    if h > 0:
        return f"{h}h {m}m {s}s"
    if m > 0:
        return f"{m}m {s}s"
    return f"{s}s"


def pretty_proc(total: int, proc: int) -> str:
    """Two-decimal floored percentage (``66.66%`` in the reference's
    sample transcript, README.md:46-55)."""
    prec = proc / total if total else 0.0
    return f"{int(prec * 10000) / 100}%"


@dataclass
class ProgressEstimator:
    """Linear-extrapolation ETA over ``total`` units of work."""

    total: int
    name: str = "progress"
    min_interval_s: float = 60.0
    started_at: float = field(default_factory=time.monotonic)
    processed: int = 0
    _last_emit: float = field(default=float("-inf"))

    def update(self, n: int = 1) -> None:
        self.processed += n

    def spent(self) -> float:
        return time.monotonic() - self.started_at

    def eta_seconds(self) -> float | None:
        """``spent/processed*total − spent`` (Model.hs calcSpent)."""
        if self.processed <= 0:
            return None
        spent = self.spent()
        return spent / self.processed * self.total - spent

    def line(self) -> str:
        eta = self.eta_seconds()
        tail = f" ETA {pretty_time(eta)}" if eta is not None else ""
        return (
            f"{self.name} {self.processed}/{self.total} "
            f"{pretty_proc(self.total, self.processed)} "
            f"Spent {pretty_time(self.spent())}{tail}"
        )

    def maybe_emit(self, force: bool = False, sink=print) -> bool:
        """Throttled narration (the reference's 60 s timer gate)."""
        now = time.monotonic()
        if not force and now - self._last_emit < self.min_interval_s:
            return False
        self._last_emit = now
        sink(self.line())
        return True
