"""Stage protocol + pipeline compilation (SURVEY.md §2.7) and the
progress/ETA estimator (§2.2 M8)."""

import pyarrow as pa
import ray.data as rd

from simhash_ray.config import SimHashConfig
from simhash_ray.stages.base import Stage, StatelessStage, compile_pipeline
from simhash_ray.stages.encode import SimHashEncoder
from simhash_ray.state.progress import (
    ProgressEstimator,
    pretty_proc,
    pretty_time,
)


def test_encoder_conforms_and_pipeline_compiles():
    # defined inside the test: pytest test modules are not importable
    # from Ray workers, so a module-level class would pickle by
    # reference and the actor pool would never construct
    class UpperStage(StatelessStage):
        """Toy custom stage: uppercases a column."""

        def __init__(self, col="caption"):
            self.col = col

        def process_batch(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.set_column(
                batch.column_names.index(self.col),
                self.col,
                pc.utf8_upper(batch[self.col]),
            )

    enc = SimHashEncoder(SimHashConfig())
    assert isinstance(enc, Stage)
    assert enc.checkpoint() == {"config_hash": SimHashConfig().config_hash()}

    ds = rd.from_arrow(
        pa.table({"caption": pa.array(["hello world", "another doc here"])})
    )
    out = compile_pipeline(
        ds,
        [(UpperStage, {}), (SimHashEncoder, {"cfg": SimHashConfig()})],
        concurrency=(1, 2),
    ).to_pandas()
    assert list(out.columns) == ["caption", "simhash"]
    assert out["caption"].tolist() == ["HELLO WORLD", "ANOTHER DOC HERE"]
    # signatures equal the direct (uncompiled) stage on the same input
    direct = SimHashEncoder(SimHashConfig())(
        pa.table({"caption": pa.array(["HELLO WORLD", "ANOTHER DOC HERE"])})
    )["simhash"].to_pylist()
    assert out["simhash"].tolist() == direct


def test_pretty_formatting_matches_reference_shapes():
    assert pretty_time(3) == "3s"
    assert pretty_time(63) == "1m 3s"
    assert pretty_time(3723) == "1h 2m 3s"
    assert pretty_proc(3, 2) == "66.66%"  # the reference transcript value
    assert pretty_proc(0, 0) == "0.0%"


def test_progress_estimator_eta_and_throttle():
    est = ProgressEstimator(total=10, name="enc", min_interval_s=3600)
    est.update(5)
    eta = est.eta_seconds()
    assert eta is not None and eta >= 0
    lines = []
    assert est.maybe_emit(sink=lines.append)  # first emit passes
    assert not est.maybe_emit(sink=lines.append)  # throttled
    assert est.maybe_emit(force=True, sink=lines.append)
    assert len(lines) == 2
    assert "enc 5/10 50.0%" in lines[0]
