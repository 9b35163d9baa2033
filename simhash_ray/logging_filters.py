"""Targeted log hygiene for a known-benign Ray Data sort artifact.

Every ``map_groups``-style stage in this repo emits a TYPED empty table
on every empty exit (``_EMPTY_*`` constants; ``stages.base.map_groups_typed``
pins the empty-partition schema too).  The one remaining producer of
zero-column empty blocks is Ray's own sort exchange:

- ``arrow_block.py::sort_and_partition`` returns ``pa.table({})`` per
  output partition when a mapper's input block is empty, and
- ``arrow_block.py::merge_sorted_blocks`` returns ``pa.table({})`` when
  every mapper block for a reducer range is empty (ray 2.49.2,
  ``ray/data/_internal/arrow_block.py:168,394,409``).

Both happen whenever a sort range holds no rows — routine for
low-cardinality group keys (part ∈ [0, n_parts)) — and are harmless:
the blocks are empty, so no row ever carries the wrong schema.  The
streaming executor still logs a "RefBundle with a different schema"
warning per occurrence, which buries real schema drift in noise.  This
filter drops exactly that case (empty new schema) and nothing else: a
warning with a NON-empty conflicting schema — the genuinely dangerous
kind — still surfaces.
"""

from __future__ import annotations

import logging

_EXECUTOR_LOGGER = "ray.data._internal.execution.streaming_executor_state"


class _BenignEmptySchemaDrift(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg and "new schema: ." in msg
        )


def install_empty_schema_drift_filter() -> None:
    """Idempotently drop the empty-new-schema RefBundle warning (see
    module docstring).  Called by bench.py and the CLI; library code
    never mutates logging on import."""
    logger = logging.getLogger(_EXECUTOR_LOGGER)
    if not any(isinstance(f, _BenignEmptySchemaDrift) for f in logger.filters):
        logger.addFilter(_BenignEmptySchemaDrift())
