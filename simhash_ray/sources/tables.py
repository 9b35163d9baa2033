"""Table readers: Lance-or-Parquet format adapter (SURVEY.md §7.6).

The north-rule input is a Lance table of image+caption pairs; ``lance``
is not importable in this sandbox (no network pip), so the adapter
prefers ``ray.data.read_lance`` when the package exists and otherwise
reads Parquet with the identical Arrow schema.  All downstream logic is
format-agnostic (Arrow batches).

Column pruning happens here: the flagship pipeline reads only
``(image_id, caption, phash)`` — the wide ``bytes`` column never leaves
storage until the final survivor rejoin (SURVEY.md §7.7).
"""

from __future__ import annotations

import os

import ray.data as rd

try:  # pragma: no cover - lance not installable in sandbox
    import lance  # noqa: F401

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def have_lance() -> bool:
    return _HAVE_LANCE


def read_table(path_or_dir: str, name: str | None = None, columns=None) -> rd.Dataset:
    """Read a logical table as a Ray Dataset.

    ``path_or_dir`` may be a directory containing ``<name>.lance`` /
    ``<name>.parquet``, or a direct file path.  ``columns`` prunes at
    the read (projection + row-group pushdown for Parquet).
    """
    if name is not None:
        lance_path = os.path.join(path_or_dir, f"{name}.lance")
        pq_path = os.path.join(path_or_dir, f"{name}.parquet")
    else:
        lance_path = pq_path = path_or_dir
    if _HAVE_LANCE and os.path.exists(lance_path):
        return rd.read_lance(lance_path, columns=columns)
    return rd.read_parquet(pq_path, columns=columns)


def write_table(ds: rd.Dataset, out_dir: str) -> None:
    """Partitioned sink: directory of part files (never one giant file)."""
    if _HAVE_LANCE:  # pragma: no cover
        ds.write_lance(out_dir)
    else:
        ds.write_parquet(out_dir)
