"""Line-oriented corpus sources: the reference engine's native input.

The reference streams ``label, message`` text lines
(``readLineAndDo``, reference ``src/Htm/Utils.hs:44-54``) and splits
each line at the FIRST comma (``splitLabelAndMsg``,
``src/Htm/Utils.hs:38-42``).  The north-rule input is a table, so the
flagship pipelines read Lance/Parquet (``sources/tables.py``) — but a
reference user's existing corpora are these line files, and this module
lets them run every pipeline over those files unchanged:
``read_label_lines`` parses them into the same two-column Dataset shape
the text stages consume.

Reference parse semantics, mirrored exactly (including the quirk):

* ``label = strip(takeWhile (/= ','))`` — text before the first comma,
  whitespace-stripped.
* ``msg = strip(drop(len(label) + 1))`` — the drop count is the
  STRIPPED label's length + 1 measured from the start of the ORIGINAL
  line (``Utils.hs:40-42``).  When the pre-comma prefix carries leading
  whitespace (``" foo , bar"``) the reference therefore re-includes the
  prefix's own tail in the message (``"o , bar"``); we reproduce that
  byte-for-byte so corpora round-trip identically.
* Rows with an empty label OR empty message are skipped
  (``unless (T.null label || T.null str)``, ``Utils.hs:51``) — which
  also covers blank lines and comma-less lines (no comma → everything
  is label, message empty → skipped).

Lengths are Unicode code points (Haskell ``Text``), matching Python
``str`` indexing — not bytes.

JSONL / CSV adapters (`read_jsonl`, `read_csv_table`, `write_jsonl`)
round out the line-based formats so a corpus exported as JSON-lines or
CSV feeds the same pipelines; both prune columns at (or immediately
after) the read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = [
    "parse_label_lines",
    "read_label_lines",
    "read_jsonl",
    "read_csv_table",
    "write_jsonl",
    "write_label_lines",
]


def _split_label_msg(lines: pd.Series) -> pd.DataFrame:
    """Vectorized ``splitLabelAndMsg`` over a string Series.

    Common case (no whitespace around the pre-comma prefix) is pure
    pandas string kernels; only rows where the prefix carries
    surrounding whitespace — where the reference's stripped-length drop
    quirk changes the answer — fall back to per-row slicing.
    """
    s = lines.fillna("")
    parts = s.str.partition(",")
    prefix = parts[0]
    label = prefix.str.strip()
    msg = parts[2].str.strip()
    # The reference drops len(stripped_label)+1 chars from the ORIGINAL
    # line; partition's "rest" equals that only when the prefix is
    # already stripped.  Re-slice the (rare) quirky rows.
    quirky = (prefix.str.len() != label.str.len()) & (parts[1] == ",")
    if quirky.any():
        idx = np.flatnonzero(quirky.to_numpy())
        raw = s.to_numpy()
        lab = label.to_numpy()
        fixed = [raw[i][len(lab[i]) + 1 :].strip() for i in idx]
        m = msg.to_numpy(dtype=object, copy=True)
        m[idx] = fixed
        msg = pd.Series(m, index=s.index)
    keep = (label.str.len() > 0) & (msg.str.len() > 0)
    return pd.DataFrame({"label": label[keep], "text": msg[keep]})


def parse_label_lines(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Parse a Dataset of raw text lines (as from ``ray.data.read_text``)
    into ``(label, text)`` rows with the reference's exact skip/strip
    semantics."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return _split_label_msg(batch[text_col])

    return ds.map_batches(fn, batch_format="pandas")


def read_label_lines(paths) -> rd.Dataset:
    """Stream ``label, message`` line files into a ``(label, text)``
    Dataset — the Ray-native ``readLineAndDo``.  ``paths`` may be one
    file, a directory, or a list; blocks parallelize per file chunk, so
    a 100-TB corpus of line files streams without any driver pass."""
    return parse_label_lines(rd.read_text(paths), text_col="text")


def read_jsonl(paths, columns=None) -> rd.Dataset:
    """JSON-lines reader; ``columns`` prunes immediately after parse
    (Arrow's JSON reader has no projection pushdown)."""
    ds = rd.read_json(paths)
    return ds.select_columns(list(columns)) if columns else ds


def read_csv_table(paths, columns=None) -> rd.Dataset:
    """CSV reader with column pruning."""
    ds = rd.read_csv(paths)
    return ds.select_columns(list(columns)) if columns else ds


def write_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Partitioned JSON-lines sink (one file per block — resumable,
    never one giant file)."""
    ds.write_json(out_dir)


def write_label_lines(ds: rd.Dataset, out_dir: str,
                      label_col: str = "label", text_col: str = "text") -> None:
    """Export ``(label, text)`` rows back to the reference's line
    format.  Newlines inside the text are collapsed to spaces (the line
    format cannot carry them); labels must be comma-free to round-trip
    (the parse splits at the first comma) — enforced loudly."""

    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def fmt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        labels = batch[label_col]
        if pc.any(pc.match_substring(labels, ",")).as_py():
            raise ValueError(
                f"{label_col} values contain ',' — they cannot round-trip "
                "through the 'label, message' line format"
            )
        text = pc.replace_substring_regex(batch[text_col], r"[\r\n]+", " ")
        line = pc.binary_join_element_wise(
            pc.cast(labels, pa.string()), text, ", "
        )
        # one part file per block (executed inside the task — the write
        # is distributed; pyarrow's CSV writer can't emit unquoted
        # commas, so emit the lines directly)
        part = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.txt")
        body = "\n".join(line.to_pylist())
        with open(part, "w", encoding="utf-8") as f:
            if body:
                f.write(body + "\n")
        return pa.table({"n": pa.array([len(line)], type=pa.int64())})

    # consume to run the write; sum of n = rows written
    ds.map_batches(fmt, batch_format="pyarrow").sum("n")
