"""Lance read-path contract (round-4 verdict item 3 / SURVEY §7.6).

The north-rule input format is Lance, but ``lance`` is not installable
in this sandbox (no network pip) — so every green run so far exercised
the Parquet fallback only.  Two guards close the gap as far as the
sandbox allows:

- ``test_lance_roundtrip_when_available`` runs the REAL branch
  (``write → read_table → parity vs Parquet``) whenever the package
  exists, and otherwise skips with an explicit reason the CI log shows.
- ``test_read_table_prefers_lance_branch`` executes ``read_table``'s
  format-dispatch logic deterministically WITHOUT the package, by
  injecting a recording fake for ``ray.data.read_lance`` — pinning
  that a ``<name>.lance`` path wins over ``<name>.parquet`` when the
  package reports available, that ``columns=`` pruning is forwarded,
  and that the Parquet fallback engages when either the package or the
  ``.lance`` path is missing.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from simhash_ray.sources import tables


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "image_id": pa.array(["img0", "img1", "img2"]),
            "caption": pa.array(["a cat", "a dog", "a cat"]),
            "phash": pa.array([11, 22, 33], type=pa.int64()),
        }
    )


@pytest.mark.skipif(
    not tables.have_lance(),
    reason="lance not installable in this sandbox (no network pip); "
    "the real branch runs wherever the package exists — see SURVEY §7.6",
)
def test_lance_roundtrip_when_available(tmp_path):
    import lance

    t = _sample_table()
    ldir = tmp_path / "images.lance"
    lance.write_dataset(t, str(ldir))
    pq.write_table(t, str(tmp_path / "images.parquet"))
    via_lance = (
        tables.read_table(str(tmp_path), "images")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    os.rename(str(ldir), str(tmp_path / "moved.lance"))  # force fallback
    via_parquet = (
        tables.read_table(str(tmp_path), "images")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert via_lance.equals(via_parquet)


def test_read_table_prefers_lance_branch(tmp_path, monkeypatch):
    t = _sample_table()
    pq.write_table(t, str(tmp_path / "images.parquet"))
    ldir = tmp_path / "images.lance"
    ldir.mkdir()  # the path existence check is all the branch needs

    calls: list[tuple[str, object]] = []

    def fake_read_lance(path, columns=None):
        calls.append((path, columns))
        return rd.from_arrow(t.select(columns) if columns else t)

    monkeypatch.setattr(tables, "_HAVE_LANCE", True)
    monkeypatch.setattr(tables.rd, "read_lance", fake_read_lance, raising=False)

    out = tables.read_table(str(tmp_path), "images", columns=["image_id", "phash"])
    assert calls == [(str(ldir), ["image_id", "phash"])]
    assert out.schema().names == ["image_id", "phash"]
    assert out.count() == 3

    # no .lance path on disk -> parquet fallback even with lance "present"
    calls.clear()
    os.rename(str(ldir), str(tmp_path / "gone.lance"))
    out2 = tables.read_table(str(tmp_path), "images", columns=["image_id"])
    assert calls == []  # read_lance not called
    assert out2.count() == 3 and out2.schema().names == ["image_id"]

    # package absent -> parquet fallback even when the .lance path exists
    monkeypatch.setattr(tables, "_HAVE_LANCE", False)
    os.rename(str(tmp_path / "gone.lance"), str(ldir))
    out3 = tables.read_table(str(tmp_path), "images")
    assert calls == []
    assert out3.count() == 3
