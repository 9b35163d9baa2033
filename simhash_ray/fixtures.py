"""Deterministic image+caption fixture generator (FIXTURES.md §1).

Synthesizes the north-rule input table
``(image_id, bytes, w, h, fmt, caption, phash)`` plus a companion
``truth`` table ``(image_id, cluster_id, kind)`` with planted duplicate
clusters, at any scale, from a single seed — no external data.

Planted mix (of n_rows):
  65% unique            singleton clusters
  10% exact_dup         identical bytes+caption under a new image_id
  15% near_dup_caption  ≤2 word edits, image re-encoded in another
                        lossless fmt (phash unchanged)
   5% near_dup_image    pixels perturbed within the phash Hamming ball,
                        caption unchanged (simhash unchanged)
   5% near_dup_both     both edits (neither signature exact — exercises
                        the LSH path, not just exact-sig collapse)

Edits are *certified*: a batch retry loop re-rolls any edit whose
signature lands outside the pinned Hamming ball (text τ from
``DedupConfig.text_lsh``, image τ from ``image_lsh``), so planted
recall is measurable exactly.  The dup predicate the truth encodes is
the pipeline's: near in caption space OR near in image space.

Skew variant (``hot_frac``): one hot caption repeated in a fraction of
rows (distinct images) — a pathological LSH bucket exercising the
exact-signature collapse + salting path (SURVEY.md §2.5).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import DEFAULT_CONFIG, DedupConfig
from .imgcodec import encode_image
from .phash import gray32_from_rgb, phash_batch_32, phash_to_uint64
from .simhash import hamming64, simhash_batch

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

TRUTH_SCHEMA = pa.schema(
    [("image_id", pa.string()), ("cluster_id", pa.int64()), ("kind", pa.string())]
)


@dataclass(frozen=True)
class FixtureSpec:
    n_rows: int = 1000
    seed: int = 42
    sizes: tuple[int, ...] = (32, 64, 96)  # side lengths; multiples of 32
    formats: tuple[str, ...] = ("raw", "bmp", "png")
    hot_frac: float = 0.0  # skew stressor: fraction of rows with one hot caption
    frac_exact: float = 0.10
    frac_near_caption: float = 0.15
    frac_near_image: float = 0.05
    frac_near_both: float = 0.05
    # mirrored copies with fresh unrelated captions: invisible to BOTH
    # north-rule spaces (plain phash is not mirror-invariant), found
    # only by the dihedral-canonical hash (pipelines.dedup_images
    # .dedup_images_dihedral) — default 0 keeps the standard mix
    frac_mirror: float = 0.0

    def tag(self) -> str:
        import hashlib

        payload = json.dumps(asdict(self), sort_keys=True, default=list).encode()
        return hashlib.sha256(payload).hexdigest()[:12]


def _make_vocab(n: int = 2000, seed: int = 1234) -> list[str]:
    """Deterministic pseudo-words with diverse character n-grams (a
    numeric vocab like 'tok0042' shares almost all 3-grams across
    tokens, which collapses char-gram-weighted SimHash distances)."""
    r = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out, seen = [], set()
    while len(out) < n:
        w = "".join(letters[r.integers(0, 26, int(r.integers(3, 10)))])
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


_VOCAB = _make_vocab()


def _edit_caption(rng: np.random.Generator, tokens: list[str], n_ops: int) -> list[str]:
    toks = list(tokens)
    for _ in range(n_ops):
        if len(toks) < 2:
            break
        op = rng.integers(0, 4)
        i = int(rng.integers(0, len(toks) - 1))
        if op == 0:  # swap adjacent
            toks[i], toks[i + 1] = toks[i + 1], toks[i]
        elif op == 1:  # substitute
            toks[i] = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
        elif op == 2 and len(toks) > 5:  # drop
            del toks[i]
        else:  # insert
            toks.insert(i, _VOCAB[int(rng.integers(0, len(_VOCAB)))])
    return toks


def generate_fixture(
    spec: FixtureSpec, cfg: DedupConfig = DEFAULT_CONFIG
) -> dict[str, pa.Table]:
    rng = np.random.default_rng(spec.seed)
    n = spec.n_rows
    n_hot = int(n * spec.hot_frac)
    n_exact = int(n * spec.frac_exact)
    n_ncap = int(n * spec.frac_near_caption)
    n_nimg = int(n * spec.frac_near_image)
    n_nboth = int(n * spec.frac_near_both)
    n_mirror = int(n * spec.frac_mirror)
    n_orig = n - n_hot - n_exact - n_ncap - n_nimg - n_nboth - n_mirror
    if n_orig <= 0:
        raise ValueError("n_rows too small for the planted mix")

    # ---- originals -------------------------------------------------------
    cap_lens = rng.integers(5, 31, n_orig)
    cap_tok_idx = rng.integers(0, len(_VOCAB), int(cap_lens.sum()))
    captions: list[str] = []
    pos = 0
    for L in cap_lens:
        captions.append(" ".join(_VOCAB[j] for j in cap_tok_idx[pos : pos + L]))
        pos += L

    sizes = np.array(spec.sizes, dtype=np.int64)
    side = sizes[rng.integers(0, len(sizes), n_orig)]
    fmts = np.array(spec.formats)
    fmt_idx = rng.integers(0, len(fmts), n_orig)
    # bulk pixel gen + batched phash, grouped by side (vectorized; the
    # per-image path was the generator bottleneck at bench scale)
    pixels: list[np.ndarray | None] = [None] * n_orig
    phash = np.zeros(n_orig, dtype=np.int64)
    for s in np.unique(side):
        rows = np.flatnonzero(side == s)
        for lo in range(0, len(rows), 8192):
            chunk = rows[lo : lo + 8192]
            block = rng.integers(0, 256, (len(chunk), s, s, 3), dtype=np.uint8)
            phash[chunk] = phash_batch_32(gray32_from_rgb(block))
            for j, r in enumerate(chunk):
                pixels[r] = block[j]

    # dup sources come from a deterministic prefix of the originals
    n_dups = n_exact + n_ncap + n_nimg + n_nboth
    n_src_pool = max(1, min(n_orig, max(n_dups, n_orig // 5)))

    rows_id: list[str] = []
    rows_bytes: list[bytes] = []
    rows_w: list[int] = []
    rows_h: list[int] = []
    rows_fmt: list[str] = []
    rows_cap: list[str] = []
    rows_ph: list[int] = []
    truth_cluster: list[int] = []
    truth_kind: list[str] = []

    def add_row(pix, fmt, cap, ph, cluster, kind):
        idx = len(rows_id)
        rows_id.append(f"img{idx:09d}")
        rows_bytes.append(encode_image(pix, fmt))
        rows_h.append(pix.shape[0])
        rows_w.append(pix.shape[1])
        rows_fmt.append(fmt)
        rows_cap.append(cap)
        rows_ph.append(int(ph))
        truth_cluster.append(cluster)
        truth_kind.append(kind)

    is_source = np.zeros(n_orig, dtype=bool)
    src_of = {
        "exact_dup": rng.integers(0, n_src_pool, n_exact),
        "near_dup_caption": rng.integers(0, n_src_pool, n_ncap),
        "near_dup_image": rng.integers(0, n_src_pool, n_nimg),
        "near_dup_both": rng.integers(0, n_src_pool, n_nboth),
        # size-0 draws leave the rng state untouched, so default specs
        # generate byte-identical fixtures
        "mirror_dup": rng.integers(0, n_src_pool, n_mirror),
    }
    for arr in src_of.values():
        is_source[arr] = True

    for i in range(n_orig):
        add_row(
            pixels[i],
            str(fmts[fmt_idx[i]]),
            captions[i],
            phash[i],
            i,
            "original" if is_source[i] else "unique",
        )

    # ---- certified caption edits (batch retry) ---------------------------
    tau_text = cfg.text_lsh.hamming_tau
    sims = simhash_batch(pa.array(captions), cfg.simhash)

    def certified_caption_edits(src_idx: np.ndarray) -> list[str]:
        out = [None] * len(src_idx)
        pending = list(range(len(src_idx)))
        for attempt in range(6):
            if not pending:
                break
            n_ops = max(1, 2 - attempt)  # milder edits on retry
            cands = [
                " ".join(_edit_caption(rng, captions[src_idx[j]].split(), n_ops))
                for j in pending
            ]
            sig = simhash_batch(pa.array(cands), cfg.simhash)
            ref = sims[src_idx[pending]]
            ok = hamming64(sig, ref) <= tau_text
            still = []
            for j, cand, good in zip(pending, cands, ok):
                if good:
                    out[j] = cand
                else:
                    still.append(j)
            pending = still
        for j in pending:  # fallback: unchanged caption (Hamming 0)
            out[j] = captions[src_idx[j]]
        return out

    # ---- certified pixel perturbation ------------------------------------
    tau_img = cfg.image_lsh.hamming_tau

    def certified_pixel_perturb(src_idx: np.ndarray) -> list[np.ndarray]:
        """Batch amp-ladder: try noise amplitude 6, re-try failures at
        3, then 1, then fall back to identical pixels."""
        out: list[np.ndarray | None] = [None] * len(src_idx)
        pending = np.arange(len(src_idx))
        for amp in (6, 3, 1):
            if len(pending) == 0:
                break
            sides = np.array([pixels[src_idx[p]].shape[0] for p in pending])
            still = []
            for s in np.unique(sides):
                grp = pending[sides == s]
                base = np.stack([pixels[src_idx[p]] for p in grp])
                noise = rng.integers(-amp, amp + 1, base.shape, dtype=np.int16)
                cand = np.clip(base.astype(np.int16) + noise, 0, 255).astype(
                    np.uint8
                )
                ph1 = phash_batch_32(gray32_from_rgb(cand))
                ph0 = phash[src_idx[grp]]
                ok = (
                    hamming64(phash_to_uint64(ph1), phash_to_uint64(ph0))
                    <= tau_img
                )
                for j, p in enumerate(grp):
                    if ok[j]:
                        out[p] = cand[j]
                    else:
                        still.append(p)
            pending = np.array(sorted(still), dtype=np.int64)
        for p in pending:  # fallback: identical pixels (Hamming 0)
            out[p] = pixels[src_idx[p]]
        return out

    # exact dups
    for j in src_of["exact_dup"]:
        add_row(
            pixels[j], str(fmts[fmt_idx[j]]), captions[j], phash[j], int(j), "exact_dup"
        )
    # caption near-dups: re-encode losslessly in the next fmt
    ncap_caps = certified_caption_edits(src_of["near_dup_caption"])
    for j, cap in zip(src_of["near_dup_caption"], ncap_caps):
        fmt2 = str(fmts[(fmt_idx[j] + 1) % len(fmts)])
        add_row(pixels[j], fmt2, cap, phash[j], int(j), "near_dup_caption")
    def _batch_phash(pix_list: list[np.ndarray]) -> np.ndarray:
        out = np.zeros(len(pix_list), dtype=np.int64)
        sides_ = np.array([p.shape[0] for p in pix_list])
        for s in np.unique(sides_):
            rows = np.flatnonzero(sides_ == s)
            stack = np.stack([pix_list[r] for r in rows])
            out[rows] = phash_batch_32(gray32_from_rgb(stack))
        return out

    # image near-dups
    nimg_pix = certified_pixel_perturb(src_of["near_dup_image"])
    nimg_ph = _batch_phash(nimg_pix) if nimg_pix else np.empty(0, dtype=np.int64)
    for j, pix, ph1 in zip(src_of["near_dup_image"], nimg_pix, nimg_ph):
        add_row(pix, str(fmts[fmt_idx[j]]), captions[j], ph1, int(j), "near_dup_image")
    # both
    nboth_caps = certified_caption_edits(src_of["near_dup_both"])
    nboth_pix = certified_pixel_perturb(src_of["near_dup_both"])
    nboth_ph = _batch_phash(nboth_pix) if nboth_pix else np.empty(0, dtype=np.int64)
    for j, cap, pix, ph1 in zip(
        src_of["near_dup_both"], nboth_caps, nboth_pix, nboth_ph
    ):
        add_row(pix, str(fmts[fmt_idx[j]]), cap, ph1, int(j), "near_dup_both")

    # mirror dups: horizontal flip + FRESH unrelated caption — neither
    # north-rule space links them to the source (mirroring scrambles
    # the plain phash's DCT signs), so they pin the dihedral-canonical
    # space's added recall; truth still records cluster = source
    if n_mirror:
        m_lens = rng.integers(5, 31, n_mirror)
        m_tok = rng.integers(0, len(_VOCAB), int(m_lens.sum()))
        mcaps: list[str] = []
        mpos = 0
        for L in m_lens:
            mcaps.append(" ".join(_VOCAB[t] for t in m_tok[mpos : mpos + L]))
            mpos += L
        for j, cap in zip(src_of["mirror_dup"], mcaps):
            pix = np.ascontiguousarray(pixels[j][:, ::-1])
            ph1 = int(phash_batch_32(gray32_from_rgb(pix)[None])[0])
            add_row(pix, str(fmts[fmt_idx[j]]), cap, ph1, int(j), "mirror_dup")

    # ---- hot-caption skew rows ------------------------------------------
    if n_hot:
        hot_cap = "hot " + " ".join(_VOCAB[:8])
        hot_cluster = n_orig + 1_000_000  # its own cluster id space
        for _ in range(n_hot):
            s = int(sizes[rng.integers(0, len(sizes))])
            pix = rng.integers(0, 256, (s, s, 3), dtype=np.uint8)
            ph1 = phash_batch_32(gray32_from_rgb(pix)[None])[0]
            add_row(
                pix,
                str(fmts[rng.integers(0, len(fmts))]),
                hot_cap,
                ph1,
                hot_cluster,
                "hot_caption",
            )

    images = pa.table(
        {
            "image_id": rows_id,
            "bytes": rows_bytes,
            "w": rows_w,
            "h": rows_h,
            "fmt": rows_fmt,
            "caption": rows_cap,
            "phash": rows_ph,
        },
        schema=IMAGE_SCHEMA,
    )
    truth = pa.table(
        {"image_id": rows_id, "cluster_id": truth_cluster, "kind": truth_kind},
        schema=TRUTH_SCHEMA,
    )
    return {"images": images, "truth": truth}


def write_fixture(
    out_dir: str, spec: FixtureSpec, cfg: DedupConfig = DEFAULT_CONFIG
) -> str:
    """Write (or reuse) a fixture directory; returns the directory.

    Cached on (spec, cfg) hash — safe across test/bench processes.
    Parquet is the storage format (Lance is not importable in-sandbox;
    see simhash_ray/sources/tables.py for the adapter)."""
    manifest_path = os.path.join(out_dir, "fixture.json")
    # "layout" guards the physical file layout: many row groups so a
    # Ray read parallelizes (one 400k-row row group = one read task).
    expected = {"spec": asdict(spec), "config_hash": cfg.config_hash(), "layout": 2}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == json.loads(json.dumps(expected)):
                return out_dir
    tables = generate_fixture(spec, cfg)
    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in tables.items():
        pq.write_table(
            tbl, os.path.join(out_dir, f"{name}.parquet"), row_group_size=16384
        )
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(expected, f, default=list)
    os.replace(tmp, manifest_path)  # atomic commit, like the reference's
    # save-then-rename checkpoint (/root/reference/src/Htm/V2.hs:88-94)
    return out_dir


def default_fixture_dir(spec: FixtureSpec) -> str:
    return os.path.join("/tmp/simhash_ray_fixtures", spec.tag())
