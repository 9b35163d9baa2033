"""Pinned configuration for the SimHash dedup engine.

The reference configures its encoder through a YAML sidecar with
``size`` / ``sparsity`` / ``token_similarity``
(/root/reference/src/Htm/SimHashDocumentEncoder.hsc:40-52, defaults
600 / 0.2 / true at /root/reference/src/Htm/V2.hs:54-62).  The new
engine's analogue is a frozen dataclass: 64 signature bits (per
BASELINE.json north_rule), word-shingle width, a char-n-gram switch
(the ``token_similarity`` analogue) and a pinned hash seed.  The
config hash goes into every lineage manifest so runs are
config-addressed (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class SimHashConfig:
    """Semantics of the 64-bit SimHash signature (SURVEY.md §2.6).

    Mirrors the reference encoder's knobs:

    - ``bits``       — signature width.  Reference: ``size`` (600 sparse
      bits); north_rule pins the new engine to a dense 64.
    - ``shingle_k``  — word k-gram width.  Reference tokenizes on
      whitespace and hashes single tokens; we hash k-grams so word-order
      matters (k=1 reproduces the reference's bag-of-tokens behaviour).
    - ``char_ngram`` — the ``token_similarity`` analogue
      (/root/reference/cxx-src/sdr.cpp:63-72): when > 0, each token
      occurrence additionally contributes hashes of its character
      n-grams, so near-spellings yield overlapping bit patterns.
      0 disables (= token_similarity=false).
    - ``hash_seed``  — keyed blake2b seed; pinned so signatures are
      reproducible across processes and rounds.
    - ``lowercase``  — normalize before tokenizing.

    Accumulation is the reference's weighted bit-vector rule: per digest
    bit add +1 if set else -1; threshold is the classic sign rule
    (adder > 0 → bit set), the ``sparsity=0.5`` degenerate case called
    out in SURVEY.md §2.6 step 4.
    """

    bits: int = 64
    shingle_k: int = 2
    char_ngram: int = 3
    hash_seed: int = 0x5173_4861  # "QsHa"
    lowercase: bool = True

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def __post_init__(self):
        if self.bits != 64:
            raise ValueError(f"bits must be 64 (north rule), got {self.bits}")
        if self.shingle_k < 1:
            raise ValueError(
                f"shingle_k must be >= 1, got {self.shingle_k} (a zero "
                "width would read uninitialized shingle memory)"
            )
        if self.char_ngram < 0:
            raise ValueError(f"char_ngram must be >= 0, got {self.char_ngram}")


@dataclass(frozen=True)
class LSHConfig:
    """Hamming-ball LSH banding over a 64-bit signature.

    The signature is split into ``n_blocks`` contiguous bit blocks; a
    band key is the concatenation of every ``combo_m``-subset of blocks
    (C(n_blocks, combo_m) bands).  Pigeonhole guarantee: two signatures
    within Hamming distance ``n_blocks - combo_m`` differ in at most
    that many blocks, so at least ``combo_m`` blocks are clean and the
    band keyed on some clean combo matches exactly → recall 1.0 for
    pairs within ``hamming_tau`` ≤ n_blocks − combo_m.

    Defaults: 8 blocks × choose 2 → 28 bands of 16-bit keys, τ=6.
    At 10^12-row scale, shrink τ and grow keys (e.g. n_blocks=4,
    combo_m=1, τ=3 → Manku et al., WWW'07-style 16-bit block tables)
    — the band-key space must stay ≫ rows/node to bound bucket size.
    """

    n_blocks: int = 8
    combo_m: int = 2
    hamming_tau: int = 6
    # Skew guard (SURVEY.md §2.5 "skewed hot buckets"): buckets up to
    # this size emit all C(g,2) pairs; larger buckets fall back to
    # O(g) star/chain edges that preserve within-bucket connectivity
    # for clustering without the quadratic pair blowup.  Nothing is
    # ever silently dropped.  Plumbed into stages/lsh via
    # pipelines/dedup_images.
    pair_full_threshold: int = 256

    def __post_init__(self) -> None:
        if self.hamming_tau > self.n_blocks - self.combo_m:
            raise ValueError(
                f"hamming_tau={self.hamming_tau} breaks the pigeonhole "
                f"guarantee (max {self.n_blocks - self.combo_m} for "
                f"{self.n_blocks} blocks choose {self.combo_m})"
            )

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


@dataclass(frozen=True)
class DedupConfig:
    """Full flagship-pipeline config: text-signature LSH + image-phash
    LSH + clustering bounds."""

    simhash: SimHashConfig = field(default_factory=SimHashConfig)
    text_lsh: LSHConfig = field(default_factory=LSHConfig)
    # phash near-dups are planted within 4 bits → 6 blocks choose 2
    # (15 bands, ~21-bit keys) still pigeonhole-guarantees τ ≤ 4 with
    # roughly half the band rows of the text scheme.
    image_lsh: LSHConfig = field(
        default_factory=lambda: LSHConfig(n_blocks=6, combo_m=2, hamming_tau=4)
    )
    max_cluster_rounds: int = 12

    def config_hash(self) -> str:
        payload = json.dumps(
            {
                "simhash": asdict(self.simhash),
                "text_lsh": asdict(self.text_lsh),
                "image_lsh": asdict(self.image_lsh),
                "max_cluster_rounds": self.max_cluster_rounds,
            },
            sort_keys=True,
        ).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()


def load_config(path: str) -> DedupConfig:
    """Parse a YAML or JSON config sidecar into a :class:`DedupConfig`.

    The analogue of the reference's ``<model>.opts.yml`` loader
    (/root/reference/src/Htm/V2.hs:41-62,111-116): a run is configured
    by a small declarative file next to the model, not by code edits.
    Validation is LOUD (SURVEY.md §2.1 S3): unknown keys, non-mapping
    sections and type mismatches raise ValueError with the offending
    key; semantic constraints (the pigeonhole bound) are enforced by
    the dataclasses themselves."""
    import dataclasses

    with open(path) as f:
        text = f.read()
    if path.endswith((".yml", ".yaml")):
        import yaml  # vendored with ray; no extra dependency

        raw = yaml.safe_load(text)
    else:
        raw = json.loads(text)
    if not isinstance(raw, dict):
        raise ValueError(f"config {path}: top level must be a mapping, got {type(raw).__name__}")

    def build(cls, d: dict, where: str):
        if not isinstance(d, dict):
            raise ValueError(f"config {path}: section '{where}' must be a mapping")
        fields_ = {f.name: f for f in dataclasses.fields(cls)}
        unknown = set(d) - set(fields_)
        if unknown:
            raise ValueError(
                f"config {path}: unknown keys {sorted(unknown)} in '{where}' "
                f"(valid: {sorted(fields_)})"
            )
        for k, v in d.items():
            want = type(getattr(cls(), k))
            if want is bool:
                ok = isinstance(v, bool)
            elif want is int:
                ok = isinstance(v, int) and not isinstance(v, bool)
            else:
                ok = isinstance(v, want)
            if not ok:
                raise ValueError(
                    f"config {path}: '{where}.{k}' must be {want.__name__}, "
                    f"got {type(v).__name__} ({v!r})"
                )
        return cls(**d)

    sections = {"simhash": SimHashConfig, "text_lsh": LSHConfig, "image_lsh": LSHConfig}
    kwargs = {}
    for k, v in raw.items():
        if k in sections:
            kwargs[k] = build(sections[k], v, k)
        elif k == "max_cluster_rounds":
            if not isinstance(v, int) or isinstance(v, bool):
                raise ValueError(f"config {path}: 'max_cluster_rounds' must be int")
            kwargs[k] = v
        else:
            raise ValueError(
                f"config {path}: unknown top-level key '{k}' "
                f"(valid: {sorted(sections) + ['max_cluster_rounds']})"
            )
    return DedupConfig(**kwargs)
