"""Config front-end for the corpus (dedup / similarity / retention)
operators.

The log pipeline has a YAML config (plans/yaml_config.py, mirroring the
reference's format); the corpus operators' sketch/index parameters were
module constants until round 3 — correct at fixture scale but not
resizable by a caller ("the 10^9-doc sizing requires editing the
package"). This module is the caller-facing knob: a validated,
immutable parameter set, loadable from a ``corpus:`` YAML document, and
threaded through every SQL generator in operators/dedup.py and
operators/similarity.py.

Validation mirrors the reference's config verification style (path-
qualified errors, reference: run/config.go:64-134) — a bad combination
fails at load time, never as a silent recall loss at run time.
"""

from __future__ import annotations

from dataclasses import dataclass, fields, replace

import yaml

from .yaml_config import ConfigError


def _require(cond: bool, path: str, msg: str) -> None:
    if not cond:
        raise ConfigError(path, msg)


@dataclass(frozen=True)
class CorpusParams:
    """Every tunable of the corpus operators, with the fixture-scale
    defaults. Scaling guidance lives next to each field; validation in
    ``validate`` enforces the structural invariants the algorithms
    assume (band divisibility, pigeonhole recall, probe bounds)."""

    # MinHash + LSH (operators/dedup.py)
    minhash_k: int = 12          # signature size; rows per band = k/bands
    lsh_bands: int = 4           # more bands -> higher recall, more candidates
    jaccard_threshold: float = 0.35

    # exact n-gram Jaccard
    ngram_df_cap: int = 100      # stop-shingle cut; raise with corpus size

    # SimHash banded-Hamming near-dup
    simhash_bands: int = 4
    simhash_band_bits: int = 16  # 16 for <=10^6 docs; 32 (128-bit sketch) for 10^9+
    simhash_hamming_k: int = 3   # exact recall requires k < bands

    # ANN / IVF (operators/similarity.py)
    topk: int = 10
    ivf_centroids: int = 8       # untrained variant (first-C seeds)
    ivf_probes: int = 2
    trained_centroids: int = 16  # k-means variant (oversegment: lists >= clusters)
    trained_probes: int = 3
    kmeans_sample_mod: int = 5   # train on 1/mod of the corpus (hash-picked);
    #                              raise so n/mod lands in ~10^5-10^6 vectors
    kmeans_iters: int = 2

    # corpus retention (the composite training-set cut)
    retention_min_tokens: int = 20
    retention_min_distinct: float = 0.3
    retention_max_stopword: float = 0.2

    # sequence packing (concat-and-chunk)
    pack_budget_tokens: int = 2048  # context-window budget per chunk
    pack_bucket_docs: int = 64      # docs per prefix-sum bucket; raise to
    #                                 ~10^4 at 10^9 docs so the bucket-
    #                                 totals window stays tiny

    # deterministic mix sampling: lang -> keep rate in permille;
    # languages absent from the mapping keep mix_default_permille
    mix_keep_permille: tuple = (("en", 700),)
    mix_default_permille: int = 1000

    def validate(self) -> "CorpusParams":
        p = "corpus"
        _require(self.minhash_k > 0, f"{p}.minhashK", "must be positive")
        _require(self.lsh_bands > 0, f"{p}.lshBands", "must be positive")
        _require(
            self.minhash_k % self.lsh_bands == 0, f"{p}.minhashK",
            f"must be divisible by lshBands ({self.lsh_bands})",
        )
        _require(
            0 < self.jaccard_threshold <= 1, f"{p}.jaccardThreshold",
            "must be in (0, 1]",
        )
        _require(self.ngram_df_cap >= 2, f"{p}.ngramDfCap", "must be >= 2")
        _require(self.simhash_bands > 0, f"{p}.simhashBands",
                 "must be positive")
        _require(
            self.simhash_band_bits > 0
            and self.simhash_band_bits % 4 == 0,
            f"{p}.simhashBandBits",
            "must be a positive multiple of 4 (md5 hex-digit "
            "construction; 0 bits would give every document an empty "
            "band key and an O(n^2) band join)",
        )
        _require(
            self.simhash_bands * self.simhash_band_bits <= 128,
            f"{p}.simhashBands",
            "bands * bandBits must be <= 128 (md5 supplies 128 sketch bits)",
        )
        _require(
            0 < self.simhash_hamming_k < self.simhash_bands,
            f"{p}.simhashHammingK",
            "exact recall requires 0 < k < bands (pigeonhole)",
        )
        _require(self.topk > 0, f"{p}.topk", "must be positive")
        for name, cents, probes in (
            ("ivf", self.ivf_centroids, self.ivf_probes),
            ("trained", self.trained_centroids, self.trained_probes),
        ):
            _require(cents > 0, f"{p}.{name}Centroids", "must be positive")
            _require(
                0 < probes <= cents, f"{p}.{name}Probes",
                f"must be in [1, {name}Centroids]",
            )
        _require(self.kmeans_sample_mod >= 1, f"{p}.kmeansSampleMod",
                 "must be >= 1")
        _require(self.kmeans_iters >= 1, f"{p}.kmeansIters", "must be >= 1")
        _require(self.pack_budget_tokens > 0, f"{p}.packBudgetTokens",
                 "must be positive")
        for lang, permille in self.mix_keep_permille:
            _require(
                isinstance(permille, int) and 0 <= permille <= 1000,
                f"{p}.mixKeepPermille.{lang}",
                "must be an integer in [0, 1000]",
            )
        _require(
            0 <= self.mix_default_permille <= 1000,
            f"{p}.mixDefaultPermille", "must be in [0, 1000]",
        )
        _require(self.pack_bucket_docs > 0, f"{p}.packBucketDocs",
                 "must be positive")
        _require(self.retention_min_tokens >= 0, f"{p}.retentionMinTokens",
                 "must be >= 0")
        _require(0 <= self.retention_min_distinct <= 1,
                 f"{p}.retentionMinDistinct", "must be in [0, 1]")
        _require(0 <= self.retention_max_stopword <= 1,
                 f"{p}.retentionMaxStopword", "must be in [0, 1]")
        return self


DEFAULT_CORPUS_PARAMS = CorpusParams().validate()

# camelCase YAML key -> dataclass field (config files follow the
# reference's camelCase convention)
_YAML_KEYS = {
    "minhashK": "minhash_k",
    "lshBands": "lsh_bands",
    "jaccardThreshold": "jaccard_threshold",
    "ngramDfCap": "ngram_df_cap",
    "simhashBands": "simhash_bands",
    "simhashBandBits": "simhash_band_bits",
    "simhashHammingK": "simhash_hamming_k",
    "topk": "topk",
    "ivfCentroids": "ivf_centroids",
    "ivfProbes": "ivf_probes",
    "trainedCentroids": "trained_centroids",
    "trainedProbes": "trained_probes",
    "kmeansSampleMod": "kmeans_sample_mod",
    "kmeansIters": "kmeans_iters",
    "packBudgetTokens": "pack_budget_tokens",
    "mixKeepPermille": "mix_keep_permille",
    "mixDefaultPermille": "mix_default_permille",
    "packBucketDocs": "pack_bucket_docs",
    "retentionMinTokens": "retention_min_tokens",
    "retentionMinDistinct": "retention_min_distinct",
    "retentionMaxStopword": "retention_max_stopword",
}

_FLOAT_FIELDS = {
    f.name for f in fields(CorpusParams) if f.type in ("float", float)
}


def parse_corpus_config(text: str) -> CorpusParams:
    """Parse a YAML document with a ``corpus:`` mapping (or a bare
    mapping of the same keys) into validated :class:`CorpusParams`.
    Unknown keys are rejected with a path-qualified error; omitted keys
    keep their defaults."""
    doc = yaml.safe_load(text) or {}
    _require(isinstance(doc, dict), "corpus", "config must be a mapping")
    section = doc.get("corpus", doc)
    _require(isinstance(section, dict), "corpus", "must be a mapping")
    updates = {}
    for key, value in section.items():
        _require(key in _YAML_KEYS, f"corpus.{key}", "unknown parameter")
        field_name = _YAML_KEYS[key]
        if field_name == "mix_keep_permille":
            _require(
                isinstance(value, dict)
                and all(isinstance(k, str) for k in value),
                f"corpus.{key}", f"must be a lang->permille mapping, got {value!r}",
            )
            updates[field_name] = tuple(sorted(value.items()))
        elif field_name in _FLOAT_FIELDS:
            _require(isinstance(value, (int, float)), f"corpus.{key}",
                     f"must be a number, got {value!r}")
            updates[field_name] = float(value)
        else:
            _require(isinstance(value, int) and not isinstance(value, bool),
                     f"corpus.{key}", f"must be an integer, got {value!r}")
            updates[field_name] = value
    return replace(DEFAULT_CORPUS_PARAMS, **updates).validate()


def load_corpus_config(path: str) -> CorpusParams:
    with open(path, encoding="utf-8") as fh:
        return parse_corpus_config(fh.read())
