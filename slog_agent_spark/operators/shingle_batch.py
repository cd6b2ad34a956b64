"""Vectorized (Arrow-batch) twins of the per-document sketch projections.

The dedup family's per-row stages — shingle md5 arrays, MinHash
signatures, SimHash band sketches — are pure DISCRETE computations
(regex token split, md5, string min, bit counting): no floating point
anywhere, so a Python implementation that follows the same definitions
is bit-for-bit identical to the SQL expression forms in
operators/dedup.py, not merely close. The SQL forms evaluate as
interpreted higher-order-function lambdas (transform/filter get no
whole-stage codegen), measured 3-6s per stage at 50k docs x local[32];
the mapInArrow twins hand whole batches to hashlib/numpy (guide §4.2)
and run the same stages in a few hundred ms.

Exact-parity contract, mirrored from the SQL definitions:

- tokens: ``split(lower(text), '[^a-z0-9]+')`` with Spark's default
  limit -1 ≡ Python ``re.split`` (both keep leading/trailing empty
  tokens).
- shingles: ``transform(sequence(1, greatest(n-2, 1)), i ->
  md5(array_join(slice(toks, i, 3), ' ')))`` — slice truncates at the
  end exactly like Python list slicing.
- ``array_distinct`` keeps first occurrence order ≡ ``dict.fromkeys``.
- MinHash: ``array_min`` over md5 hex strings is ASCII-lexicographic ≡
  Python ``min`` on str.
- SimHash band bits: hex-digit/bit indexing copied from
  dedup.simhash_band_items; majority rule ``2*cnt > n`` over the
  NON-distinct shingle array.

The oracle gate (tools/check_entry.py) re-verifies every consumer
query against DuckDB, and tests/test_shingle_batch.py pins the
DataFrame twins against the SQL forms row-for-row.

Scale shape: unchanged — these are per-row projections (no shuffle);
the Python boundary ships only (doc_id, text) in and the narrow sketch
columns out, Arrow-batched.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

from ..plans.corpus_config import CorpusParams, DEFAULT_CORPUS_PARAMS

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.split(text.lower())


def _shingles(toks: list[str]) -> list[str]:
    n = len(toks)
    out = []
    for i in range(max(n - 2, 1)):
        s = " ".join(toks[i:i + 3])
        out.append(hashlib.md5(s.encode()).hexdigest())
    return out


def _minhash(distinct_shingles: list[str], k: int) -> list[str]:
    # md5(x || 'seed<i>') via one hashed prefix + per-seed copies
    bases = [hashlib.md5(x.encode()) for x in distinct_shingles]
    sig = []
    for i in range(k):
        seed = f"seed{i}".encode()
        best = None
        for b in bases:
            h = b.copy()
            h.update(seed)
            d = h.hexdigest()
            if best is None or d < best:
                best = d
        sig.append(best)
    return sig


def _simhash_bands(shingles: list[str], bands: int, band_bits: int) -> list[int]:
    import numpy as np

    digits_per_band = band_bits // 4
    need = bands * digits_per_band
    n = len(shingles)
    arr = np.empty((n, need), dtype=np.uint8)
    for i, h in enumerate(shingles):
        arr[i] = [int(c, 16) for c in h[:need]]
    # bit b of each hex digit, counted over shingles
    bits = (arr[:, :, None] >> np.arange(4)[None, None, :]) & 1
    cnt = bits.sum(axis=0)                      # (need, 4)
    maj = (2 * cnt) > n
    out = []
    for b in range(bands):
        v = 0
        for r in range(band_bits):
            if maj[b * digits_per_band + r // 4, r % 4]:
                v += 1 << r
        out.append(v)
    return out


def _batched(spark: SparkSession, docs_rel: str, schema: str, fn) -> DataFrame:
    """mapInArrow over (doc_id, text) of ``docs_rel``; ``fn`` maps a
    list of (doc_id, text) to a dict of output columns."""
    import pyarrow as pa

    src = spark.table(docs_rel).select("doc_id", "text")

    def run(batches):
        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            yield pa.RecordBatch.from_pydict(fn(ids, texts))

    return src.mapInArrow(run, schema)


def minhash_signatures_df(
    spark: SparkSession,
    docs_rel: str = "documents",
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> DataFrame:
    """DataFrame twin of dedup.minhash_signatures_sql (Spark side):
    (doc_id, shingle_set, mh0..mhK-1)."""
    k = params.minhash_k

    def fn(ids, texts):
        sets, sigs = [], []
        for t in texts:
            sh = list(dict.fromkeys(_shingles(_tokens(t))))
            sets.append(sh)
            sigs.append(_minhash(sh, k))
        out = {"doc_id": ids, "shingle_set": sets}
        for i in range(k):
            out[f"mh{i}"] = [s[i] for s in sigs]
        return out

    mh_cols = ", ".join(f"mh{i} string" for i in range(k))
    return _batched(
        spark, docs_rel,
        f"doc_id long, shingle_set array<string>, {mh_cols}", fn,
    )


def ngram_sets_df(
    spark: SparkSession, docs_rel: str = "documents"
) -> DataFrame:
    """DataFrame twin of dedup.ngram_sets_sql: (doc_id, shingle_set, n_sh)."""

    def fn(ids, texts):
        sets = [list(dict.fromkeys(_shingles(_tokens(t)))) for t in texts]
        return {
            "doc_id": ids,
            "shingle_set": sets,
            "n_sh": [len(s) for s in sets],
        }

    # n_sh is declared long (Arrow int64 is what from_pydict infers);
    # the SQL twin's size() is int — consumers only do arithmetic on it
    # (never emit it), so the width is output-invisible.
    return _batched(
        spark, docs_rel,
        "doc_id long, shingle_set array<string>, n_sh long", fn,
    )


def simhash_sketches_df(
    spark: SparkSession,
    docs_rel: str = "documents",
    bands: int | None = None,
    band_bits: int | None = None,
) -> DataFrame:
    """DataFrame twin of dedup.simhash_sketches_sql:
    (doc_id, sb0..sb{bands-1})."""
    from .dedup import SIMHASH_BAND_BITS, SIMHASH_BANDS

    bands = SIMHASH_BANDS if bands is None else bands
    band_bits = SIMHASH_BAND_BITS if band_bits is None else band_bits

    def fn(ids, texts):
        rows = [
            _simhash_bands(_shingles(_tokens(t)), bands, band_bits)
            for t in texts
        ]
        out = {"doc_id": ids}
        for b in range(bands):
            out[f"sb{b}"] = [r[b] for r in rows]
        return out

    cols = ", ".join(f"sb{b} long" for b in range(bands))
    return _batched(spark, docs_rel, f"doc_id long, {cols}", fn)
