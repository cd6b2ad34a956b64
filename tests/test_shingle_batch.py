"""Round-6 optimization pins: the vectorized Arrow-batch twins must be
row-for-row identical to the SQL expression forms they replace, and the
codegen-span barrier must be row-invisible.

These are the focused internal-equivalence tests for the r06
optimizations (the DuckDB oracle gate separately re-verifies every
consumer query end-to-end)."""

from __future__ import annotations

import pytest

from slog_agent_spark.functions.dialect import SPARK
from slog_agent_spark.operators import dedup, shingle_batch, similarity
from slog_agent_spark.plans.corpus import _register

SF = "/root/testdata/sf0.01"


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


@pytest.fixture(scope="module")
def docs(spark):
    _register(spark, SF, "documents")
    return spark


@pytest.fixture(scope="module")
def embs(spark):
    _register(spark, SF, "embeddings")
    return spark


def test_minhash_signatures_df_matches_sql(docs):
    a = _rows(docs.sql(dedup.minhash_signatures_sql(SPARK)), "doc_id")
    b = _rows(shingle_batch.minhash_signatures_df(docs), "doc_id")
    assert a == b


def test_ngram_sets_df_matches_sql(docs):
    a = _rows(docs.sql(dedup.ngram_sets_sql(SPARK)), "doc_id")
    b = _rows(shingle_batch.ngram_sets_df(docs), "doc_id")
    assert a == b


def test_simhash_sketches_df_matches_sql(docs):
    a = _rows(docs.sql(dedup.simhash_sketches_sql(SPARK)), "doc_id")
    b = _rows(shingle_batch.simhash_sketches_df(docs), "doc_id")
    assert a == b


def test_neardup_pairs_df_matches_sql(embs):
    """The numpy bucket-dot verify returns exactly the SQL pair
    relation (same staged centroid/assignment/norm views feed both)."""
    cents = embs.sql(similarity.ivf_centroids_sql(SPARK)).localCheckpoint()
    cents.createOrReplaceTempView("ivf_centroids")
    assigned = embs.sql(
        similarity.ivf_multi_assign_sql(SPARK, "embeddings", "ivf_centroids")
    ).localCheckpoint()
    assigned.createOrReplaceTempView("ivf_assigned")
    norms = embs.sql(similarity.emb_norms_sql(SPARK)).localCheckpoint()
    norms.createOrReplaceTempView("emb_norms")
    a = _rows(
        embs.sql(similarity.neardup_pairs_from_assigned_sql(
            SPARK, "emb_norms", "ivf_assigned")),
        "vec_a", "vec_b",
    )
    b = _rows(
        similarity.neardup_pairs_from_assigned_df(
            embs, "emb_norms", "ivf_assigned"),
        "vec_a", "vec_b",
    )
    assert a == b
    assert len(a) > 0


def test_unrolled_assign_matches_aggregate_form(embs):
    """The literal-inlined assignment (centroid values read on the
    driver, unrolled into a codegen projection) must return exactly the
    aggregate top-r / argmax rows, for both r=1 (projection form) and
    r=2 (fenced-explode form)."""
    cents = embs.sql(similarity.ivf_centroids_sql(SPARK)).localCheckpoint()
    cents.createOrReplaceTempView("ivf_centroids_t")
    for r in (1, 2):
        a = _rows(
            embs.sql(similarity.spark_topr_assign_sql(
                "embeddings", "ivf_centroids_t", r)),
            "vec_id", "centroid_id",
        )
        b = _rows(
            similarity.assign_df(
                embs, cents_rel="ivf_centroids_t", assign_r=r),
            "vec_id", "centroid_id",
        )
        assert a == b
        assert len(a) > 0


def test_codegen_span_barrier_is_row_invisible(spark, monkeypatch):
    """apply_chain_spark's observe barrier must never change rows."""
    import slog_agent_spark.operators.transforms as T
    from slog_agent_spark.plans.pipeline import transform_transcripts
    from slog_agent_spark.sources.transcripts import transcripts_df

    src = transcripts_df(spark, "/root/testdata/sf0.001", 1)
    with_barrier = transform_transcripts(src).orderBy(
        "conv_id", "turn_idx").collect()
    monkeypatch.setattr(T, "CODEGEN_SPAN_MAX_LAYERS", 10**9)
    without = transform_transcripts(src).orderBy(
        "conv_id", "turn_idx").collect()
    assert with_barrier == without
