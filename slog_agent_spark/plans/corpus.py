"""Corpus-analytics plan runners: documents + embeddings operators.

Spark side registers the parquet tables as temp views and runs the SAME
generated SQL the DuckDB oracle runs (spark dialect) — declarative,
Catalyst-planned (AQE picks broadcast joins for the tiny
centroid/query sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.dialect import DUCKDB, SPARK
from ..operators import dedup, similarity, textops


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)


def _items_sql(d, rel: str, key: str, items: dict[str, str]) -> str:
    sel = ", ".join(f"{e} AS {k}" for k, e in items.items())
    return f"SELECT {key}, {sel} FROM {rel}"


def _doc_items_query(builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir, "documents")
        return spark.sql(_items_sql(SPARK, "documents", "doc_id", builder(SPARK)))

    def oracle() -> str:
        return _items_sql(DUCKDB, "documents", "doc_id", builder(DUCKDB))

    return run, oracle


token_count_query, token_count_oracle = _doc_items_query(textops.token_count_items)
quality_query, quality_oracle = _doc_items_query(textops.quality_items)
langid_query, langid_oracle = _doc_items_query(textops.langid_items)
fingerprint_query, fingerprint_oracle = _doc_items_query(textops.fingerprint_items)


def _sql_query(sql_builder, tables: tuple[str, ...]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir, *tables)
        return spark.sql(sql_builder(SPARK))

    def oracle() -> str:
        return sql_builder(DUCKDB)

    return run, oracle


exact_dedup_query, exact_dedup_oracle = _sql_query(
    dedup.exact_dedup_sql, ("documents",)
)
minhash_lsh_query, minhash_lsh_oracle = _sql_query(
    dedup.minhash_lsh_pairs_sql, ("documents",)
)
simhash_query, simhash_oracle = _sql_query(
    dedup.simhash_groups_sql, ("documents",)
)
simhash_neardup_query, simhash_neardup_oracle = _sql_query(
    dedup.simhash_neardup_pairs_sql, ("documents",)
)
ngram_jaccard_query, ngram_jaccard_oracle = _sql_query(
    dedup.ngram_jaccard_pairs_sql, ("documents",)
)
ann_ivf_trained_query, ann_ivf_trained_oracle = _sql_query(
    similarity.ann_ivf_trained_sql, ("embeddings",)
)
ann_bruteforce_query, ann_bruteforce_oracle = _sql_query(
    similarity.ann_bruteforce_sql, ("embeddings",)
)
ann_ivf_query, ann_ivf_oracle = _sql_query(
    similarity.ivf_topk_sql, ("embeddings",)
)
emb_neardup_query, emb_neardup_oracle = _sql_query(
    similarity.embedding_neardup_sql, ("embeddings",)
)
emb_neardup_exact_query, emb_neardup_exact_oracle = _sql_query(
    similarity.embedding_neardup_exact_sql, ("embeddings",)
)
corpus_stats_query, corpus_stats_oracle = _sql_query(
    textops.corpus_stats_sql, ("documents",)
)
emb_neardup_trained_query, emb_neardup_trained_oracle = _sql_query(
    similarity.embedding_neardup_trained_sql, ("embeddings",)
)
