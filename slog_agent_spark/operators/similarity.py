"""Similarity search over the `embeddings` table (array<float> column).

Two tiers, both pure SQL expressions (no Python in the scoring path):

- brute-force cosine top-k: the correctness baseline. One pass, no
  shuffle except the final top-k.
- IVF (inverted-file) variant: deterministic centroids (the first C
  vectors), assignment = argmax centroid cosine, probe the best P lists.
  At cluster scale the centroid table broadcasts and the probe prunes
  (C-P)/C of the corpus — the standard ANN scale path.

Cosine is computed in DOUBLE with left-to-right accumulation in both
engines and rounded, keeping the DuckDB oracle hash-identical.
"""

from __future__ import annotations

from ..functions.dialect import SqlDialect

IVF_CENTROIDS = 8
IVF_PROBES = 2
TOPK = 10


def dot_expr(d: SqlDialect, a: str, b: str) -> str:
    if d.name == d.SPARK:
        return (
            f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), "
            f"CAST({b} AS ARRAY<DOUBLE>), (x, y) -> x * y), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def norm_expr(d: SqlDialect, a: str) -> str:
    return f"sqrt({dot_expr(d, a, a)})"


def cosine_expr(d: SqlDialect, a: str, b: str) -> str:
    return (
        f"round({dot_expr(d, a, b)} / "
        f"greatest({norm_expr(d, a)} * {norm_expr(d, b)}, 1e-12), 4)"
    )


def ann_bruteforce_sql(
    d: SqlDialect, query_vec_id: int = 0, k: int = TOPK,
    emb_rel: str = "embeddings",
) -> str:
    """Exact cosine top-k for one query vector (baseline)."""
    cos = cosine_expr(d, "e.embedding", "q.embedding")
    return f"""
    WITH q AS (SELECT embedding FROM {emb_rel} WHERE vec_id = {query_vec_id})
    SELECT e.vec_id, e.label, {cos} AS cosine
    FROM {emb_rel} e, q
    WHERE e.vec_id != {query_vec_id}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {k}
    """


def ivf_assign_sql(d: SqlDialect, emb_rel: str = "embeddings") -> str:
    """Assign every vector to its nearest deterministic centroid.

    Centroids = the first IVF_CENTROIDS vectors (deterministic, shared
    with the oracle). The centroid side is tiny → broadcast join at scale.
    """
    cos = cosine_expr(d, "e.embedding", "c.embedding")
    return f"""
    WITH c AS (SELECT vec_id AS centroid_id, embedding
               FROM {emb_rel} WHERE vec_id < {IVF_CENTROIDS}),
    scored AS (
      SELECT e.vec_id, c.centroid_id, {cos} AS cos_c
      FROM {emb_rel} e, c
    ),
    ranked AS (
      SELECT vec_id, centroid_id, cos_c,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_c DESC, centroid_id) AS rn
      FROM scored
    )
    SELECT vec_id, centroid_id, cos_c FROM ranked WHERE rn = 1
    """


def ivf_topk_sql(
    d: SqlDialect, query_vec_id: int = 0, k: int = TOPK,
    emb_rel: str = "embeddings",
) -> str:
    """ANN top-k probing the IVF_PROBES centroid lists nearest the query."""
    cos_q = cosine_expr(d, "e.embedding", "q.embedding")
    assign = ivf_assign_sql(d, emb_rel)
    return f"""
    WITH assigned AS ({assign}),
    q AS (SELECT embedding FROM {emb_rel} WHERE vec_id = {query_vec_id}),
    probe AS (
      SELECT centroid_id FROM assigned WHERE vec_id = {query_vec_id}
      UNION ALL
      SELECT centroid_id FROM (
        SELECT c.vec_id AS centroid_id,
               row_number() OVER (
                 ORDER BY {cosine_expr(d, "c.embedding", "q.embedding")} DESC,
                          c.vec_id) AS rn
        FROM {emb_rel} c, q WHERE c.vec_id < {IVF_CENTROIDS}
      ) ranked_probe WHERE rn <= {IVF_PROBES}
    ),
    probe_set AS (SELECT DISTINCT centroid_id FROM probe),
    pruned AS (
      SELECT a.vec_id FROM assigned a
      JOIN probe_set p ON a.centroid_id = p.centroid_id
      WHERE a.vec_id != {query_vec_id}
    )
    SELECT e.vec_id, e.label, {cos_q} AS cosine
    FROM {emb_rel} e JOIN pruned USING (vec_id), q
    ORDER BY cosine DESC, e.vec_id
    LIMIT {k}
    """


def embedding_neardup_sql(
    d: SqlDialect, threshold: float = 0.3, emb_rel: str = "embeddings"
) -> str:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed.

    Pairs are only compared within the same centroid list, so the
    comparison count scales with bucket sizes (not |corpus|²).
    """
    assign = ivf_assign_sql(d, emb_rel)
    cos = cosine_expr(d, "ea.embedding", "eb.embedding")
    return f"""
    WITH assigned AS ({assign})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
    FROM assigned a
    JOIN assigned b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    JOIN {emb_rel} ea ON ea.vec_id = a.vec_id
    JOIN {emb_rel} eb ON eb.vec_id = b.vec_id
    WHERE {cos} >= {threshold}
    """
