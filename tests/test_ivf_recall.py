"""Trained-IVF recall: k-means lists must track the data's real clusters.

Runs the SAME dual-dialect SQL the gate checks, on a deterministic
clustered corpus (10 unit centers, sigma 0.12, labels in contiguous
blocks so naive first-K centroid seeding collapses into one cluster).
DuckDB executes here for speed; engine equivalence of these builders is
covered by the driver gate (ann_topk_ivf_trained).

Note: the driver's embeddings fixture is unclustered noise (top-10
cosines ~0.37), where no IVF can reach high recall at low probe
fractions — recall claims belong on clustered data, which is what IVF
is for.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from slog_agent_spark.functions.dialect import DUCKDB
from slog_agent_spark.operators import similarity as S

QUERIES = (0, 60, 123, 222, 321, 404, 499)


@pytest.fixture(scope="module")
def con():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = [i // 50 for i in range(500)]
    vecs = [
        (centers[lab[i]] + 0.12 * rng.normal(size=64)).astype(np.float32)
        for i in range(500)
    ]
    df = pd.DataFrame(
        {
            "vec_id": range(500),
            "embedding": [list(map(float, v)) for v in vecs],
            "label": lab,
        }
    )
    c = duckdb.connect()
    c.register("embdf", df)
    c.execute(
        "CREATE VIEW embeddings AS SELECT vec_id, "
        "CAST(embedding AS FLOAT[]) AS embedding, label FROM embdf"
    )
    return c


def _recall(con, sql_builder) -> float:
    total = 0.0
    for q in QUERIES:
        exact = {r[0] for r in con.execute(S.ann_bruteforce_sql(DUCKDB, q)).fetchall()}
        got = {r[0] for r in con.execute(sql_builder(q)).fetchall()}
        total += len(exact & got) / len(exact)
    return total / len(QUERIES)


def test_trained_ivf_recall_at_10(con):
    rec = _recall(con, lambda q: S.ann_ivf_trained_sql(DUCKDB, q))
    assert rec >= 0.9, f"trained IVF recall@10 = {rec}"


def test_trained_beats_naive_seeding(con):
    trained = _recall(con, lambda q: S.ann_ivf_trained_sql(DUCKDB, q))
    naive = _recall(con, lambda q: S.ivf_topk_sql(DUCKDB, q))
    assert trained > naive, (trained, naive)


def test_kmeans_is_deterministic(con):
    km, cents = S.kmeans_centroids_ctes(DUCKDB, "embeddings")
    q = f"WITH {km} SELECT centroid_id, emb FROM {cents} ORDER BY centroid_id"
    assert con.execute(q).fetchall() == con.execute(q).fetchall()


def test_neardup_ivf_subset_and_recall_on_clustered(con):
    """IVF-bucketed near-dup vs the exact all-pairs baseline.

    Guaranteed: bucketing only PRUNES candidates, so its pairs are a
    strict subset of the exact query's. Measured: on clustered data
    (where near-dups actually live inside clusters) the bucketed join
    keeps high pair recall — the property that lets the O(n²) exact tier
    stay a fixture/sample-only verification tool at 100 TB.
    """
    thr = 0.6  # in-cluster pairs on this corpus sit well above this
    exact = {
        (r[0], r[1])
        for r in con.execute(
            S.embedding_neardup_exact_sql(DUCKDB, threshold=thr)
        ).fetchall()
    }

    def pairs(builder):
        return {(r[0], r[1]) for r in con.execute(builder).fetchall()}

    naive = pairs(S.embedding_neardup_sql(DUCKDB, threshold=thr))
    trained = pairs(S.embedding_neardup_trained_sql(DUCKDB, threshold=thr))
    assert exact, "fixture must contain near-dup pairs at this threshold"
    assert naive <= exact and trained <= exact  # bucketing only prunes
    recall = len(trained) / len(exact)
    assert recall >= 0.9, f"trained near-dup pair recall = {recall}"
    assert len(trained) > len(naive)  # k-means lists + multi-assign win


def test_quantized_ivf_recall_vs_float():
    """The int8 store answers the same IVF query with high overlap vs
    the float store (cosine is scale-free over symmetric quantization,
    so the only error is the 1/254 resolution): top-10 overlap >= 0.8
    across several query vectors, exact on most."""
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators import similarity as S

    from conftest import SF_DIR

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF_DIR}/embeddings.parquet'"
    )
    overlaps = []
    for qid in (0, 7, 23, 61, 99):
        q = {r[0] for r in con.execute(
            S.ann_topk_ivf_quantized_sql(DUCKDB, query_vec_id=qid)
        ).fetchall()}
        f = {r[0] for r in con.execute(
            S.ivf_topk_sql(DUCKDB, query_vec_id=qid)
        ).fetchall()}
        overlaps.append(len(q & f) / len(f))
    assert min(overlaps) >= 0.8 and sum(overlaps) / len(overlaps) >= 0.9
