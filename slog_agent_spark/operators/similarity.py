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

from ..functions.dialect import SPARK as SPARK_DIALECT, SqlDialect
from ..plans.corpus_config import CorpusParams, DEFAULT_CORPUS_PARAMS

# Fixture-scale defaults live in plans/corpus_config.CorpusParams (the
# caller-facing knob); aliases kept for default-sizing callers.
_P = DEFAULT_CORPUS_PARAMS
IVF_CENTROIDS = _P.ivf_centroids
IVF_PROBES = _P.ivf_probes
TOPK = _P.topk


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


def cosine_prenorm_expr(d: SqlDialect, a: str, b: str, na: str, nb: str) -> str:
    """Cosine with the norms hoisted to per-VECTOR columns (``na``/``nb``).

    Bit-identical to :func:`cosine_expr` — same dot, same
    greatest(na*nb, 1e-12) denominator, same 4dp round — but a pair
    verify pays ONE array aggregate instead of three. On an all-pairs
    verify that is the whole cost model: norms are O(n), dots are
    O(candidate pairs).
    """
    return (
        f"round({dot_expr(d, a, b)} / greatest({na} * {nb}, 1e-12), 4)"
    )


def emb_norms_sql(d: SqlDialect, emb_rel: str = "embeddings") -> str:
    """Per-vector norm relation: (vec_id, embedding, nrm) — the staged
    O(n) pass that lets every pair verify skip recomputing norms.

    Spark additionally pre-casts the vector to ARRAY<DOUBLE> here, so
    the per-PAIR dot's CAST becomes a no-op (SimplifyCasts removes it)
    instead of allocating a fresh double array per pair side — same
    value (float→double is exact), 2 fewer array materializations per
    candidate pair in the verify stage."""
    if d.name == d.SPARK:
        return (
            f"SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS embedding, "
            f"{norm_expr(d, 'embedding')} AS nrm FROM {emb_rel}"
        )
    return (
        f"SELECT vec_id, embedding, {norm_expr(d, 'embedding')} AS nrm "
        f"FROM {emb_rel}"
    )


def ann_bruteforce_sql(
    d: SqlDialect, query_vec_id: int = 0, k: int = TOPK,
    emb_rel: str = "embeddings",
) -> str:
    """Exact cosine top-k for one query vector (baseline).

    The query vector's norm is hoisted into the (one-row, broadcast)
    ``q`` relation — inlining it in the cosine would re-aggregate the
    same 64 elements once per CORPUS row.
    """
    cos = cosine_prenorm_expr(
        d, "e.embedding", "q.embedding", norm_expr(d, "e.embedding"), "q.qn"
    )
    return f"""
    WITH q AS (SELECT embedding, {norm_expr(d, "embedding")} AS qn
               FROM {emb_rel} WHERE vec_id = {query_vec_id})
    SELECT e.vec_id, e.label, {cos} AS cosine
    FROM {emb_rel} e, q
    WHERE e.vec_id != {query_vec_id}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {k}
    """


def ivf_assign_sql(
    d: SqlDialect, emb_rel: str = "embeddings",
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """Assign every vector to its nearest deterministic centroid.

    Centroids = the first ``params.ivf_centroids`` vectors
    (deterministic, shared with the oracle). The centroid side is tiny →
    broadcast join at scale. Spark additionally carries the winning
    cosine through the same min_by struct (field order (nc, cid, cos)
    keeps the comparison identical to ORDER BY cos DESC, centroid_id).
    """
    if d.name == d.SPARK:
        cents = (
            f"(SELECT vec_id AS centroid_id, embedding AS emb "
            f"FROM {emb_rel} WHERE vec_id < {params.ivf_centroids})"
        )
        e_side, c_side, cos = _spark_prenorm_sides(emb_rel, cents)
        return f"""
      SELECT vec_id, picked.cid AS centroid_id, picked.cos AS cos_c FROM (
        SELECT vec_id,
               min_by(named_struct('cid', centroid_id, 'cos', cos_c),
                      named_struct('nc', -cos_c, 'cid', centroid_id))
                 AS picked
        FROM (SELECT e.vec_id, c.centroid_id, {cos} AS cos_c
              FROM {e_side} CROSS JOIN {c_side}) scored
        GROUP BY vec_id
      ) agg"""
    cos = cosine_expr(d, "e.embedding", "c.embedding")
    return f"""
    WITH c AS (SELECT vec_id AS centroid_id, embedding
               FROM {emb_rel} WHERE vec_id < {params.ivf_centroids}),
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
    d: SqlDialect, query_vec_id: int = 0, k: int | None = None,
    emb_rel: str = "embeddings",
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """ANN top-k probing the ``params.ivf_probes`` centroid lists nearest
    the query."""
    k = params.topk if k is None else k
    cos_q = cosine_prenorm_expr(
        d, "e.embedding", "q.embedding", norm_expr(d, "e.embedding"), "q.qn"
    )
    assign = ivf_assign_sql(d, emb_rel, params)
    return f"""
    WITH assigned AS ({assign}),
    q AS (SELECT embedding, {norm_expr(d, "embedding")} AS qn
          FROM {emb_rel} WHERE vec_id = {query_vec_id}),
    probe AS (
      SELECT centroid_id FROM assigned WHERE vec_id = {query_vec_id}
      UNION ALL
      SELECT centroid_id FROM (
        SELECT c.vec_id AS centroid_id,
               row_number() OVER (PARTITION BY c.vec_id % 1
                 ORDER BY {cosine_expr(d, "c.embedding", "q.embedding")} DESC,
                          c.vec_id) AS rn
        FROM {emb_rel} c, q WHERE c.vec_id < {params.ivf_centroids}
      ) ranked_probe WHERE rn <= {params.ivf_probes}
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


KMEANS_SAMPLE_MOD = _P.kmeans_sample_mod  # deterministic 1/mod sample (hash-picked)
KMEANS_ITERS = _P.kmeans_iters
TRAINED_CENTROIDS = _P.trained_centroids  # oversegments (lists ≥ clusters)
TRAINED_PROBES = _P.trained_probes


def _arr_at(d: SqlDialect, arr: str, idx1: str) -> str:
    """1-based array element access."""
    if d.name == d.SPARK:
        return f"element_at({arr}, CAST({idx1} AS INT))"
    return f"{arr}[{idx1}]"


def kmeans_centroids_ctes(
    d: SqlDialect,
    emb_rel: str = "embeddings",
    n_centroids: int = IVF_CENTROIDS,
    sample_mod: int = KMEANS_SAMPLE_MOD,
    iters: int = KMEANS_ITERS,
) -> tuple[str, str]:
    """Sampled k-means, expressed in SQL (both dialects) → trained
    centroids. Returns (cte_body, final_relation_name).

    Deterministic end to end: fixed hash-picked sample, fixed
    hash-ordered seeds, fixed iteration count, per-dimension means
    rounded to 4 decimals each round (so float summation order cannot
    flip an assignment between engines). Each iteration is one
    broadcast-join argmax + one bucket-wise VECTOR mean over the sample
    only — on Spark a two-phase elementwise zip_with tree aggregate
    (shuffles sample rows once; never sample × dims exploded rows).

    Scale note: the sample is 1/``sample_mod`` of the corpus — at 10^12
    vectors the CALLER must raise ``sample_mod`` so n/sample_mod lands
    in the usual IVF training budget (~10^5-10^6 vectors); the fixture
    default (20%) is sized for the test corpora.
    """
    dbl = "ARRAY<DOUBLE>" if d.name == d.SPARK else "DOUBLE[]"
    vid_hash = d.hex_to_long(d.md5(d.to_string("vec_id")))
    # hash-decorrelated deterministic sample + hash-ordered seeds: id
    # arithmetic (vec_id % mod) correlates with id-derived data layouts
    # and can collapse the whole sample into one or two natural clusters;
    # hashing makes both the sample and the seed pick pseudo-random while
    # staying engine-portable and deterministic.
    if d.name == d.SPARK:
        # prenormalized sample (sn hoisted once per sample vector); the
        # per-iteration argmax is a min_by aggregate over the broadcast
        # cross join instead of a row_number window — shuffles |sample|
        # aggregated rows per round, not |sample| x |centroids| window
        # rows, and each cosine pays one dot (norms hoisted both sides).
        # Same selection/tie rule, same 4dp-rounded cosine arithmetic.
        samp_sql = (
            f"samp AS (SELECT vec_id, CAST(embedding AS {dbl}) AS emb, "
            f"{norm_expr(d, 'embedding')} AS sn "
            f"FROM {emb_rel} WHERE ({vid_hash}) % {sample_mod} = 0)"
        )
    else:
        samp_sql = (
            f"samp AS (SELECT vec_id, CAST(embedding AS {dbl}) AS emb "
            f"FROM {emb_rel} WHERE ({vid_hash}) % {sample_mod} = 0)"
        )
    parts = [
        samp_sql,
        f"c0 AS (SELECT vec_id AS centroid_id, emb FROM ("
        f"SELECT vec_id, emb FROM samp "
        f"ORDER BY {d.md5(d.to_string('vec_id'))}, vec_id "
        f"LIMIT {n_centroids}) z)",
    ]
    prev = "c0"
    for t in range(1, iters + 1):
        cos = cosine_expr(d, "s.emb", "c.emb")
        if d.name == d.SPARK:
            pcos = (
                f"round({dot_expr(d, 's.emb', 'c.emb')} / "
                f"greatest(s.sn * c.cn, 1e-12), 4)"
            )
            parts.append(
                f"a{t} AS (SELECT vec_id, "
                f"min_by(centroid_id, named_struct('nc', -cos_c, "
                f"'cid', centroid_id)) AS centroid_id FROM ("
                f"SELECT s.vec_id, c.centroid_id, {pcos} AS cos_c "
                f"FROM samp s CROSS JOIN (SELECT centroid_id, emb, "
                f"{norm_expr(d, 'emb')} AS cn FROM {prev}) c) scored "
                f"GROUP BY vec_id)"
            )
        else:
            parts.append(
                f"a{t} AS (SELECT vec_id, centroid_id FROM ("
                f"SELECT s.vec_id, c.centroid_id, "
                f"row_number() OVER (PARTITION BY s.vec_id "
                f"ORDER BY {cos} DESC, c.centroid_id) AS rn "
                f"FROM samp s CROSS JOIN {prev} c) x WHERE rn = 1)"
            )
        if d.name == d.SPARK:
            # Bucket-wise VECTOR mean, no per-dimension explode: the old
            # d{t} stage unnested sample × dims rows through a
            # (centroid, pos) shuffle — 10^8-10^9 shuffled rows per
            # iteration at the documented training budget. Instead, sum
            # vectors elementwise with a two-phase tree aggregate:
            # sub-buckets of ~1/64 of a list first (bounds the
            # collect_list buffer), then combine the ≤64 partial sums
            # per centroid. Rows shuffled = sample rows, once.
            def esum(lst: str) -> str:
                zero = f"transform(element_at({lst}, 1), x -> CAST(0 AS DOUBLE))"
                return (
                    f"aggregate({lst}, {zero}, "
                    f"(acc, v) -> zip_with(acc, v, (p, q) -> p + q))"
                )

            sub = "pmod(xxhash64(s.vec_id), 64)"
            parts.append(
                f"p{t} AS (SELECT a.centroid_id, {sub} AS sub, "
                f"count(*) AS cnt, {esum('collect_list(s.emb)')} AS sums "
                f"FROM a{t} a JOIN samp s USING (vec_id) "
                f"GROUP BY a.centroid_id, {sub})"
            )
            parts.append(
                f"c{t} AS (SELECT centroid_id, "
                f"transform(sums_total, x -> round(x / cnt_total, 4)) AS emb "
                f"FROM (SELECT centroid_id, "
                f"{esum('collect_list(sums)')} AS sums_total, "
                f"sum(cnt) AS cnt_total "
                f"FROM p{t} GROUP BY centroid_id) z)"
            )
        else:
            # oracle dialect: fixture-scale only, the per-dimension
            # unnest is fine and keeps the SQL simple
            val = _arr_at(d, "s.emb", "t.pos")
            parts.append(
                f"d{t} AS (SELECT a.centroid_id, t.pos, avg({val}) AS v "
                f"FROM a{t} a JOIN samp s USING (vec_id) "
                f"CROSS JOIN LATERAL (SELECT unnest(generate_series(1, "
                f"len(s.emb))) AS pos) t "
                f"GROUP BY a.centroid_id, t.pos)"
            )
            parts.append(
                f"c{t} AS (SELECT centroid_id, "
                f"list(round(v, 4) ORDER BY pos) AS emb "
                f"FROM d{t} GROUP BY centroid_id)"
            )
        prev = f"c{t}"
    return ", ".join(parts), prev


def ivf_centroids_sql(
    d: SqlDialect,
    emb_rel: str = "embeddings",
    n_centroids: int | None = None,
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """The k-means training stage as a standalone query:
    (centroid_id, emb).

    Split out so the Spark runner can MATERIALIZE the trained centroids
    once — the trained top-k/near-dup queries reference the centroid
    relation from both the assignment and the probe/pair side, and an
    inlined CTE re-executes the whole iterative k-means per reference.
    At corpus scale this is how IVF works anyway: train once, store the
    centroid table, broadcast it to every assignment job.
    """
    kmeans, cents = kmeans_centroids_ctes(
        d, emb_rel,
        n_centroids=params.trained_centroids if n_centroids is None else n_centroids,
        sample_mod=params.kmeans_sample_mod, iters=params.kmeans_iters,
    )
    return f"WITH {kmeans} SELECT centroid_id, emb FROM {cents}"


def ann_ivf_trained_sql(
    d: SqlDialect, query_vec_id: int = 0, k: int | None = None,
    emb_rel: str = "embeddings", probes: int | None = None,
    n_centroids: int | None = None,
    cents_rel: str | None = None,
    assigned_rel: str | None = None,
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """ANN top-k over k-means-trained IVF lists (probe the best lists).

    Same scale shape as the untrained variant — tiny centroid relation
    (broadcast), probe pruning — but the lists follow the data's actual
    clusters, so recall at equal probe count is higher
    (tests/test_corpus_ops.py measures recall@k vs brute force).
    ``cents_rel`` names a pre-materialized centroid relation (see
    :func:`ivf_centroids_sql`); without it the k-means CTEs are inlined
    (the single-SQL oracle form).
    """
    k = params.topk if k is None else k
    probes = params.trained_probes if probes is None else probes
    if n_centroids is None:
        n_centroids = params.trained_centroids
    if cents_rel is None:
        kmeans, cents = kmeans_centroids_ctes(
            d, emb_rel, n_centroids=n_centroids,
            sample_mod=params.kmeans_sample_mod, iters=params.kmeans_iters,
        )
        prelude = f"WITH {kmeans},"
    else:
        cents = cents_rel
        prelude = "WITH"
    cos_assign = cosine_expr(d, "e.embedding", "c.emb")
    cos_q = cosine_prenorm_expr(
        d, "e.embedding", "q.embedding", norm_expr(d, "e.embedding"), "q.qn"
    )
    cos_probe = cosine_expr(d, "c.emb", "q.embedding")
    if assigned_rel is not None:
        assigned_body = f"SELECT vec_id, centroid_id FROM {assigned_rel}"
    elif d.name == d.SPARK:
        assigned_body = spark_argmax_assign_sql(emb_rel, cents)
    else:
        assigned_body = f"""
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_assign} DESC, c.centroid_id) AS rn
        FROM {emb_rel} e CROSS JOIN {cents} c
      ) x WHERE rn = 1
    """
    return f"""
    {prelude}
    assigned AS ({assigned_body}),
    q AS (SELECT embedding, {norm_expr(d, "embedding")} AS qn
          FROM {emb_rel} WHERE vec_id = {query_vec_id}),
    probe_set AS (
      SELECT centroid_id FROM (
        SELECT c.centroid_id,
               row_number() OVER (PARTITION BY c.centroid_id % 1
                 ORDER BY {cos_probe} DESC, c.centroid_id) AS rn
        FROM {cents} c CROSS JOIN q
      ) rp WHERE rn <= {probes}
    ),
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
    cos = cosine_prenorm_expr(
        d, "ea.embedding", "eb.embedding", "ea.nrm", "eb.nrm"
    )
    if d.name == d.SPARK:
        # fenced cut — see neardup_pairs_from_assigned_sql
        return f"""
    WITH assigned AS ({assign}),
    norms AS ({emb_norms_sql(d, emb_rel)})
    SELECT vec_a, vec_b, cosine FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine{d.fence_field()}
      FROM assigned a
      JOIN assigned b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      JOIN norms ea ON ea.vec_id = a.vec_id
      JOIN norms eb ON eb.vec_id = b.vec_id
    ) verified WHERE {d.fence_pred()}cosine >= {threshold}
    """
    return f"""
    WITH assigned AS ({assign}),
    norms AS ({emb_norms_sql(d, emb_rel)})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
    FROM assigned a
    JOIN assigned b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    JOIN norms ea ON ea.vec_id = a.vec_id
    JOIN norms eb ON eb.vec_id = b.vec_id
    WHERE {cos} >= {threshold}
    """


def embedding_neardup_exact_sql(
    d: SqlDialect, threshold: float = 0.3, emb_rel: str = "embeddings"
) -> str:
    """Embedding-cosine near-duplicate pairs, exact all-pairs baseline.

    O(n²) comparisons — this is the VERIFICATION tier: run it on a
    sample (or a fixture) to measure the recall of the IVF-bucketed
    variant (`embedding_neardup_sql`), never on the full corpus. At
    100 TB the bucketed join is the only viable shape; this query is
    what its recall is measured against (tests/test_corpus_ops.py).
    """
    cos = cosine_prenorm_expr(
        d, "ea.embedding", "eb.embedding", "ea.nrm", "eb.nrm"
    )
    if d.name == d.SPARK:
        # fenced cut — see neardup_pairs_from_assigned_sql
        return f"""
    WITH norms AS ({emb_norms_sql(d, emb_rel)})
    SELECT vec_a, vec_b, cosine FROM (
      SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b, {cos} AS cosine{d.fence_field()}
      FROM norms ea
      JOIN norms eb ON ea.vec_id < eb.vec_id
    ) verified WHERE {d.fence_pred()}cosine >= {threshold}
    """
    return f"""
    WITH norms AS ({emb_norms_sql(d, emb_rel)})
    SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b, {cos} AS cosine
    FROM norms ea
    JOIN norms eb ON ea.vec_id < eb.vec_id
    WHERE {cos} >= {threshold}
    """


def embedding_neardup_trained_sql(
    d: SqlDialect,
    threshold: float = 0.3,
    emb_rel: str = "embeddings",
    n_centroids: int | None = None,
    assign_r: int = 2,
    cents_rel: str | None = None,
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """Near-duplicate pairs over k-means-trained IVF lists with
    multi-assignment: every vector lands in its ``assign_r`` closest
    lists, and a pair is compared when ANY list is shared — the standard
    fix for near-dups straddling a bucket boundary (single-assignment
    loses exactly the pairs whose two members argmax into different
    lists; tests/test_ivf_recall.py measures the recall difference).

    Scale shape: centroid relation is tiny (broadcast); candidate set is
    ~assign_r² × in-bucket pairs, never O(n²); DISTINCT dedups the
    multi-list collisions before the (expensive) cosine verify.
    """
    if n_centroids is None:
        n_centroids = params.trained_centroids
    if cents_rel is None:
        kmeans, cents = kmeans_centroids_ctes(
            d, emb_rel, n_centroids=n_centroids,
            sample_mod=params.kmeans_sample_mod, iters=params.kmeans_iters,
        )
        prelude = f"WITH {kmeans},"
    else:
        cents = cents_rel
        prelude = "WITH"
    assign = ivf_multi_assign_sql(d, emb_rel, cents, assign_r)
    pairs = neardup_pairs_from_assigned_sql(d, "norms", "assigned", threshold)
    return (
        f"{prelude} assigned AS ({assign}), "
        f"norms AS ({emb_norms_sql(d, emb_rel)}) {pairs}"
    )


def _spark_prenorm_sides(emb_rel: str, cents_rel: str,
                         vec_col: str = "embedding") -> tuple[str, str, str]:
    """Spark-side prenormalized (vector side, centroid side, cosine)
    for assignment joins: hoists BOTH norms and the float→double cast to
    per-relation projections, so the per-(vector, centroid) work is one
    dot + one divide instead of three array aggregates + two casts.
    Arithmetic is bit-identical to cosine_expr (same dot, same
    greatest(en*cn, 1e-12), same 4dp round)."""
    d = SPARK_DIALECT
    e_side = (
        f"(SELECT vec_id, CAST({vec_col} AS ARRAY<DOUBLE>) AS emb, "
        f"{norm_expr(d, vec_col)} AS en FROM {emb_rel}) e"
    )
    c_side = (
        f"(SELECT centroid_id, CAST(emb AS ARRAY<DOUBLE>) AS emb, "
        f"{norm_expr(d, 'emb')} AS cn FROM {cents_rel}) c"
    )
    cos = (
        f"round({dot_expr(d, 'e.emb', 'c.emb')} / "
        f"greatest(e.en * c.cn, 1e-12), 4)"
    )
    return e_side, c_side, cos


def spark_topr_assign_sql(
    emb_rel: str, cents_rel: str, assign_r: int,
    vec_col: str = "embedding",
) -> str:
    """Spark-only top-r assignment WITHOUT the window-over-cross-join:
    the r closest centroids per vector via one aggregation over the
    broadcast nested-loop join — collect the (−cos, centroid) structs
    per vector (map-side partial, the C rows of a vector never leave
    their scan partition before reduction), array_sort, slice r,
    explode. Same selection and tie rule as the row_number form
    (ORDER BY cos DESC, centroid_id ≡ ascending (−cos, centroid_id);
    IEEE negation is order-reversing, signed zeros included), but the
    shuffle carries |vectors| aggregated rows instead of
    |vectors|×|centroids| window rows, and each cosine costs one dot
    (norms hoisted per side) instead of three array aggregates."""
    e_side, c_side, cos = _spark_prenorm_sides(emb_rel, cents_rel, vec_col)
    return f"""
      SELECT vec_id, s.cid AS centroid_id FROM (
        SELECT vec_id,
               slice(array_sort(collect_list(
                 named_struct('nc', -cos_c, 'cid', centroid_id))),
                 1, {assign_r}) AS top
        FROM (SELECT e.vec_id, c.centroid_id, {cos} AS cos_c
              FROM {e_side} CROSS JOIN {c_side}) scored
        GROUP BY vec_id
      ) t LATERAL VIEW explode(t.top) x AS s"""


def spark_argmax_assign_sql(
    emb_rel: str, cents_rel: str, vec_col: str = "embedding",
) -> str:
    """Spark-only argmax assignment (top-1): min_by over the same
    (−cos, centroid_id) struct — no collect_list buffer at all."""
    e_side, c_side, cos = _spark_prenorm_sides(emb_rel, cents_rel, vec_col)
    return f"""
      SELECT vec_id,
             min_by(centroid_id,
                    named_struct('nc', -cos_c, 'cid', centroid_id))
               AS centroid_id
      FROM (SELECT e.vec_id, c.centroid_id, {cos} AS cos_c
            FROM {e_side} CROSS JOIN {c_side}) scored
      GROUP BY vec_id"""


def _lit_double(v: float) -> str:
    """Exact SQL double literal: repr() is the shortest decimal that
    round-trips binary64, and a string→double CAST parses it back to the
    identical bits (correctly-rounded parse). Constant-folded by
    Catalyst, so the cost is plan-time only."""
    return f"CAST('{v!r}' AS DOUBLE)"


def unrolled_sorted_structs(
    cent_rows: list[tuple[int, list[float]]],
) -> str:
    """The guarded, SORTED (−cos, centroid_id) struct array over
    literal-inlined centroid coefficients — the shared core of the
    unrolled assignment forms. Expects the consumer to project
    ``emb`` (the vector as ARRAY<DOUBLE>) and ``en`` (its norm);
    element k of the result is the k-th-closest centroid under the
    exact assignment rule (see :func:`unrolled_assign_sql`)."""
    import math

    dims = len(cent_rows[0][1])
    structs_fast, structs_slow = [], []
    for cid, emb in sorted(cent_rows, key=lambda r: r[0]):
        acc = 0.0
        for v in emb:
            acc += v * v
        cn = _lit_double(math.sqrt(acc))
        dot_fast = " + ".join(
            ["CAST(0 AS DOUBLE)"]
            + [f"element_at(emb, {k + 1}) * {_lit_double(v)}"
               for k, v in enumerate(emb)]
        )
        arr_lit = "array(" + ", ".join(_lit_double(v) for v in emb) + ")"
        dot_slow = (
            f"aggregate(zip_with(emb, {arr_lit}, (x, y) -> x * y), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        for dot, structs in ((dot_fast, structs_fast), (dot_slow, structs_slow)):
            structs.append(
                f"named_struct('nc', -round(({dot}) / "
                f"greatest(en * {cn}, 1e-12), 4), "
                f"'cid', CAST({cid} AS BIGINT))"
            )
    fast_arr = "array(" + ", ".join(structs_fast) + ")"
    slow_arr = "array(" + ", ".join(structs_slow) + ")"
    return (
        f"array_sort(CASE WHEN size(emb) = {dims} THEN {fast_arr} "
        f"ELSE {slow_arr} END)"
    )


def unrolled_assign_sql(
    cent_rows: list[tuple[int, list[float]]],
    emb_rel: str,
    assign_r: int,
    vec_col: str = "embedding",
) -> str:
    """Spark-only top-r assignment with the centroid VALUES inlined as
    literal coefficients — a pure codegen projection: no join, no
    shuffle, no interpreted higher-order-function fold.

    ``cent_rows`` is the materialized centroid relation read once on the
    driver (|C| x dims doubles — the same driver-side-metadata class as
    bucket lists / one-row tops). Bit-identical to
    :func:`spark_topr_assign_sql` by construction:

    - the dot is spelled as ``0.0 + e[1]*c1 + e[2]*c2 + …`` — the same
      left-to-right IEEE fold (including the 0.0 seed) as
      ``aggregate(zip_with(..), 0.0D, +)``;
    - centroid norms are folded in Python with the identical ordered
      ``acc += v*v`` / sqrt sequence and inlined via exact literals;
    - the same ``round(dot / greatest(en*cn, 1e-12), 4)`` cosine and the
      same ascending ``(−cos, centroid_id)`` tie rule, here via
      ``array_sort`` over the identical struct;
    - vectors whose length differs from the centroid dimensionality
      (impossible for k-means output, but guarded anyway) fall back to
      the original ``aggregate(zip_with(...))`` fold over a literal
      array — CASE branches evaluate lazily, so typical rows never pay
      for the guard.

    For ``assign_r == 1`` the result is a plain projection
    (``element_at(array_sort(...), 1).cid`` — no Generate at all). For
    larger r the sorted-slice column is FENCED below the explode:
    without the fence, CollapseProject inlines the whole literal array
    into the Generate operator, which evaluates its generator outside
    whole-stage codegen — measured 25s vs 0.9s at 20k vectors.
    """
    guarded = unrolled_sorted_structs(cent_rows)
    d = SPARK_DIALECT
    e_side = (
        f"(SELECT vec_id, CAST({vec_col} AS ARRAY<DOUBLE>) AS emb, "
        f"{norm_expr(d, vec_col)} AS en FROM {emb_rel}) e"
    )
    if assign_r == 1:
        return (
            f"SELECT vec_id, element_at({guarded}, 1).cid AS centroid_id "
            f"FROM {e_side}"
        )
    return f"""
      SELECT vec_id, s.cid AS centroid_id FROM (
        SELECT vec_id, slice({guarded}, 1, {assign_r}) AS top,
               spark_partition_id() AS __fence
        FROM {e_side}
      ) t LATERAL VIEW explode(t.top) x AS s
      WHERE __fence >= 0"""


# Literal-inlining budget: |centroids| x dims coefficient terms beyond
# this compile to a pathologically large projection (plan/codegen cost
# grows linearly and eventually trips method limits), so bigger index
# configs keep the aggregate form. 16x64 default = 1024 terms.
UNROLL_MAX_TERMS = 20_000


def assign_df(
    spark,
    emb_rel: str = "embeddings",
    cents_rel: str = "ivf_centroids",
    assign_r: int = 2,
    vec_col: str = "embedding",
):
    """DataFrame twin of :func:`ivf_multi_assign_sql` (Spark side) over a
    MATERIALIZED centroid view: reads the centroid values once on the
    driver and runs :func:`unrolled_assign_sql`. Same rows as the
    aggregate/window forms (pinned by tests/test_shingle_batch.py).
    Falls back to the aggregate form when the config's |C| x dims
    exceeds the inlining budget (UNROLL_MAX_TERMS)."""
    rows = spark.table(cents_rel).collect()
    cent_rows = [(r["centroid_id"], list(r["emb"])) for r in rows]
    if not cent_rows or len(cent_rows) * len(cent_rows[0][1]) > UNROLL_MAX_TERMS:
        return spark.sql(
            spark_topr_assign_sql(emb_rel, cents_rel, assign_r, vec_col)
        )
    return spark.sql(
        unrolled_assign_sql(cent_rows, emb_rel, assign_r, vec_col=vec_col)
    )


def ivf_multi_assign_sql(
    d: SqlDialect, emb_rel: str, cents_rel: str, assign_r: int = 2
) -> str:
    """Multi-assignment stage: (vec_id, centroid_id) for each vector's
    ``assign_r`` closest centroids. Staged separately so the Spark
    runner can materialize it: the pair join reads it from BOTH sides.
    Spark uses the aggregate top-r form (see spark_topr_assign_sql);
    the oracle keeps the row_number-over-cross-join text."""
    if d.name == d.SPARK:
        return spark_topr_assign_sql(emb_rel, cents_rel, assign_r,
                                     vec_col="embedding")
    cos_assign = cosine_expr(d, "e.embedding", "c.emb")
    return f"""
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_assign} DESC, c.centroid_id) AS rn
        FROM {emb_rel} e CROSS JOIN {cents_rel} c
      ) x WHERE rn <= {assign_r}"""


def neardup_pairs_from_assigned_sql(
    d: SqlDialect, norms_rel: str, assigned_rel: str, threshold: float = 0.3
) -> str:
    """Pair stage over (materialized) multi-assignment + norm relations.

    ``norms_rel`` must expose (vec_id, embedding, nrm) — see
    :func:`emb_norms_sql`; the verify then pays one dot per pair."""
    cos = cosine_prenorm_expr(
        d, "ea.embedding", "eb.embedding", "ea.nrm", "eb.nrm"
    )
    if d.name == d.SPARK:
        # fenced threshold cut (dialect.fence_field): without it the
        # WHERE re-evaluates the pair dot below the projection (Filter
        # predicates get no subexpression elimination) — 2 dots per
        # candidate pair instead of 1, measured ~2x the verify stage at
        # 48M candidates. DuckDB keeps the original single-SELECT text
        # (its optimizer CSEs the shared aggregate).
        return f"""
    SELECT vec_a, vec_b, cosine FROM (
      SELECT c.vec_a, c.vec_b, {cos} AS cosine{d.fence_field()}
      FROM (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM {assigned_rel} a
        JOIN {assigned_rel} b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      ) c
      JOIN {norms_rel} ea ON ea.vec_id = c.vec_a
      JOIN {norms_rel} eb ON eb.vec_id = c.vec_b
    ) verified WHERE {d.fence_pred()}cosine >= {threshold}
    """
    return f"""
    SELECT c.vec_a, c.vec_b, {cos} AS cosine
    FROM (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM {assigned_rel} a
      JOIN {assigned_rel} b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    ) c
    JOIN {norms_rel} ea ON ea.vec_id = c.vec_a
    JOIN {norms_rel} eb ON eb.vec_id = c.vec_b
    WHERE {cos} >= {threshold}
    """


def neardup_pairs_from_assigned_df(
    spark,
    norms_rel: str,
    assigned_rel: str,
    threshold: float = 0.3,
):
    """DataFrame twin of :func:`neardup_pairs_from_assigned_sql` with the
    per-pair dot products computed as per-BUCKET vectorized batches in
    numpy (guide §4.2: hand whole batches to native code) instead of 48M
    interpreted ``aggregate(zip_with(...))`` lambda folds — measured
    46s → ~4s for the verify stage at 48M candidate pairs, same rows.

    Value-identical by construction, not by luck:

    - candidate SCREENING runs as a float32 GEMM per row block (the
      fastest dense primitive available), with a conservative margin:
      ``|cos32 − cos64| ≤ ~(dims+4)·eps32 ≈ 5e-6`` relative (the error
      of a float32 dot is bounded by eps32·Σ|aₖbₖ| per accumulation
      step and Σ|aₖbₖ| ≤ ‖a‖‖b‖ = nn, so the bound holds regardless of
      cancellation), screened at ``threshold − 1e-3`` — two orders of
      magnitude of slack, so no pair the exact cut would keep can be
      screened out. Screen false-positives cost only a re-verify.
    - every RETURNED dot is then recomputed for the surviving pairs
      dimension-by-dimension in index order (``acc += Ai[:,k] *
      Aj[:,k]``), which is bit-for-bit the JVM's left-to-right
      ``aggregate(zip_with(a, b, *), 0.0, +)`` fold over float64 —
      numpy elementwise ops are IEEE doubles, and float32 → float64
      widening is exact. No BLAS value ever leaves Python: the GEMM
      only decides which pairs get the exact fold.
    - Python applies only a CONSERVATIVE final pre-cut (threshold minus
      1e-4 margin on the unrounded exact cosine — same cut as before
      the GEMM screen existed, so the emitted row set is unchanged);
      the exact, oracle-shared ``round(dot / greatest(nn, 1e-12), 4) >=
      threshold`` cut runs in Spark SQL on the returned exact dot/nn —
      so Spark-vs-DuckDB rounding semantics never depend on Python.
    - a pair sharing two IVF lists yields two bit-identical rows; the
      SQL tail dedups them with DISTINCT before the projection.

    Scale shape: one tiny shuffle of (centroid, vec, embedding, norm)
    rows onto the bucket key; per-bucket all-pairs via row-block GEMM
    (memory-bounded: BLOCK×|bucket| accumulators, never |bucket|²);
    output rows ≈ final pairs (the screen drops ~98% of candidates
    inside Python). Hot buckets split the same way the salted LSH join
    does — on the occupancy view's evidence.
    """
    import pandas as pd  # noqa: F401 — applyInPandas contract

    def bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "dot": [], "nn": []}
            ).astype({"vec_a": "int64", "vec_b": "int64",
                      "dot": "float64", "nn": "float64"})
        A = np.asarray(
            [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
        )
        A32 = A.astype(np.float32)
        AT = np.ascontiguousarray(A.T)   # (dims, n): contiguous fold rows
        nrm32 = nrm.astype(np.float32)
        dims = A.shape[1]
        cut = threshold - 1e-4          # exact-cosine cut (unchanged)
        cut32 = threshold - 1e-3        # float32 screen, ≥100× the error bound
        out_a, out_b, out_dot, out_nn = [], [], [], []
        BLOCK = 1024
        jj = np.arange(n)
        for s in range(0, n, BLOCK):
            e = min(s + BLOCK, n)
            # float32 GEMM screen (values never emitted)
            g32 = A32[s:e] @ A32.T
            nn32 = np.maximum(
                nrm32[s:e, None] * nrm32[None, :], np.float32(1e-12)
            )
            g32 /= nn32
            keep = g32 >= cut32
            keep &= jj[None, :] > np.arange(s, e)[:, None]
            ii, jx = np.nonzero(keep)
            if not len(ii):
                continue
            # exact fold for survivors only: gather the pair COLUMNS from
            # the transposed copy (each aiT[k] is contiguous), then
            # dimension-ORDERED accumulation = the JVM fold, vectorized
            aiT, ajT = AT[:, ii + s], AT[:, jx]
            acc = np.zeros(len(ii))
            tmp = np.empty(len(ii))
            for k in range(dims):
                np.multiply(aiT[k], ajT[k], out=tmp)
                acc += tmp
            pnn = nrm[ii + s] * nrm[jx]
            fin = (acc / np.maximum(pnn, 1e-12)) >= cut
            out_a.append(ids[ii + s][fin])
            out_b.append(ids[jx][fin])
            out_dot.append(acc[fin])
            out_nn.append(pnn[fin])
        if not out_a:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "dot": [], "nn": []}
            ).astype({"vec_a": "int64", "vec_b": "int64",
                      "dot": "float64", "nn": "float64"})
        return pd.DataFrame({
            "vec_a": np.concatenate(out_a),
            "vec_b": np.concatenate(out_b),
            "dot": np.concatenate(out_dot),
            "nn": np.concatenate(out_nn),
        })

    joined = spark.sql(f"""
        SELECT a.centroid_id, a.vec_id, n.embedding, n.nrm
        FROM {assigned_rel} a JOIN {norms_rel} n USING (vec_id)
    """)
    pairs = joined.groupBy("centroid_id").applyInPandas(
        bucket_pairs,
        "vec_a long, vec_b long, dot double, nn double",
    )
    pairs.createOrReplaceTempView("__neardup_bucket_pairs")
    return spark.sql(f"""
        SELECT vec_a, vec_b, cosine FROM (
          SELECT vec_a, vec_b,
                 round(dot / greatest(nn, 1e-12), 4) AS cosine,
                 spark_partition_id() AS __fence
          FROM (SELECT DISTINCT vec_a, vec_b, dot, nn
                FROM __neardup_bucket_pairs) d
        ) verified WHERE __fence >= 0 AND cosine >= {threshold}
    """)


def ivf_occupancy_sql(
    d: SqlDialect,
    emb_rel: str = "embeddings",
    cents_rel: str | None = None,
    assigned_rel: str | None = None,
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """IVF list occupancy: (centroid_id, n_vectors, permille) — the
    vector-side twin of the LSH band-occupancy view (dedup.band_index):
    list sizes ARE the skew profile of every downstream cost. A hot
    list inflates the in-bucket pair join of ``embedding_neardup``
    quadratically and every probe that ranks it; the fixes (probe more
    + smaller lists via more centroids, or block-salt the pair join
    like ``dedup_minhash_lsh_salted``) are sized from exactly this
    histogram, the same way choose_salt_buckets reads the keyset
    histogram.

    Scale shape: one broadcast argmax assignment (the corpus never
    shuffles for the window — row_number partitions by vec_id within
    the scan) + one groupBy over |centroids| keys with map-side
    partials. Permille is integer fixed-point so the report stays
    hash-stable cross-engine.
    """
    if cents_rel is None:
        kmeans, cents = kmeans_centroids_ctes(
            d, emb_rel, n_centroids=params.trained_centroids,
            sample_mod=params.kmeans_sample_mod, iters=params.kmeans_iters,
        )
        prelude = f"WITH {kmeans},"
    else:
        cents = cents_rel
        prelude = "WITH"
    if assigned_rel is not None:
        assign = f"SELECT vec_id, centroid_id FROM {assigned_rel}"
    else:
        assign = ivf_multi_assign_sql(d, emb_rel, cents, assign_r=1)
    return f"""
    {prelude}
    assigned AS ({assign}),
    tot AS (SELECT count(*) AS n FROM assigned)
    SELECT centroid_id,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST({d.int_div('count(*) * 1000', '(SELECT n FROM tot)')} AS BIGINT)
             AS permille
    FROM assigned
    GROUP BY centroid_id
    """


def ann_topk_batch_sql(
    d: SqlDialect,
    n_queries: int = 5,
    k: int | None = None,
    emb_rel: str = "embeddings",
    probes: int | None = None,
    cents_rel: str | None = None,
    assigned_rel: str | None = None,
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """BATCH ANN: top-k neighbours for EVERY query in a query set, one
    job — the retrieval shape a training pipeline actually runs (dedup
    a batch, kNN-label a batch), not one query at a time.

    Scale shape: the query relation and centroid relation are both tiny
    (broadcast); every query probes its best ``probes`` k-means lists;
    candidates come from ONE bucket join (assignment × probe set);
    ranking is one window partitioned BY QUERY. Corpus rows outside
    every probed list are never scored. With Q queries the cost is
    Q × probed-fraction of the corpus — never Q × |corpus|.

    The query set is the first ``n_queries`` vectors (deterministic,
    shared with the oracle); self-matches are excluded per query.
    """
    k = params.topk if k is None else k
    probes = params.trained_probes if probes is None else probes
    if cents_rel is None:
        kmeans, cents = kmeans_centroids_ctes(
            d, emb_rel, n_centroids=params.trained_centroids,
            sample_mod=params.kmeans_sample_mod, iters=params.kmeans_iters,
        )
        prelude = f"WITH {kmeans},"
    else:
        cents = cents_rel
        prelude = "WITH"
    cos_assign = cosine_expr(d, "e.embedding", "c.emb")
    cos_probe = cosine_expr(d, "c.emb", "q.embedding")
    cos_q = cosine_prenorm_expr(
        d, "n.embedding", "q.embedding", "n.nrm", "q.qn"
    )
    if assigned_rel is not None:
        assigned_body = f"SELECT vec_id, centroid_id FROM {assigned_rel}"
    elif d.name == d.SPARK:
        assigned_body = spark_argmax_assign_sql(emb_rel, cents)
    else:
        assigned_body = f"""
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_assign} DESC, c.centroid_id) AS rn
        FROM {emb_rel} e CROSS JOIN {cents} c
      ) x WHERE rn = 1
    """
    return f"""
    {prelude}
    assigned AS ({assigned_body}),
    q AS (SELECT vec_id AS q_id, embedding, {norm_expr(d, "embedding")} AS qn
          FROM {emb_rel} WHERE vec_id < {n_queries}),
    probe_set AS (
      SELECT q_id, centroid_id FROM (
        SELECT q.q_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.q_id
                                  ORDER BY {cos_probe} DESC, c.centroid_id) AS rn
        FROM {cents} c CROSS JOIN q
      ) rp WHERE rn <= {probes}
    ),
    cand AS (
      SELECT p.q_id, a.vec_id
      FROM probe_set p JOIN assigned a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id != p.q_id
    ),
    norms AS (SELECT vec_id, label, embedding,
              {norm_expr(d, "embedding")} AS nrm FROM {emb_rel})
    SELECT q_id, vec_id, label, cosine FROM (
      SELECT c.q_id, c.vec_id, n.label, {cos_q} AS cosine,
             row_number() OVER (PARTITION BY c.q_id
                                ORDER BY {cos_q} DESC, c.vec_id) AS rnk
      FROM cand c
      JOIN norms n ON n.vec_id = c.vec_id
      JOIN q ON q.q_id = c.q_id
    ) ranked WHERE rnk <= {k}
    """


# -- int8 vector quantization --------------------------------------------------
# symmetric per-vector scheme: q_i = floor(x_i * 127 / max|x| + 0.5),
# scale = max|x| / 127. floor(+0.5) instead of round() pins the tie rule
# across engines (Spark rounds HALF_UP, DuckDB half-even). Cosine over
# quantized vectors is scale-free (the per-vector scales cancel), so an
# int8 store answers cosine ANN with no dequant error beyond the
# quantization itself.


def quantized_embeddings_sql(d: SqlDialect, emb_rel: str = "embeddings") -> str:
    """The int8 store: (vec_id, label, qvec ARRAY<INT in [-127,127]>,
    scale DOUBLE) — 4x smaller vector bytes than float32 at 100 TB
    (the production form writes TINYINT parquet; the logical scheme is
    what the gate pins)."""
    if d.name == d.SPARK:
        ma = (
            "greatest(array_max(transform(CAST(embedding AS ARRAY<DOUBLE>),"
            " x -> abs(x))), 1e-12)"
        )
        qv = (
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(floor(x * 127 / ma + 0.5) AS INT))"
        )
    else:
        ma = (
            "greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),"
            " x -> abs(x))), 1e-12)"
        )
        qv = (
            "list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> CAST(floor(x * 127 / ma + 0.5) AS INT))"
        )
    return f"""
    SELECT vec_id, label, {qv} AS qvec, ma / 127 AS scale
    FROM (SELECT *, {ma} AS ma FROM {emb_rel}) withmax
    """


def dequantized_embeddings_sql(d: SqlDialect, emb_rel: str = "embeddings") -> str:
    """What the engine reads back from the int8 store: the same
    (vec_id, label, embedding) relation with quantization error applied
    — so every float-vector operator runs UNCHANGED over it."""
    dq = (
        "transform(qvec, x -> x * scale)" if d.name == d.SPARK
        else "list_transform(qvec, x -> x * scale)"
    )
    return f"""
    SELECT vec_id, label, {dq} AS embedding
    FROM ({quantized_embeddings_sql(d, emb_rel)}) quantized
    """


def ann_topk_ivf_quantized_sql(
    d: SqlDialect, query_vec_id: int = 0, k: int | None = None,
    emb_rel: str = "embeddings",
    params: CorpusParams = DEFAULT_CORPUS_PARAMS,
) -> str:
    """IVF top-k where BOTH the index and the scoring read the int8
    store — :func:`ivf_topk_sql` verbatim over the dequantized
    relation, so the quantized path exercises the exact operator a
    float store uses. Recall vs the float store is pytest-pinned
    (test_ivf_recall); parity of the arithmetic itself is oracle-gated
    like every other query."""
    body = ivf_topk_sql(d, query_vec_id, k, "qemb", params).lstrip()
    assert body.startswith("WITH ")
    return (
        f"WITH qemb AS ({dequantized_embeddings_sql(d, emb_rel)}), "
        + body[len("WITH "):]
    )
