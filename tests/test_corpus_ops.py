"""Corpus operators (dedup / similarity / text analysis): parity + semantics."""

from __future__ import annotations

import duckdb
import pytest
from conftest import SF_DIR, assert_df_equals_oracle

from slog_agent_spark.plans import corpus as C

PAIRS = [
    ("token_count", C.token_count_query, C.token_count_oracle),
    ("quality", C.quality_query, C.quality_oracle),
    ("langid", C.langid_query, C.langid_oracle),
    ("fingerprint", C.fingerprint_query, C.fingerprint_oracle),
    ("exact_dedup", C.exact_dedup_query, C.exact_dedup_oracle),
    ("minhash_lsh", C.minhash_lsh_query, C.minhash_lsh_oracle),
    # the salted form's oracle IS the plain single-SQL pairs query, so
    # this parity row pins "salting is placement-only" on the fixture
    ("minhash_lsh_salted", C.minhash_lsh_salted_query,
     C.minhash_lsh_salted_oracle),
    ("simhash", C.simhash_query, C.simhash_oracle),
    ("ngram_jaccard", C.ngram_jaccard_query, C.ngram_jaccard_oracle),
    ("boilerplate", C.boilerplate_query, C.boilerplate_oracle),
    ("ann_bruteforce", C.ann_bruteforce_query, C.ann_bruteforce_oracle),
    ("ann_ivf", C.ann_ivf_query, C.ann_ivf_oracle),
    ("emb_neardup", C.emb_neardup_query, C.emb_neardup_oracle),
]


@pytest.mark.parametrize("name,query,oracle", PAIRS, ids=[p[0] for p in PAIRS])
def test_parity(spark, duck, name, query, oracle):
    df = query(spark, SF_DIR)
    # normalize integer widths for comparison
    from pyspark.sql import functions as F

    for c, t in df.dtypes:
        if t in ("int", "bigint"):
            df = df.withColumn(c, F.col(c).cast("long"))
    assert_df_equals_oracle(df, duck, oracle())


def test_minhash_finds_near_duplicates(spark):
    """LSH candidates verified by true Jaccard must be real near-dups."""
    rows = C.minhash_lsh_query(spark, SF_DIR).collect()
    assert rows, "corpus should contain near-duplicate documents"
    assert all(r["jaccard"] >= 0.35 for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_ngram_jaccard_exact_superset_of_lsh(spark):
    """Exact inverted-index Jaccard finds every pair LSH found (LSH can
    only miss pairs, never invent them above the shared threshold).
    Comfortably-above-threshold LSH pairs must appear exactly; boundary
    pairs may differ only via the documented stop-shingle cut."""
    exact_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in C.ngram_jaccard_query(spark, SF_DIR).collect()
    }
    assert exact_pairs, "corpus should contain near-duplicate documents"
    assert all(j >= 0.35 for j in exact_pairs.values())
    lsh_strong = {
        (r["doc_a"], r["doc_b"])
        for r in C.minhash_lsh_query(spark, SF_DIR).collect()
        if r["jaccard"] >= 0.45
    }
    # Pinned to the sf0.01 fixture: the exact query's NGRAM_DF_CAP
    # stop-shingle cut could push a strong pair whose overlap sits in
    # df>cap shingles below the threshold at other corpus sizes.
    assert SF_DIR.endswith("sf0.001")
    assert lsh_strong <= set(exact_pairs)


def test_ann_ivf_recall_vs_bruteforce(spark):
    exact = {r["vec_id"] for r in C.ann_bruteforce_query(spark, SF_DIR).collect()}
    approx = {r["vec_id"] for r in C.ann_ivf_query(spark, SF_DIR).collect()}
    assert len(approx) == len(exact) == 10
    # IVF with 2/8 probes: expect meaningful (not necessarily full) recall
    assert len(exact & approx) >= 3


def test_exact_dedup_covers_corpus(spark):
    rows = C.exact_dedup_query(spark, SF_DIR).collect()
    assert sum(r["group_size"] for r in rows) == 500


def test_contamination_flags_eval_overlap(duck):
    """A corpus doc embedding an eval doc's text is flagged with a high
    contamination ratio; unrelated docs are not flagged (DuckDB-executed
    — the generators are dual-dialect, parity is pinned by the gate)."""
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators.textops import contamination_sql

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (0, eval_text),                                   # the eval doc
        (10, "prefix words " + eval_text + " suffix words here"),  # contaminated
        (11, "completely different content about databases and engines ok"),
    ]
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con = duckdb.connect()
    sql = contamination_sql(DUCKDB, rel=f"(VALUES {vals}) docs(doc_id, text)",
                            min_shared=3)
    got = {r[0]: r for r in con.execute(sql).fetchall()}
    assert 10 in got and got[10][1] == 0       # flagged against eval doc 0
    assert got[10][3] > 0.4                    # high shared-shingle ratio
    assert 11 not in got                       # clean doc untouched


def test_boilerplate_cuts_cross_doc_spans(duck):
    """A 3-token span shared by ``min_docs`` documents is cut from every
    one of them (covered counts + clean_hash pin the rewrite); a doc
    without the span is untouched and hashes to its own tokenized text
    (DuckDB-executed — parity is pinned by the gate + test_parity)."""
    import hashlib

    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators.textops import boilerplate_sql

    rows = [
        (1, "alpha beta gamma delta common tail phrase"),
        (2, "zeta eta theta common tail phrase iota"),
        (3, "unique words only here nothing shared"),
    ]
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    sql = boilerplate_sql(
        DUCKDB, rel=f"(VALUES {vals}) docs(doc_id, text)", min_docs=2
    )
    got = {r[0]: r for r in duckdb.connect().execute(sql).fetchall()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 1: "common tail phrase" starts at pos 5, covers tokens 5-7
    assert got[1][1:4] == (7, 1, 3)
    assert got[1][5] == md5("alpha beta gamma delta")
    # doc 2: span starts at pos 4, covers 4-6; surrounding tokens survive
    assert got[2][1:4] == (7, 1, 3)
    assert got[2][5] == md5("zeta eta theta iota")
    # doc 3: no shared span — untouched, ratio 0
    assert got[3][1:4] == (6, 0, 0) and got[3][4] == 0.0
    assert got[3][5] == md5(rows[2][1])


def test_length_histogram_buckets_are_integer_exact(duck):
    """Boundary values land in the right bucket (no float log2) and the
    rollup conserves doc/token totals."""
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators.textops import doc_length_histogram_sql

    # docs with exactly 15, 16, 31 and 32 whitespace tokens
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([15, 16, 31, 32])]
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con = duckdb.connect()
    sql = doc_length_histogram_sql(
        DUCKDB, rel=f"(VALUES {vals}) docs(doc_id, text)"
    )
    got = {r[0]: r for r in con.execute(sql).fetchall()}
    assert got[0][2] == 1 and got[0][1] == "< 16"     # the 15-token doc
    assert got[1][2] == 2 and got[1][1] == "16-31"    # 16 and 31
    assert got[2][2] == 1 and got[2][1] == "32-63"    # 32
    assert sum(r[2] for r in got.values()) == 4
    assert sum(r[3] for r in got.values()) == 15 + 16 + 31 + 32


def test_dedup_groups_cc_fixpoint_and_transitivity(spark, sf_dir):
    """The runner converges within the oracle's fixed round budget on
    the fixture (which is exactly what keeps the fixed-CC_ITERS DuckDB
    oracle form exact there), components are edge-consistent (both
    endpoints of every near-dup pair share a group), and the exemplar
    is the group min."""
    from slog_agent_spark.functions.dialect import SPARK as SD
    from slog_agent_spark.operators import dedup as D

    got = {r["doc_id"]: r for r in C.dedup_groups_query(spark, sf_dir).collect()}
    # would raise if the fixture needed more than CC_ITERS+1 rounds
    more = {
        r["doc_id"]: r["group_id"]
        for r in C.dedup_groups_query(
            spark, sf_dir, max_iters=D.CC_ITERS + 1
        ).collect()
    }
    assert {k: v["group_id"] for k, v in got.items()} == more  # fixpoint

    pairs = spark.sql(
        D.minhash_lsh_pairs_sql(SD, "documents")
    ).collect()
    assert pairs  # the fixture really has near-dups
    for p in pairs:
        assert got[p["doc_a"]]["group_id"] == got[p["doc_b"]]["group_id"]
    by_group: dict = {}
    for doc_id, r in got.items():
        by_group.setdefault(r["group_id"], []).append(doc_id)
    for gid, members in by_group.items():
        assert gid == min(members)
        assert all(got[m]["group_size"] == len(members) for m in members)
        assert sum(got[m]["is_exemplar"] for m in members) == 1


def test_dedup_groups_cc_converges_on_long_chain(spark):
    """A duplicate chain longer than the oracle's fixed budget (12 links
    > CC_ITERS=5) must still merge into ONE component — the round-3
    finding was that a fixed 5-round propagation silently under-merges
    any component of diameter > 5; the convergence check keeps going
    until no label changes."""
    from slog_agent_spark.operators import dedup as D
    from slog_agent_spark.plans.corpus import dedup_groups_from_pairs

    chain = [(i, i + 1) for i in range(12)]  # 0-1-2-...-12, diameter 12
    island = [(100, 101)]
    pairs = spark.createDataFrame(chain + island, ["doc_a", "doc_b"])
    got = {r["doc_id"]: r for r in dedup_groups_from_pairs(spark, pairs).collect()}
    assert {r["group_id"] for d, r in got.items() if d <= 12} == {0}
    assert got[0]["group_size"] == 13 and got[0]["is_exemplar"]
    assert got[100]["group_id"] == 100 and got[100]["group_size"] == 2
    # the fixed-iteration budget really would have under-merged this
    assert 12 > D.CC_ITERS


def test_dedup_groups_cc_cap_raises(spark):
    """Exceeding max_iters raises instead of returning a silently
    under-merged cluster table."""
    import pytest as _pt

    from slog_agent_spark.plans.corpus import dedup_groups_from_pairs

    chain = [(i, i + 1) for i in range(8)]
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    with _pt.raises(RuntimeError, match="did not converge"):
        dedup_groups_from_pairs(spark, pairs, max_iters=3)


def test_pack_chunks_matches_naive_cumsum(spark, duck, sf_dir):
    """The distributed prefix-sum packing must equal the naive
    single-window concat-and-chunk: start positions are the running
    token sum in doc_id order, chunks cut every budget tokens."""
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators.textops import (
        PACK_BUDGET_TOKENS, pack_chunks_sql, token_count_items,
    )

    rows = {
        r["doc_id"]: r
        for r in C.pack_chunks_query(spark, sf_dir).collect()
    }
    t = token_count_items(DUCKDB)["n_tokens"]
    naive = duck.execute(f"""
        SELECT doc_id,
               coalesce(sum(n) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM (SELECT doc_id, {t} AS n FROM documents)
    """).fetchall()
    assert len(naive) == len(rows) > 0
    for doc_id, start in naive:
        r = rows[doc_id]
        assert r["chunk_id"] == start // PACK_BUDGET_TOKENS, doc_id
        assert r["chunk_offset"] == start % PACK_BUDGET_TOKENS, doc_id
    # chunks are contiguous: every id up to the max appears
    chunk_ids = {r["chunk_id"] for r in rows.values()}
    assert chunk_ids == set(range(max(chunk_ids) + 1))


def test_pack_chunks_negative_doc_ids_cross_engine(spark):
    """Bucketing uses floor_div so negative synthetic doc_ids land in
    the SAME, floor-semantics bucket on both engines (round-4 ADVICE;
    the explicit correction means neither engine's native integer
    division semantics are load-bearing)."""
    import duckdb as _d
    import pandas as pd

    from slog_agent_spark.functions.dialect import DUCKDB, SPARK
    from slog_agent_spark.operators.textops import pack_chunks_sql

    pdf = pd.DataFrame(
        [(i, "tok" + " x" * (abs(i) % 7)) for i in range(-25, 6)],
        columns=["doc_id", "text"],
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("neg_docs")
    s_rows = sorted(
        map(tuple, spark.sql(pack_chunks_sql(SPARK, rel="neg_docs")).collect())
    )
    con = _d.connect()
    con.register("neg_docs", pdf)
    d_rows = sorted(
        map(tuple, con.execute(pack_chunks_sql(DUCKDB, rel="neg_docs")).fetchall())
    )
    con.close()
    assert len(s_rows) == len(pdf)
    assert s_rows == d_rows


def test_floor_div_parity(spark):
    """floor_div == Python floor division on both engines across sign
    combinations (the dialect primitive pack bucketing rests on)."""
    import duckdb as _d

    from slog_agent_spark.functions.dialect import DUCKDB, SPARK

    cases = [(-25, 10), (-20, 10), (-1, 10), (0, 10), (1, 10), (25, 10),
             (-7, 3), (7, -3), (-7, -3)]
    con = _d.connect()
    for a, b in cases:
        want = a // b
        got_s = spark.sql(
            f"SELECT {SPARK.floor_div(str(a), str(b))} AS v"
        ).first()["v"]
        got_d = con.execute(
            f"SELECT {DUCKDB.floor_div(str(a), str(b))} AS v"
        ).fetchone()[0]
        assert got_s == got_d == want, (a, b, got_s, got_d, want)
    con.close()


def test_mix_sample_rates_and_determinism(spark, sf_dir):
    """Stratified mix sampling keeps ~the configured permille of the
    downsampled language, all of the rest, and is stable across runs."""
    from slog_agent_spark.operators.textops import MIX_KEEP_PERMILLE

    rows = C.mix_sample_query(spark, sf_dir).collect()
    again = C.mix_sample_query(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    by_lang: dict = {}
    for r in rows:
        tot, kept = by_lang.get(r["lang"], (0, 0))
        by_lang[r["lang"]] = (tot + 1, kept + int(r["kept"]))
    en_tot, en_kept = by_lang["en"]
    rate = MIX_KEEP_PERMILLE["en"] / 1000
    assert abs(en_kept / en_tot - rate) < 0.1, (en_kept, en_tot)
    for lang, (tot, kept) in by_lang.items():
        if lang != "en":
            assert kept == tot, lang


def test_training_cut_composes_retention_mix_pack(spark, sf_dir):
    """The training-cut capstone equals its parts: selected == retention
    kept AND mix kept; pack positions over the selected set match the
    standalone packing operator run on exactly those documents;
    unselected docs carry the -1 sentinel."""
    from slog_agent_spark.functions.dialect import SPARK
    from slog_agent_spark.operators.textops import pack_chunks_sql

    cut = {r["doc_id"]: r for r in
           C.corpus_training_cut_query(spark, sf_dir).collect()}
    retention = {r["doc_id"]: r["kept"] for r in
                 C.corpus_retention_query(spark, sf_dir).collect()}
    mix = {r["doc_id"]: r["kept"] for r in
           C.mix_sample_query(spark, sf_dir).collect()}
    assert set(cut) == set(retention) == set(mix)
    selected_ids = set()
    for doc_id, r in cut.items():
        assert r["retained"] == retention[doc_id]
        assert r["mix_kept"] == mix[doc_id]
        assert r["selected"] == (retention[doc_id] and mix[doc_id])
        if r["selected"]:
            selected_ids.add(doc_id)
            assert r["chunk_id"] >= 0 and r["chunk_offset"] >= 0
        else:
            assert (r["n_tokens"], r["chunk_id"], r["chunk_offset"]) \
                == (-1, -1, -1)
    assert selected_ids and selected_ids != set(cut)
    # pack parity: standalone packing over exactly the selected docs
    sel_list = ",".join(str(i) for i in sorted(selected_ids))
    spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        f"doc_id IN ({sel_list})"
    ).createOrReplaceTempView("_sel_docs")
    standalone = {
        r["doc_id"]: r
        for r in spark.sql(pack_chunks_sql(SPARK, rel="_sel_docs")).collect()
    }
    assert set(standalone) == selected_ids
    for doc_id in selected_ids:
        got, want = cut[doc_id], standalone[doc_id]
        assert (got["n_tokens"], got["chunk_id"], got["chunk_offset"]) == (
            want["n_tokens"], want["chunk_id"], want["chunk_offset"]
        ), doc_id


def test_repetition_and_gopher_gate_semantics(duck):
    """A spammy doc (repeated lines) fails the gate on the repetition
    rules; a normal doc passes (DuckDB-executed; dual-dialect parity is
    pinned by the driver gate)."""
    import duckdb as _d

    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators.textops import gopher_flags_sql

    spam_line = "click here to win a prize now"
    spam = "\n".join([spam_line] * 10)
    normal = " ".join(
        f"the word{i} of item{i} and thing{i}" for i in range(20)
    )
    con = _d.connect()
    vals = f"(0, '{spam}'), (1, '{normal}')"
    sql = gopher_flags_sql(DUCKDB, rel=f"(VALUES {vals}) docs(doc_id, text)")
    got = {r[0]: r for r in con.execute(sql).fetchall()}
    cols = [c[0] for c in con.execute(sql).description]
    spam_row = dict(zip(cols, got[0]))
    norm_row = dict(zip(cols, got[1]))
    assert not spam_row["dup_line_ok"] and not spam_row["dup_shingle_ok"]
    assert not spam_row["gopher_pass"]
    assert norm_row["gopher_pass"], norm_row


PII_ROWS = [
    (0, "contact a@b.com or c.d@e-f.org today"),
    (1, "no addresses here at all"),
    (2, "call +1-555-123-4567 or (555) 123 4567 now"),
    (3, "server at 10.0.42.7 answered"),
    (4, "api_key=abc123XYZ789 leaked in log"),
    (5, "Password: hunter2secret was rotated"),
    (6, "version 1.2.3.4567 is fine"),          # not an IP (\b guard)
    (7, "ratio 12:34 and x=y are fine"),         # precheck hits, regex doesn't
]


def _pii_vals() -> str:
    return ", ".join(f"({i}, '{t}')" for i, t in PII_ROWS)


def test_pii_scan_counts_and_clean_hash(duck):
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators.textops import pii_scan_sql

    sql = pii_scan_sql(DUCKDB, rel=f"(VALUES {_pii_vals()}) docs(doc_id, text)")
    d = duck.execute(sql)
    cols = [c[0] for c in d.description]
    got = {r[0]: dict(zip(cols, r)) for r in d.fetchall()}
    assert got[0]["n_emails"] == 2 and got[0]["redacted"] is True
    assert got[1]["redacted"] is False
    assert got[2]["n_phones"] == 2 and got[2]["n_emails"] == 0
    assert got[3]["n_ips"] == 1
    assert got[4]["n_keys"] == 1
    assert got[5]["n_keys"] == 1              # (?i) + ':' separator
    assert got[6]["n_ips"] == 0 and got[6]["redacted"] is False
    assert got[7]["n_keys"] == 0 and got[7]["redacted"] is False
    import hashlib
    clean = "contact REDACTED or REDACTED today"
    assert got[0]["clean_hash"] == hashlib.md5(clean.encode()).hexdigest()
    assert got[4]["clean_hash"] == hashlib.md5(
        b"REDACTED leaked in log"
    ).hexdigest()


def test_pii_scan_spark_duckdb_parity(spark, duck):
    """Every PII rule class must agree char-for-char across engines on
    rows that exercise it (the driver's documents fixture is PII-free,
    so the gate alone cannot pin these patterns)."""
    from slog_agent_spark.functions.dialect import DUCKDB, SPARK
    from slog_agent_spark.operators.textops import pii_scan_sql

    spark.createDataFrame(PII_ROWS, "doc_id INT, text STRING") \
        .createOrReplaceTempView("pii_docs")
    df = spark.sql(pii_scan_sql(SPARK, rel="pii_docs"))
    assert_df_equals_oracle(
        df, duck,
        pii_scan_sql(DUCKDB, rel=f"(VALUES {_pii_vals()}) docs(doc_id, text)"),
    )


def test_quantile_rank_convention_parity(spark, duck):
    """doc_length_quantiles rests on approx_percentile (exact below its
    accuracy budget) picking the SAME discrete rank as DuckDB's
    quantile_disc — pin that convention across group sizes, including
    the 1-element and duplicate-heavy edges, so an engine upgrade that
    shifts either side's rank rule fails loudly here instead of as an
    opaque driver hash mismatch."""
    from slog_agent_spark.operators.textops import (
        QUANTILE_ACCURACY,
        QUANTILE_PROBS,
    )

    probs = ", ".join(str(p) for p in QUANTILE_PROBS)
    cases = {
        "n1": [5],
        "n2": [1, 2],
        "n7": list(range(1, 8)),
        "n10": list(range(1, 11)),
        "n11": list(range(1, 12)),
        "n100": list(range(1, 101)),
        "dups": [3] * 40 + [7] * 9 + [100],
        "skew": [1] * 95 + [10_000] * 5,
    }
    for name, vals in cases.items():
        arr = ",".join(map(str, vals))
        got = spark.sql(
            f"SELECT approx_percentile(x, array({probs}), "
            f"{QUANTILE_ACCURACY}) AS qs "
            f"FROM (SELECT explode(array({arr})) AS x)"
        ).first()["qs"]
        want = duck.execute(
            f"SELECT quantile_disc(x, [{probs}]) "
            f"FROM (SELECT unnest([{arr}]) AS x)"
        ).fetchone()[0]
        assert list(got) == list(want), f"{name}: {got} vs {want}"


def test_doc_length_quantiles_matches_oracle(spark, duck, sf_dir):
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.operators.textops import doc_length_quantiles_sql
    from slog_agent_spark.plans.corpus import doc_length_quantiles_query

    df = doc_length_quantiles_query(spark, sf_dir)
    assert_df_equals_oracle(df, duck, doc_length_quantiles_sql(DUCKDB))
    # the stopword split is real on the fixture (both verdicts present)
    assert df.select("stopword_ok").distinct().count() == 2


def test_doc_chunk_split_invariants(spark, duck):
    """Window-chunking edge cases on synthetic docs (the fixture has no
    empty/boundary-length texts): every doc yields >= 1 chunk, chunk
    starts advance by the stride, token counts are window-clamped, and
    stitching the non-overlapping tails back together reproduces the
    canonical token stream. Dual-engine, so the slice/series semantics
    the SQL leans on stay pinned."""
    from slog_agent_spark.functions.dialect import DUCKDB, SPARK
    from slog_agent_spark.operators.textops import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        doc_chunk_split_sql,
    )

    stride = CHUNK_SIZE - CHUNK_OVERLAP
    rows = [
        (1, "one"),
        (2, " ".join(f"t{i}" for i in range(CHUNK_SIZE))),       # exactly S
        (3, " ".join(f"t{i}" for i in range(CHUNK_SIZE + 1))),   # S + 1
        (4, " ".join(f"w{i}" for i in range(CHUNK_SIZE * 3 + 7))),
        (5, " ".join(f"x{i}" for i in range(stride))),
    ]
    spark.createDataFrame(rows, "doc_id LONG, text STRING") \
        .createOrReplaceTempView("chunk_docs")
    df = spark.sql(doc_chunk_split_sql(SPARK, rel="chunk_docs"))
    vals = ", ".join(
        f"({i}, '{t}')" for i, t in rows
    )
    assert_df_equals_oracle(
        df, duck,
        doc_chunk_split_sql(
            DUCKDB, rel=f"(VALUES {vals}) docs(doc_id, text)"
        ),
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_tokens"], r["chunk_text"])
        for r in df.collect()
    }
    by_doc: dict = {}
    for (doc, idx), v in sorted(got.items()):
        by_doc.setdefault(doc, []).append((idx, *v))
    # every doc chunks; boundary sizes produce the expected counts
    assert {d: len(c) for d, c in by_doc.items()} == {
        1: 1, 2: 1, 3: 2, 4: 4, 5: 1,
    }
    for doc_id, text in rows:
        toks = text.lower().split()
        chunks = by_doc[doc_id]
        # reconstruct: first chunk whole, then each chunk's tail past
        # the overlap
        stitched = chunks[0][2].split()
        for _, _, ctext in chunks[1:]:
            stitched += ctext.split()[CHUNK_OVERLAP:]
        assert stitched == toks, f"doc {doc_id} does not reconstruct"
        for idx, ntok, ctext in chunks:
            assert ntok == len(ctext.split())
            assert ntok <= CHUNK_SIZE
            assert ctext.split() == toks[idx * stride: idx * stride + CHUNK_SIZE]
