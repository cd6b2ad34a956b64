"""Grok parse stage parity + semantics."""

from __future__ import annotations

from conftest import assert_df_equals_oracle
from pyspark.sql import functions as F

from slog_agent_spark.sources.parser import parse_oracle_select, parse_transcripts
from slog_agent_spark.sources.transcripts import transcripts_df, transcripts_oracle_cte


def test_parse_parity(spark, sf_dir, duck):
    df = parse_transcripts(transcripts_df(spark, sf_dir))
    # raw_length is bigint on duck side; cast to long on spark for compare
    df = df.withColumn("raw_length", F.col("raw_length").cast("long"))
    oracle = (
        "WITH transcripts AS (" + transcripts_oracle_cte() + ") " + parse_oracle_select()
    )
    assert_df_equals_oracle(df, duck, oracle)


def test_level_matches_role(spark, sf_dir):
    """pri%8 → level must reproduce the transcript's role column."""
    df = parse_transcripts(transcripts_df(spark, sf_dir))
    assert df.where("parse_ok AND level != role").count() == 0


def test_malformed_flagged_not_dropped(spark, sf_dir):
    df = parse_transcripts(transcripts_df(spark, sf_dir)).cache()
    try:
        total = df.count()
        bad = df.where(~F.col("parse_ok")).count()
        assert bad > 0
        assert df.where(~F.col("parse_ok") & (F.col("log") == F.col("text"))).count() == bad
        assert df.where(F.col("parse_ok")).count() + bad == total
    finally:
        df.unpersist()


def test_multiline_unescaped_flag(spark, sf_dir):
    df = parse_transcripts(transcripts_df(spark, sf_dir))
    assert df.where(F.col("unescaped") & ~F.col("log").contains("\n")).count() == 0
    assert df.where(F.col("unescaped")).count() > 0


def test_empty_tokens_and_empty_body_parse_ok(spark, duck):
    """nextFieldBySpace alignment: each header field only needs its
    trailing space — consecutive spaces yield EMPTY fields that still
    parse, and a record ending right after extradata's separator has an
    empty body (reference: input/syslogparser/syslogparser.go:152-171,
    204-210). A record missing the 7th separator stays malformed.
    """
    from slog_agent_spark.sources.parser import parse_logs, parse_oracle_select

    recs = [
        # empty host token (double space): parses OK
        ("<13>1 2024-01-01T00:00:00Z  app1 123 src.log - body text here", 0),
        # empty body (trailing space after extradata): parses OK
        ("<13>1 2024-01-01T00:00:00Z host app1 123 src.log - ", 1),
        # no space after extradata: the 7th field never terminates → bad
        ("<13>1 2024-01-01T00:00:00Z host app1 123 src.log -", 2),
        ("<13>1 2024-01-01T00:00:00Z host app1 123 src.log - normal", 3),
    ]
    df = parse_logs(
        spark.createDataFrame(recs, ["text", "rid"]), ["rid"]
    ).withColumn("raw_length", F.col("raw_length").cast("long"))
    got = {r["rid"]: r for r in df.collect()}
    assert got[0]["parse_ok"] and got[0]["host"] == ""
    assert got[1]["parse_ok"] and got[1]["log"] == ""
    assert not got[2]["parse_ok"]
    assert got[3]["parse_ok"]

    values = ", ".join(f"({t!r}, {i})" for t, i in recs)
    oracle = (
        f"WITH transcripts AS (SELECT * FROM (VALUES {values}) t(text, rid)) "
        + parse_oracle_select(passthrough=["rid"])
    )
    assert_df_equals_oracle(df, duck, oracle)


def test_parse_ok_raw_text_form_edge_cases(spark, duck):
    """The round-4 parse_ok rewrite (over raw text: one split + locate/
    substr of the first token, so a pushed-down Filter stays cheap) must
    stay value-identical to the oracle's token-array form on adversarial
    shapes: no-space text, short first tokens, '>1' in the wrong place,
    non-numeric / negative / overflow pri, boundary facility 191/192,
    multi-digit pri, empty text, '<' alone."""
    from slog_agent_spark.sources.parser import parse_logs, parse_oracle_select

    pad = "x" * 40  # keeps octet_length >= 32 from masking other conditions
    recs = [
        (f"nospace_at_all_{pad}", 0),                       # no spaces
        (f"<13>1 a b c d e f {pad}", 1),                    # ok
        (f"13>1 a b c d e f {pad}", 2),                     # no '<'
        (f"<>1 a b c d e f {pad}", 3),                      # empty pri
        (f"<x>1 a b c d e f {pad}", 4),                     # non-numeric pri
        (f"<-5>1 a b c d e f {pad}", 5),                    # negative pri
        (f"<191>1 a b c d e f {pad}", 6),                   # max valid pri
        (f"<192>1 a b c d e f {pad}", 7),                   # pri == 192: bad
        (f"<9999999999>1 a b c d e f {pad}", 8),            # overflow pri
        (f"<1>2 a b c d e f {pad}", 9),                     # wrong version
        (f"<1> 1 a b c d e f {pad}", 10),                   # token too short
        (f"< 1>1 a b c d e f {pad}", 11),                   # space inside pri
        (f"<13>1 a b c d e {pad}", 12),                     # only 7 tokens
        (f"<13>1  a b c d e f {pad}", 13),                  # empty time token
        ("<13>1 a b", 14),                                  # too short overall
        (f">1<13 a b c d e f {pad}", 15),                   # '>1' misplaced
    ]
    df = parse_logs(
        spark.createDataFrame(recs, ["text", "rid"]), ["rid"]
    ).withColumn("raw_length", F.col("raw_length").cast("long"))
    ok = {r["rid"]: r["parse_ok"] for r in df.collect()}
    assert ok == {
        0: False, 1: True, 2: False, 3: False, 4: False, 5: False,
        6: True, 7: False, 8: False, 9: False, 10: False, 11: False,
        12: False, 13: True, 14: False, 15: False,
    }
    values = ", ".join(f"({t!r}, {i})" for t, i in recs)
    oracle = (
        f"WITH transcripts AS (SELECT * FROM (VALUES {values}) t(text, rid)) "
        + parse_oracle_select(passthrough=["rid"])
    )
    assert_df_equals_oracle(df, duck, oracle)
