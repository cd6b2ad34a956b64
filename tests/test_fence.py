"""Pushdown-fence behavior: filters on computed columns must evaluate
the materialized column, never re-execute the defining chain.

Catalyst substitutes a filtered column's definition into a Filter below
the projection (PushPredicateThroughNonJoin), and Filter predicates get
no subexpression elimination — a plain .where("NOT dropped") re-ran the
whole extraction/condition chain per input row (measured 4.3s vs 0.58s
at 2M rows x 32 cores). The plan audit (tools/explain_plans.py) asserts
the same shapes per round; this pytest keeps the guarantee inside the
north rule's `python -m pytest -x -q` gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slog_agent_spark.plans.pipeline import fence_filter, transform_transcripts
from slog_agent_spark.sources.transcripts import transcripts_df


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_fence_filter_same_rows_no_chain_in_filter(spark, sf_dir):
    tr = transform_transcripts(transcripts_df(spark, sf_dir))
    fenced = fence_filter(tr, "NOT dropped")
    plain = tr.where("NOT dropped")

    # row-identical to the plain filter
    key = lambda r: (r["conv_id"], r["turn_idx"])
    assert sorted(map(key, fenced.collect())) == sorted(map(key, plain.collect()))
    assert fenced.columns == plain.columns  # __fence never leaks

    # the fenced Filter tests the computed column: no extraction
    # machinery substituted into any Filter condition
    plan = _optimized(fenced.select("conv_id"))
    filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln]
    assert filter_lines
    for ln in filter_lines:
        if "dropped" in ln:
            assert "__fence" in ln and "rtrim" not in ln and "md5" not in ln
    # the chain runs once: one rtrim (source extraction marker) total
    assert plan.count("rtrim(") == 1


def test_fence_filter_accepts_column_condition(spark):
    df = spark.range(10).withColumn("flag", F.col("id") % 2 == 0)
    out = fence_filter(df, F.col("flag"))
    assert sorted(r["id"] for r in out.collect()) == [0, 2, 4, 6, 8]
    assert out.columns == ["id", "flag"]
