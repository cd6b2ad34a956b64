"""Registry drift guards: the gate entry, the corpus job, and the
params-bound registry must stay in sync as operators are added."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from jobs.run_corpus import DOC_OPS, EMB_OPS, EVENT_OPS, EXTRA_OPS, registry
from slog_agent_spark.plans.corpus import build_corpus_queries
from slog_agent_spark.plans.corpus_config import DEFAULT_CORPUS_PARAMS


def test_every_query_has_an_oracle():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) == set(os_), (
        sorted(set(qs) ^ set(os_)),
        "every queries() entry needs an oracle_sql() twin (and vice versa)",
    )


def test_corpus_job_ops_resolve_and_cover_param_registry():
    reg = registry()
    for op in DOC_OPS + EVENT_OPS + EMB_OPS + EXTRA_OPS:
        assert op in reg, op
    # every params-rebindable operator is runnable through the job
    for name in build_corpus_queries(DEFAULT_CORPUS_PARAMS):
        assert name in reg, f"{name} missing from run_corpus registry"


def test_corpus_gate_queries_runnable_via_job():
    """Each corpus_/dedup_/ann_/embedding_/doc_ gate query is exposed by
    the corpus job (a reference user can run every claimed operator)."""
    reg = registry()
    prefixes = ("corpus_", "dedup_", "ann_", "embedding_", "doc_", "events_")
    for name in entry_mod.queries():
        if name.startswith(prefixes) and not name.startswith("doc_length"):
            assert name in reg or name in (
                # intermediate/sampled tiers surfaced in the gate but
                # not in the job's default op set
                "dedup_simhash", "embedding_neardup_ivf",
            ), f"{name} not runnable via jobs/run_corpus.py"
