"""spark-submit entry point for the corpus-hygiene operators.

Usage (cluster):
    tools/package.sh          # builds dist/slog_agent_spark.zip
    spark-submit --py-files dist/slog_agent_spark.zip \\
        jobs/run_corpus.py \\
        --data <dir with documents.parquet / embeddings.parquet> \\
        --output <result root> \\
        [--ops dedup_exact,dedup_minhash_lsh,...]   (default: all)
        [--corpus-config corpus.yml]   (sketch/index sizing overrides)

Runs the selected operators and writes each result as parquet under
``<output>/<op>/``. These are the standard pretraining-data passes:
dedup (exact / MinHash+LSH / n-gram Jaccard / banded-Hamming SimHash),
embedding near-dup (trained IVF, multi-assign), ANN top-k, text
quality/language/token reports, the per-language corpus rollup, and
the temporal event operators (as-of enrich plain + segmented, bounded-
window attribution, gap sessionization) over events.parquet.

Scale notes: every operator here is shuffle-shaped for a real cluster
(band-key / posting-list / bucket joins, broadcast centroid tables — no
O(n²) pass except the explicitly-named *exact* near-dup baseline, which
is excluded from the default set and intended for samples). Expensive
signature/centroid stages are materialized once per run
(plans/corpus.py:_staged_query).
"""

from __future__ import annotations

import argparse
import os
import sys

DOC_OPS = (
    "doc_token_count",
    "doc_quality_score",
    "doc_language_id",
    "doc_fingerprint",
    "corpus_stats",
    "doc_length_histogram",
    "doc_length_quantiles",
    "doc_chunk_split",
    "ann_list_occupancy",
    "doc_repetition",
    "doc_gopher_flags",
    "corpus_pii_scan",
    "corpus_vocab_top",
    "corpus_bpe_merges",
    "corpus_pack_chunks",
    "corpus_mix_sample",
    "corpus_contamination",
    "corpus_boilerplate",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_salted",
    "dedup_band_index",
    "dedup_ngram_jaccard",
    "dedup_simhash_neardup",
    "dedup_groups_cc",
    "corpus_retention",
    "corpus_training_cut",
)
EVENT_OPS = (
    "events_asof_enrich",
    "events_asof_segmented",
    "events_window_attrib",
    "events_sessionize",
    "events_funnel",
)
EMB_OPS = (
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_ivf_quantized",
    "ann_topk_ivf_trained",
    "ann_topk_batch",
    "embedding_neardup_trained",
)
# O(n²) verification tier — opt-in only, run it on a sample
EXTRA_OPS = ("embedding_neardup_exact",)


def registry(params=None):
    from slog_agent_spark.plans import corpus as C

    base = {
        "doc_token_count": C.token_count_query,
        "doc_quality_score": C.quality_query,
        "doc_language_id": C.langid_query,
        "doc_fingerprint": C.fingerprint_query,
        "corpus_stats": C.corpus_stats_query,
        "doc_length_histogram": C.doc_length_histogram_query,
        "doc_length_quantiles": C.doc_length_quantiles_query,
        "doc_chunk_split": C.doc_chunk_split_query,
        "ann_list_occupancy": C.ann_list_occupancy_query,
        "doc_repetition": C.doc_repetition_query,
        "doc_gopher_flags": C.gopher_flags_query,
        "corpus_pii_scan": C.pii_scan_query,
        "corpus_vocab_top": C.vocab_top_query,
        "corpus_bpe_merges": C.bpe_merges_query,
        "corpus_pack_chunks": C.pack_chunks_query,
        "corpus_mix_sample": C.mix_sample_query,
        "corpus_contamination": C.contamination_query,
        "corpus_boilerplate": C.boilerplate_query,
        "events_asof_enrich": C.asof_enrich_query,
        "events_asof_segmented": C.asof_segmented_query,
        "events_window_attrib": C.window_attrib_query,
        "events_sessionize": C.sessionize_query,
        "events_funnel": C.funnel_query,
        "dedup_exact": C.exact_dedup_query,
        "dedup_minhash_lsh": C.minhash_lsh_query,
        "dedup_minhash_lsh_salted": C.minhash_lsh_salted_query,
        "dedup_band_index": C.band_index_query,
        "dedup_ngram_jaccard": C.ngram_jaccard_query,
        "dedup_simhash_neardup": C.simhash_neardup_query,
        "dedup_groups_cc": C.dedup_groups_query,
        "corpus_retention": C.corpus_retention_query,
        "corpus_training_cut": C.corpus_training_cut_query,
        "ann_topk_bruteforce": C.ann_bruteforce_query,
        "ann_topk_ivf": C.ann_ivf_query,
        "ann_topk_ivf_quantized": C.ann_ivf_quantized_query,
        "ann_topk_ivf_trained": C.ann_ivf_trained_query,
        "ann_topk_batch": C.ann_topk_batch_query,
        "embedding_neardup_trained": C.emb_neardup_trained_query,
        "embedding_neardup_exact": C.emb_neardup_exact_query,
    }
    if params is not None:
        # rebind the parameterized operators to the configured sizing
        # (plans/corpus_config.CorpusParams; defaults otherwise)
        for name, (run, _oracle) in C.build_corpus_queries(params).items():
            if name in base:
                base[name] = run
    return base


def run_ops(spark, data: str, output: str, ops, params=None) -> dict[str, int]:
    """Run the selected operators and write each under ``<output>/<op>``
    — the job body, split from main() so the integration test can drive
    the exact --corpus-config path on a shared session."""
    reg = registry(params)
    unknown = [o for o in ops if o not in reg]
    if unknown:
        raise ValueError(f"unknown ops: {unknown}; available: {sorted(reg)}")
    # dedupe, order-preserving (round-4 ADVICE: a repeated op in --ops ran
    # and wrote twice but reported only one counts entry, masking the
    # duplicate work)
    seen: set = set()
    ops = [o for o in ops if not (o in seen or seen.add(o))]
    counts = {}
    for op in ops:
        df = reg[op](spark, data)
        dst = os.path.join(output, op)
        df.write.mode("overwrite").parquet(dst)
        counts[op] = spark.read.parquet(dst).count()
    return counts


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="dir containing documents.parquet / embeddings.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--ops", default=None,
                    help="comma-separated op names (default: all standard ops)")
    ap.add_argument("--corpus-config", default=None,
                    help="YAML file with a `corpus:` section of sketch/index "
                         "parameters (see plans/corpus_config.CorpusParams)")
    args = ap.parse_args(argv)

    from slog_agent_spark.session import build_session

    params = None
    if args.corpus_config:
        from slog_agent_spark.plans.corpus_config import load_corpus_config

        params = load_corpus_config(args.corpus_config)
        print(f"corpus params: {params}")
    ops = (
        [o.strip() for o in args.ops.split(",") if o.strip()]
        if args.ops
        else list(DOC_OPS + EVENT_OPS + EMB_OPS)
    )
    # reject op-name typos before spinning up a session; ValueErrors
    # raised during execution propagate with their tracebacks
    unknown = [o for o in ops if o not in registry(params)]
    if unknown:
        print(f"unknown ops: {unknown}; available: {sorted(registry(params))}")
        return 2

    spark = build_session(app_name="slog-agent-spark-corpus")
    try:
        counts = run_ops(spark, args.data, args.output, ops, params)
        for op, n in counts.items():
            print(f"{op}: {n} rows -> {os.path.join(args.output, op)}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
