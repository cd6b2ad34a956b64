"""spark-submit entry point for the Structured Streaming shell.

Usage (cluster):
    tools/package.sh          # builds dist/slog_agent_spark.zip
    spark-submit --py-files dist/slog_agent_spark.zip \\
        jobs/run_stream.py \\
        --input <transcript parquet dir (files appear over time)> \\
        --output <sink root> --checkpoint <streaming checkpoint root> \\
        [--mode pipeline|wire|neardup|docdedup|trainingcut|boilerplate|
                simhash|attrib|ann-train|ann-ingest|ann-neardup|sessions|
                dedup|counters|
                {events,neardup,docdedup,ann,trainingcut,boilerplate,
                 simhash}-compact]
        [--salts N] [--centroids PATH] [--compact-mode incremental|full]
        [--drain]

Modes (all resume from --checkpoint; sessions/dedup/counters are
watermarked, pipeline/wire/neardup are foreachBatch exactly-once):
    pipeline   full parse→transform→route through foreachBatch, per-tag
               parquet sinks (exactly-once via checkpoint + idempotent
               batch overwrites)
    wire       full pipeline with REAL protocol output per (batch, tag):
               fluentd forward msgpack/gzip chunks (default) or datadog
               gzip JSON-array intake bodies (--wire-format datadog)
    sessions   per-conversation gap sessionization (session_window)
    neardup    incremental MinHash-LSH near-dup over a DOCUMENT stream
               (doc_id, text): per-batch signatures joined against the
               bucketed band store (partition-pruned lookups; signature
               fetch pruned to candidates); pair/sig/band stores under
               --output, exactly-once per batch partition
    neardup-compact  fold the near-dup store's committed per-batch
               partitions into the bounded base partition (run between
               drains; --output = the store dir)
    events-compact   same fold for the pipeline sink's events/metrics
               (batch_id, tag) partitions (run between drains;
               --output = the pipeline sink root)
    ann-train  materialize the deterministic k-means IVF centroids from
               an embeddings table (--input) to --centroids; train
               once, broadcast everywhere
    ann-ingest incremental IVF ANN indexing over an EMBEDDING stream
               (vec_id, embedding, label): each micro-batch assigns its
               vectors to their centroid lists (--centroids) and
               appends to the bucketed vector store under --output;
               query it with streaming/ann_stream.ann_query_store
               (partition-pruned to the probed lists)
    ann-neardup  ann-ingest PLUS incremental embedding-cosine near-dup:
               each micro-batch multi-assigns its vectors, compares
               them against the store's touched lists, and appends
               verified pairs under <store>/pairs (each unordered pair
               exactly once, in its later vector's batch)
    ann-compact  fold the vector store's committed per-batch partitions
               (run between drains; --output = the store dir)
    docdedup   incremental exact dedup over a DOCUMENT stream
               (doc_id, text): per-batch (content-hash, min-doc, count)
               partials into a bucketed hash store under --output;
               first-arrival verdicts per batch, canonical duplicate
               groups via streaming/stream.docdedup_rollup (equal to
               the batch dedup_exact under any arrival order)
    docdedup-compact  fold the hash store's committed per-batch
               partitions (run between drains; --output = the store)
    trainingcut  incremental training cut over a DOCUMENT stream
               (doc_id, text, lang): per batch, exact dedup + MinHash
               near-dup against the accumulated stores + quality gate +
               deterministic mix draw + packed-position assignment
               (running token offset via a tiny totals table); per-doc
               verdicts under <store>/cut, value-identical to the batch
               corpus_training_cut when batches arrive in ascending
               doc_id ranges (first-arrival-wins otherwise)
    trainingcut-compact  fold cut/totals plus the delegated dedup and
               near-dup stores (run between drains; --output = store)
    boilerplate  incremental cross-document boilerplate detection over
               a DOCUMENT stream: per-batch shingle document-frequency
               partials into a bucketed store; verdicts use counts as of
               arrival (first-arrival policy — a later-common shingle
               does not retro-cut earlier docs); frequency rollup equals
               the batch operator's under any order
    boilerplate-compact  fold the freq/cut stores (between drains)
    simhash    incremental banded-Hamming SimHash near-dup over a
               DOCUMENT stream — same store discipline as the MinHash
               twin, with the verify fetch reduced to the candidates'
               stored sketches (a few ints per candidate); drained pair
               union equals the batch dedup_simhash_neardup
    simhash-compact  fold the sketch/band/pair stores (between drains)
    attrib     bounded-window attribution over an EVENT stream via
               Spark's native stream-stream interval join (watermarked
               self-join, state bounded by the horizon); pair set equal
               to the batch events_window_attrib over inputs ordered
               within the lateness bound (600s default — size it to
               the input's disorder; later arrivals are dropped by
               the watermark)
    dedup      at-least-once redelivery guard
               (dropDuplicatesWithinWatermark on conv_id/turn_idx)
    counters   event-time windowed per-role counters

``--drain`` uses trigger(availableNow=True): process everything present
then exit — the batch-parity mode the tests use. Without it the query
runs continuously (micro-batches as files land).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="pipeline",
                    choices=["pipeline", "wire", "neardup", "neardup-compact",
                             "events-compact", "ann-train", "ann-ingest",
                             "ann-neardup", "ann-compact", "docdedup",
                             "docdedup-compact", "trainingcut",
                             "trainingcut-compact", "boilerplate",
                             "boilerplate-compact", "simhash", "simhash-compact",
                             "attrib", "sessions",
                             "dedup", "counters"])
    ap.add_argument("--salts", type=int, default=1,
                    help="wire mode: sub-chunkers per hot tag")
    ap.add_argument("--wire-format", default="fluentd",
                    choices=["fluentd", "datadog"],
                    help="wire mode: output protocol")
    ap.add_argument("--compact-mode", default="incremental",
                    choices=["incremental", "full"],
                    help="compact modes: incremental folds only newly "
                         "committed batches into a new generation "
                         "(O(new data) IO); full merges every "
                         "generation into the base (O(store), rare)")
    ap.add_argument("--centroids", default=None,
                    help="ann modes: path of the materialized centroid "
                         "table (written by ann-train, read by ann-ingest)")
    ap.add_argument("--drain", action="store_true",
                    help="availableNow trigger: drain existing input, exit")
    ap.add_argument("--metrics-out", default=None,
                    help="pipeline mode: dump the cumulative cross-batch "
                         "process counters as Prometheus text after the "
                         "drain (stream twin of run_pipeline --metrics-out)")
    args = ap.parse_args(argv)

    from slog_agent_spark.session import build_session
    from slog_agent_spark.streaming import stream as S

    spark = build_session(app_name=f"slog-agent-spark-stream-{args.mode}")
    try:
        if args.mode == "pipeline":
            # has its own foreachBatch writer + availableNow drain
            S.run_stream_pipeline(
                spark, args.input, args.output, args.checkpoint
            )
            if args.metrics_out:
                from slog_agent_spark.operators.metrics import prometheus_dump

                totals = S.stream_metrics_total(spark, args.output)
                with open(args.metrics_out, "w", encoding="utf-8") as fh:
                    fh.write(prometheus_dump(totals))
                print(f"metrics -> {args.metrics_out}")
            return 0
        if args.mode == "wire":
            # protocol chunks per (batch, tag): fluentd
            # CompressedPackedForward or datadog gzip JSON-array
            S.run_stream_wire_sink(
                spark, args.input, args.output, args.checkpoint,
                salts=args.salts, wire_format=args.wire_format,
            )
            return 0
        if args.mode == "neardup":
            S.run_stream_neardup(
                spark, args.input, args.output, args.checkpoint
            )
            return 0
        if args.mode == "docdedup":
            S.run_stream_docdedup(
                spark, args.input, args.output, args.checkpoint
            )
            return 0
        if args.mode in ("ann-train", "ann-ingest", "ann-neardup"):
            from slog_agent_spark.streaming import ann_stream as A

            if not args.centroids:
                raise SystemExit("--centroids is required for ann modes")
            if args.mode == "ann-train":
                A.train_ann_centroids(
                    spark, spark.read.parquet(args.input), args.centroids
                )
                print(f"centroids -> {args.centroids}")
            else:
                A.run_stream_ann_ingest(
                    spark, args.input, args.output, args.checkpoint,
                    args.centroids, neardup=(args.mode == "ann-neardup"),
                )
            return 0
        if args.mode == "attrib":
            S.run_stream_attrib(
                spark, args.input, args.output, args.checkpoint
            )
            return 0
        if args.mode == "simhash":
            S.run_stream_simhash(
                spark, args.input, args.output, args.checkpoint
            )
            return 0
        if args.mode == "boilerplate":
            S.run_stream_boilerplate(
                spark, args.input, args.output, args.checkpoint
            )
            return 0
        if args.mode == "trainingcut":
            S.run_stream_training_cut(
                spark, args.input, args.output, args.checkpoint
            )
            return 0
        if args.mode in ("neardup-compact", "events-compact", "ann-compact",
                         "docdedup-compact", "trainingcut-compact",
                         "boilerplate-compact", "simhash-compact"):
            # between drains (never concurrently with the stream): fold
            # committed per-batch store partitions into the bounded base
            if args.mode == "ann-compact":
                from slog_agent_spark.streaming.ann_stream import (
                    compact_ann_store as compact,
                )
            else:
                compact = {
                    "neardup-compact": S.compact_neardup_store,
                    "events-compact": S.compact_events_sink,
                    "docdedup-compact": S.compact_docdedup_store,
                    "trainingcut-compact": S.compact_training_cut_store,
                    "boilerplate-compact": S.compact_boilerplate_store,
                    "simhash-compact": S.compact_simhash_store,
                }[args.mode]
            report = compact(spark, args.output, mode=args.compact_mode)
            for table, r in report.items():
                print(f"compacted {table}: {r['rows']} rows, "
                      f"{r['files_before']} -> {r['files_after']} files")
            return 0

        src = S.stream_transcripts(spark, args.input)
        df = {
            "sessions": S.session_rollup_stream,
            "dedup": S.dedup_stream,
            "counters": S.windowed_role_counts,
        }[args.mode](src)
        writer = (
            df.writeStream.format("parquet")
            .option("path", args.output)
            .option("checkpointLocation", args.checkpoint)
            .outputMode("append")
        )
        if args.drain:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        q.awaitTermination()
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
