"""Bounded-generation discipline for batch-partitioned streaming stores.

Every foreachBatch sink in this package writes its state/output
partitioned by ``batch_id`` (leading) so a replayed micro-batch
dynamically overwrites exactly its own partitions — that is the
exactly-once primitive. The cost is one directory per micro-batch:
unbounded partition/small-file sprawl over a long-running stream (the
reference bounds the analogous queue directories,
ref: buffer/hybridbuffer/bufferer.go:104-132).

:func:`fold_batch_partitions` is the shared compaction primitive: fold
every checkpoint-committed batch partition into one base generation
(``batch_id = -1``) with a bounded task/file count, KEEPING the max live
batch untouched — it is the only batch the streaming checkpoint could
still replay, and a replay must keep overwriting its own partitions.
Repeated compactions fold the previous base generation too, so the
store stays at (1 base + 1 live) partitions regardless of stream age.

Crash-safe swap: the new generation is written to ``<path>_tmp`` and
swapped in via two renames; :func:`heal_swapped_dir` recovers the
window between them (used by every reader of a foldable store). Run
compaction between drains — never concurrently with the stream.

Used by: the near-dup state store (sigs/bands/pairs,
streaming/stream.compact_neardup_store), the pipeline events+metrics
sinks (compact_events_sink), and the streaming ANN vector store
(streaming/ann_stream.compact_ann_store).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# base partition for compacted generations; real streaming batch_ids
# are >= 0 so -1 can never collide with a live batch
BASE_BATCH = -1


def heal_swapped_dir(path: str) -> None:
    """Recover a store table from a compaction crash between the two
    directory renames: if ``<path>`` is gone but ``<path>_old`` exists,
    the old generation is intact — restore it."""
    if not os.path.exists(path) and os.path.exists(f"{path}_old"):
        os.rename(f"{path}_old", path)


def count_parquet_files(path: str) -> int:
    return sum(
        1 for _, _, fns in os.walk(path)
        for fn in fns if fn.endswith(".parquet")
    )


def fold_batch_partitions(
    spark: SparkSession,
    path: str,
    secondary: str | None = None,
    n_tasks: int | None = None,
    sort_keys: list[str] | None = None,
    base_batch: int = BASE_BATCH,
) -> dict | None:
    """Fold a ``batch_id``-partitioned table's committed batches into the
    base generation. Returns {rows, files_before, files_after}, or None
    if the table doesn't exist or has nothing to fold.

    - ``secondary``: a second partition column kept through the fold
      (state-store bucket, sink tag); folded rows are repartitioned by
      it so each (base, secondary) directory gets ~one file.
    - ``n_tasks``: task count for that repartition (bucketed stores pass
      their bucket count; default = number of distinct values is left
      to AQE via a plain column repartition).
    - ``sort_keys``: sortWithinPartitions keys, so post-fold lookups
      skip row groups via parquet min/max stats on top of partition
      pruning (e.g. the band store sorts by band_key).
    """
    from pyspark.errors import AnalysisException

    heal_swapped_dir(path)
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return None
    batches = sorted(
        r["b"] for r in df.select(
            F.col("batch_id").cast("long").alias("b")
        ).distinct().collect()
    )
    live = [b for b in batches if b != base_batch]
    if len(batches) <= 1 or not live:
        return None  # nothing to fold
    keep = max(live)
    files_before = count_parquet_files(path)
    folded = df.where(F.col("batch_id").cast("long") != keep).withColumn(
        "batch_id", F.lit(base_batch).cast("long")
    )
    if secondary:
        if n_tasks:
            folded = folded.repartition(n_tasks, F.col(secondary))
        else:
            folded = folded.repartition(F.col(secondary))
        if sort_keys:
            folded = folded.sortWithinPartitions(secondary, *sort_keys)
    else:
        folded = folded.coalesce(1)
        if sort_keys:
            folded = folded.sortWithinPartitions(*sort_keys)
    kept = df.where(F.col("batch_id").cast("long") == keep).withColumn(
        "batch_id", F.col("batch_id").cast("long")
    )
    parts = ["batch_id"] + ([secondary] if secondary else [])
    tmp = f"{path}_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    cols = folded.columns
    merged = folded.select(cols).unionByName(kept.select(cols))
    merged.write.partitionBy(*parts).mode("overwrite").parquet(tmp)
    n_rows = spark.read.parquet(tmp).count()
    os.rename(path, f"{path}_old")
    os.rename(tmp, path)
    shutil.rmtree(f"{path}_old", ignore_errors=True)
    return {
        "rows": n_rows,
        "files_before": files_before,
        "files_after": count_parquet_files(path),
    }
