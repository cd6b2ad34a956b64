"""Table IO abstraction: Iceberg when available, parquet otherwise.

The design targets Iceberg (atomic per-partition commits = the
reference's chunk-ACK semantics, SURVEY.md §2.9), but this sandbox has no
Iceberg runtime jar, so the same API transparently falls back to
partitioned parquet + atomic manifest files (plans/checkpoint.py provides
the commit protocol on top).

Set ``SLOG_ICEBERG_CATALOG`` (e.g. "spark_catalog" with the Iceberg
extension configured on the cluster) to route through ``writeTo``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_catalog() -> str | None:
    return os.environ.get("SLOG_ICEBERG_CATALOG") or None


def _is_table_identifier(location: str) -> bool:
    """Catalog table identifiers (``db.table``) never contain path
    separators; filesystem/URI locations do. With SLOG_ICEBERG_CATALOG
    set, a caller passing a PATH (e.g. the resumable checkpointer's
    sink root from jobs/run_pipeline.py --output) still gets the
    parquet route — interpolating a path into ``writeTo`` would build
    an invalid multi-part identifier and kill the job at first write."""
    return "/" not in location and "\\" not in location and ":" not in location


def write_table(
    df: DataFrame,
    location: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a table; ``location`` is a path (parquet) or catalog table
    name (iceberg) depending on availability.

    Modes: ``overwrite`` (replace the table), ``append``, and
    ``overwrite_partitions`` — replace only the partitions present in
    ``df`` (Iceberg ``overwritePartitions()``; parquet dynamic
    ``partitionOverwriteMode``). The last one is the resumable-sink
    commit primitive (plans/checkpoint.py): committed partitions'
    files are never touched, and on Iceberg each call is one atomic
    snapshot commit — the chunk-ACK semantics of SURVEY.md §2.9.

    The Iceberg route needs the iceberg-spark-runtime jar and a
    configured catalog on the cluster (spark.sql.catalog.<name>...);
    this sandbox ships neither, so tests stub the DataFrameWriterV2
    (tests/test_writers.py) and everything else uses the parquet path.
    """
    cat = iceberg_catalog()
    if cat and _is_table_identifier(location):
        writer = df.writeTo(f"{cat}.{location}")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "overwrite_partitions":
            writer.overwritePartitions()
        else:
            writer.append()
        return
    if mode == "overwrite_partitions":
        w = df.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
    else:
        w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def read_table(spark: SparkSession, location: str) -> DataFrame:
    cat = iceberg_catalog()
    if cat and _is_table_identifier(location):
        return spark.read.table(f"{cat}.{location}")
    return spark.read.parquet(location)
