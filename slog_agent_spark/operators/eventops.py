"""Event-stream enrichment operators over the ``events`` table.

As-of joins (attach the most recent prior mark event to each probe
event) and bounded-window attribution (all marks within a trailing
horizon) — the two temporal-join shapes every log/metrics pipeline
needs and Spark has no built-in operator for.

Spark-first formulations:

- **As-of** is NOT a join here: both sides union with a side flag and
  one window pass per user carries the latest mark forward
  (``last(... , true)`` = IGNORE NULLS). One shuffle on ``user_id``,
  no range explosion, no skew amplification — the plan a 100 TB as-of
  needs. The DuckDB oracle is a genuinely different formulation
  (native ``ASOF LEFT JOIN``), so the gate pins semantics, not SQL
  text.
- **Window attribution** equi-joins on coarse time buckets sized to
  the horizon (each probe looks at its own and the previous bucket
  only) and filters exactly — the standard bounded-range-join
  decomposition; never an unbounded inequality join.
"""

from __future__ import annotations

from ..functions.dialect import SqlDialect

ASOF_MARK_TYPE = "view"
ASOF_PROBE_TYPE = "purchase"
ATTRIB_HORIZON_SEC = 6 * 3600


def asof_enrich_sql(
    d: SqlDialect,
    rel: str = "events",
    mark_type: str = ASOF_MARK_TYPE,
    probe_type: str = ASOF_PROBE_TYPE,
) -> str:
    """Most recent ``mark_type`` event at-or-before each ``probe_type``
    event per user (attribution/config-asof join), LEFT semantics: a
    probe with no prior mark keeps NULL mark columns.

    Tie rules (both engines, deterministic): a mark at exactly the
    probe's timestamp matches (inclusive); duplicate marks at one
    (user, ts) resolve to the greatest event_id.

    Spark shape: union(marks, probes) → one window over user_id
    ordered by (ts, side, event_id) carrying the last non-null mark →
    filter side=1. ONE shuffle, map-side-prunable columns, no join
    operator at all. The oracle is DuckDB's native ASOF LEFT JOIN over
    (user, ts)-deduped marks — different algorithm, same relation.
    """
    if d.name == d.DUCKDB:
        return f"""
        WITH marks AS (
          SELECT user_id, ts, max(event_id) AS mark_event_id,
                 arg_max(value, event_id) AS mark_value
          FROM {rel} WHERE event_type = '{mark_type}'
          GROUP BY user_id, ts
        ),
        probes AS (
          SELECT event_id, user_id, ts, value FROM {rel}
          WHERE event_type = '{probe_type}'
        )
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS ts_us, p.value,
               m.mark_event_id, epoch_us(m.ts) AS mark_ts_us,
               m.mark_value,
               epoch_us(p.ts) - epoch_us(m.ts) AS staleness_us
        FROM probes p ASOF LEFT JOIN marks m
          ON p.user_id = m.user_id AND p.ts >= m.ts
        """
    return f"""
    WITH unioned AS (
      SELECT user_id, ts, 0 AS side, event_id AS mark_event_id,
             ts AS mark_ts, value AS mark_value,
             CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value
      FROM {rel} WHERE event_type = '{mark_type}'
      UNION ALL
      SELECT user_id, ts, 1 AS side, CAST(NULL AS BIGINT),
             CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE), event_id, value
      FROM {rel} WHERE event_type = '{probe_type}'
    ),
    carried AS (
      SELECT user_id, ts, side, event_id, value,
             last(mark_event_id, true) OVER w AS mark_event_id,
             last(mark_ts, true) OVER w AS mark_ts,
             last(mark_value, true) OVER w AS mark_value
      FROM unioned
      WINDOW w AS (
        PARTITION BY user_id
        ORDER BY ts, side, mark_event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      )
    )
    SELECT event_id, user_id, {d.unix_micros('ts')} AS ts_us, value,
           mark_event_id, {d.unix_micros('mark_ts')} AS mark_ts_us,
           mark_value,
           {d.unix_micros('ts')} - {d.unix_micros('mark_ts')}
             AS staleness_us
    FROM carried WHERE side = 1
    """


def window_attrib_sql(
    d: SqlDialect,
    rel: str = "events",
    mark_type: str = ASOF_MARK_TYPE,
    probe_type: str = ASOF_PROBE_TYPE,
    horizon_sec: int = ATTRIB_HORIZON_SEC,
) -> str:
    """Bounded-window attribution: every (probe, mark) pair where the
    mark happened within ``horizon_sec`` at-or-before the probe, plus
    the pair's age. The bounded-range-join decomposition: bucket both
    sides by ``floor(epoch / horizon)`` so each probe equi-joins its
    own and the previous bucket only, then filter the exact window —
    join fan-in is 2 buckets per probe at ANY corpus size, and the
    bucket key co-partitions with user_id in one shuffle.

    Same SQL on both engines (the decomposition is engine-neutral);
    correctness vs a plain inequality join is pinned by pytest on a
    hand-built fixture, and the bucket arithmetic is integer-exact.
    """
    us = 1_000_000
    h_us = horizon_sec * us
    probe_epoch = d.unix_micros("p.ts")
    mark_epoch = d.unix_micros("m.ts")
    b = "bucket"
    if d.name == d.SPARK:
        gen = f"explode(array({b}, {b} - 1))"
    else:
        gen = f"unnest([{b}, {b} - 1])"
    return f"""
    WITH marks AS (
      SELECT user_id, ts, event_id, value,
             {d.int_div(d.unix_micros('ts'), str(h_us))} AS bucket
      FROM {rel} WHERE event_type = '{mark_type}'
    ),
    probes AS (
      SELECT user_id, ts, event_id, value,
             {d.int_div(d.unix_micros('ts'), str(h_us))} AS bucket
      FROM {rel} WHERE event_type = '{probe_type}'
    ),
    probe_lookup AS (
      SELECT user_id, ts, event_id, value, {gen} AS join_bucket
      FROM probes
    )
    SELECT p.event_id AS probe_event_id, m.event_id AS mark_event_id,
           p.user_id,
           {probe_epoch} AS probe_ts_us, {mark_epoch} AS mark_ts_us,
           p.value AS probe_value, m.value AS mark_value,
           {probe_epoch} - {mark_epoch} AS age_us
    FROM probe_lookup p
    JOIN marks m
      ON p.user_id = m.user_id AND p.join_bucket = m.bucket
    WHERE m.ts <= p.ts
      AND {probe_epoch} - {mark_epoch} < {h_us}
    """
