"""Temporal joins over event streams — as-of (nearest preceding match).

The as-of join is the classic event-analytics primitive Spark lacks as a
built-in (kdb+ ``aj``, Flink temporal join, Pandas ``merge_asof``,
DuckDB ``ASOF JOIN``): for every probe row, attach the most recent
reference row of the same key whose timestamp is <= the probe's. The
naive relational form is a range join (probe × all earlier reference
rows, then argmax) — quadratic per key and a non-equi join Catalyst
plans as BroadcastNestedLoop.

Spark-first translation — the union-window form:

* union probe and reference rows into ONE stream tagged by side,
* ONE window keyed by the join key, ordered (ts, side) with reference
  rows sorting first at equal timestamps (inclusive <= semantics),
* ``last(value, ignorenulls=True)`` carries the latest reference
  payload forward onto each probe row,
* filter back to probe rows.

ONE shuffle on the key, no join node at all, no range explosion —
per-key cost is the sorted-window scan, exactly the kdb/Flink execution
shape distributed by key. Hot keys cost one task's sort (the same
bound sessionization accepts); everything else is map-side.

Reference parity note: the reference engine has no cross-stream
temporal join (its reads are per-stream); this extends the
events-analytics family (SURVEY §2, next to events_funnel /
user_sessions) with the standard enrichment primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schema import spread


def asof_join(probe: DataFrame, reference: DataFrame, key_cols: list[str],
              probe_ts: str = "ts", ref_ts: str = "ts",
              ref_value_cols: list[str] | None = None,
              suffix: str = "_ref") -> DataFrame:
    """For each ``probe`` row, attach the most recent ``reference`` row
    with the same ``key_cols`` and ``ref_ts`` <= ``probe_ts``
    (inclusive; backward direction — the merge_asof/ASOF JOIN default).

    Returns all probe columns plus ``<ts><suffix>`` (the matched
    reference timestamp, NULL when no reference row precedes) and
    ``<col><suffix>`` for every ``ref_value_cols`` entry.

    The reference side should be unique per (key, ts) — pre-aggregate
    it otherwise; with duplicates the carried value is the lexically
    last at that timestamp, which is engine-dependent in every as-of
    implementation (DuckDB included).
    """
    if ref_value_cols is None:
        ref_value_cols = [c for c in reference.columns
                          if c not in key_cols and c != ref_ts]
    probe, reference = spread(probe), spread(reference)
    payload = [c for c in probe.columns
               if c not in key_cols and c != probe_ts]
    # tagged union: reference rows (side 0) sort before probe rows
    # (side 1) at equal timestamps -> inclusive <= without a join
    p = probe.select(
        *key_cols,
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in payload],
        F.lit(None).cast(reference.schema[ref_ts].dataType).alias("_rts"),
        *[F.lit(None).cast(reference.schema[c].dataType).alias(f"_rv_{c}")
          for c in ref_value_cols],
    )
    r = reference.select(
        *key_cols,
        F.col(ref_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in payload],
        F.col(ref_ts).alias("_rts"),
        *[F.col(c).alias(f"_rv_{c}") for c in ref_value_cols],
    )
    w = (Window.partitionBy(*key_cols).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = p.unionByName(r).select(
        "*",
        F.last("_rts", ignorenulls=True).over(w).alias(f"{ref_ts}{suffix}"),
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w)
          .alias(f"{c}{suffix}") for c in ref_value_cols],
    )
    return (
        carried.where(F.col("_side") == 1)
        .select(*key_cols, F.col("_ts").alias(probe_ts), *payload,
                f"{ref_ts}{suffix}",
                *[f"{c}{suffix}" for c in ref_value_cols])
    )


def sql_asof_events(probe_type: str = "purchase", ref_type: str = "view",
                    table: str = "events") -> str:
    """DuckDB oracle for the events as-of enrichment: native ASOF LEFT
    JOIN (inclusive >=), reference side pre-aggregated unique per
    (user_id, ts) so tie-breaking is engine-independent."""
    return f"""
WITH probe AS (
  SELECT event_id, user_id, ts, value FROM {table}
  WHERE event_type = '{probe_type}'
), ref AS (
  SELECT user_id, ts, max(value) AS view_value FROM {table}
  WHERE event_type = '{ref_type}' GROUP BY user_id, ts
)
SELECT p.user_id, p.ts, p.event_id, p.value,
       r.ts AS ts_ref, r.view_value AS view_value_ref
FROM probe p ASOF LEFT JOIN ref r
  ON p.user_id = r.user_id AND p.ts >= r.ts
"""
