"""Distributed EXACT order statistics.

Spark ships `approx_quantile` (Greenwald-Khanna) — fine for dashboards,
useless when the number feeds a gate that must reproduce across engines
and runs (data-card stats, SLA percentiles, split thresholds). Exact
quantiles are usually written as one global sort or one unpartitioned
rank window — both serialize the corpus through a single task.

`exact_quantiles` instead uses the two-phase bucket-offset scheme (the
ccnet_buckets distributed-rank move, generalized): a bounded histogram
locates each target rank's bucket, then only those buckets rank
locally. Nothing corpus-sized is ever sorted globally or collected.

Reference parity note: the reference engine (an event store) has no
analytic quantiles — this is part of the training-data-pipeline /
analytics surface the project brief adds as first-class components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schema import spread


def exact_quantiles(df: DataFrame, value_col: str,
                    qs: tuple[int, ...] = (25, 50, 75, 99),
                    buckets: int = 1024) -> DataFrame:
    """Exact discrete percentiles of a numeric column: for each q in
    ``qs``, the value at rank ceil(q·N/100) of the ascending order (the
    classic lower/"disc" quantile — rank arithmetic is pure BIGINT:
    (q·N + 99) div 100, so both engines pick the same element).

    Returns (q_pct, value), one row per requested percentile.

    Plan shape at 100 TB:

    * phase 1 — one scan builds a ``buckets``-bin histogram (map-side
      combined groupBy on the bin; min/max/N is a one-row scalar
      broadcast, the bm25 shape). Cumulative offsets run over ≤
      ``buckets`` rows — bounded by construction, never corpus-sized.
    * phase 2 — each target rank lands in exactly one bin; only rows of
      the hit bins are re-ranked, with a window KEYED by bin (each bin
      holds ~N/buckets rows — at 1e12 rows and 1024 bins that is still
      a billion-row bin, so raise ``buckets`` with N; the bin count is
      the explicit knob trading histogram size for bin width).

    The value itself is compared, never arithmetically combined, so
    DOUBLE columns are exact across engines. Bin assignment is internal
    (any binning yields the same final answer); only the rank
    definition is part of the contract.
    """
    v = spread(df).select(F.col(value_col).cast("double").alias("v")).where(
        F.col("v").isNotNull())
    stats = v.agg(F.min("v").alias("mn"), F.max("v").alias("mx"),
                  F.count(F.lit(1)).alias("n"))
    binned = v.crossJoin(F.broadcast(stats)).select(
        "v",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(buckets - 1),
                F.floor((F.col("v") - F.col("mn")) * buckets
                        / (F.col("mx") - F.col("mn"))).cast("int"),
            ),
        ).otherwise(F.lit(0)).alias("b"),
        "n",
    )
    hist = binned.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    # cumulative offsets over <= `buckets` rows — bounded by construction
    offs = hist.select(
        "b", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("lo"))
    targets = (
        stats.select("n")
        .select(F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q_pct"),
                "n")
        .select("q_pct",
                F.expr("(q_pct * n + 99) div 100").cast("long").alias("rk"))
    )
    hit = (
        targets.crossJoin(F.broadcast(offs))
        .where((F.col("rk") > F.col("lo"))
               & (F.col("rk") <= F.col("lo") + F.col("cnt")))
        .select("q_pct", "b", (F.col("rk") - F.col("lo")).alias("k"))
    )
    wb = Window.partitionBy("b").orderBy("v")
    ranked = (
        binned.join(F.broadcast(hit.select("b").distinct()), "b", "left_semi")
        .withColumn("rn", F.row_number().over(wb))
    )
    return (
        ranked.join(F.broadcast(hit), "b")
        .where(F.col("rn") == F.col("k"))
        .select("q_pct", "v")
        .groupBy("q_pct").agg(F.min("v").alias("value"))
    )


def sql_exact_quantiles(value_col: str, qs: tuple[int, ...] = (25, 50, 75, 99),
                        table: str = "lineitem") -> str:
    """DuckDB oracle for :func:`exact_quantiles` — definitional: one
    global rank, pick ceil(q·N/100) with the same BIGINT arithmetic.
    (Engine perf is irrelevant oracle-side; the bucketed plan is the
    Spark deliverable, the definition is the contract.)"""
    qvals = ", ".join(f"({int(q)})" for q in qs)
    return f"""
WITH v AS (
  SELECT CAST({value_col} AS DOUBLE) AS v FROM {table}
  WHERE {value_col} IS NOT NULL
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
r AS (
  SELECT q.q AS q_pct, (q.q * n.n + 99) // 100 AS rk
  FROM (VALUES {qvals}) q(q), n
), sel AS (
  SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rn FROM v
)
SELECT r.q_pct, min(sel.v) AS value
FROM r JOIN sel ON sel.rn = r.rk
GROUP BY r.q_pct
"""
