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

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schema import spread, scoped_cache, scoped_persist

# Storage level for CORPUS-SIZED cached projections (r14-opt, guide §5):
# the default deserialized MEMORY_AND_DISK can exceed executor storage at
# 100 TB and evict mid-query (recompute storms). Serialized in-memory
# columnar batches are several x smaller and spill to disk gracefully;
# aggregate-sized caches keep the plain default — their footprint is
# bounded by construction and the deserialized form reads faster.
_CORPUS_CACHE = StorageLevel.MEMORY_AND_DISK


def exact_quantiles(df: DataFrame, value_col: str,
                    qs: tuple[int, ...] = (25, 50, 75, 99),
                    buckets: int = 1024) -> DataFrame:
    """Exact discrete percentiles of a numeric column: for each q in
    ``qs``, the value at rank ceil(q·N/100) of the ascending order (the
    classic lower/"disc" quantile — rank arithmetic is pure BIGINT:
    (q·N + 99) div 100, so both engines pick the same element).

    Returns (q_pct, value), one row per requested percentile.

    Plan shape at 100 TB — exactly THREE passes over the input, nothing
    corpus-sized ever sorts globally or collects:

    * pass 1 — the bounds sketch (one ``percentile_approx`` aggregate),
      shipped as a one-row broadcast; it is evaluated once because both
      downstream uses consume the SAME broadcast exchange.
    * pass 2 — one scan builds a ``buckets``-bin histogram (map-side
      combined groupBy on the bin). Cumulative offsets AND the total N
      come from one window over ≤ ``buckets`` rows — bounded by
      construction; N is NOT a separate corpus aggregate (the pre-r13opt
      form re-scanned the input for it, and again for each of the two
      uses of the rank→bin hit table — six corpus passes in the
      physical plan where three suffice, confirmed by plan diff).
    * pass 3 — each target rank lands in exactly one bin; only rows of
      the hit bins are re-ranked, with a window KEYED by (bin, target)
      (each bin holds ~N/buckets rows — at 1e12 rows and 1024 bins that
      is still a billion-row bin, so raise ``buckets`` with N; the bin
      count is the explicit knob trading histogram size for bin width).
      The ≤|qs|-row hit table broadcasts into ONE inner join — the
      row_number is partitioned by (b, q_pct) so a bin hit by several
      targets ranks each target's copy independently (identical ranks:
      the order statistic of a multiset does not depend on tie order).

    The value itself is compared, never arithmetically combined, so
    DOUBLE columns are exact across engines. Bin assignment is internal
    (any binning yields the same final answer); only the rank
    definition is part of the contract. The bin bounds are the
    approximate [1/buckets, 1−1/buckets] quantiles (one
    ``percentile_approx`` sketch, r13) with under/overflow buckets at
    the edges — equi-width over the raw [min, max] lets one sentinel
    outlier collapse every real value into a single bin, turning the
    phase-2 re-rank into a corpus-sized single-task sort.

    (r13-opt) No ``spread``: the per-row work here is a cast and one
    CASE — far below the cost of a round-robin exchange of the corpus,
    and ``spread`` on a DERIVED input (mad_outliers/skew_report call
    this on aggregate outputs) is always a pure-overhead exchange
    because ``inputFiles()`` reports the leaf files of any plan.
    """
    buckets = max(int(buckets), 3)
    frac = 1.0 / buckets
    # (r13-opt) The projected value column feeds three plan branches
    # (bounds sketch, histogram, hit-bin re-rank join); left lazy, each
    # branch re-evaluates the WHOLE upstream — callers hand in derived
    # corpus aggregations (skew_report's per-key counts) or broadcast-
    # joined scans (mad_outliers' dev), so that is 3-4 corpus passes
    # where one suffices. One lazy cache of the single-column
    # projection (narrowest possible footprint, spills to disk)
    # evaluates the input exactly once.
    v = df.select(F.col(value_col).cast("double").alias("v")).where(
        F.col("v").isNotNull()).transform(scoped_persist(_CORPUS_CACHE))
    stats = v.agg(
        F.percentile_approx("v", [frac, 1.0 - frac], 10000).alias("qb"),
    ).select(F.element_at("qb", 1).alias("qlo"),
             F.element_at("qb", 2).alias("qhi"))
    binned = v.crossJoin(F.broadcast(stats)).select(
        "v",
        F.when(F.col("v") < F.col("qlo"), F.lit(0))
        .when(F.col("v") > F.col("qhi"), F.lit(buckets - 1))
        .when(
            F.col("qhi") > F.col("qlo"),
            F.least(
                F.lit(buckets - 3),
                F.floor((F.col("v") - F.col("qlo")) * (buckets - 2)
                        / (F.col("qhi") - F.col("qlo"))).cast("int"),
            ) + 1,
        ).otherwise(F.lit(1)).alias("b"),
    )
    hist = binned.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    wn = Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing)
    # cumulative offsets AND total N over <= `buckets` rows — bounded by
    # construction; deriving N here keeps the corpus subtree out of the
    # target-rank arithmetic entirely.
    offs = hist.select(
        "b", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("lo"),
        F.sum("cnt").over(wn).alias("n"))
    hit = (
        offs.select(
            "b", "cnt", "lo",
            F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q_pct"),
            "n")
        .withColumn("rk", F.expr("(q_pct * n + 99) div 100").cast("long"))
        .where((F.col("rk") > F.col("lo"))
               & (F.col("rk") <= F.col("lo") + F.col("cnt")))
        .select("q_pct", "b", (F.col("rk") - F.col("lo")).alias("k"))
    )
    wb = Window.partitionBy("b", "q_pct").orderBy("v")
    return (
        binned.join(F.broadcast(hit), "b")
        .withColumn("rn", F.row_number().over(wb))
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


def _keyed_value_offsets(cnts: DataFrame, value: str,
                         cnt_cols: tuple[str, ...], keys: tuple[str, ...] = (),
                         buckets: int = 1024) -> DataFrame:
    """Exclusive running sums of each ``cnt_cols`` column in ascending
    ``value`` order WITHIN each ``keys`` group over a per-distinct-value
    count table, added as columns ``lo_<cnt>`` (other columns pass
    through).

    TWO-LEVEL, never a single per-key window over the distinct values:
    "distinct values are few" holds for quantized scores and lengths
    but the API accepts any long-castable column — feed a
    micro-quantized continuous score (the repo's own 1e6-ppm
    convention) and distinct count approaches corpus size, turning the
    one-partition-per-key window into a corpus-sized single-task sort
    (the sized-by-assumption class guarded_broadcast was built to
    kill). Scheme (the exact_quantiles bucket-histogram move):

    * level 1 — values bin into ``buckets`` GLOBAL ranges (min/max is a
      one-row scalar broadcast; bin arithmetic in DECIMAL(38,0), exact
      for the full BIGINT range); bucket totals cumulate over
      ≤ ``buckets`` rows per key — bounded by CONSTRUCTION.
    * level 2 — per-value offsets cumulate inside a window KEYED by
      (keys, bucket) (~distinct/buckets values each);
      lo = key's bucket_lo + local.

    Rank-robust bounds (r13, closing ADVICE r11's concentration
    caveat): the interior bins are equi-width over the APPROXIMATE
    [1/buckets, 1−1/buckets] quantiles of the distinct values (one
    ``percentile_approx`` sketch in the same one-row stats aggregate —
    no extra pass), with dedicated under/overflow buckets 0 and
    buckets−1. A Long.MAX sentinel — or any extreme-tail outlier —
    lands in an edge bucket and costs only itself; equi-width over the
    raw [min, max] would collapse EVERY real value into one bucket and
    degenerate level 2 into the per-key single-task sort this scheme
    exists to kill. Bounds only steer bin balance, never the answer:
    any monotone binning yields identical offsets, so the sketch's
    approximation (and its run-to-run merge-order variance) is
    invisible in the output.
    """
    kl = list(keys)
    buckets = max(int(buckets), 3)
    frac = 1.0 / buckets
    # (r13-opt) The input count table feeds THREE plan branches (the
    # bounds sketch, the bucket totals, and the final per-value join) —
    # left lazy, Spark re-evaluates its whole upstream per branch, and
    # every caller here derives it with a corpus-sized aggregation
    # (ks_drift's pair grid re-ran SEVEN corpus aggregations end to
    # end). One lazy cache evaluates it once; it is aggregate-sized
    # (per-distinct-value counts) and spills to disk if a continuous
    # column makes it large — still strictly cheaper than recomputing
    # the corpus aggregation per branch.
    cnts = cnts.transform(scoped_cache)
    stats = cnts.agg(
        F.percentile_approx(value, [frac, 1.0 - frac], 10000).alias("_qb")
    ).select(F.element_at("_qb", 1).alias("_qlo"),
             F.element_at("_qb", 2).alias("_qhi"))
    binned = cnts.crossJoin(F.broadcast(stats)).withColumn(
        "_b",
        F.expr(f"CASE WHEN {value} < _qlo THEN 0 "
               f"WHEN {value} > _qhi THEN {int(buckets) - 1} "
               f"ELSE CAST((CAST({value} AS DECIMAL(38,0)) - _qlo) "
               f"* {int(buckets) - 2} "
               f"DIV (CAST(_qhi AS DECIMAL(38,0)) - _qlo + 1) AS INT) + 1 "
               f"END"))
    wb = ((Window.partitionBy(*kl) if kl else Window)
          .orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    boffs = (
        binned.groupBy(*kl, "_b")
        .agg(*[F.sum(c).alias(f"_bc_{c}") for c in cnt_cols])
        .select(*kl, "_b",
                *[(F.sum(f"_bc_{c}").over(wb) - F.col(f"_bc_{c}"))
                  .alias(f"_blo_{c}") for c in cnt_cols]))
    wv = (Window.partitionBy(*kl, "_b").orderBy(value)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # unkeyed boffs is ≤buckets rows — always broadcastable; keyed boffs
    # is keys×buckets (aggregate-sized, not corpus-sized) — plain keyed
    # equi-join, AQE may still broadcast it when small
    out = binned.join(F.broadcast(boffs) if not kl else boffs, kl + ["_b"])
    for c in cnt_cols:
        out = out.withColumn(
            f"lo_{c}",
            (F.col(f"_blo_{c}") + F.sum(c).over(wv) - F.col(c)).cast("long"))
    return out.drop("_b", "_qlo", "_qhi", *[f"_blo_{c}" for c in cnt_cols])


def _value_offsets(cnts: DataFrame, value: str = "v", cnt: str = "c",
                   buckets: int = 1024) -> DataFrame:
    """Unkeyed single-count form of :func:`_keyed_value_offsets` — the
    exclusive running sum lands in column ``lo``."""
    return (_keyed_value_offsets(cnts, value, (cnt,), buckets=buckets)
            .withColumnRenamed(f"lo_{cnt}", "lo"))


def ks_drift(df: DataFrame, group_col: str = "lang",
             value_col: str = "n_chars", buckets: int = 1024) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between every pair
    of groups' value distributions — the standard drift test for "did
    this source/snapshot change shape?" monitoring of ingest pipelines
    (Massey 1951; corpus drift audits à la data cards).

    For groups a, b with counts n_a, n_b and step ECDFs F_a, F_b:
      D = max_x |F_a(x) − F_b(x)|
        = max_x |cum_a(x)·n_b − cum_b(x)·n_a| / (n_a·n_b)
    evaluated at every observed value of either group (the step points —
    where the max must occur). Returned as (g_a, g_b, n_a, n_b, ks_ppm)
    with ks_ppm the exact BIGINT floor of D·1e6; the cross-product
    cum·n reaches n²≈1e24 at corpus scale, so it is computed in
    DECIMAL(38,0)/HUGEINT (the kn_perplexity overflow class).

    Plan shape at 100 TB:

    * the corpus collapses to (group, value) counts in ONE map-side
      combined aggregate — everything downstream is aggregate-sized
      (≤ groups × distinct-values rows), never corpus-sized.
    * pair expansion joins those counts onto the bounded group-pair
      table (S² rows for S groups; sources/langs are dozens, not
      millions) — a broadcast join by construction.
    * the running ECDFs use :func:`_keyed_value_offsets`' TWO-LEVEL
      scheme keyed by (g_a, g_b) — bucket-keyed windows plus a
      ≤ ``buckets``-row per-pair bucket cumulative — so a pair's ECDF
      stays distributed even when the value column is continuous
      (micro-quantized scores: distinct values ≈ corpus size). The r11
      form (ONE window per pair ordered by value) was the last
      sized-by-assumption window in the repo; killed r12.

    Reference parity note: the reference engine has no distribution
    tests; this extends the corpus-analytics surface (SURVEY §2, next
    to exact_quantiles/zipf_fit).
    """
    base = spread(df).select(F.col(group_col).alias("g"),
                             F.col(value_col).cast("long").alias("x"))
    # (r13-opt) the (g, x) count table feeds totals AND both pair-join
    # sides — cache it so the corpus aggregation runs once, not three
    # times (aggregate-sized; the pmi/minhash shared-subtree discipline)
    cnts = base.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c")).transform(scoped_cache)
    totals = cnts.groupBy("g").agg(F.sum("c").alias("n"))

    g = totals.select("g", "n")
    pairs = (
        g.select(F.col("g").alias("ga"), F.col("n").alias("na"))
        .join(g.select(F.col("g").alias("gb"), F.col("n").alias("nb")),
              F.col("ga") < F.col("gb"))
    )
    side_a = (
        pairs.join(cnts.withColumnRenamed("g", "ga"), "ga")
        .select("ga", "gb", "na", "nb", "x",
                F.col("c").alias("ca"), F.lit(0).alias("cb"))
    )
    side_b = (
        pairs.join(cnts.withColumnRenamed("g", "gb"), "gb")
        .select("ga", "gb", "na", "nb", "x",
                F.lit(0).alias("ca"), F.col("c").alias("cb"))
    )
    grid = (
        side_a.unionByName(side_b)
        .groupBy("ga", "gb", "na", "nb", "x")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    offs = _keyed_value_offsets(grid, "x", ("ca", "cb"),
                                keys=("ga", "gb"), buckets=buckets)
    stepped = offs.select(
        "ga", "gb", "na", "nb",
        (F.col("lo_ca") + F.col("ca")).alias("cum_a"),
        (F.col("lo_cb") + F.col("cb")).alias("cum_b"),
    )
    return (
        stepped
        .withColumn(
            "diff",
            F.expr("abs(CAST(cum_a AS DECIMAL(38,0)) * nb "
                   "- CAST(cum_b AS DECIMAL(38,0)) * na)"))
        .groupBy(F.col("ga").alias("g_a"), F.col("gb").alias("g_b"),
                 F.col("na").alias("n_a"), F.col("nb").alias("n_b"))
        .agg(F.expr("CAST((max(diff) * 1000000) "
                    "DIV (CAST(max(na) AS DECIMAL(38,0)) * max(nb)) "
                    "AS BIGINT)").alias("ks_ppm"))
    )


def sql_ks_drift(group_col: str = "lang", value_col: str = "n_chars",
                 table: str = "documents") -> str:
    """DuckDB oracle for :func:`ks_drift` — definitional: full ECDF join
    at every step point, HUGEINT cross-products."""
    return f"""
WITH base AS (
  SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS x FROM {table}
), cnts AS (
  SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY g, x
), totals AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cnts GROUP BY g
), pairs AS (
  SELECT a.g AS ga, a.n AS na, b.g AS gb, b.n AS nb
  FROM totals a JOIN totals b ON a.g < b.g
), grid AS (
  SELECT p.ga, p.gb, p.na, p.nb, c.x,
         sum(CASE WHEN c.g = p.ga THEN c.c ELSE 0 END) AS ca,
         sum(CASE WHEN c.g = p.gb THEN c.c ELSE 0 END) AS cb
  FROM pairs p JOIN cnts c ON c.g = p.ga OR c.g = p.gb
  GROUP BY p.ga, p.gb, p.na, p.nb, c.x
), stepped AS (
  SELECT ga, gb, na, nb,
         sum(ca) OVER (PARTITION BY ga, gb ORDER BY x
                       ROWS UNBOUNDED PRECEDING) AS cum_a,
         sum(cb) OVER (PARTITION BY ga, gb ORDER BY x
                       ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM grid
)
SELECT ga AS g_a, gb AS g_b, na AS n_a, nb AS n_b,
       CAST((max(abs(CAST(cum_a AS HUGEINT) * nb
                     - CAST(cum_b AS HUGEINT) * na)) * 1000000)
            // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT) AS ks_ppm
FROM stepped
GROUP BY ga, gb, na, nb
"""


def auc_eval(df: DataFrame, score_col: str, label_col: str,
             buckets: int = 1024) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label — the
    Mann-Whitney U statistic with the standard tie correction (ties
    count half), the metric every quality/contamination classifier gate
    is judged by.

      AUC = [Σ_pos #neg_below + ½·#neg_tied] / (n_pos·n_neg)

    computed exactly: per distinct score value v with pos_v/neg_v
    counts, contribution = pos_v·(2·cumneg_below(v) + neg_v); AUC in
    ppm = Σ·1e6 div (2·n_pos·n_neg), all in DECIMAL(38,0)/HUGEINT
    (n_pos·n_neg ≈ n² passes 2^63 at corpus scale — the kn_perplexity
    overflow class). Returns ONE row (n_pos, n_neg, auc_ppm); NULL
    auc_ppm when either class is empty.

    Plan shape at 100 TB: the corpus collapses to per-score-value
    (pos, neg) counts in ONE map-side-combined aggregate; the running
    negative count uses :func:`_value_offsets`'s TWO-LEVEL scheme —
    bucket-keyed windows plus one ≤1024-row bucket cumulative — so it
    stays distributed even when the score column is continuous and
    distinct values approach corpus size; the final sum is a one-row
    aggregate. Nothing corpus-sized is sorted, windowed or joined.
    ``buckets`` sizes the level-1 histogram (quantile-bounded bins,
    robust to sentinel extremes — see :func:`_keyed_value_offsets`);
    raise it when N/buckets rows per bucket is still too many.

    Reference parity note: no eval surface in the reference engine;
    extends the eval family (SURVEY §2, next to knn_eval/ndcg_eval/
    overlap_eval).
    """
    base = spread(df).select(
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("boolean").alias("y"))
    cnts = base.groupBy("s").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("nn"))
    stepped = _value_offsets(cnts, value="s", cnt="nn",
                             buckets=buckets).select(
        "np", "nn", F.col("lo").alias("below"))
    return (
        stepped
        .agg(F.sum("np").alias("n_pos"), F.sum("nn").alias("n_neg"),
             F.sum(F.expr(
                 "CAST(np AS DECIMAL(38,0)) * (2 * below + nn)")).alias("u2"))
        .select(
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            F.expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL "
                   "ELSE CAST((u2 * 1000000) "
                   "DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) "
                   "AS BIGINT) END").alias("auc_ppm"))
    )


def sql_auc_eval(score_sql: str, label_sql: str, table: str) -> str:
    """DuckDB oracle for :func:`auc_eval` — same per-value counts,
    running sum and HUGEINT combination."""
    return f"""
WITH base AS (
  SELECT CAST({score_sql} AS BIGINT) AS s,
         CAST({label_sql} AS BOOLEAN) AS y
  FROM {table}
), cnts AS (
  SELECT s,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM base GROUP BY s
), stepped AS (
  SELECT np, nn,
         sum(nn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nn AS below
  FROM cnts
), agg AS (
  SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
         sum(CAST(np AS HUGEINT) * (2 * below + nn)) AS u2
  FROM stepped
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE CAST((u2 * 1000000)
                      // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) END
         AS auc_ppm
FROM agg
"""


def rate_anomaly(df: DataFrame, ts_col: str = "ts", trailing: int = 24,
                 threshold_ppm: int = 500_000) -> DataFrame:
    """Hourly event-rate anomaly detection against a trailing baseline —
    the ops-monitoring pass over an ingest/event stream ("did traffic
    deviate >50% from the last day's average this hour?").

    Per hour h with count n and the previous ``trailing`` OBSERVED
    hours' total s over m hours:

      dev_ppm    = |n·m − s| · 1e6 div s      (relative deviation from
                                               the trailing mean, exact
                                               BIGINT via DECIMAL —
                                               n·m·1e6 passes 2^63 at
                                               real event rates)
      is_anomaly = dev_ppm ≥ threshold_ppm AND m = trailing (warm-up
                   hours never flag)

    Returns (hour, n, trailing_n, trailing_hours, dev_ppm, is_anomaly).

    Plan shape at 100 TB: the stream collapses to per-hour counts in
    ONE map-side-combined aggregate; the trailing window runs over
    DISTINCT HOURS — bounded by the time range (a decade is ~9e4
    rows), never by event volume. The window is deliberately
    unpartitioned: its input is bounded by construction (the
    exact_quantiles offsets precedent).

    Reference parity note: the reference engine exposes no analytics
    over event rates; extends the events-analytics family (SURVEY §2,
    next to events_hourly/events_funnel/user_sessions).
    """
    hours = (
        spread(df)
        .select(F.date_trunc("hour", F.col(ts_col)).alias("hour"))
        .groupBy("hour").agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("hour").rowsBetween(-trailing, -1)
    stepped = hours.select(
        "hour", "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("trailing_n"),
        F.count("n").over(w).cast("long").alias("trailing_hours"),
    )
    return stepped.select(
        "hour", "n", "trailing_n", "trailing_hours",
        F.expr("CASE WHEN trailing_n = 0 THEN NULL "
               "ELSE CAST(abs(CAST(n AS DECIMAL(38,0)) * trailing_hours "
               "- trailing_n) * 1000000 DIV trailing_n AS BIGINT) END")
        .alias("dev_ppm"),
    ).withColumn(
        "is_anomaly",
        F.expr(f"coalesce(dev_ppm >= {int(threshold_ppm)} "
               f"AND trailing_hours = {int(trailing)}, false)"),
    )


def sql_rate_anomaly(ts_col: str = "ts", trailing: int = 24,
                     threshold_ppm: int = 500_000,
                     table: str = "events") -> str:
    """DuckDB oracle for :func:`rate_anomaly` — same hour counts,
    trailing frame and HUGEINT deviation."""
    return f"""
WITH hours AS (
  SELECT date_trunc('hour', {ts_col}) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1
), stepped AS (
  SELECT hour, n,
         CAST(coalesce(sum(n) OVER (ORDER BY hour
              ROWS BETWEEN {trailing} PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS trailing_n,
         CAST(count(n) OVER (ORDER BY hour
              ROWS BETWEEN {trailing} PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS trailing_hours
  FROM hours
)
SELECT hour, n, trailing_n, trailing_hours,
       CASE WHEN trailing_n = 0 THEN NULL
            ELSE CAST(abs(CAST(n AS HUGEINT) * trailing_hours - trailing_n)
                      * 1000000 // trailing_n AS BIGINT) END AS dev_ppm,
       coalesce((CASE WHEN trailing_n = 0 THEN NULL
            ELSE CAST(abs(CAST(n AS HUGEINT) * trailing_hours - trailing_n)
                      * 1000000 // trailing_n AS BIGINT) END)
            >= {int(threshold_ppm)}
            AND trailing_hours = {int(trailing)}, FALSE) AS is_anomaly
FROM stepped
"""


def classification_prf(df: DataFrame, gold_col: str = "gold",
                       pred_col: str = "pred") -> DataFrame:
    """Per-class precision / recall / F1 from (gold, pred) label pairs —
    the summary layer over a confusion matrix (langid_eval emits one);
    the number a pipeline gate is actually tuned on.

    Exact ppm arithmetic: p = tp·1e6 div pred_n, r = tp·1e6 div gold_n,
    f1 = 2·tp·1e6 div (pred_n + gold_n) (the harmonic mean computed
    from raw counts so no intermediate rounding compounds); zero
    denominators yield 0. Classes = union of gold and pred labels.
    Counts ride DECIMAL(38,0)/HUGEINT past the ·1e6 overflow line.

    Plan shape at 100 TB: ONE map-side-combined (gold, pred) count
    aggregate collapses the corpus; everything downstream is
    |classes|²-sized — two keyed re-aggregations and one outer join on
    the class key.

    Reference parity note: extends the eval family (SURVEY §2, next to
    langid_eval/auc_eval/knn_eval).
    """
    cm = (spread(df)
          .select(F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred"))
          .groupBy("gold", "pred").agg(F.count(F.lit(1)).alias("n"))
          # (r13-opt) cm feeds THREE plan branches (tp, gold_n, pred_n);
          # left lazy each re-ran the corpus aggregation. One lazy cache
          # of the |classes|²-sized confusion matrix = one corpus pass.
          .transform(scoped_cache))
    tp = (cm.where(F.col("gold") == F.col("pred"))
          .select(F.col("gold").alias("label"), F.col("n").alias("tp")))
    gold_n = cm.groupBy(F.col("gold").alias("label")).agg(
        F.sum("n").alias("gold_n"))
    pred_n = cm.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").alias("pred_n"))
    return (
        gold_n.join(pred_n, "label", "full")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("gold_n", F.lit(0)).cast("long").alias("gold_n"),
            F.coalesce("pred_n", F.lit(0)).cast("long").alias("pred_n"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
        .select(
            "label", "gold_n", "pred_n", "tp",
            F.expr("CASE WHEN pred_n = 0 THEN 0 ELSE CAST(CAST(tp AS "
                   "DECIMAL(38,0)) * 1000000 DIV pred_n AS BIGINT) END")
            .alias("precision_ppm"),
            F.expr("CASE WHEN gold_n = 0 THEN 0 ELSE CAST(CAST(tp AS "
                   "DECIMAL(38,0)) * 1000000 DIV gold_n AS BIGINT) END")
            .alias("recall_ppm"),
            F.expr("CASE WHEN gold_n + pred_n = 0 THEN 0 ELSE "
                   "CAST(2 * CAST(tp AS DECIMAL(38,0)) * 1000000 "
                   "DIV (gold_n + pred_n) AS BIGINT) END").alias("f1_ppm"),
        )
    )


def sql_classification_prf(gold_sql: str, pred_sql: str, table: str) -> str:
    """DuckDB oracle for :func:`classification_prf`."""
    return f"""
WITH cm AS (
  SELECT {gold_sql} AS gold, {pred_sql} AS pred,
         CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1, 2
), tp AS (
  SELECT gold AS label, n AS tp FROM cm WHERE gold = pred
), gn AS (SELECT gold AS label, CAST(sum(n) AS BIGINT) AS gold_n
          FROM cm GROUP BY gold),
pn AS (SELECT pred AS label, CAST(sum(n) AS BIGINT) AS pred_n
       FROM cm GROUP BY pred),
j AS (
  SELECT coalesce(gn.label, pn.label) AS label,
         coalesce(gold_n, 0) AS gold_n, coalesce(pred_n, 0) AS pred_n
  FROM gn FULL JOIN pn ON gn.label = pn.label
)
SELECT j.label, j.gold_n, j.pred_n,
       CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
       CAST(CASE WHEN j.pred_n = 0 THEN 0
            ELSE CAST(coalesce(tp.tp, 0) AS HUGEINT) * 1000000 // j.pred_n
            END AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN j.gold_n = 0 THEN 0
            ELSE CAST(coalesce(tp.tp, 0) AS HUGEINT) * 1000000 // j.gold_n
            END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN j.gold_n + j.pred_n = 0 THEN 0
            ELSE 2 * CAST(coalesce(tp.tp, 0) AS HUGEINT) * 1000000
                 // (j.gold_n + j.pred_n) END AS BIGINT) AS f1_ppm
FROM j LEFT JOIN tp ON j.label = tp.label
"""


def percentile_rank(df: DataFrame, value_col: str,
                    id_col: str = "doc_id",
                    buckets: int = 1024) -> DataFrame:
    """Exact percentile rank of every row's value — the normalization
    primitive for fusing heterogeneous per-doc signals (quality scores,
    perplexities, dup counts) onto one [0, 1e6] scale before gating or
    mixing (the CCNet-bucket move, generalized to a per-row rank).

    rank = position in the ascending (value, id) order (ids break ties,
    so the rank is total and reproducible); pct_ppm =
    (rank − 1)·1e6 div (N − 1) (0 when N = 1) — exact BIGINT via
    DECIMAL(38,0) (rank·1e6 brushes 2^63 at 1e13 rows).

    Returns (doc_id, value, rank, pct_ppm).

    Plan shape at 100 TB (the exact_quantiles / ccnet_buckets scheme —
    NO global sort, NO corpus-wide window):

    * one map-side aggregate collapses the corpus to per-value counts;
      cumulative offsets use :func:`_value_offsets`'s TWO-LEVEL scheme
      (bucket-keyed windows + one ≤``buckets``-row bucket cumulative),
      exact and distributed even when the value column is continuous
      and distinct values approach corpus size; bins are quantile-
      bounded (robust to sentinel extremes — see
      :func:`_keyed_value_offsets`).
    * each row's rank = its value's offset + a row_number inside a
      window KEYED by value (partition size = that value's tie count).
    * N is a one-row scalar broadcast (the bm25 N/avgdl shape).

    Reference parity note: extends the selection/analytics family
    (SURVEY §2, next to ccnet_buckets/exact_quantiles).
    """
    ranked, n = _pct_ranked(df, value_col, id_col, buckets)
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id", F.col("v").alias("value"), "rank",
            F.expr("CASE WHEN n <= 1 THEN CAST(0 AS BIGINT) "
                   "ELSE CAST(CAST(rank - 1 AS DECIMAL(38,0)) * 1000000 "
                   "DIV (n - 1) AS BIGINT) END").alias("pct_ppm"))
    )


def _pct_ranked(df: DataFrame, value_col: str, id_col: str,
                buckets: int) -> tuple[DataFrame, DataFrame]:
    """Shared core of :func:`percentile_rank` / :func:`quantile_bucket`:
    the two-level distributed (value, id) rank plus the one-row N table.

    (r13-opt) N sums the per-value count table — which
    :func:`_keyed_value_offsets` already caches — instead of
    re-aggregating the corpus input, and both consumers derive rank AND
    N from here instead of quantile_bucket re-running the whole ranked
    subtree for its N (count of rows ≡ Σ per-value counts, exactly).
    Corpus passes: percentile_rank 3 → 2, quantile_bucket ~5 → 2.
    """
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull())
    cnts = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    offs = _value_offsets(cnts, value="v", cnt="c",
                          buckets=buckets).select("v", "lo")
    n = cnts.agg(F.sum("c").cast("long").alias("n"))
    wv = Window.partitionBy("v").orderBy("doc_id")
    ranked = (
        base.join(offs, "v")
        .withColumn("rank", (F.col("lo") + F.row_number().over(wv))
                    .cast("long")))
    return ranked, n


def sql_percentile_rank(value_col: str, id_col: str = "doc_id",
                        table: str = "documents") -> str:
    """DuckDB oracle for :func:`percentile_rank` — definitional global
    (value, id) rank; the bucketed plan is the Spark deliverable."""
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, CAST({value_col} AS BIGINT) AS v
  FROM {table} WHERE {value_col} IS NOT NULL
), ranked AS (
  SELECT doc_id, v,
         CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT) AS rank,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM base
)
SELECT doc_id, v AS value, rank,
       CASE WHEN n <= 1 THEN CAST(0 AS BIGINT)
            ELSE CAST(CAST(rank - 1 AS HUGEINT) * 1000000 // (n - 1)
                      AS BIGINT) END AS pct_ppm
FROM ranked
"""


def mad_outliers(df: DataFrame, value_col: str, id_col: str = "doc_id",
                 k_ppm: int = 3_000_000, buckets: int = 1024) -> DataFrame:
    """Robust outlier flags via median absolute deviation (Hampel 1974;
    the data-card standard for "flag docs whose length/score is wildly
    off" without the mean/stddev's sensitivity to the outliers
    themselves):

      med  = exact lower median of value        (rank (50·N+99) div 100)
      mad  = exact lower median of |value−med|
      flag = |value−med|·1e6 > k_ppm·mad        (k_ppm=3e6 ≈ the classic
                                                 3-MAD fence; all BIGINT)

    Returns one row per input row: (doc_id, value, dev, is_outlier).
    Caveat inherent to MAD: if ≥ half the values are identical, mad = 0
    and every deviating row flags — that's the estimator, not a bug.

    Plan shape at 100 TB: both medians come from
    :func:`exact_quantiles`'s bucket-histogram rank location (one scan +
    bounded windows each — never a global sort); med/mad ride back as
    ONE-ROW scalar broadcasts (the bm25 N/avgdl shape); the flag pass is
    pure scan arithmetic.

    Reference parity note: extends the corpus-analytics family
    (SURVEY §2, next to exact_quantiles/ks_drift).
    """
    # (r13-opt) base feeds the med quantile AND the dev construction;
    # dev feeds the mad quantile AND the output fence. Left lazy the
    # input re-scanned (and re-spread) once per branch — 7 corpus
    # passes end to end in the physical plan. Two lazy caches (narrow
    # (doc_id, v[, dev]) projections) cut that to ONE input scan.
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull()).transform(scoped_persist(_CORPUS_CACHE))
    med = (exact_quantiles(base, "v", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("med")))
    dev = (base.crossJoin(F.broadcast(med))
           .withColumn("dev", F.abs(F.col("v") - F.col("med")))).transform(scoped_persist(_CORPUS_CACHE))
    mad = (exact_quantiles(dev, "dev", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("mad")))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select("doc_id", F.col("v").alias("value"), "dev",
                (F.col("dev") * 1_000_000 > F.lit(int(k_ppm)) * F.col("mad"))
                .alias("is_outlier"))
    )


def sql_mad_outliers(value_col: str, id_col: str = "doc_id",
                     k_ppm: int = 3_000_000,
                     table: str = "documents") -> str:
    """DuckDB oracle for :func:`mad_outliers` — definitional global
    ranks for both medians, same BIGINT fence."""
    return f"""
WITH v AS (
  SELECT {id_col} AS doc_id, CAST({value_col} AS BIGINT) AS v
  FROM {table} WHERE {value_col} IS NOT NULL
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
medr AS (
  SELECT v AS med FROM (
    SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v
  ), n WHERE rn = (50 * n.n + 99) // 100
), dev AS (
  SELECT doc_id, v, abs(v - med) AS dev FROM v, medr
), madr AS (
  SELECT dev AS mad FROM (
    SELECT dev, row_number() OVER (ORDER BY dev) AS rn FROM dev
  ), n WHERE rn = (50 * n.n + 99) // 100
)
SELECT doc_id, v AS value, dev,
       dev * 1000000 > {int(k_ppm)} * mad AS is_outlier
FROM dev, madr
"""


def concentration_report(df: DataFrame, group_col: str = "source"
                         ) -> DataFrame:
    """Corpus concentration over a categorical key (source/domain/lang)
    — the mixture-audit number pair: Herfindahl-Hirschman index and the
    Gini coefficient of the group-size distribution ("is the corpus a
    handful of domains in a trench coat?" — the C4/Dolma data-card
    staple).

    For group counts n_1..n_G (ascending) with N = Σn, rank i = 1..G:

      hhi_ppm  = Σ n_g² · 1e6 div N²
      gini_ppm = (2·Σ i·n_i − (G+1)·N) · 1e6 div (G·N)

    both exact in DECIMAL(38,0)/HUGEINT (n² and N² pass 2^63 at corpus
    scale). Returns ONE row (n_groups, n_rows, hhi_ppm, gini_ppm).

    Plan shape at 100 TB: the corpus collapses to per-group counts in
    ONE map-side aggregate; the Gini rank runs TWO-LEVEL (the
    _keyed_value_offsets scheme — ≤1024-bucket histogram cumulative +
    row_number inside bucket-keyed windows ordered (n, g)), never one
    unpartitioned window over all G groups: "groups are few" holds for
    sources/langs but the API takes any column, and a near-unique group
    key (url, doc hash) drives G to corpus size — the sized-by-
    assumption class killed for percentile_rank/auc_eval (r11) and
    ks_drift (r12). Output is one row.

    Reference parity note: extends the corpus-analytics family
    (SURVEY §2, next to source_mixture/kmv_distinct/zipf_fit).
    """
    cnts = (spread(df)
            .groupBy(F.col(group_col).alias("g"))
            .agg(F.count(F.lit(1)).alias("n")))
    # quantile-bounded bins (the _keyed_value_offsets r13 scheme): one
    # mega-group — a sentinel-sized count — lands in the overflow bucket
    # alone instead of collapsing every real count into one bucket
    gstats = cnts.agg(
        F.percentile_approx("n", [1.0 / 1024, 1.0 - 1.0 / 1024], 10000)
        .alias("_qb")
    ).select(F.element_at("_qb", 1).alias("_qlo"),
             F.element_at("_qb", 2).alias("_qhi"))
    binned = cnts.crossJoin(F.broadcast(gstats)).withColumn(
        "_b",
        F.expr("CASE WHEN n < _qlo THEN 0 WHEN n > _qhi THEN 1023 "
               "ELSE CAST((CAST(n AS DECIMAL(38,0)) - _qlo) * 1022 "
               "DIV (CAST(_qhi AS DECIMAL(38,0)) - _qlo + 1) AS INT) + 1 "
               "END"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    boffs = (binned.groupBy("_b").agg(F.count(F.lit(1)).alias("_bc"))
             .select("_b", (F.sum("_bc").over(wb) - F.col("_bc"))
                     .alias("_blo")))
    wv = Window.partitionBy("_b").orderBy("n", "g")
    ranked = (
        binned.join(F.broadcast(boffs), "_b")
        .select("n", (F.col("_blo") + F.row_number().over(wv))
                .cast("long").alias("i")))
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n").alias("n_rows"),
            F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * n")).alias("sq"),
            F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * n")).alias("iw"),
        )
        .select(
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.expr("CAST(sq * 1000000 DIV (CAST(n_rows AS DECIMAL(38,0)) "
                   "* n_rows) AS BIGINT)").alias("hhi_ppm"),
            F.expr("CAST((2 * iw - (n_groups + 1) "
                   "* CAST(n_rows AS DECIMAL(38,0))) * 1000000 "
                   "DIV (CAST(n_groups AS DECIMAL(38,0)) * n_rows) "
                   "AS BIGINT)").alias("gini_ppm"),
        )
    )


def sql_concentration_report(group_col: str = "source",
                             table: str = "documents") -> str:
    """DuckDB oracle for :func:`concentration_report`."""
    return f"""
WITH cnts AS (
  SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1
), ranked AS (
  SELECT n, CAST(row_number() OVER (ORDER BY n, g) AS BIGINT) AS i
  FROM cnts
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(n) AS BIGINT) AS n_rows,
         sum(CAST(n AS HUGEINT) * n) AS sq,
         sum(CAST(i AS HUGEINT) * n) AS iw
  FROM ranked
)
SELECT n_groups, n_rows,
       CAST(sq * 1000000 // (CAST(n_rows AS HUGEINT) * n_rows) AS BIGINT)
         AS hhi_ppm,
       CAST((2 * iw - (n_groups + 1) * CAST(n_rows AS HUGEINT)) * 1000000
            // (CAST(n_groups AS HUGEINT) * n_rows) AS BIGINT) AS gini_ppm
FROM agg
"""


def skew_report(df: DataFrame, key_cols: list[str],
                buckets: int = 1024) -> DataFrame:
    """Key-distribution audit for shuffle-skew diagnosis — the question
    to ask BEFORE a 100-TB groupBy/join stalls on two straggler tasks:
    how hot is the hottest key of each candidate shuffle column?

    One row per audited column:

      key_col, n_rows, n_keys, max_count, p50_count, p99_count,
      top_share_ppm  = max_count·1e6 div n_rows      (hottest key's mass)
      skew_x_ppm     = max_count·n_keys·1e6 div n_rows (max/mean, ppm —
                       1e6 = perfectly uniform)
      suggested_salt = greatest(1, max_count·n_keys div n_rows)
                       (salt shards to bring the hottest key down to
                        ~mean size — the standard skew-join remedy)

    Exact, aggregate-sized: ONE grouping-sets pass over the corpus
    yields every column's count-per-key table (r13-opt — previously one
    keyed corpus aggregate per column), then per column a one-row stats
    aggregate and :func:`exact_quantiles` over that column's count
    slice (bucket-histogram rank — the count table itself can be
    corpus-sized when keys are near-unique, so no global sort and no
    unpartitioned window touches it). DECIMAL(38,0) products.

    Reference parity note: operational diagnostics, no reference
    analog; next to concentration_report (SURVEY §2 stats family).
    """
    out = None
    base = spread(df)
    # (r13-opt) ONE grouping-sets pass computes every audited column's
    # per-key count table in a single corpus aggregation (Expand +
    # map-side combine) instead of one corpus groupBy per column, and
    # the ≤Σ|keys(col)|-row result is lazily cached: downstream each
    # column consumes its slice in several plan branches (the stats
    # aggregate + exact_quantiles), which previously re-ran the corpus
    # aggregation per branch — 5 corpus passes per column where one
    # total suffices. Only (grouping_id, count) is cached — the key
    # values themselves never flow downstream.
    n = len(key_cols)
    gid_of = {col: (2 ** n - 1) - 2 ** (n - 1 - i)
              for i, col in enumerate(key_cols)}
    cnts_all = (
        base.groupingSets([[c] for c in key_cols], *key_cols)
        .agg(F.count(F.lit(1)).alias("c"), F.grouping_id().alias("_gid"))
        .select("_gid", "c")
    ).transform(scoped_cache)
    for col in key_cols:
        cnts = cnts_all.where(F.col("_gid") == gid_of[col]).select("c")
        stats = cnts.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_count"),
            F.sum("c").cast("long").alias("n_rows"))
        q = (exact_quantiles(cnts, "c", qs=(50, 99), buckets=buckets)
             .agg(F.max(F.when(F.col("q_pct") == 50, F.col("value")))
                  .cast("long").alias("p50_count"),
                  F.max(F.when(F.col("q_pct") == 99, F.col("value")))
                  .cast("long").alias("p99_count")))
        row = (stats.crossJoin(F.broadcast(q)).select(
            F.lit(col).alias("key_col"),
            "n_rows", "n_keys", "max_count", "p50_count", "p99_count",
            F.expr("CAST(CAST(max_count AS DECIMAL(38,0)) * 1000000 "
                   "DIV n_rows AS BIGINT)").alias("top_share_ppm"),
            F.expr("CAST(CAST(max_count AS DECIMAL(38,0)) * n_keys "
                   "* 1000000 DIV n_rows AS BIGINT)").alias("skew_x_ppm"),
            F.expr("GREATEST(CAST(1 AS BIGINT), "
                   "CAST(CAST(max_count AS DECIMAL(38,0)) * n_keys "
                   "DIV n_rows AS BIGINT))").alias("suggested_salt"),
        ))
        out = row if out is None else out.unionByName(row)
    return out


def sql_skew_report(key_cols: list[str], table: str = "events") -> str:
    """DuckDB oracle for :func:`skew_report` — definitional global-rank
    quantiles of the per-key counts, same BIGINT rank arithmetic."""
    parts = []
    for col in key_cols:
        parts.append(f"""
SELECT '{col}' AS key_col, n_rows, n_keys, max_count, p50_count,
       p99_count,
       CAST(CAST(max_count AS HUGEINT) * 1000000 // n_rows AS BIGINT)
         AS top_share_ppm,
       CAST(CAST(max_count AS HUGEINT) * n_keys * 1000000 // n_rows
         AS BIGINT) AS skew_x_ppm,
       greatest(CAST(1 AS BIGINT),
                CAST(CAST(max_count AS HUGEINT) * n_keys // n_rows
                     AS BIGINT)) AS suggested_salt
FROM (
  WITH c AS (SELECT {col} AS k, CAST(count(*) AS BIGINT) AS c
             FROM {table} GROUP BY 1),
  s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(c) AS BIGINT) AS max_count,
               CAST(sum(c) AS BIGINT) AS n_rows FROM c),
  r AS (SELECT c, CAST(row_number() OVER (ORDER BY c) AS BIGINT) AS rn
        FROM c)
  SELECT s.n_keys, s.max_count, s.n_rows,
         (SELECT min(c) FROM r WHERE rn = (50 * s.n_keys + 99) // 100)
           AS p50_count,
         (SELECT min(c) FROM r WHERE rn = (99 * s.n_keys + 99) // 100)
           AS p99_count
  FROM s
)""")
    return " UNION ALL ".join(parts)


def calibration_curve(df: DataFrame, score_col: str, label_col: str,
                      bins: int = 10) -> DataFrame:
    """Reliability diagram of a [0, 1e6]-ppm confidence score against a
    binary outcome — the standard "is the classifier's confidence
    honest?" audit (Expected Calibration Error's per-bin table) run
    before trusting a quality/contamination gate's scores as sampling
    weights.

    Scores bin into ``bins`` equal ppm ranges (out-of-range scores
    clamp into the end bins); per bin: count, exact mean score and
    positive rate, both in ppm (sums in DECIMAL(38,0) — n·1e6 passes
    2^63 at corpus scale, the kn_perplexity overflow class).

    Returns (bin, n, mean_score_ppm, pos_ppm), one row per non-empty
    bin. ECE = Σ n_b·|mean_b − pos_b| / N is one trivial aggregate on
    top — emitted per-bin so the caller sees WHERE the miscalibration
    lives.

    Plan shape at 100 TB: ONE map-side-combined aggregate over ≤
    ``bins`` groups. Nothing else.

    Reference parity note: no eval surface in the reference; extends
    the eval family (SURVEY §2, next to auc_eval/langid_prf).
    """
    base = spread(df).select(
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).where(F.col("s").isNotNull())
    nb = int(bins)
    b = F.greatest(
        F.lit(0),
        F.least(F.lit(nb - 1),
                F.expr(f"CAST(s * {nb} DIV 1000000 AS INT)")))
    return (
        base.groupBy(b.cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(sum(CAST(s AS DECIMAL(38,0))) DIV count(*) "
                   "AS BIGINT)").alias("mean_score_ppm"),
            F.expr("CAST(sum(CASE WHEN y THEN CAST(1 AS DECIMAL(38,0)) "
                   "ELSE 0 END) * 1000000 DIV count(*) AS BIGINT)")
            .alias("pos_ppm"))
    )


def sql_calibration_curve(score_sql: str, label_sql: str, table: str,
                          bins: int = 10) -> str:
    """DuckDB oracle for :func:`calibration_curve` — same clamp, bin
    and HUGEINT ratios."""
    nb = int(bins)
    return f"""
WITH base AS (
  SELECT CAST({score_sql} AS BIGINT) AS s,
         CAST({label_sql} AS BOOLEAN) AS y
  FROM {table}
  WHERE ({score_sql}) IS NOT NULL
)
SELECT CAST(greatest(0, least({nb - 1}, s * {nb} // 1000000)) AS BIGINT)
         AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(s AS HUGEINT)) // count(*) AS BIGINT)
         AS mean_score_ppm,
       CAST(sum(CASE WHEN y THEN CAST(1 AS HUGEINT) ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS pos_ppm
FROM base GROUP BY 1
"""


def pr_curve(df: DataFrame, score_col: str, label_col: str,
             points: int = 20, buckets: int = 1024) -> DataFrame:
    """Precision/recall sweep of a score against a binary label at
    ``points`` exact score-quantile thresholds (ranks q·N div 100 for
    q = 100/points, 2·100/points, …, 100 of the ASCENDING score order;
    predicted-positive ⟺ score >= threshold) — the operating-point
    picker for a trained gate, complementing :func:`auc_eval`'s single
    number.

    Returns (q_pct, threshold, n_pred, tp, precision_ppm, recall_ppm);
    duplicate thresholds (quantiles colliding on few distinct scores)
    emit duplicate rows — deterministic in both engines.

    Plan shape at 100 TB: the corpus collapses to per-score-value
    (pos, neg) counts in ONE map-side aggregate; exclusive below-counts
    come from :func:`_keyed_value_offsets`' two-level scheme (so
    cum(score >= t) = total − below(t) with NO descending re-sort);
    thresholds are picked DIRECTLY from those offsets — rank rk lands
    on the unique value whose (lo, lo+cnt] interval contains it, via a
    broadcast of the ≤ ``points`` target-rank rows. Nothing corpus-sized
    is sorted, windowed, or replicated, the base table is scanned once,
    and the rank→value pick is pure BIGINT (no DOUBLE round-trip — a
    |score| > 2^53 threshold is matched exactly, ADVICE r12).
    """
    base = spread(df).select(
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).where(F.col("s").isNotNull())
    pts = max(int(points), 1)
    qs = tuple(sorted({(i * 100) // pts for i in range(1, pts + 1)} - {0}))
    cnts = base.groupBy("s").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("nn"))
    offs = _keyed_value_offsets(cnts, "s", ("np", "nn"), buckets=buckets)
    tot = cnts.agg(F.sum("np").alias("n_pos"),
                   F.sum(F.col("np") + F.col("nn")).alias("n_all"))
    targets = (
        tot.select(
            F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q_pct"),
            "n_pos", "n_all")
        .select("q_pct", "n_pos", "n_all",
                F.expr("(q_pct * n_all + 99) div 100").cast("long")
                .alias("_rk"))
    )
    return (
        offs.crossJoin(F.broadcast(targets))
        .where((F.col("lo_np") + F.col("lo_nn") < F.col("_rk"))
               & (F.col("_rk") <= F.col("lo_np") + F.col("lo_nn")
                  + F.col("np") + F.col("nn")))
        .select(
            "q_pct",
            F.col("s").alias("threshold"),
            (F.col("n_all") - F.col("lo_np") - F.col("lo_nn"))
            .cast("long").alias("n_pred"),
            (F.col("n_pos") - F.col("lo_np")).cast("long").alias("tp"),
            "n_pos")
        .select(
            "q_pct", "threshold", "n_pred", "tp",
            F.expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV n_pred "
                   "AS BIGINT)").alias("precision_ppm"),
            F.expr("CASE WHEN n_pos = 0 THEN NULL ELSE "
                   "CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV n_pos "
                   "AS BIGINT) END").alias("recall_ppm"))
    )


def sql_pr_curve(score_sql: str, label_sql: str, table: str,
                 points: int = 20) -> str:
    """DuckDB oracle for :func:`pr_curve` — definitional: rank-picked
    thresholds, then a thresholds × per-value-counts range aggregate
    (engine perf irrelevant oracle-side)."""
    pts = max(int(points), 1)
    qs = sorted({(i * 100) // pts for i in range(1, pts + 1)} - {0})
    qvals = ", ".join(f"({q})" for q in qs)
    return f"""
WITH base AS (
  SELECT CAST({score_sql} AS BIGINT) AS s,
         CAST({label_sql} AS BOOLEAN) AS y
  FROM {table}
  WHERE ({score_sql}) IS NOT NULL
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM base
), r AS (
  SELECT q.q AS q_pct, (q.q * n.n_all + 99) // 100 AS rk
  FROM (VALUES {qvals}) q(q), n
), sel AS (
  SELECT s, CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS rn FROM base
), th AS (
  SELECT r.q_pct, min(sel.s) AS threshold
  FROM r JOIN sel ON sel.rn = r.rk GROUP BY r.q_pct
)
SELECT th.q_pct, th.threshold,
       CAST(count(*) FILTER (WHERE b.s >= th.threshold) AS BIGINT)
         AS n_pred,
       CAST(count(*) FILTER (WHERE b.s >= th.threshold AND b.y)
            AS BIGINT) AS tp,
       CAST(CAST(count(*) FILTER (WHERE b.s >= th.threshold AND b.y)
                 AS HUGEINT) * 1000000
            // count(*) FILTER (WHERE b.s >= th.threshold) AS BIGINT)
         AS precision_ppm,
       CASE WHEN (SELECT n_pos FROM n) = 0 THEN NULL ELSE
         CAST(CAST(count(*) FILTER (WHERE b.s >= th.threshold AND b.y)
                   AS HUGEINT) * 1000000
              // (SELECT n_pos FROM n) AS BIGINT) END AS recall_ppm
FROM th CROSS JOIN base b
GROUP BY th.q_pct, th.threshold
"""


def winsorize(df: DataFrame, value_col: str, id_col: str = "doc_id",
              p_lo: int = 1, p_hi: int = 99,
              buckets: int = 1024) -> DataFrame:
    """Clamp a numeric column to its exact [p_lo, p_hi] percentile range
    (Winsorization — the standard outlier treatment before computing
    means/mixture weights over heavy-tailed signals like document
    lengths or duplicate counts; complements :func:`mad_outliers`'
    flag-don't-touch report).

    Returns (doc_id, value, winsorized) — every row, with the clamp
    applied; rank definition = :func:`exact_quantiles`' (q·N+99) div
    100, so both engines pick identical bounds.

    Plan shape at 100 TB: exact_quantiles' bounded histogram pass for
    the two bounds (never a global sort), collapsed to a ONE-ROW scalar
    broadcast onto a single clamp scan. Two scans total.
    """
    q = exact_quantiles(df, value_col, qs=(int(p_lo), int(p_hi)),
                        buckets=buckets)
    bounds = q.agg(
        F.min(F.when(F.col("q_pct") == int(p_lo), F.col("value")))
        .alias("_qlo"),
        F.min(F.when(F.col("q_pct") == int(p_hi), F.col("value")))
        .alias("_qhi"))
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("value"))
    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id", "value",
            F.when(F.col("value").isNull(), F.lit(None).cast("double"))
            .otherwise(F.least(F.greatest(F.col("value"), F.col("_qlo")),
                               F.col("_qhi"))).alias("winsorized"))
    )


def sql_winsorize(value_col: str, id_col: str = "doc_id",
                  p_lo: int = 1, p_hi: int = 99,
                  table: str = "documents") -> str:
    """DuckDB oracle for :func:`winsorize` — definitional global-rank
    bounds, same clamp."""
    return f"""
WITH v AS (
  SELECT CAST({value_col} AS DOUBLE) AS v FROM {table}
  WHERE {value_col} IS NOT NULL
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
sel AS (
  SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rn FROM v
), bounds AS (
  SELECT
    (SELECT min(v) FROM sel, n WHERE rn = ({int(p_lo)} * n.n + 99) // 100)
      AS qlo,
    (SELECT min(v) FROM sel, n WHERE rn = ({int(p_hi)} * n.n + 99) // 100)
      AS qhi
)
SELECT {id_col} AS doc_id, CAST({value_col} AS DOUBLE) AS value,
       CASE WHEN {value_col} IS NULL THEN NULL
            ELSE least(greatest(CAST({value_col} AS DOUBLE), b.qlo), b.qhi)
       END AS winsorized
FROM {table} CROSS JOIN bounds b
"""


def chi2_independence(df: DataFrame, a_col: str = "source",
                      b_col: str = "lang") -> DataFrame:
    """Exact-integer Pearson chi-square test of independence between
    two categorical columns — the hypothesis-test sibling of
    :func:`~eventstore_spark.operators.corpus.association_mi` (is the
    source × language association statistically real, and how strong
    per Cramér's V?). Standard corpus-audit stat (data cards; Pearson
    1900).

    Determinism convention (the association_mi/pmi one): every cell's
    term enters as exact BIGINT/DECIMAL integers with ONE double
    division micro-rounded immediately, so DuckDB reproduces the sum
    bit-for-bit:

      t_micro(a,b) = round((nab·N − na·nb)² / (na·nb·N) · 1e6)   [DOUBLE
                     only inside the round; all inputs exact integers]

    Empty cells (observed 0, expected > 0) contribute Σ e = N − Σ_obs e
    in closed form — (N² − Σ_obs na·nb)·1e6 DIV N, PURE DECIMAL(38,0)
    integer arithmetic (N ≤ 1e12 keeps N²·1e6 ≤ 1e30 < 10^38) — so the
    full contingency grid is never materialized and no cross join of
    the marginals exists in the plan.

    Returns ONE row (n, n_a, n_b, dof, chi2_micro, cramers_v_micro);
    cramers_v derives from the already-rounded chi2 (deterministic by
    construction).

    Plan shape at 100 TB: ONE map-side cell aggregate; marginals are
    aggregate-sized groupBys broadcast back onto the cells; one-row
    output. Same shape as association_mi.
    """
    base = spread(df).select(F.col(a_col).alias("a"),
                             F.col(b_col).alias("b"))
    # (r13-opt) The cell table feeds FIVE plan branches (both marginals,
    # the total, the term join, and the distinct-count dims — the dims
    # read cells instead of base: distinct a over the cells IS distinct
    # a over the corpus); left lazy each branch re-ran the corpus
    # aggregation. One lazy cache of the aggregate-sized cell table
    # collapses five corpus passes into one.
    cells = (base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nab"))
             .transform(scoped_cache))
    ma = cells.groupBy("a").agg(F.sum("nab").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("nab").alias("nb"))
    tot = cells.agg(F.sum("nab").alias("n"))
    term = (
        cells.join(F.broadcast(ma), "a").join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.expr("CAST(na AS DECIMAL(38,0)) * nb").alias("ee"),
            F.expr(
                "CAST(round(((CAST(nab AS DOUBLE) * n - CAST(na AS DOUBLE)"
                " * nb) * (CAST(nab AS DOUBLE) * n - CAST(na AS DOUBLE)"
                " * nb)) / (CAST(na AS DOUBLE) * nb * n) * 1e6) AS BIGINT)"
            ).alias("t_micro"))
    )
    return (
        term.agg(F.max("n").alias("_n"),
                 F.sum("t_micro").alias("_obs"),
                 F.sum("ee").alias("_s"))
        .crossJoin(F.broadcast(
            cells.agg(F.countDistinct("a").alias("n_a"),
                      F.countDistinct("b").alias("n_b"))))
        .select(
            F.col("_n").cast("long").alias("n"), "n_a", "n_b",
            ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long")
            .alias("dof"),
            F.expr("CAST(_obs + (CAST(_n AS DECIMAL(38,0)) * _n - _s) "
                   "* 1000000 DIV _n AS BIGINT)").alias("chi2_micro"))
        .withColumn(
            "cramers_v_micro",
            F.expr("CASE WHEN dof = 0 THEN 0 ELSE CAST(round(sqrt("
                   "(CAST(chi2_micro AS DOUBLE) / 1e6) / (CAST(n AS DOUBLE)"
                   " * least(n_a - 1, n_b - 1))) * 1e6) AS BIGINT) END"))
    )


def sql_chi2_independence(a_col: str = "source", b_col: str = "lang",
                          table: str = "documents") -> str:
    """DuckDB oracle for :func:`chi2_independence` — same cells, same
    per-cell micro-rounded term, same closed-form empty-cell sum."""
    return f"""
WITH base AS (
  SELECT {a_col} AS a, {b_col} AS b FROM {table}
), cells AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS nab FROM base GROUP BY a, b
), ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na FROM cells GROUP BY a),
mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb FROM cells GROUP BY b),
tot AS (SELECT CAST(sum(nab) AS BIGINT) AS n FROM cells),
term AS (
  SELECT n, CAST(na AS HUGEINT) * nb AS ee,
         CAST(round(((CAST(nab AS DOUBLE) * n - CAST(na AS DOUBLE) * nb)
              * (CAST(nab AS DOUBLE) * n - CAST(na AS DOUBLE) * nb))
              / (CAST(na AS DOUBLE) * nb * n) * 1e6) AS BIGINT) AS t_micro
  FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
), agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         CAST(sum(t_micro) AS HUGEINT) AS obs,
         CAST(sum(ee) AS HUGEINT) AS s
  FROM term
), dims AS (
  SELECT CAST(count(DISTINCT a) AS BIGINT) AS n_a,
         CAST(count(DISTINCT b) AS BIGINT) AS n_b
  FROM base
)
SELECT n, n_a, n_b,
       CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
       CAST(obs + (CAST(n AS HUGEINT) * n - s) * 1000000 // n AS BIGINT)
         AS chi2_micro,
       CASE WHEN (n_a - 1) * (n_b - 1) = 0 THEN 0 ELSE
         CAST(round(sqrt((CAST(obs + (CAST(n AS HUGEINT) * n - s)
              * 1000000 // n AS DOUBLE) / 1e6)
              / (CAST(n AS DOUBLE) * least(n_a - 1, n_b - 1))) * 1e6)
              AS BIGINT) END AS cramers_v_micro
FROM agg CROSS JOIN dims
"""


def brier_score(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact Brier score of a calibrated probability score (ppm-scaled,
    the repo's 1e6 convention) against a binary label — mean squared
    error of the forecast, the single-number companion of
    :func:`calibration_curve` (Brier 1950; the standard "is the gate's
    probability a probability" audit before thresholding a corpus).

      brier_micro = Σ (p_ppm − y·1e6)² DIV (n · 1e6)

    PURE integer: the squared residual is ≤ 1e12 per row, the DECIMAL
    (38,0) sum holds 1e12 rows with 26 digits to spare, and the final
    integer division floors identically in both engines. Returns ONE
    row (n, n_pos, brier_micro).

    Plan shape at 100 TB: one map-side aggregate over the scan — no
    join, no window, no shuffle beyond the final one-row combine.
    """
    base = spread(df).select(
        F.col(score_col).cast("long").alias("p"),
        F.col(label_col).cast("boolean").cast("long").alias("y"),
    ).where(F.col("p").isNotNull() & F.col("y").isNotNull())
    return base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.expr("CAST(sum(CAST(p - y * 1000000 AS DECIMAL(38,0)) "
               "* (p - y * 1000000)) DIV (count(1) * 1000000) AS BIGINT)")
        .alias("brier_micro"))


def sql_brier_score(score_sql: str, label_sql: str, table: str) -> str:
    """DuckDB oracle for :func:`brier_score` — same integer floor."""
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN CAST({label_sql} AS BOOLEAN) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pos,
       CAST(sum(CAST(CAST({score_sql} AS BIGINT)
                - (CASE WHEN CAST({label_sql} AS BOOLEAN) THEN 1 ELSE 0 END)
                * 1000000 AS HUGEINT)
                * (CAST({score_sql} AS BIGINT)
                - (CASE WHEN CAST({label_sql} AS BOOLEAN) THEN 1 ELSE 0 END)
                * 1000000))
            // (count(*) * 1000000) AS BIGINT) AS brier_micro
FROM {table}
WHERE ({score_sql}) IS NOT NULL AND ({label_sql}) IS NOT NULL
"""


def quantile_bucket(df: DataFrame, value_col: str, k: int = 10,
                    id_col: str = "doc_id",
                    buckets: int = 1024) -> DataFrame:
    """Exact equal-frequency bucket (distributed NTILE(k)) of every
    row — the feature-pipeline binning primitive (CCNet thirds,
    decile mixing) as a first-class operator: bucket sizes differ by
    at most one, ties broken by id so the assignment is total and
    engine-reproducible.

      bucket = (rank − 1) · k DIV N + 1,  rank from the ascending
      (value, id) order

    which is exactly SQL NTILE(k) over that order. Returns
    (doc_id, value, rank, bucket).

    Plan shape at 100 TB: :func:`percentile_rank`'s two-level
    distributed rank (no global sort, no corpus-wide window) + ONE
    one-row N scalar broadcast — nothing new shuffles.
    """
    # (r13-opt) rank and N both come from _pct_ranked — previously N
    # re-aggregated percentile_rank's OUTPUT, re-running the entire
    # ranked subtree (offsets join + tie window) a second time.
    ranked, n = _pct_ranked(df, value_col, id_col, buckets)
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id", F.col("v").alias("value"), "rank",
            F.expr(f"CAST((CAST(rank AS DECIMAL(38,0)) - 1) * {int(k)} "
                   f"DIV n + 1 AS BIGINT)").alias("bucket"))
    )


def sql_quantile_bucket(value_col: str, k: int = 10,
                        table: str = "documents",
                        id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`quantile_bucket` — native NTILE over
    the same total (value, id) order."""
    return f"""
SELECT {id_col} AS doc_id, CAST({value_col} AS BIGINT) AS value,
       CAST(row_number() OVER w AS BIGINT) AS rank,
       CAST(ntile({int(k)}) OVER w AS BIGINT) AS bucket
FROM {table}
WHERE {value_col} IS NOT NULL
WINDOW w AS (ORDER BY {value_col}, {id_col})
"""


def psi_drift(df_old: DataFrame, df_new: DataFrame,
              group_col: str = "source") -> DataFrame:
    """Exact-integer Population Stability Index between two snapshots'
    distributions of a categorical column — THE production drift gate
    for ingest monitoring (credit-risk lineage; "PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted"), complementing
    :func:`ks_drift` (continuous two-sample) and
    :func:`~eventstore_spark.operators.corpus.snapshot_diff`
    (per-id content diff):

      PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)

    with add-one (Laplace) smoothing over the category UNION — p_i =
    (a_i + 1)/(Na + C), q_i = (b_i + 1)/(Nb + C) — so categories
    present on only one side contribute finitely and deterministically.
    Determinism convention (association_mi/chi2): each cell's ln is
    ONE double of an exact integer ratio, micro-rounded immediately;
    the share difference combines as exact DECIMAL(38,0):

      psi_micro = Σ ((a_i+1)·(Nb+C) − (b_i+1)·(Na+C)) · t_micro
                  DIV ((Na+C) · (Nb+C))
      t_micro   = round(ln((a_i+1)·(Nb+C) / ((b_i+1)·(Na+C))) · 1e6)

    Returns ONE row (n_old, n_new, n_categories, psi_micro).

    Plan shape at 100 TB: each snapshot collapses to per-category
    counts in ONE map-side aggregate; the union is a keyed full-outer
    join of two aggregate-sized tables; totals are a one-row scalar
    broadcast; output is one row. The snapshot_diff/association_mi
    shape.
    """
    a = (spread(df_old).select(F.col(group_col).alias("g"))
         .groupBy("g").agg(F.count(F.lit(1)).alias("a")))
    b = (spread(df_new).select(F.col(group_col).alias("g"))
         .groupBy("g").agg(F.count(F.lit(1)).alias("b")))
    # (r13-opt) cells feeds the totals aggregate AND the term pass;
    # left lazy both snapshot aggregations (and their full-outer join)
    # ran twice. One lazy cache of the aggregate-sized union table =
    # one pass per snapshot.
    cells = (a.join(b, "g", "full_outer")
             .select("g", F.coalesce("a", F.lit(0)).alias("a"),
                     F.coalesce("b", F.lit(0)).alias("b"))
             .transform(scoped_cache))
    tot = cells.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"),
                    F.count(F.lit(1)).alias("c"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "na", "nb", "c",
            F.expr(
                "(CAST(a AS DECIMAL(38,0)) + 1) * (nb + c) "
                "- (CAST(b AS DECIMAL(38,0)) + 1) * (na + c)"
            ).alias("d"),
            F.expr(
                "CAST(round(ln((CAST(a AS DOUBLE) + 1) * (nb + c) "
                "/ ((CAST(b AS DOUBLE) + 1) * (na + c))) * 1e6) AS BIGINT)"
            ).alias("t_micro"))
        .agg(F.max("na").cast("long").alias("n_old"),
             F.max("nb").cast("long").alias("n_new"),
             F.max("c").cast("long").alias("n_categories"),
             F.expr(
                 "CAST(sum(d * t_micro) DIV ((max(na) + max(c)) "
                 "* CAST(max(nb) + max(c) AS DECIMAL(38,0))) AS BIGINT)"
             ).alias("psi_micro"))
    )


def sql_psi_drift(old_sql: str, new_sql: str,
                  group_col: str = "source") -> str:
    """DuckDB oracle for :func:`psi_drift` — same smoothing, same
    per-cell micro-rounded ln, same exact combination."""
    return f"""
WITH a AS (
  SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS a
  FROM ({old_sql}) GROUP BY 1
), b AS (
  SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS b
  FROM ({new_sql}) GROUP BY 1
), cells AS (
  SELECT COALESCE(a.g, b.g) AS g, COALESCE(a.a, 0) AS a,
         COALESCE(b.b, 0) AS b
  FROM a FULL OUTER JOIN b ON a.g = b.g
), tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
         CAST(count(*) AS BIGINT) AS c
  FROM cells
), term AS (
  SELECT na, nb, c,
         (CAST(a AS HUGEINT) + 1) * (nb + c)
           - (CAST(b AS HUGEINT) + 1) * (na + c) AS d,
         CAST(round(ln((CAST(a AS DOUBLE) + 1) * (nb + c)
              / ((CAST(b AS DOUBLE) + 1) * (na + c))) * 1e6) AS BIGINT)
           AS t_micro
  FROM cells CROSS JOIN tot
)
SELECT CAST(max(na) AS BIGINT) AS n_old,
       CAST(max(nb) AS BIGINT) AS n_new,
       CAST(max(c) AS BIGINT) AS n_categories,
       CAST(sum(d * t_micro)
            // ((max(na) + max(c)) * CAST(max(nb) + max(c) AS HUGEINT))
            AS BIGINT) AS psi_micro
FROM term
"""


def welch_t(df: DataFrame, group_col: str = "lang",
            value_col: str = "n_chars") -> DataFrame:
    """Welch's unequal-variance t statistic between every pair of
    groups' value distributions — the parametric sibling of
    :func:`ks_drift` (mean-shift drift with a significance-ready
    statistic; Welch 1947) and the continuous complement of
    :func:`psi_drift`.

    For groups a, b with counts n, exact integer sums S1 = Σx and
    S2 = Σx² (DECIMAL(38,0) — x² ≤ 1e12-squared rows still fit):

      mean = S1/n,  var = (n·S2 − S1²) / (n·(n−1))
      t    = (mean_a − mean_b) / sqrt(var_a/n_a + var_b/n_b)
      df   = (var_a/n_a + var_b/n_b)² /
             ((var_a/n_a)²/(n_a−1) + (var_b/n_b)²/(n_b−1))

    Determinism: every double derives from the SAME exact-integer
    aggregates through the SAME expression text in both engines, and
    t/df micro-round at the end — one rounding site per output cell.
    Pairs where either side has n < 2 (variance undefined) are
    omitted. Returns (g_a, g_b, n_a, n_b, mean_a_micro, mean_b_micro,
    t_micro, df_micro) for every g_a < g_b.

    Plan shape at 100 TB: the corpus collapses to per-group
    (n, S1, S2) in ONE map-side aggregate; pair expansion is the
    bounded inequality join over the per-group TOTALS table (groups
    are dozens — the ks_drift shape); output is pairs-sized.
    """
    g = (spread(df)
         .select(F.col(group_col).alias("g"),
                 F.col(value_col).cast("long").alias("x"))
         .where(F.col("x").isNotNull())
         .groupBy("g")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("s1"),
              F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("s2"))
         .where(F.col("n") >= 2)
         # (r13-opt) g feeds BOTH sides of the pair inequality join;
         # left lazy the corpus aggregation ran twice. One lazy cache
         # of the groups-sized totals table = one corpus pass.
         .transform(scoped_cache))
    a = g.select(F.col("g").alias("g_a"), F.col("n").alias("na"),
                 F.col("s1").alias("s1a"), F.col("s2").alias("s2a"))
    b = g.select(F.col("g").alias("g_b"), F.col("n").alias("nb"),
                 F.col("s1").alias("s1b"), F.col("s2").alias("s2b"))
    stat = (
        "CAST(s1a AS DOUBLE) / na", "CAST(s1b AS DOUBLE) / nb",
        "(CAST(na AS DOUBLE) * s2a - CAST(s1a AS DOUBLE) * s1a) "
        "/ (CAST(na AS DOUBLE) * (na - 1)) / na",
        "(CAST(nb AS DOUBLE) * s2b - CAST(s1b AS DOUBLE) * s1b) "
        "/ (CAST(nb AS DOUBLE) * (nb - 1)) / nb",
    )
    ma, mb, sea, seb = stat
    return (
        a.join(b, F.col("g_a") < F.col("g_b"))
        .select(
            "g_a", "g_b",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.expr(f"CAST(round(({ma}) * 1e6) AS BIGINT)")
            .alias("mean_a_micro"),
            F.expr(f"CAST(round(({mb}) * 1e6) AS BIGINT)")
            .alias("mean_b_micro"),
            F.expr(
                f"CAST(round((({ma}) - ({mb})) / sqrt(({sea}) + ({seb}))"
                f" * 1e6) AS BIGINT)").alias("t_micro"),
            F.expr(
                f"CAST(round((({sea}) + ({seb})) * (({sea}) + ({seb}))"
                f" / ((({sea}) * ({sea})) / (na - 1)"
                f" + (({seb}) * ({seb})) / (nb - 1)) * 1e6) AS BIGINT)"
            ).alias("df_micro"))
    )


def sql_welch_t(group_col: str = "lang", value_col: str = "n_chars",
                table: str = "documents") -> str:
    """DuckDB oracle for :func:`welch_t` — same exact-integer
    aggregates, same expression text, same single rounding site."""
    ma = "CAST(s1a AS DOUBLE) / na"
    mb = "CAST(s1b AS DOUBLE) / nb"
    sea = ("(CAST(na AS DOUBLE) * s2a - CAST(s1a AS DOUBLE) * s1a) "
           "/ (CAST(na AS DOUBLE) * (na - 1)) / na")
    seb = ("(CAST(nb AS DOUBLE) * s2b - CAST(s1b AS DOUBLE) * s1b) "
           "/ (CAST(nb AS DOUBLE) * (nb - 1)) / nb")
    return f"""
WITH g AS (
  SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST({value_col} AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST({value_col} AS HUGEINT) * {value_col}) AS HUGEINT)
           AS s2
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY 1 HAVING count(*) >= 2
)
SELECT a.g AS g_a, b.g AS g_b,
       na AS n_a, nb AS n_b,
       CAST(round(({ma}) * 1e6) AS BIGINT) AS mean_a_micro,
       CAST(round(({mb}) * 1e6) AS BIGINT) AS mean_b_micro,
       CAST(round((({ma}) - ({mb})) / sqrt(({sea}) + ({seb})) * 1e6)
            AS BIGINT) AS t_micro,
       CAST(round((({sea}) + ({seb})) * (({sea}) + ({seb}))
            / ((({sea}) * ({sea})) / (na - 1)
            + (({seb}) * ({seb})) / (nb - 1)) * 1e6) AS BIGINT)
         AS df_micro
FROM (SELECT g, n AS na, s1 AS s1a, s2 AS s2a FROM g) a
JOIN (SELECT g, n AS nb, s1 AS s1b, s2 AS s2b FROM g) b
  ON a.g < b.g
"""
