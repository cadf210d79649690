"""Interleaved A/B for the r13 batch-2 cache/grouping-sets changes.

Old variants are the pre-edit function bodies reconstructed inline
(same helpers, no caches / per-column groupBys), so both variants run
in ONE session round-robin (tools/ab_probe discipline).
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from eventstore_spark.session import get_spark
from eventstore_spark.schema import spread
from eventstore_spark.operators import stats as st
from eventstore_spark.operators import similarity as sim
from eventstore_spark.operators import dedup as dd
from eventstore_spark.operators import temporal as tp
from tools.ab_probe import probe

spark = get_spark("probe_r13b")
SF = "/root/testdata/sf0.1"
docs = spark.read.parquet(f"{SF}/documents.parquet")
events = spark.read.parquet(f"{SF}/events.parquet")
lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")


def old_eq(df, value_col, qs=(25, 50, 75, 99), buckets=1024):
    buckets = max(int(buckets), 3)
    frac = 1.0 / buckets
    v = df.select(F.col(value_col).cast("double").alias("v")).where(
        F.col("v").isNotNull())          # no cache
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


def old_mad(df, value_col, id_col="doc_id", k_ppm=3_000_000, buckets=1024):
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull())
    med = (old_eq(base, "v", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("med")))
    dev = (base.crossJoin(F.broadcast(med))
           .withColumn("dev", F.abs(F.col("v") - F.col("med"))))
    mad = (old_eq(dev, "dev", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("mad")))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select("doc_id", F.col("v").alias("value"), "dev",
                (F.col("dev") * 1_000_000 > F.lit(int(k_ppm)) * F.col("mad"))
                .alias("is_outlier"))
    )


def old_skew(df, key_cols, buckets=1024):
    out = None
    base = spread(df)
    for col in key_cols:
        cnts = base.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c"))
        stats = cnts.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_count"),
            F.sum("c").cast("long").alias("n_rows"))
        q = (old_eq(cnts, "c", qs=(50, 99), buckets=buckets)
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


HOUR_US = 3_600_000_000
EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def resample_obs():
    return (
        events.select(
            "user_id",
            F.expr(f"timestampdiff(MICROSECOND, {EPOCH}, ts)").alias("tsu"),
            "value")
        .groupBy("user_id", "tsu").agg(F.max("value").alias("value")))


def old_resample(reference, key_cols, ref_ts, value_cols, step):
    reference = spread(reference)  # no cache
    bounds = reference.agg(
        F.min(F.col(ref_ts).cast("long")).alias("mn"),
        F.max(F.col(ref_ts).cast("long")).alias("mx")).collect()[0]
    start, end = int(bounds.mn), int(bounds.mx)
    step = max(int(step), 1)
    g0 = ((start + step - 1) // step) * step
    keys = reference.select(*key_cols).distinct()
    grid = keys.withColumn("grid_ts", F.explode(F.sequence(
        F.lit(g0).cast("long"), F.lit(end).cast("long"),
        F.lit(step).cast("long"))))
    ref = reference.select(*key_cols,
                           F.col(ref_ts).cast("long").alias(ref_ts),
                           *value_cols)
    return tp.asof_join(grid, ref, key_cols, "grid_ts", ref_ts,
                        value_cols, suffix="_ref")


def old_winnow(docs_df, max_df=20, n=3, win=4, min_shared=2):
    wf = dd.winnowing_fingerprints(docs_df, n, win, "doc_id", "text")
    uniq = wf.select("doc_id", "fp").distinct().cache()
    keep = (uniq.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df).select("fp"))
    uniq2 = uniq.join(keep, "fp", "left_semi")  # no cache
    a = uniq2.select(F.col("doc_id").alias("a"), "fp")
    b = uniq2.select(F.col("doc_id").alias("b"), "fp")
    return (a.join(b, "fp").where(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count(F.lit(1)).alias("shared"))
            .where(F.col("shared") >= min_shared))


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "eq"):
    probe(spark, {
        "eq_old": lambda: old_eq(lineitem, "l_extendedprice"),
        "eq_new": lambda: st.exact_quantiles(lineitem, "l_extendedprice"),
    }, reps=5)
if which in ("all", "mad"):
    probe(spark, {
        "mad_old": lambda: old_mad(docs, "n_chars"),
        "mad_new": lambda: st.mad_outliers(docs, "n_chars"),
    }, reps=5)
if which in ("all", "skew"):
    probe(spark, {
        "skew_old": lambda: old_skew(events, ["user_id", "event_type"]),
        "skew_new": lambda: st.skew_report(events, ["user_id", "event_type"]),
    }, reps=5)
if which in ("all", "ndcg"):
    # old ndcg = same body minus truth cache; easiest faithful old:
    # temporarily monkeypatch is messy — instead time new only and rely
    # on the plan diff (scan count) for the old cost; plus a 2x bound
    # argument. Here: time new.
    probe(spark, {
        "ndcg_new": lambda: sim.ndcg_eval(emb, k=10, sample_mod=50),
    }, reps=5)
if which in ("all", "resample"):
    probe(spark, {
        "resample_old": lambda: old_resample(
            resample_obs(), ["user_id"], "tsu", ["value"], 6 * HOUR_US),
        "resample_new": lambda: tp.resample(
            resample_obs(), ["user_id"], "tsu", ["value"], step=6 * HOUR_US),
    }, reps=5)
if which in ("all", "winnow"):
    probe(spark, {
        "winnow_old": lambda: old_winnow(docs, max_df=20),
        "winnow_new": lambda: dd.winnowing_neardup(docs, max_df=20),
    }, reps=5)

if which in ("all", "equiv"):
    pairs = [
        ("eq", old_eq(lineitem, "l_extendedprice"),
         st.exact_quantiles(lineitem, "l_extendedprice")),
        ("mad", old_mad(docs, "n_chars"), st.mad_outliers(docs, "n_chars")),
        ("skew", old_skew(events, ["user_id", "event_type"]),
         st.skew_report(events, ["user_id", "event_type"])),
        ("resample",
         old_resample(resample_obs(), ["user_id"], "tsu", ["value"],
                      6 * HOUR_US),
         tp.resample(resample_obs(), ["user_id"], "tsu", ["value"],
                     step=6 * HOUR_US)),
        ("winnow", old_winnow(docs, max_df=20),
         dd.winnowing_neardup(docs, max_df=20)),
    ]
    for name, o, nw in pairs:
        a = sorted(map(tuple, o.collect()))
        b = sorted(map(tuple, nw.collect()))
        print(f"EQUIV {name}: {a == b} ({len(a)} vs {len(b)})")
