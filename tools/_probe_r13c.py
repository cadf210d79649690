"""Decompose the mad/skew regressions: which piece costs locally?"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from eventstore_spark.session import get_spark
from eventstore_spark.schema import spread
from eventstore_spark.operators import stats as st
from tools.ab_probe import probe
from tools._probe_r13b import old_eq, old_mad, old_skew

spark = get_spark("probe_r13c")
SF = "/root/testdata/sf0.1"
docs = spark.read.parquet(f"{SF}/documents.parquet")
events = spark.read.parquet(f"{SF}/events.parquet")


def mad_eqcache_only(df, value_col, id_col="doc_id", k_ppm=3_000_000,
                     buckets=1024):
    """old mad body (no base/dev caches) but NEW exact_quantiles."""
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull())
    med = (st.exact_quantiles(base, "v", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("med")))
    dev = (base.crossJoin(F.broadcast(med))
           .withColumn("dev", F.abs(F.col("v") - F.col("med"))))
    mad = (st.exact_quantiles(dev, "dev", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("mad")))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select("doc_id", F.col("v").alias("value"), "dev",
                (F.col("dev") * 1_000_000 > F.lit(int(k_ppm)) * F.col("mad"))
                .alias("is_outlier"))
    )


def mad_bodycache_oldeq(df, value_col, id_col="doc_id", k_ppm=3_000_000,
                        buckets=1024):
    """base/dev caches but OLD exact_quantiles (no internal cache)."""
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull()).cache()
    med = (old_eq(base, "v", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("med")))
    dev = (base.crossJoin(F.broadcast(med))
           .withColumn("dev", F.abs(F.col("v") - F.col("med")))).cache()
    mad = (old_eq(dev, "dev", qs=(50,), buckets=buckets)
           .select(F.col("value").cast("long").alias("mad")))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select("doc_id", F.col("v").alias("value"), "dev",
                (F.col("dev") * 1_000_000 > F.lit(int(k_ppm)) * F.col("mad"))
                .alias("is_outlier"))
    )


def skew_percol_cache(df, key_cols, buckets=1024):
    """per-column groupBy (no grouping sets), cnts cached, NEW EQ."""
    out = None
    base = spread(df)
    for col in key_cols:
        cnts = base.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")).cache()
        stats = cnts.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_count"),
            F.sum("c").cast("long").alias("n_rows"))
        q = (st.exact_quantiles(cnts, "c", qs=(50, 99), buckets=buckets)
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


def skew_percol_nospread(df, key_cols, buckets=1024):
    """per-column groupBy straight off the scan (no spread), cnts cached,
    NEW EQ."""
    out = None
    for col in key_cols:
        cnts = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")).cache()
        stats = cnts.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_count"),
            F.sum("c").cast("long").alias("n_rows"))
        q = (st.exact_quantiles(cnts, "c", qs=(50, 99), buckets=buckets)
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


probe(spark, {
    "mad_old_all": lambda: old_mad(docs, "n_chars"),
    "mad_eqcache_only": lambda: mad_eqcache_only(docs, "n_chars"),
    "mad_bodycache_oldeq": lambda: mad_bodycache_oldeq(docs, "n_chars"),
    "mad_new_all": lambda: st.mad_outliers(docs, "n_chars"),
}, reps=5)
probe(spark, {
    "skew_old": lambda: old_skew(events, ["user_id", "event_type"]),
    "skew_percol_cache": lambda: skew_percol_cache(
        events, ["user_id", "event_type"]),
    "skew_percol_nospread": lambda: skew_percol_nospread(
        events, ["user_id", "event_type"]),
    "skew_gs_new": lambda: st.skew_report(events, ["user_id", "event_type"]),
}, reps=5)
