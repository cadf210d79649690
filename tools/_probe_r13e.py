"""Interleaved A/B for the r13 entry-query reuse batch (tpch q2/q11/
q15/q17, events_funnel, events_cohort_retention).

Old variants are the pre-edit builders reconstructed inline (no caches,
cohort's two corpus aggregations), run round-robin against the current
registry builders in one session.
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from eventstore_spark.session import get_spark
from tools.ab_probe import probe
import __spark_entry__ as entry
from __spark_entry__ import _table, _cents, load_envelope

spark = get_spark("probe_r13e")
SF = "/root/testdata/sf0.1"
qs = entry.queries()


def old_q2():
    reg = _table(spark, SF, "region").where(F.col("r_name") == "EUROPE")
    nat = _table(spark, SF, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    sup = _table(spark, SF, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    parts = _table(spark, SF, "part").where(
        (F.col("p_size") < 10) & (F.col("p_type") == "SMALL"))
    li = (
        _table(spark, SF, "lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("_cost", _cents(F.col("l_extendedprice")))
    )
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("_cost").alias("_min_cost"))
    return (
        li.join(F.broadcast(per_part),
                (F.col("l_partkey") == F.col("_pk"))
                & (F.col("_cost") == F.col("_min_cost")))
        .select(
            F.col("s_acctbal"), F.col("s_name"), F.col("n_name"),
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.col("p_name"),
            (F.col("_min_cost").cast("double") / 100.0).alias("min_cost"),
        )
        .distinct()
    )


def old_q11():
    li = _table(spark, SF, "lineitem")
    sup = _table(spark, SF, "supplier")
    nat = _table(spark, SF, "nation")
    rev = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(
            _cents(F.col("l_extendedprice"))
            * (100 - _cents(F.col("l_discount")))
        ).alias("_v"))
    )
    total = rev.agg(F.sum("_v").alias("_total"))
    return (
        rev.join(F.broadcast(total))
        .where(F.col("_v") * 100 > F.col("_total") * 5)
        .select("n_name",
                (F.col("_v").cast("double") / 10_000.0).alias("value"))
    )


def old_q17():
    parts = _table(spark, SF, "part").where(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15)
    ).select("p_partkey")
    li = _table(spark, SF, "lineitem").join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(_cents(F.col("l_quantity"))).alias("_sum_q"),
        F.count(F.lit(1)).alias("_n"),
    )
    small = li.join(F.broadcast(per_part),
                    F.col("l_partkey") == F.col("_pk")).where(
        _cents(F.col("l_quantity")) * 5 * F.col("_n") < F.col("_sum_q"))
    agg = small.agg(F.sum(_cents(F.col("l_extendedprice"))).alias("_e"),
                    F.count(F.lit(1)).alias("n_lines"))
    return agg.select(
        (F.col("_e").cast("double") / 100.0 / 7.0).alias("avg_yearly"),
        "n_lines")


def old_funnel():
    ev = load_envelope(spark, SF)
    t1 = ev.where(F.col("event_type") == "view").groupBy("stream_id").agg(
        F.min("created").alias("_t1"))
    c2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, "stream_id").where(F.col("created") >= F.col("_t1"))
        .groupBy("stream_id").agg(F.min("created").alias("_t2"))
    )
    c3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(c2, "stream_id").where(F.col("created") >= F.col("_t2"))
        .groupBy("stream_id").agg(F.min("created").alias("_t3"))
    )

    def stage(df, label):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("users")).select(
            F.lit(label).alias("stage"), "users")
    return (
        stage(t1, "1_view")
        .unionByName(stage(c2, "2_click_after_view"))
        .unionByName(stage(c3, "3_purchase_after_click"))
    )


def old_cohort():
    ev = load_envelope(spark, SF)
    first = ev.groupBy("stream_id").agg(
        F.min(F.to_date("created")).alias("cohort_day"))
    active = ev.select(
        "stream_id", F.to_date("created").alias("day")).distinct()
    j = active.join(first, "stream_id")
    return (
        j.groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("stream_id").alias("users"))
    )


probe(spark, {
    "q2_old": old_q2,
    "q2_new": lambda: qs["tpch_q2_min_cost_supplier"](spark, SF),
    "q11_old": old_q11,
    "q11_new": lambda: qs["tpch_q11_nation_value"](spark, SF),
    "q17_old": old_q17,
    "q17_new": lambda: qs["tpch_q17_small_quantity"](spark, SF),
}, reps=5)
probe(spark, {
    "funnel_old": old_funnel,
    "funnel_new": lambda: qs["events_funnel"](spark, SF),
    "cohort_old": old_cohort,
    "cohort_new": lambda: qs["events_cohort_retention"](spark, SF),
}, reps=5)
