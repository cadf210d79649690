"""r14 probe: tpch_q5 join-order A/B.

Current shape joins lineitem x orders first, then re-shuffles the joined
fact-sized result by custkey to reach customer, and only then applies the
region filter via broadcast nation/region — the largest exchange in the
query carries every lineitem row. Variant: resolve customer -> nation ->
region FIRST (region prunes ~4/5 of customers), join orders against that
(locally an auto-broadcast; at scale a custkey shuffle of the two slim
tables), and join lineitem LAST against the pruned (o_orderkey, n_name)
table — the fact-sized join result never re-shuffles (guide §2.3 shuffle
fewer bytes, §3 join order). Inner equijoin reordering: exact.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from eventstore_spark.session import get_spark  # noqa: E402
from tools.ab_probe import probe  # noqa: E402

SF = "/root/testdata/sf0.1"


def _cents(c):
    return F.round(c * 100).cast("long")


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def current(spark):
    li, orders = _t(spark, "lineitem"), _t(spark, "orders")
    cust, nation = _t(spark, "customer"), _t(spark, "nation")
    region = _t(spark, "region").where(F.col("r_name") == "AMERICA")
    j = (
        li.withColumn("_rev", _cents(F.col("l_extendedprice"))
                      * (100 - _cents(F.col("l_discount"))))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        (F.sum("_rev").cast("double") / 10_000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def reordered(spark):
    li, orders = _t(spark, "lineitem"), _t(spark, "orders")
    cust, nation = _t(spark, "customer"), _t(spark, "nation")
    region = _t(spark, "region").where(F.col("r_name") == "AMERICA")
    cr = (
        cust.join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    of = (
        orders.join(cr, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "n_name")
    )
    j = (
        li.select(
            "l_orderkey",
            (_cents(F.col("l_extendedprice"))
             * (100 - _cents(F.col("l_discount")))).alias("_rev"))
        .join(of, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy("n_name").agg(
        (F.sum("_rev").cast("double") / 10_000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def main():
    spark = get_spark("probe_r14g")
    a = sorted(current(spark).collect())
    b = sorted(reordered(spark).collect())
    print("equivalent:", a == b, f"({len(a)} rows)")
    assert a == b
    for name, fn in [("current", current), ("reordered", reordered)]:
        plan = fn(spark)._sc is None  # noqa: unused - keep explain textual
    import io
    from contextlib import redirect_stdout
    for name, fn in [("current", current), ("reordered", reordered)]:
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark).explain("formatted")
        s = buf.getvalue()
        print(f"{name}: exchanges={s.count('Exchange')} bhj={s.count('BroadcastHashJoin')} smj={s.count('SortMergeJoin')} shj={s.count('ShuffledHashJoin')}")
    probe(spark, {
        "current": lambda: current(spark),
        "reordered": lambda: reordered(spark),
    }, reps=5)


if __name__ == "__main__":
    main()
