"""r14 probe: kn_perplexity model-guard fusion A/B.

Current shape: three sequential guarded_broadcast calls (c2, h, cont),
each an EAGER count job — three driver round-trips before the scoring
query even plans, and the h/cont jobs re-aggregate cached c2. But |h| and
|cont| are BY CONSTRUCTION countDistinct(w1) / countDistinct(w2) over c2
(one row per distinct key), so ONE multi-aggregate job over cached c2
returns all three guard counts with identical broadcast decisions. h and
cont also stop being persisted — each is consumed exactly once (its
broadcast build) from cached c2.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from eventstore_spark.session import get_spark  # noqa: E402
from eventstore_spark.operators.textops import kn_perplexity  # noqa: E402
from eventstore_spark.functions import text as X  # noqa: E402
from eventstore_spark.schema import spread, scoped_persist  # noqa: E402
from eventstore_spark.plans.join_strategy import DEFAULT_MAX_BROADCAST_ROWS  # noqa: E402
from tools.ab_probe import probe  # noqa: E402

SF = "/root/testdata/sf0.1"


def unfused(docs, train_source="src0", text_col="text"):
    """The pre-r14 chain, FROZEN here so the A/B stays reproducible after
    the library adopted the fused guard (the _probe_r13g lesson): three
    sequential guarded_broadcast calls, each an eager count job."""
    staged = spread(docs).select(
        F.col("doc_id"), F.col("source"), X.tokens(F.col(text_col)).alias("_toks")
    )
    bigram_structs = (
        "zip_with(slice(_toks, 1, size(_toks) - 1), "
        "slice(_toks, 2, size(_toks) - 1), "
        "(a, b) -> named_struct('w1', a, 'w2', b))"
    )

    def bigrams(df):
        return (
            df.select("doc_id", F.explode(F.expr(
                f"IF(size(_toks) < 2, array(), {bigram_structs})")).alias("p"))
            .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .where((F.col("w1") != "") & (F.col("w2") != ""))
        )

    from eventstore_spark.plans.join_strategy import guarded_broadcast

    tb = bigrams(staged.where(F.col("source") == train_source))
    c2 = tb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    h = c2.groupBy("w1").agg(F.sum("c2").alias("c1"),
                             F.count(F.lit(1)).alias("n1f"))
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p"))
    btot = c2.agg(F.count(F.lit(1)).alias("B"))

    eb = bigrams(staged)
    scored = (
        eb.join(guarded_broadcast(c2), ["w1", "w2"], "left")
        .join(guarded_broadcast(h), "w1", "left")
        .join(guarded_broadcast(cont), "w2", "left")
        .crossJoin(F.broadcast(btot))
        .withColumn("n1p_eff", F.greatest(F.coalesce(F.col("n1p"), F.lit(0)), F.lit(1)))
        .withColumn(
            "num",
            F.when(
                F.col("c2").isNotNull(),
                F.greatest(F.lit(4) * F.col("c2") - 3, F.lit(0))
                .cast("decimal(38,0)") * F.col("B")
                + (F.lit(3) * F.col("n1f")).cast("decimal(38,0)")
                * F.col("n1p_eff"),
            )
            .when(F.col("c1").isNotNull(),
                  (F.lit(3) * F.col("n1f")).cast("decimal(38,0)")
                  * F.col("n1p_eff"))
            .otherwise(F.col("n1p_eff").cast("decimal(38,0)"))
            .cast("decimal(38,0)"),
        )
        .withColumn(
            "den",
            F.when(F.col("c1").isNotNull(),
                   (F.lit(4) * F.col("B")).cast("decimal(38,0)") * F.col("c1"))
            .otherwise((F.lit(4) * F.col("B")).cast("decimal(38,0)"))
            .cast("decimal(38,0)"),
        )
        .withColumn(
            "lp_micro",
            F.round(F.log(F.col("num").cast("double") / F.col("den").cast("double"))
                    * 1e6).cast("long"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp_micro").alias("sum_lp_micro"),
    )
    base = staged.select("doc_id").distinct()
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_lp_micro", F.lit(0)).cast("long").alias("sum_lp_micro"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) > 0,
                   -F.expr("(-sum_lp_micro) div n_bigrams"))
            .otherwise(F.lit(0)).cast("long").alias("mean_lp_micro"),
        )
    )


def fused(docs, train_source="src0", text_col="text"):
    staged = spread(docs).select(
        F.col("doc_id"), F.col("source"), X.tokens(F.col(text_col)).alias("_toks")
    )
    bigram_structs = (
        "zip_with(slice(_toks, 1, size(_toks) - 1), "
        "slice(_toks, 2, size(_toks) - 1), "
        "(a, b) -> named_struct('w1', a, 'w2', b))"
    )

    def bigrams(df):
        return (
            df.select("doc_id", F.explode(F.expr(
                f"IF(size(_toks) < 2, array(), {bigram_structs})")).alias("p"))
            .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .where((F.col("w1") != "") & (F.col("w2") != ""))
        )

    tb = bigrams(staged.where(F.col("source") == train_source))
    c2 = (tb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
          .transform(scoped_persist(StorageLevel.MEMORY_AND_DISK)))
    h = c2.groupBy("w1").agg(F.sum("c2").alias("c1"),
                             F.count(F.lit(1)).alias("n1f"))
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p"))
    btot = c2.agg(F.count(F.lit(1)).alias("B"))

    # ONE guard job instead of three: fills c2's cache and returns every
    # guard count (|h| = countDistinct(w1), |cont| = countDistinct(w2)).
    n_c2, n_h, n_cont = c2.agg(
        F.count(F.lit(1)), F.countDistinct("w1"), F.countDistinct("w2")
    ).first()

    def guard(df, n):
        return F.broadcast(df) if n <= DEFAULT_MAX_BROADCAST_ROWS else df.hint("shuffle_hash")

    eb = bigrams(staged)
    scored = (
        eb.join(guard(c2, n_c2), ["w1", "w2"], "left")
        .join(guard(h, n_h), "w1", "left")
        .join(guard(cont, n_cont), "w2", "left")
        .crossJoin(F.broadcast(btot))
        .withColumn("n1p_eff", F.greatest(F.coalesce(F.col("n1p"), F.lit(0)), F.lit(1)))
        .withColumn(
            "num",
            F.when(
                F.col("c2").isNotNull(),
                F.greatest(F.lit(4) * F.col("c2") - 3, F.lit(0))
                .cast("decimal(38,0)") * F.col("B")
                + (F.lit(3) * F.col("n1f")).cast("decimal(38,0)")
                * F.col("n1p_eff"),
            )
            .when(F.col("c1").isNotNull(),
                  (F.lit(3) * F.col("n1f")).cast("decimal(38,0)")
                  * F.col("n1p_eff"))
            .otherwise(F.col("n1p_eff").cast("decimal(38,0)"))
            .cast("decimal(38,0)"),
        )
        .withColumn(
            "den",
            F.when(F.col("c1").isNotNull(),
                   (F.lit(4) * F.col("B")).cast("decimal(38,0)") * F.col("c1"))
            .otherwise((F.lit(4) * F.col("B")).cast("decimal(38,0)"))
            .cast("decimal(38,0)"),
        )
        .withColumn(
            "lp_micro",
            F.round(F.log(F.col("num").cast("double") / F.col("den").cast("double"))
                    * 1e6).cast("long"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp_micro").alias("sum_lp_micro"),
    )
    base = staged.select("doc_id").distinct()
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_lp_micro", F.lit(0)).cast("long").alias("sum_lp_micro"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) > 0,
                   -F.expr("(-sum_lp_micro) div n_bigrams"))
            .otherwise(F.lit(0)).cast("long").alias("mean_lp_micro"),
        )
    )


def main():
    spark = get_spark("probe_r14h")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(unfused(docs).collect())
    spark.catalog.clearCache()
    b = sorted(fused(docs).collect())
    c = sorted(kn_perplexity(docs).collect())
    print("equivalent:", a == b == c, f"({len(a)} rows)")
    assert a == b == c
    spark.catalog.clearCache()
    probe(spark, {
        "unfused_old": lambda: unfused(docs),
        "fused": lambda: fused(docs),
        "library": lambda: kn_perplexity(docs),
    }, reps=5)


if __name__ == "__main__":
    main()
