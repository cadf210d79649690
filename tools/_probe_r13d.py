"""Interleaved A/B for the r13 'aggregate-once' stats/corpus batch.

Old variants are the pre-edit function bodies reconstructed inline
(same helpers, no caches / dims from base / N from ranked output), so
both variants run in ONE session round-robin (tools/ab_probe
discipline).
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from eventstore_spark.session import get_spark
from eventstore_spark.schema import spread
from eventstore_spark.operators import stats as st
from eventstore_spark.operators import corpus as cp
from tools.ab_probe import probe

spark = get_spark("probe_r13d")
SF = "/root/testdata/sf0.1"
docs = spark.read.parquet(f"{SF}/documents.parquet")


def old_chi2(df, a_col="source", b_col="lang"):
    base = spread(df).select(F.col(a_col).alias("a"),
                             F.col(b_col).alias("b"))
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nab"))
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
            base.agg(F.countDistinct("a").alias("n_a"),
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


def old_mi(df, a_col="source", b_col="lang"):
    base = spread(df).select(F.col(a_col).alias("a"),
                             F.col(b_col).alias("b"))
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nab"))
    ma = cells.groupBy("a").agg(F.sum("nab").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("nab").alias("nb"))
    tot = cells.agg(F.sum("nab").alias("n"))
    term = (
        cells.join(F.broadcast(ma), "a").join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "nab", "n",
            F.expr("CAST(round(ln((CAST(nab AS DOUBLE) * n) "
                   "/ (CAST(na AS DOUBLE) * nb)) * 1e6) AS BIGINT)")
            .alias("t_micro"))
    )
    return (
        term.agg(
            F.max("n").alias("_n"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.expr("CAST(nab AS DECIMAL(38,0)) * t_micro"))
            .alias("_s"))
        .crossJoin(F.broadcast(
            base.agg(F.countDistinct("a").alias("n_a"),
                     F.countDistinct("b").alias("n_b"))))
        .select(
            F.col("_n").cast("long").alias("n"),
            "n_a", "n_b",
            F.col("n_cells").cast("long").alias("n_cells"),
            F.expr("CAST(_s DIV _n AS BIGINT)").alias("mi_micro"))
    )


def old_psi(df_old, df_new, group_col="source"):
    a = (spread(df_old).select(F.col(group_col).alias("g"))
         .groupBy("g").agg(F.count(F.lit(1)).alias("a")))
    b = (spread(df_new).select(F.col(group_col).alias("g"))
         .groupBy("g").agg(F.count(F.lit(1)).alias("b")))
    cells = (a.join(b, "g", "full_outer")
             .select("g", F.coalesce("a", F.lit(0)).alias("a"),
                     F.coalesce("b", F.lit(0)).alias("b")))
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


def old_welch(df, group_col="lang", value_col="n_chars"):
    g = (spread(df)
         .select(F.col(group_col).alias("g"),
                 F.col(value_col).cast("long").alias("x"))
         .where(F.col("x").isNotNull())
         .groupBy("g")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("s1"),
              F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("s2"))
         .where(F.col("n") >= 2))
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


def old_prf(df, gold_col="gold", pred_col="pred"):
    cm = (spread(df)
          .select(F.col(gold_col).alias("gold"),
                  F.col(pred_col).alias("pred"))
          .groupBy("gold", "pred").agg(F.count(F.lit(1)).alias("n")))
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


def old_pct_rank(df, value_col, id_col="doc_id", buckets=1024):
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("long").alias("v")).where(
        F.col("v").isNotNull())
    cnts = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    offs = st._value_offsets(cnts, value="v", cnt="c",
                             buckets=buckets).select("v", "lo")
    n = base.agg(F.count(F.lit(1)).alias("n"))
    wv = Window.partitionBy("v").orderBy("doc_id")
    return (
        base.join(offs, "v")
        .withColumn("rank", (F.col("lo") + F.row_number().over(wv))
                    .cast("long"))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", F.col("v").alias("value"), "rank",
            F.expr("CASE WHEN n <= 1 THEN CAST(0 AS BIGINT) "
                   "ELSE CAST(CAST(rank - 1 AS DECIMAL(38,0)) * 1000000 "
                   "DIV (n - 1) AS BIGINT) END").alias("pct_ppm"))
    )


def old_qbucket(df, value_col, k=10, id_col="doc_id", buckets=1024):
    ranked = old_pct_rank(df, value_col, id_col=id_col, buckets=buckets)
    n = ranked.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id", "value", "rank",
            F.expr(f"CAST((CAST(rank AS DECIMAL(38,0)) - 1) * {int(k)} "
                   f"DIV _n + 1 AS BIGINT)").alias("bucket"))
    )


langs = docs.select(
    F.col("lang").alias("gold"),
    F.when(F.col("doc_id") % 11 == 0, F.lit("und"))
    .otherwise(F.col("lang")).alias("pred"))

probe(spark, {
    "chi2_old": lambda: old_chi2(docs),
    "chi2_new": lambda: st.chi2_independence(docs),
    "mi_old": lambda: old_mi(docs),
    "mi_new": lambda: cp.association_mi(docs),
}, reps=5)
probe(spark, {
    "psi_old": lambda: old_psi(docs, docs.where(F.col("doc_id") % 7 != 0)),
    "psi_new": lambda: st.psi_drift(docs, docs.where(F.col("doc_id") % 7 != 0)),
    "welch_old": lambda: old_welch(docs),
    "welch_new": lambda: st.welch_t(docs),
    "prf_old": lambda: old_prf(langs),
    "prf_new": lambda: st.classification_prf(langs),
}, reps=5)
probe(spark, {
    "pct_rank_old": lambda: old_pct_rank(docs, "n_chars"),
    "pct_rank_new": lambda: st.percentile_rank(docs, "n_chars"),
    "qbucket_old": lambda: old_qbucket(docs, "n_chars"),
    "qbucket_new": lambda: st.quantile_bucket(docs, "n_chars"),
}, reps=5)
