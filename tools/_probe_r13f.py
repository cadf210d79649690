"""Interleaved A/B for the r13 batch-3 dedup changes (bloom tail join,
bloom base cache, edit_verify pref cache). Old variants are the pre-edit
bodies reconstructed inline."""
import functools
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from eventstore_spark.session import get_spark
from eventstore_spark.schema import spread
from eventstore_spark.operators import dedup as dd
from eventstore_spark.operators.dedup import (
    _band_rows, _ascii_prefix, _bloom_positions, fingerprint,
    minhash_signature)
from tools.ab_probe import probe

spark = get_spark("probe_r13f")
SF = "/root/testdata/sf0.1"
docs = spark.read.parquet(f"{SF}/documents.parquet")


def old_bloom(split_mod=3, m_bits=8192, k=4):
    base = docs.select(
        F.col("doc_id").alias("doc_id"),
        fingerprint(F.col("text")).alias("fp"),
        (F.col("doc_id") % split_mod == 0).alias("is_new"),
    )  # no cache
    hist = base.where(~F.col("is_new"))
    new = base.where("is_new").select("doc_id", "fp")
    positions = (
        hist.select(F.explode(_bloom_positions(F.col("fp"), k, m_bits))
                    .alias("pos")).distinct().cache())
    hist_fps = (hist.select("fp").distinct()
                .withColumn("dup", F.lit(True)))
    pos_cols = _bloom_positions(F.col("fp"), k, m_bits)
    positions.count()
    probed = new.select(
        "doc_id", "fp", *[pos_cols[j].alias(f"pos{j}") for j in range(k)])
    for j in range(k):
        side = positions.select(F.col("pos").alias(f"pos{j}"),
                                F.lit(1).alias(f"hit{j}"))
        probed = probed.join(F.broadcast(side), f"pos{j}", "left")
    probed = probed.select(
        "doc_id", "fp",
        functools.reduce(
            lambda a, b: a & b,
            [F.coalesce(F.col(f"hit{j}"), F.lit(0)) == 1 for j in range(k)],
        ).alias("maybe_dup"))
    flagged = (
        probed.where("maybe_dup")
        .join(hist_fps, "fp", "left")
        .select("doc_id", "maybe_dup",
                F.coalesce("dup", F.lit(False)).alias("is_dup")))
    clear = probed.where(~F.col("maybe_dup")).select(
        "doc_id", "maybe_dup", F.lit(False).alias("is_dup"))
    return flagged.unionByName(clear)


def old_edit_verify(num_hashes=9, bands=3, shingle_n=3, prefix_chars=256,
                    min_sim_ppm=600_000):
    rows = num_hashes // bands
    d = spread(docs)
    sigs = minhash_signature(d, "doc_id", "text", num_hashes,
                             shingle_n).drop("shingles")
    banded = _band_rows(sigs, bands, rows).cache()
    cand = (
        banded.alias("x").join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct())
    pref = d.select(F.col("doc_id").alias("doc_id"),
                    _ascii_prefix(F.col("text"), prefix_chars).alias("p"))
    thr = max(1, (prefix_chars * (1_000_000 - min_sim_ppm)) // 1_000_000)
    return (
        cand.join(pref.withColumnRenamed("doc_id", "a")
                      .withColumnRenamed("p", "pa"), "a")
        .join(pref.withColumnRenamed("doc_id", "b")
                  .withColumnRenamed("p", "pb"), "b")
        .withColumn("dist", F.levenshtein("pa", "pb", thr).cast("long"))
        .where(F.col("dist") >= 0)
        .withColumn("m", F.greatest(F.length("pa"),
                                    F.length("pb")).cast("long"))
        .withColumn(
            "sim_ppm",
            F.when(F.col("m") == 0, F.lit(1_000_000).cast("long"))
            .otherwise(F.expr("((m - dist) * 1000000) div m")))
        .where(F.col("sim_ppm") >= min_sim_ppm)
        .select("a", "b", "dist", "sim_ppm"))


if __name__ == "__main__":
    # equivalence first: sorted collect old vs new
    new_bloom = dd.bloom_dedup_incremental(docs)
    a = sorted(map(tuple, old_bloom().collect()))
    b = sorted(map(tuple, new_bloom.collect()))
    assert a == b, f"bloom mismatch: {len(a)} vs {len(b)}"
    print("bloom equivalence ok", len(a))
    spark.catalog.clearCache()
    ev_new = dd.edit_verify_pairs(docs, prefix_chars=256,
                                  min_sim_ppm=600_000)
    a = sorted(map(tuple, old_edit_verify().collect()))
    b = sorted(map(tuple, ev_new.collect()))
    assert a == b, f"edit_verify mismatch: {len(a)} vs {len(b)}"
    print("edit_verify equivalence ok", len(a))
    spark.catalog.clearCache()
    probe(spark, {
        "bloom_old": lambda: old_bloom(),
        "bloom_new": lambda: dd.bloom_dedup_incremental(docs),
        "edit_old": lambda: old_edit_verify(),
        "edit_new": lambda: dd.edit_verify_pairs(docs, prefix_chars=256,
                                                 min_sim_ppm=600_000),
    }, reps=5)


def bloom_tail_only(split_mod=3, m_bits=8192, k=4):
    """New single-join tail, but NO base cache."""
    base = docs.select(
        F.col("doc_id").alias("doc_id"),
        fingerprint(F.col("text")).alias("fp"),
        (F.col("doc_id") % split_mod == 0).alias("is_new"),
    )
    hist = base.where(~F.col("is_new"))
    new = base.where("is_new").select("doc_id", "fp")
    positions = (
        hist.select(F.explode(_bloom_positions(F.col("fp"), k, m_bits))
                    .alias("pos")).distinct().cache())
    hist_fps = (hist.select("fp").distinct()
                .withColumn("dup", F.lit(True)))
    pos_cols = _bloom_positions(F.col("fp"), k, m_bits)
    positions.count()
    probed = new.select(
        "doc_id", "fp", *[pos_cols[j].alias(f"pos{j}") for j in range(k)])
    for j in range(k):
        side = positions.select(F.col("pos").alias(f"pos{j}"),
                                F.lit(1).alias(f"hit{j}"))
        probed = probed.join(F.broadcast(side), f"pos{j}", "left")
    probed = probed.select(
        "doc_id", "fp",
        functools.reduce(
            lambda a, b: a & b,
            [F.coalesce(F.col(f"hit{j}"), F.lit(0)) == 1 for j in range(k)],
        ).alias("maybe_dup"))
    return (
        probed.join(hist_fps, "fp", "left")
        .select("doc_id", "maybe_dup",
                (F.col("maybe_dup") & F.coalesce("dup", F.lit(False)))
                .alias("is_dup")))
