"""r14 probe: minhash verify-join semi-prune A/B.

Current shape: the two verify joins shuffle the FULL cached signature-set
table (|corpus| rows carrying shingle arrays) by a and by b. Variant:
cache the candidate table, broadcast its distinct doc ids, and left-semi
prune the sets side before the verify joins — the array shuffle then
carries only candidate docs (guide §3 pre-filter; at sf0.1 that is 1051
of 5000 rows; at warehouse scale candidates are a vanishing fraction of
the corpus). dedup_minhash_pairs is a HEADLINE query, so the variant is
adopted only if locally flat-or-better.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from eventstore_spark.session import get_spark  # noqa: E402
from eventstore_spark.operators.dedup import (  # noqa: E402
    minhash_signature, _band_rows,
)
from tools.ab_probe import probe  # noqa: E402

SF = "/root/testdata/sf0.1"
NUM_HASHES, BANDS, ROWS, THRESH = 9, 3, 3, 0.5


def _base(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = (minhash_signature(docs, "doc_id", "text", NUM_HASHES, 3)
            .withColumn("sset", F.array_distinct("shingles"))
            .drop("shingles").cache())
    banded = _band_rows(sigs, BANDS, ROWS)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .repartition("a")
        .dropDuplicates(["a", "b"])
    )
    return sigs, cand


def _verify(cand, sets):
    return (
        cand.join(sets.withColumnRenamed("doc_id", "a")
                  .withColumnRenamed("sset", "sa"), "a")
        .join(sets.withColumnRenamed("doc_id", "b")
              .withColumnRenamed("sset", "sb"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sa", "sb")).cast("double")
            / F.size(F.array_union("sa", "sb")).cast("double"))
        .where(F.col("jaccard") >= THRESH)
        .select("a", "b", "jaccard")
    )


def current(spark):
    sigs, cand = _base(spark)
    sets = sigs.select("doc_id", "sset").hint("shuffle_hash")
    return _verify(cand, sets)


def semi_pruned(spark):
    sigs, cand = _base(spark)
    cand = cand.cache()
    ids = cand.select(F.explode(F.array("a", "b")).alias("doc_id")).distinct()
    sets = (sigs.select("doc_id", "sset")
            .join(F.broadcast(ids), "doc_id", "left_semi")
            .hint("shuffle_hash"))
    return _verify(cand, sets)


def main():
    spark = get_spark("probe_r14f")
    a = sorted(current(spark).collect())
    b = sorted(semi_pruned(spark).collect())
    print("equivalent:", a == b, f"({len(a)} pairs)")
    assert a == b
    spark.catalog.clearCache()
    probe(spark, {
        "current": lambda: current(spark),
        "semi_pruned": lambda: semi_pruned(spark),
    }, reps=5)


if __name__ == "__main__":
    main()
