"""r14 task 7: decompose dedup_minhash_pairs (heaviest headline, 1.744 s
driver median) into its stages: (a) signature cache materialization,
(b) band self-join + distinct candidates, (c) verify joins. Times each
stage isolated with the noop sink on a fresh cache, plus the full query."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from eventstore_spark.session import get_spark
from eventstore_spark.operators import dedup as dd
from eventstore_spark.operators.dedup import minhash_signature, _band_rows

SF_DIR = "/root/testdata/sf0.1"


def main():
    spark = get_spark("probe_r14b")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn, reps=5):
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{label:38s} min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} max={ts[-1]:.3f}")

    # warm codegen
    noop(dd.minhash_lsh_pairs(docs, threshold=0.5))

    # full query
    timed("full minhash_lsh_pairs", lambda: noop(dd.minhash_lsh_pairs(docs, threshold=0.5)))

    # stage a: signature + sset materialization (what the cache pays)
    def stage_a():
        sigs = minhash_signature(docs, "doc_id", "text", 9, 3)
        sigs = sigs.withColumn("sset", F.array_distinct("shingles")).drop("shingles")
        noop(sigs)

    timed("a: sigs+sset projection", stage_a)

    # stage b: bands + self-join + distinct over a pre-materialized cache
    def stage_b_full():
        sigs = minhash_signature(docs, "doc_id", "text", 9, 3)
        sigs = sigs.withColumn("sset", F.array_distinct("shingles")).drop("shingles").cache()
        noop(sigs)  # materialize (not what we want to time)
        banded = _band_rows(sigs, 3, 3)
        t0 = time.time()
        cand = (
            banded.alias("x").join(banded.alias("y"), ["band", "bh"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .distinct()
        )
        noop(cand)
        mid = time.time() - t0
        # stage c: verify joins from the same cache
        t0 = time.time()
        sets = sigs.select("doc_id", "sset").hint("shuffle_hash")
        verified = (
            cand.join(sets.withColumnRenamed("doc_id", "a").withColumnRenamed("sset", "sa"), "a")
            .join(sets.withColumnRenamed("doc_id", "b").withColumnRenamed("sset", "sb"), "b")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb")).cast("double"),
            )
            .where(F.col("jaccard") >= 0.5)
            .select("a", "b", "jaccard")
        )
        noop(verified)
        ver = time.time() - t0
        sigs.unpersist()
        return mid, ver

    mids, vers = [], []
    for _ in range(5):
        spark.catalog.clearCache()
        m, v = stage_b_full()
        mids.append(m)
        vers.append(v)
    mids.sort(); vers.sort()
    print(f"{'b: band join+distinct (cached sigs)':38s} min={mids[0]:.3f} med={mids[2]:.3f} max={mids[-1]:.3f}")
    print(f"{'c: verify joins (cached sigs, incl b)':38s} min={vers[0]:.3f} med={vers[2]:.3f} max={vers[-1]:.3f}")

    n = dd.minhash_lsh_pairs(docs, threshold=0.5).count()
    sigs = minhash_signature(docs, "doc_id", "text", 9, 3)
    nb = _band_rows(sigs, 3, 3).count()
    banded = _band_rows(sigs, 3, 3)
    ncand = (
        banded.alias("x").join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct().count()
    )
    print(f"rows: pairs={n} banded={nb} cand={ncand}")


if __name__ == "__main__":
    main()
