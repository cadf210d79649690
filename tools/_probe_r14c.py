"""r14 task 7: minhash verify-chain variants (guide §2.4 — share one
exchange between ops keyed the same way).

A = current shape: distinct keyed (a,b), then join-a re-exchanges by a.
B = distinct rides a hash(a) repartition (hash(a) satisfies the (a,b)
    clustering), so the dedup aggregate AND the join-a probe side share
    ONE exchange; everything else unchanged.
Asserts identical sorted output first, then interleaved A/B."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from eventstore_spark.session import get_spark
from eventstore_spark.operators.dedup import minhash_signature, _band_rows
from tools.ab_probe import probe

SF_DIR = "/root/testdata/sf0.1"


def build(docs, align: bool, threshold=0.5):
    sigs = minhash_signature(docs, "doc_id", "text", 9, 3)
    sigs = sigs.withColumn("sset", F.array_distinct("shingles")).drop("shingles").cache()
    banded = _band_rows(sigs, 3, 3)
    pre = (
        banded.alias("x").join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    if align:
        cand = pre.repartition("a").dropDuplicates(["a", "b"])
    else:
        cand = pre.distinct()
    sets = sigs.select("doc_id", "sset").hint("shuffle_hash")
    return (
        cand.join(sets.withColumnRenamed("doc_id", "a").withColumnRenamed("sset", "sa"), "a")
        .join(sets.withColumnRenamed("doc_id", "b").withColumnRenamed("sset", "sb"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sa", "sb")).cast("double")
            / F.size(F.array_union("sa", "sb")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def main():
    spark = get_spark("probe_r14c")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    ra = sorted(map(tuple, build(docs, False).collect()))
    spark.catalog.clearCache()
    rb = sorted(map(tuple, build(docs, True).collect()))
    assert ra == rb, f"OUTPUT MISMATCH: {len(ra)} vs {len(rb)}"
    print(f"outputs identical ({len(ra)} pairs)")
    spark.catalog.clearCache()

    import io
    import re
    from contextlib import redirect_stdout

    def plan_str(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    pb = plan_str(build(docs, True))
    print("B: Exchange count =", len(re.findall(r"\(\d+\) Exchange", pb)),
          " Reused =", len(re.findall(r"ReusedExchange", pb)))
    pa = plan_str(build(docs, False))
    print("A: Exchange count =", len(re.findall(r"\(\d+\) Exchange", pa)),
          " Reused =", len(re.findall(r"ReusedExchange", pa)))

    probe(
        spark,
        {"A_current": lambda: build(docs, False), "B_aligned": lambda: build(docs, True)},
        reps=7,
    )


if __name__ == "__main__":
    main()
