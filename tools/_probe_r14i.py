"""r14 probe: pack_shards base-cache A/B.

pack_shards consumes its (doc_id, n_tokens) projection three times —
min/max job, per-bucket subtotal job, final windowed pass — and each pass
re-tokenizes the full text column (token_count is the expensive part).
Variant: one serialized cache on the narrow 2-long-column projection
(corpus-sized at 100 TB -> MEMORY_AND_DISK_SER per the r14 storage-level
policy), so the corpus is tokenized once (guide §5 reuse test).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from eventstore_spark.session import get_spark  # noqa: E402
from eventstore_spark.operators.corpus import pack_shards  # noqa: E402
from eventstore_spark.functions import text as X  # noqa: E402
from eventstore_spark.schema import spread, scoped_persist  # noqa: E402
from tools.ab_probe import probe  # noqa: E402

SF = "/root/testdata/sf0.1"
# PySpark's MEMORY_AND_DISK is the SERIALIZED level (deserialized=False),
# unlike Scala's — the repo's corpus-cache convention (stats._CORPUS_CACHE)
SER = StorageLevel.MEMORY_AND_DISK


def cached(docs, budget_tokens=2000, buckets=32):
    base = spread(docs).select(
        F.col("doc_id"), X.token_count(F.col("text")).alias("n_tokens")
    ).transform(scoped_persist(SER))
    lo, hi = base.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:
        return base.select("doc_id", "n_tokens",
                           F.lit(0).cast("long").alias("shard"))
    width = max((int(hi) - int(lo) + 1 + buckets - 1) // buckets, 1)
    b = F.expr(f"(doc_id - {int(lo)}) div {width}")
    based = base.withColumn("_b", b)
    sub = {
        int(r["_b"]): int(r["s"])
        for r in based.groupBy("_b").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for k in sorted(sub):
        offsets[k] = acc
        acc += sub[k]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    from pyspark.sql.window import Window
    w = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = omap[F.col("_b")] + F.sum("n_tokens").over(w) - F.col("n_tokens")
    return based.select(
        "doc_id",
        "n_tokens",
        F.floor(start / F.lit(budget_tokens)).cast("long").alias("shard"),
    )


def main():
    spark = get_spark("probe_r14i")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, pack_shards(docs).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, cached(docs).collect()))
    print("equivalent:", a == b, f"({len(a)} rows)")
    assert a == b
    spark.catalog.clearCache()
    probe(spark, {
        "current": lambda: pack_shards(docs),
        "cached": lambda: cached(docs),
    }, reps=5)


if __name__ == "__main__":
    main()
