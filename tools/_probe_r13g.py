"""A/B probe: bpe_train per-round cache (r13-opt §18) vs the old uncached
fold chain. OLD is a frozen copy of the pre-change loop; NEW is the
library function. Interleaved reps (guide §1); also asserts the trained
merge tables are identical row-for-row.

HISTORICAL RECORD (r13 §18 outcome): the per-round cache measured WORSE
at merges=4 and merges=12 and was REVERTED, so the library bpe_train this
probe imports is now identical to the frozen OLD chain — re-running it
compares two identical implementations and cannot reproduce the recorded
A/B numbers. Kept only to document the methodology and the revert.

Usage: python tools/_probe_r13g.py [sf_dir] [merges] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from eventstore_spark.functions import text as X  # noqa: E402
from eventstore_spark.operators.textops import (  # noqa: E402
    _bpe_merge_fold,
    _bpe_pairs,
    bpe_train,
)
from eventstore_spark.schema import spread  # noqa: E402
from eventstore_spark.session import get_spark  # noqa: E402


def bpe_train_old(docs, merges=3, text_col="text"):
    spark = docs.sparkSession
    toks = spread(docs).select(
        F.explode(X.tokens(F.col(text_col))).alias("w")
    ).where(F.col("w") != "")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(F.col("w"))),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    vocab = (
        toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .select("w", "n", chars.alias("syms"))
        .cache()
    )
    syms = vocab
    out_rows = []
    for step in range(1, merges + 1):
        best = (
            syms.select(F.col("n"), F.explode(_bpe_pairs(F.col("syms"))).alias("pair"))
            .groupBy("pair").agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1).collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        a, b = pair.split(" ", 1)
        out_rows.append((step, a, b, a + b, cnt))
        syms = syms.withColumn(
            "syms", _bpe_merge_fold(F.col("syms"), F.lit(a), F.lit(b))
        )
    return spark.createDataFrame(
        out_rows, "step long, left_sym string, right_sym string, "
                  "merged string, n long"
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    merges = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("probe_r13g")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # equivalence first: identical trained tables
    old_rows = [tuple(r) for r in bpe_train_old(docs, merges=merges).collect()]
    spark.catalog.clearCache()
    new_rows = [tuple(r) for r in bpe_train(docs, merges=merges).collect()]
    spark.catalog.clearCache()
    assert old_rows == new_rows, (old_rows, new_rows)
    print(f"EQUIVALENT: {len(new_rows)} merge rows identical")

    variants = {"old_chain": bpe_train_old, "new_cached": bpe_train}
    # warmup
    for fn in variants.values():
        fn(docs, merges=merges).collect()
        spark.catalog.clearCache()
    times = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.time()
            fn(docs, merges=merges).collect()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:12s} min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
              f"max={ts[-1]:.3f}")


if __name__ == "__main__":
    main()
