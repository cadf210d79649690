"""r14 task 8: ann_pq driver-job decomposition A/B.

old = the r13 shape FROZEN here: train_pq_codebooks over its own cached
base (seed collect + 2 iteration collects), then a separate corpus scan
collecting the query vectors, then pq_encode re-scanning the corpus.
new = the library pq_topk after the r14 restructure (one shared base,
seed+query collect fused into one job, codes derived from the base
expression). Asserts identical sorted output, then interleaved A/B."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F, Window

from eventstore_spark.session import get_spark
from eventstore_spark.schema import spread
from eventstore_spark.operators import similarity as sim
from eventstore_spark.operators.similarity import (
    _quantize_sql, _pq_code_sql, train_pq_codebooks, _int_lit_array,
)
from tools.ab_probe import probe

SF_DIR = "/root/testdata/sf0.1"
QIDS = [1, 7, 42]


def pq_topk_old(embeddings, query_ids, k=10, m=8, n_codes=16, iters=2,
                id_col="vec_id", vec_col="embedding"):
    books = train_pq_codebooks(embeddings, m, n_codes, iters, id_col, vec_col)
    d = len(books[0][0])
    q = _quantize_sql(vec_col)
    cols = [_pq_code_sql(q, books[s], s * d + 1, d) for s in range(m)]
    codes = spread(embeddings).select(
        F.col(id_col).alias("vec_id"),
        F.expr("array({})".format(", ".join(cols))).alias("codes"),
    ).cache()
    qrows = (
        spread(embeddings)
        .where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"),
                F.expr(_quantize_sql(vec_col)).alias("qvec"))
        .collect()
    )
    per_query = []
    for r in sorted(qrows, key=lambda r: r["query_id"]):
        qv = [int(x) for x in r["qvec"]]
        luts = [
            [sum((qv[s * d + p] - cv[p]) ** 2 for p in range(d)) for cv in books[s]]
            for s in range(m)
        ]
        lut_lit = "array({})".format(", ".join(_int_lit_array(l) for l in luts))
        adist = (
            f"aggregate(zip_with(codes, {lut_lit}, "
            f"(c, lut) -> element_at(lut, c + 1)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        per_query.append(
            codes.where(F.col("vec_id") != int(r["query_id"]))
            .select(
                F.lit(int(r["query_id"])).cast("long").alias("query_id"),
                "vec_id",
                F.expr(adist).alias("adist"),
            )
            .orderBy(F.asc("adist"), F.asc("vec_id"))
            .limit(k)
        )
    out = per_query[0]
    for q_ in per_query[1:]:
        out = out.unionAll(q_)
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return out.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "query_id", "vec_id", "rank", "adist"
    )


def main():
    spark = get_spark("probe_r14d")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    a = sorted(map(tuple, pq_topk_old(emb, QIDS, k=10).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, sim.pq_topk(emb, QIDS, k=10).collect()))
    assert a == b, f"OUTPUT MISMATCH {len(a)} vs {len(b)}"
    print(f"outputs identical ({len(a)} rows)")
    spark.catalog.clearCache()

    probe(
        spark,
        {"old_5job": lambda: pq_topk_old(emb, QIDS, k=10),
         "new_4job": lambda: sim.pq_topk(emb, QIDS, k=10)},
        reps=5,
    )


if __name__ == "__main__":
    main()
