"""Feature-hashing text vectors and model-free text similarity.

The hashing trick (Weinberger et al., ICML 2009 — the sklearn
``HashingVectorizer`` / Vowpal Wabbit representation): every token hashes
to one of ``dim`` buckets with a +/-1 sign from a second hash bit, and a
document's vector is the signed sum of its token counts per bucket. No
vocabulary, no model download, no driver state — the projection is a pure
function of the token string, so it distributes trivially and two corpora
hashed independently land in the same space.

That bridges the engine's text side to its similarity side: the ANN /
near-dup machinery in ``operators/similarity.py`` needs an embedding
column, which real pipelines get from a model; these operators derive a
deterministic sparse vector IN-ENGINE so cosine near-dup / clustering /
contamination checks run over raw text with no external dependency.

Representation: LONG format (doc_id, idx, w) — sparse, exact BIGINT
weights, shuffle keys are (doc_id) or (idx), and the oracle can reproduce
it row-for-row without array-construction drift between engines.

Determinism contract (same as the rest of the repo): bucket index and
sign derive from md5 of the token string — identical in Spark and DuckDB —
and all weights/dots/norms are exact BIGINTs; the similarity gate compares
cross-multiplied integers, no floats anywhere.

At 100 TB: vectorization is explode + two keyed partial aggregates
(map-side combine does most of the work — token counts collapse before the
shuffle); the near-dup path is the sign-LSH banding of
``similarity.embedding_neardup_pairs`` re-expressed over sparse rows, so
candidate volume is bounded by Σ(bucket²), never corpus², and the verify
dot-product is a keyed equi-join on (doc, idx). The vector-carrying joins
pin shuffle_hash — Catalyst's scan-stats can't see the text→vector
expansion, the exact trap PLANS.md documents for minhash's shingle sets.

Reference: the reference engine has no text-vectorization primitive (its
scope stops at event queries); these operators are part of the
training-data-pipeline surface the build brief adds on top. Plane-sign
derivation is shared with operators/similarity.py:_plane_signs so text
vectors and real embeddings bucket through the same LSH family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import SQL_TOKENS, tokens
from ..schema import scoped_cache
from .similarity import _plane_signs

# ---------------------------------------------------------------------------
# hashed document vectors (long format)
# ---------------------------------------------------------------------------

def feature_hash_vectors(docs: DataFrame, dim: int = 32,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Signed feature-hashing vectors, long format (doc_id, idx, w).

    idx = first 8 md5 hex digits of "fh|<token>" mod ``dim``; sign = parity
    of the 9th digit; w = signed sum of token counts. Rows with w = 0
    (sign cancellation) are dropped — the vector stays truly sparse.

    Plan: one explode, then two groupBys ((doc, token) then (doc, idx)) —
    both with map-side partial aggregation, nothing leaves the JVM.
    """
    tok = F.explode(tokens(F.col(text_col))).alias("t")
    tc = (
        docs.select(F.col(id_col).alias("doc_id"), tok)
        .where(F.col("t") != "")
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    h8 = F.conv(F.substring(F.md5(F.concat(F.lit("fh|"), F.col("t"))), 1, 8), 16, 10).cast("long")
    sgn = F.conv(F.substring(F.md5(F.concat(F.lit("fh|"), F.col("t"))), 9, 1), 16, 10).cast("long") % 2
    signed = tc.select(
        "doc_id",
        (h8 % dim).alias("idx"),
        F.when(sgn == 0, F.col("c")).otherwise(-F.col("c")).alias("sc"),
    )
    return (
        signed.groupBy("doc_id", "idx")
        .agg(F.sum("sc").alias("w"))
        .where(F.col("w") != 0)
    )


def sql_feature_hash_vectors(dim: int = 32, table: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    toks = SQL_TOKENS.format(c=text_col)
    return f"""
SELECT * FROM (
  SELECT doc_id,
         CAST('0x' || substr(md5('fh|' || t), 1, 8) AS BIGINT) % {dim} AS idx,
         CAST(sum(CASE WHEN CAST('0x' || substr(md5('fh|' || t), 9, 1) AS BIGINT) % 2 = 0
                       THEN c ELSE -c END) AS BIGINT) AS w
  FROM (
    SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT {id_col} AS doc_id, unnest({toks}) AS t FROM {table})
    WHERE t <> '' GROUP BY doc_id, t
  ) GROUP BY doc_id, idx
) WHERE w <> 0
"""


# ---------------------------------------------------------------------------
# text near-dup over hashed vectors (sign-LSH candidates, exact-integer verify)
# ---------------------------------------------------------------------------

def _sign_list(table_i: int, plane_j: int, dim: int) -> list[int]:
    """Integer +/-1 plane components (same derivation as similarity LSH)."""
    return [int(s) for s in _plane_signs(table_i, plane_j, dim)]


def text_neardup_hashed(docs: DataFrame, dim: int = 32, planes: int = 4,
                        tables: int = 2, threshold_bp: int = 6400,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Model-free text near-duplicate pairs: cosine over feature-hashed
    vectors, candidates from sign-LSH bucketing, verified with exact
    integer arithmetic.

    A pair survives iff dot > 0 and dot² * 10000 >= threshold_bp * |a|²
    * |b|²  (i.e. cos² >= threshold_bp/10000 — cos >= 0.8 at the default).
    Exact for corpora whose per-bucket weights stay below ~30k tokens
    (dot²*10⁴ within BIGINT); beyond that cast the gate to DECIMAL(38,0).

    Returns (a_id, b_id, dot, n2_a, n2_b).

    Plan shape: the hashed-vector table materializes ONCE (cached — it
    feeds the bucket branch, both verify sides, and both norm sides);
    plane dots for all tables*planes hyperplanes compute in a single
    groupBy pass; candidates come from per-table self-joins keyed on the
    bucket id (Σ(bucket²) bound, as all dedup candidate generation here);
    the verify dot is a keyed (doc, idx) equi-join. Every join that
    carries vector rows hints shuffle_hash. For bigger corpora raise
    ``planes`` (buckets grow 2^planes) — candidates stay sub-quadratic.
    """
    hv = feature_hash_vectors(docs, dim, id_col, text_col).transform(scoped_cache)

    aggs, buckets = [], []
    for t in range(tables):
        for p in range(planes):
            arr = F.array(*[F.lit(s) for s in _sign_list(t, p, dim)])
            comp = F.col("w") * F.element_at(arr, (F.col("idx") + 1).cast("int"))
            aggs.append(F.sum(comp).alias(f"d{t}_{p}"))
    planed = hv.groupBy("doc_id").agg(*aggs)
    for t in range(tables):
        e = F.lit(0)
        for p in range(planes):
            bit = F.when(F.col(f"d{t}_{p}") >= 0, 1).otherwise(0)
            e = e * 2 + bit
        buckets.append(e.alias(f"b{t}"))
    bk = planed.select("doc_id", *buckets)

    cand = None
    for t in range(tables):
        a = bk.select(F.col("doc_id").alias("a_id"), F.col(f"b{t}").alias("bb"))
        b = bk.select(F.col("doc_id").alias("b_id"), F.col(f"b{t}").alias("bb"))
        c = a.join(b, "bb").where(F.col("a_id") < F.col("b_id")).select("a_id", "b_id")
        cand = c if cand is None else cand.union(c)
    cand = cand.distinct()

    va = hv.select(F.col("doc_id").alias("a_id"), F.col("idx").alias("ai"),
                   F.col("w").alias("wa"))
    vb = hv.select(F.col("doc_id").alias("_bid2"), F.col("idx").alias("bi"),
                   F.col("w").alias("wb"))
    dots = (
        cand.join(va.hint("shuffle_hash"), "a_id")
        .join(vb.hint("shuffle_hash"),
              (F.col("b_id") == F.col("_bid2")) & (F.col("ai") == F.col("bi")))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    norms = hv.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    na = norms.select(F.col("doc_id").alias("a_id"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("doc_id").alias("b_id"), F.col("n2").alias("n2_b"))
    return (
        dots.join(na.hint("shuffle_hash"), "a_id")
        .join(nb.hint("shuffle_hash"), "b_id")
        .where(
            (F.col("dot") > 0)
            & (F.col("dot") * F.col("dot") * 10000
               >= F.lit(threshold_bp) * F.col("n2_a") * F.col("n2_b"))
        )
        .select("a_id", "b_id", "dot", "n2_a", "n2_b")
    )


def sql_text_neardup_hashed(dim: int = 32, planes: int = 4, tables: int = 2,
                            threshold_bp: int = 6400,
                            table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    hv = sql_feature_hash_vectors(dim, table, id_col, text_col)
    dcols, bcols = [], []
    for t in range(tables):
        bits = []
        for p in range(planes):
            vals = ", ".join(str(s) for s in _sign_list(t, p, dim))
            dcols.append(
                f"CAST(sum(w * ([{vals}])[idx + 1]) AS BIGINT) AS d{t}_{p}"
            )
            bits.append(f"(CASE WHEN d{t}_{p} >= 0 THEN 1 ELSE 0 END)")
        e = "0"
        for b in bits:
            e = f"(({e}) * 2 + {b})"
        bcols.append(f"{e} AS b{t}")
    cands = "\nUNION\n".join(
        f"SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM buckets a "
        f"JOIN buckets b ON a.b{t} = b.b{t} AND a.doc_id < b.doc_id"
        for t in range(tables)
    )
    return f"""
WITH hv AS ({hv}),
planed AS (
  SELECT doc_id, {", ".join(dcols)} FROM hv GROUP BY doc_id
), buckets AS (
  SELECT doc_id, {", ".join(bcols)} FROM planed
), cand AS (
  {cands}
), dots AS (
  SELECT c.a_id, c.b_id, CAST(sum(va.w * vb.w) AS BIGINT) AS dot
  FROM cand c
  JOIN hv va ON va.doc_id = c.a_id
  JOIN hv vb ON vb.doc_id = c.b_id AND vb.idx = va.idx
  GROUP BY c.a_id, c.b_id
), norms AS (
  SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM hv GROUP BY doc_id
)
SELECT d.a_id, d.b_id, d.dot, na.n2 AS n2_a, nb.n2 AS n2_b
FROM dots d
JOIN norms na ON na.doc_id = d.a_id
JOIN norms nb ON nb.doc_id = d.b_id
WHERE d.dot > 0
  AND d.dot * d.dot * 10000 >= {threshold_bp} * na.n2 * nb.n2
"""
