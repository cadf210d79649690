"""Link-graph operators over an edge DataFrame (src, dst).

A crawl-scale corpus is also a graph: ``textops.extract_links`` +
``corpus.url_normalize`` turn raw HTML into a (source domain, target
domain) edge stream, and domain-level PageRank over that stream is a
standard quality prior for corpus selection (it is exactly the
"page_rank" quality signal the Common Crawl ranking releases and the
RefinedWeb/Dolma pipelines consume).

Design: PageRank here is FIXED-POINT INTEGER arithmetic (parts-per-
``base`` BIGINT ranks, floor division everywhere). Floats would make the
result depend on join/aggregation order; integer ops make every
iteration bit-reproducible across engines, so the DuckDB oracle matches
exactly — the same determinism contract the IVF/PQ quantizers use
(similarity.py IVF_SCALE).

Reference parity note: the reference engine (an event store) has no
graph tooling — this is part of the training-data-pipeline surface the
project brief adds as first-class components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import spread


def pagerank(edges: DataFrame, iterations: int = 2, damping_pct: int = 85,
             base: int = 1_000_000_000, src_col: str = "src",
             dst_col: str = "dst") -> DataFrame:
    """Fixed-point PageRank (Page, Brin, Motwani & Winograd 1999) with
    ``iterations`` unrolled rounds at damping d = damping_pct/100.

    Semantics (identical in both engines, all BIGINT floor division):

    * edges are DISTINCT (src, dst) pairs with self-loops removed;
    * every node (src or dst) starts at r0 = base // n;
    * each round: contrib(u->v) = (r_u * damping_pct) // (100 * out(u)),
      r'_v = teleport + sum(contrib over in-edges of v), with
      teleport = (base * (100 - damping_pct) // 100) // n;
    * dangling nodes (no out-edges) keep receiving teleport but their
      mass is NOT redistributed (the standard "drop dangling mass"
      simplification) — ranks sum to <= base, not exactly base.

    Returns (node, rank) with rank in parts-per-``base``.

    Scale shape: the canonical distributed PageRank — per round one
    keyed join ranks⋈out-degrees (node-keyed), one keyed join onto the
    edge list (src-keyed), one map-side-combined groupBy dst, and one
    node-keyed left join for teleport-only nodes. No broadcast of
    anything data-sized, no driver state beyond the node COUNT scalar;
    iterations is a small constant so the unrolled plan stays bounded.
    AQE handles the skewed-hub shuffle (celebrity domains) the same way
    it splits any skewed key.
    """
    e = (
        spread(edges)
        .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    r0 = base // n
    teleport = (base * (100 - damping_pct) // 100) // n
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).cache()

    # string-key joins (never attribute refs) — e feeds both outdeg and
    # the per-round contribution join, and shared-lineage attribute refs
    # trip Spark's ambiguous-self-join detection
    out_n = outdeg.select(F.col("src").alias("node"), "outdeg")
    e_u = e.select(F.col("src").alias("u"), "dst")
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for _ in range(iterations):
        contribs = (
            ranks.join(out_n, "node")
            .select(
                F.col("node").alias("u"),
                # BIGINT floor division (div), never `/` — double division
                # plus a cast can land one below the exact quotient.
                F.expr(f"(rank * {int(damping_pct)}) div (100 * outdeg)")
                .cast("long").alias("c"),
            )
            .join(e_u, "u")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.coalesce(F.col("inflow"), F.lit(0))).cast("long")
                .alias("rank"),
            )
        )
    return ranks


def sql_pagerank(edges_sql: str, iterations: int = 2, damping_pct: int = 85,
                 base: int = 1_000_000_000) -> str:
    """DuckDB oracle for :func:`pagerank` — the same integer recurrence
    with the rounds unrolled as CTEs; ``edges_sql`` is a SELECT yielding
    (src, dst)."""
    dp = int(damping_pct)
    ctes = [
        f"raw AS ({edges_sql})",
        "e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)",
        ("nodes AS (SELECT src AS node FROM e "
         "UNION SELECT dst AS node FROM e)"),
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        (f"consts AS (SELECT n, CAST({base} AS BIGINT) // n AS r0, "
         f"(CAST({base} AS BIGINT) * (100 - {dp}) // 100) // n AS tele "
         "FROM nn)"),
        ("outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg "
         "FROM e GROUP BY src)"),
        ("r0 AS (SELECT node, (SELECT r0 FROM consts) AS rank FROM nodes)"),
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node,
         sum((r.rank * {dp}) // (100 * o.outdeg)) AS inflow
  FROM {prev} r JOIN outdeg o ON r.node = o.src
  JOIN e ON e.src = o.src
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST((SELECT tele FROM consts) + COALESCE(c.inflow, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
)"""
        )
        prev = f"r{i}"
    body = ",\n".join(ctes)
    return f"WITH {body}\nSELECT node, rank FROM {prev}"
