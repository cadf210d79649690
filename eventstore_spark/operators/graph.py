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

from ..schema import spread, scoped_cache


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
        .transform(scoped_cache)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(scoped_cache)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    r0 = base // n
    teleport = (base * (100 - damping_pct) // 100) // n
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).transform(scoped_cache)

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


def hits(edges: DataFrame, iterations: int = 2, base: int = 1_000_000,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Fixed-point HITS (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment") with ``iterations`` unrolled rounds — the
    hub/authority complement to :func:`pagerank` for crawl-frontier
    prioritization (good HUBS are link pages worth re-crawling, good
    AUTHORITIES are content pages worth keeping).

    Exact integer arithmetic, identical in both engines:

    * edges are DISTINCT (src, dst) with self-loops removed;
    * hubs start at ``base``;
    * each round: auth_raw(v) = Σ_{u→v} hub(u), then L1-rescale
      auth(v) = (auth_raw(v) · base) // Σ auth_raw (floor division, so
      every auth is in [0, base]); hubs update symmetrically from the
      rescaled auths. Nodes with no in-edges have auth 0; no out-edges,
      hub 0.
    * auth_raw(v)·base is computed in DECIMAL(38,0)/HUGEINT: it can
      reach |E|·base² ≈ 1e12·|E|, past 2^63 on any real crawl graph,
      where Spark's non-ANSI BIGINT would wrap silently (the
      kn_perplexity lesson). Only the final rescaled value (≤ base)
      returns to BIGINT.

    Returns (node, hub, auth) in parts-per-``base``.

    Scale shape: per half-round ONE keyed join (scores onto the edge
    list) + one map-side-combined groupBy + a one-row L1 total joined
    back as a scalar (the allowlisted scalar-subquery broadcast, same
    as bm25's N/avgdl). No data-sized broadcast, no driver state.
    """
    e = (
        spread(edges)
        .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .transform(scoped_cache)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(scoped_cache)
    )
    hub = nodes.select("node", F.lit(base).cast("long").alias("score"))

    def _half_round(scores, key_in, key_out):
        """One HITS half-round: push `scores` along edges from key_in to
        key_out, then L1-rescale to parts-per-base. The raw-sum table is
        referenced twice (total + rescale), so it is materialized per
        half-round (O(nodes) rows) — without it each half-round DOUBLES
        the replayed plan. An EAGER localCheckpoint, deliberately not a
        lazy cache (r13 measured both): the checkpoint TRUNCATES the
        logical plan, and that truncation is load-bearing for this
        chained loop — with a lazy cache the four half-rounds build one
        deep plan whose per-round broadcast totals each re-optimize
        their whole upstream at action time (interleaved A/B at sf0.1:
        cache ~9-34 s per run vs checkpoint ~3.3-6 s; the bench
        independently showed the cached form at 20 s). The blocking
        driver job per half-round is the price of keeping planning
        linear in rounds (guide §3.3: materialize to truncate very
        large plans)."""
        raw = (
            scores.withColumnRenamed("node", key_in)
            .join(e, key_in)
            .groupBy(F.col(key_out).alias("node"))
            .agg(F.sum("score").alias("raw"))
            .localCheckpoint(eager=True)
        )
        total = raw.agg(F.sum(F.col("raw").cast("decimal(38,0)")).alias("s"))
        scaled = raw.crossJoin(F.broadcast(total)).select(
            "node",
            F.expr(f"CAST((CAST(raw AS DECIMAL(38,0)) * {int(base)}) DIV s "
                   "AS BIGINT)").alias("score"),
        )
        return nodes.join(scaled, "node", "left").select(
            "node", F.coalesce("score", F.lit(0)).cast("long").alias("score"))

    auth = None
    for _ in range(iterations):
        auth = _half_round(hub, "src", "dst")
        hub = _half_round(auth, "dst", "src")
    return (
        hub.withColumnRenamed("score", "hub")
        .join(auth.withColumnRenamed("score", "auth"), "node")
        .select("node", "hub", "auth")
    )


def sql_hits(edges_sql: str, iterations: int = 2,
             base: int = 1_000_000) -> str:
    """DuckDB oracle for :func:`hits` — the same integer recurrence with
    the rounds unrolled as CTEs; HUGEINT where Spark uses DECIMAL(38,0)."""
    b = int(base)
    ctes = [
        f"raw_e AS ({edges_sql})",
        "e AS (SELECT DISTINCT src, dst FROM raw_e WHERE src <> dst)",
        ("nodes AS (SELECT src AS node FROM e "
         "UNION SELECT dst AS node FROM e)"),
        f"h0 AS (SELECT node, CAST({b} AS BIGINT) AS score FROM nodes)",
    ]

    def half(i, prev, key_in, key_out, out):
        ctes.append(
            f"""{out}_raw{i} AS (
  SELECT e.{key_out} AS node, sum(p.score) AS raw
  FROM {prev} p JOIN e ON e.{key_in} = p.node
  GROUP BY e.{key_out}
)"""
        )
        ctes.append(
            f"""{out}{i} AS (
  SELECT n.node,
         CAST(COALESCE(
           (CAST(r.raw AS HUGEINT) * {b})
             // (SELECT sum(CAST(raw AS HUGEINT)) FROM {out}_raw{i}),
           0) AS BIGINT) AS score
  FROM nodes n LEFT JOIN {out}_raw{i} r ON n.node = r.node
)"""
        )
        return f"{out}{i}"

    hub_prev = "h0"
    auth_prev = None
    for i in range(1, iterations + 1):
        auth_prev = half(i, hub_prev, "src", "dst", "a")
        hub_prev = half(i, auth_prev, "dst", "src", "h")
    body = ",\n".join(ctes)
    return (f"WITH {body}\n"
            f"SELECT h.node, h.score AS hub, a.score AS auth "
            f"FROM {hub_prev} h JOIN {auth_prev} a ON h.node = a.node")
