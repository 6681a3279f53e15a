"""Iterative graph analytics beyond connected components: PageRank
(Brin & Page, "The Anatomy of a Large-Scale Hypertextual Web Search
Engine", WWW'98) over an edge list — the authority score a curation
pipeline uses to weight link/citation/duplication graphs.

Scale shape per iteration (the same discipline as
dedup.neardup_clusters):

- contributions = ranks ⋈ out-degrees ⋈ edges (equi-joins on the node
  id), then ONE groupBy-sum per destination — no collect_list, no
  per-node fan-in materialization, so a high-in-degree hub costs a
  partial-aggregated shuffle, never a wide row;
- dangling mass (nodes with no out-edges) folds into a 1-row aggregate
  broadcast into the update expression;
- lineage is cut with localCheckpoint per round (iterative plans
  otherwise grow unboundedly);
- contribution sums go through DECIMAL(38,18), so ranks are
  bit-identical under ANY partitioning — iterative float drift across
  cluster layouts is the classic nondeterminism bug in distributed
  PageRank (tested: repartition(17) gives byte-equal ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list. Returns
    (node, rank) with ranks summing to ~1 (dangling mass
    redistributed uniformly). Deterministic and partition-invariant:
    same edges => bit-identical ranks, any layout.

    The node universe is DERIVED from the edges — a node appearing in
    no edge at all is absent from the result (union a zero-degree
    node frame first if isolated entities must score (1-d)/n).
    Parallel edges are DEDUPLICATED (`distinct()`): this is unweighted
    PageRank where a multigraph's repeated (src, dst) rows count once —
    pre-aggregate to a weight column and adapt the contribution term if
    multiplicity must matter."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty result keeps the INPUT's node type (string keys stay
        # string — ADVICE r4) instead of hardcoding a long schema
        return nodes.select("node", F.lit(0.0).alias("rank"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks.node == out_deg.src, "left"
        ).select("node", "rank", "out_deg")
        # dangling nodes contribute their whole rank, split uniformly —
        # a 1-row DECIMAL aggregate broadcast into the update expression
        # (an in-plan scalar, not a driver collect: one job per round)
        dang = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(
                F.sum(F.col("rank").cast("decimal(38,18)")),
                F.lit(0).cast("decimal(38,18)"),
            ).alias("dm")
        )
        contribs = (
            with_deg.filter(F.col("out_deg").isNotNull())
            .join(e, with_deg.node == e.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).cast("decimal(38,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    (
                        F.lit(base)
                        + (F.col("dm").cast("double") * F.lit(damping)) / F.lit(float(n))
                    )
                    + F.lit(damping)
                    * F.coalesce(F.col("csum").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
