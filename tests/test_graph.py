"""PageRank (functions/graph.py): structural correctness on known
graphs, dangling-mass conservation, and the partition-invariance the
DECIMAL contribution sums exist for."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from hydraide_spark.functions.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_star_graph_center_dominates_and_mass_conserved(spark):
    # spokes 1..6 all point at 0; 0 points back at 1 (not dangling)
    edges = [(i, 0) for i in range(1, 7)] + [(0, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    r = _ranks(pagerank(e, iterations=12))
    assert abs(sum(r.values()) - 1.0) < 1e-9  # probability mass conserved
    # the center/hub pair holds almost all mass (their exact split
    # oscillates with iteration parity on this 2-cycle-ish core, so
    # assert dominance, not which of the two leads)
    assert r[0] + r[1] > 0.8
    assert min(r[0], r[1]) > max(r[i] for i in range(2, 7))
    # spokes 2..6 are symmetric -> identical ranks
    assert len({round(r[i], 12) for i in range(2, 7)}) == 1


def test_dangling_nodes_redistribute_not_leak(spark):
    # 0 -> 1 -> 2, and 2 has no out-edges (dangling)
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    r = _ranks(pagerank(e, iterations=15))
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[2] > r[1] > r[0]  # downstream accumulates


def test_pagerank_partition_invariant_bit_exact(spark):
    """The reason contributions sum through DECIMAL: ranks must be
    byte-identical under any partitioning, or iterative drift makes
    every cluster layout produce different scores."""
    import random

    rng = random.Random(5)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(300)})
    e = spark.createDataFrame(edges, "src long, dst long")
    a = _ranks(pagerank(e, iterations=10))
    b = _ranks(pagerank(e.repartition(17), iterations=10))
    assert a.keys() == b.keys()
    for k in a:
        assert struct.pack("d", a[k]) == struct.pack("d", b[k]), k


def test_two_cycle_converges_to_uniform(spark):
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    r = _ranks(pagerank(e, iterations=8))
    assert abs(r[0] - 0.5) < 1e-12 and abs(r[1] - 0.5) < 1e-12


def test_pagerank_empty_edges_preserves_node_key_type(spark):
    """The empty-graph early return must inherit the edge key type —
    a string-keyed graph used to get a hardcoded long-typed empty
    frame, breaking downstream unions (ADVICE r4)."""
    e = spark.createDataFrame([], "src string, dst string")
    out = pagerank(e, iterations=3)
    assert out.count() == 0
    assert dict(out.dtypes) == {"node": "string", "rank": "double"}


def test_pagerank_parallel_edges_collapse_to_simple_graph(spark):
    """Documented multigraph contract: repeated (src, dst) rows count
    once (unweighted PageRank over the simple graph)."""
    simple = spark.createDataFrame([(0, 1), (1, 0), (0, 2)], "src long, dst long")
    multi = simple.union(simple).union(simple)
    a = _ranks(pagerank(simple, iterations=6))
    b = _ranks(pagerank(multi, iterations=6))
    assert a.keys() == b.keys()
    for k in a:
        assert struct.pack("d", a[k]) == struct.pack("d", b[k]), k
