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


def test_triangle_count_hand_and_random_brute_force(spark):
    from itertools import combinations

    from hydraide_spark.functions.graph import triangle_count

    # K4 has 4 triangles; every node sits in 3 of them. Parallel edges,
    # self-loops and reversed duplicates must not change counts.
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b] + [(2, 2), (0, 1)]
    e = spark.createDataFrame(k4, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    import random

    rng = random.Random(13)
    edges = list({tuple(sorted((rng.randrange(40), rng.randrange(40))))
                  for _ in range(200) })
    edges = [(a, b) for a, b in edges if a != b]
    eset = set(edges)
    brute: dict[int, int] = {}
    for x, y, z in combinations(range(40), 3):
        if ((x, y) in eset) and ((x, z) in eset) and ((y, z) in eset):
            for n in (x, y, z):
                brute[n] = brute.get(n, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == brute and sum(brute.values()) % 3 == 0


def test_triangle_orientation_defuses_star_hub(spark):
    """A star graph (hub connected to every leaf) has zero triangles;
    the degree orientation must keep the hub's OUT-degree at zero so
    the wedge self-join generates nothing — the naive per-node
    neighborhood join would fan n^2 wedges from the hub."""
    from hydraide_spark.functions.graph import triangle_count

    n = 400
    star = spark.createDataFrame([(n, i) for i in range(n)], "src long, dst long")
    out = triangle_count(star)
    assert out.count() == 0
    # plan sanity: equi-joins only (the global no-cartesian sweep also
    # covers the golden form)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_personalized_pagerank_seed_locality_and_invariance(spark):
    from hydraide_spark.functions.graph import personalized_pagerank

    # two disconnected components; seeds only in the first — the second
    # must score EXACTLY zero everywhere (the property plain PageRank
    # cannot offer), and total mass stays ~1
    edges = [(0, 1), (1, 2), (2, 0)] + [(10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    r = _ranks(personalized_pagerank(e, seeds=[0], iterations=12))
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert all(r[n] == 0.0 for n in (10, 11, 12))
    assert r[0] > r[1] and r[0] > r[2]  # the seed holds the most mass

    # an isolated seed (no edges at all) still holds its teleport share
    r2 = _ranks(personalized_pagerank(e, seeds=[0, 99], iterations=6))
    assert r2[99] > 0.0

    # partition-invariant bit-exactness, like plain pagerank
    a = _ranks(personalized_pagerank(e, seeds=[0, 10], iterations=8))
    b = _ranks(personalized_pagerank(e.repartition(13), seeds=[0, 10], iterations=8))
    assert a.keys() == b.keys()
    for k in a:
        assert struct.pack("d", a[k]) == struct.pack("d", b[k]), k

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one seed"):
        personalized_pagerank(e, seeds=[])


def test_weighted_pagerank_weights_matter_and_multiplicity_sums(spark):
    from hydraide_spark.functions.graph import pagerank, weighted_pagerank

    # 0 splits its rank 9:1 between 1 and 2; both sink back to 0
    e = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    r = _ranks(weighted_pagerank(e, "w", iterations=20))
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[1] > r[2]  # the heavy edge carries more rank
    # uniform weights must reproduce the unweighted operator exactly
    u = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 3.0), (1, 0, 3.0), (2, 0, 3.0)],
        "src long, dst long, w double",
    )
    a = _ranks(weighted_pagerank(u, "w", iterations=10))
    b = _ranks(pagerank(u.drop("w"), iterations=10))
    for k in a:
        assert struct.pack("d", a[k]) == struct.pack("d", b[k]), k
    # duplicate (src, dst) rows SUM into one edge: 0->1 twice at w=4.5
    # equals one edge at w=9
    dup = spark.createDataFrame(
        [(0, 1, 4.5), (0, 1, 4.5), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    c = _ranks(weighted_pagerank(dup, "w", iterations=20))
    for k in r:
        assert struct.pack("d", r[k]) == struct.pack("d", c[k]), k

    import pytest as _pytest

    bad = spark.createDataFrame([(0, 1, 0.0)], "src long, dst long, w double")
    with _pytest.raises(ValueError, match="non-positive"):
        weighted_pagerank(bad, "w")


def test_weighted_pagerank_null_weight_raises(spark):
    """A NULL weight must trip the non-positive guard, not silently
    drop rank mass as a NULL share (the guard's filter previously
    excluded NULL rows because NULL <= 0 is NULL)."""
    import pytest as _pytest

    from hydraide_spark.functions.graph import weighted_pagerank

    bad = spark.createDataFrame(
        [(0, 1, 2.0), (1, 0, None)], "src long, dst long, w double"
    )
    with _pytest.raises(ValueError, match="NULL"):
        weighted_pagerank(bad, "w")


def test_pagerank_driver_cap_bit_identical(spark):
    """r15 optimization pin: the driver_cap replay (HALF_UP decimal-18
    quantize + exact decimal sums + identical float operand order) must
    be BIT-identical to the distributed loop for all three variants,
    and an over-cap graph must fall through to the distributed loop."""
    from hydraide_spark.functions.graph import (
        pagerank,
        personalized_pagerank,
        weighted_pagerank,
    )

    n = 97
    rows = [(i, (i * 31 + 7) % n) for i in range(n)] + [
        (i, (i * 17 + 3) % n) for i in range(n)
    ]
    edges = spark.createDataFrame(
        [(s, d) for s, d in rows if s != d], "src long, dst long"
    )

    def ranks(df):
        return {r["node"]: r["rank"] for r in df.collect()}

    dist = ranks(pagerank(edges, iterations=6))
    drv = ranks(pagerank(edges, iterations=6, driver_cap=100_000))
    assert drv == dist  # exact float equality, not approx

    w = edges.withColumn("w", (F.col("src") + F.col("dst")) % 5 + 1)
    dist_w = ranks(weighted_pagerank(w, "w", iterations=6))
    drv_w = ranks(weighted_pagerank(w, "w", iterations=6, driver_cap=100_000))
    assert drv_w == dist_w

    # NON-INTEGER weights (ADVICE r15): strength is now a decimal(38,18)
    # quantize+sum in BOTH paths, so collect-order vs partition-order
    # folds cannot drift — 0.3-multiples are non-dyadic, the case a
    # plain double fold gets wrong
    wf = edges.withColumn(
        "w", ((F.col("src") * 7 + F.col("dst")) % 13) * F.lit(0.3) + F.lit(0.1)
    )
    dist_wf = ranks(weighted_pagerank(wf, "w", iterations=6))
    drv_wf = ranks(weighted_pagerank(wf, "w", iterations=6, driver_cap=100_000))
    assert drv_wf == dist_wf

    seeds = [i for i in range(0, n, 13)]
    dist_p = ranks(personalized_pagerank(edges, seeds, iterations=6))
    drv_p = ranks(
        personalized_pagerank(edges, seeds, iterations=6, driver_cap=100_000)
    )
    assert drv_p == dist_p

    # cap below the edge count: distributed loop runs, same ranks
    over = ranks(pagerank(edges, iterations=6, driver_cap=3))
    assert over == dist
