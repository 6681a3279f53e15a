"""The derived partsupp view (golden/tpch_partsupp.py) — association
invariants that the five Q2/Q9/Q11/Q16/Q20 goldens rely on.

The suppkey formula ``(p + p DIV S + i*max(S DIV 4,1)) % S`` must give
each part exactly 4 DISTINCT suppliers for every supplier count the
testdata ships (S=10/100/1000) — a collision would silently halve a
part's supplier set and shift every downstream aggregate. The pure
formula is checked exhaustively for a range of S; the Spark build is
checked against the smoke fixture.
"""

from __future__ import annotations

from hydraide_spark.golden.tpch_partsupp import partsupp

from conftest import SF_SMOKE


def _suppkeys(p: int, s: int) -> list[int]:
    q = max(s // 4, 1)
    return [(p + p // s + i * q) % s for i in range(4)]


def test_formula_distinct_for_all_shipped_and_plausible_counts():
    # 3*floor(S/4) < S for every S, so the 4 offsets {0,q,2q,3q} are
    # distinct mod S whenever q >= 1 and 3q < S — i.e. every S >= 4.
    for s in [4, 5, 7, 10, 16, 100, 101, 1000, 10000]:
        for p in range(0, 4 * s, max(s // 7, 1)):
            ks = _suppkeys(p, s)
            assert len(set(ks)) == 4, (p, s, ks)
            assert all(0 <= k < s for k in ks)


def test_spark_partsupp_matches_pure_formula_and_is_unique(spark):
    ps = partsupp(spark, SF_SMOKE)
    rows = ps.collect()
    n_parts = ps.select("ps_partkey").distinct().count()
    # 4 rows per part, (partkey, suppkey) unique
    assert len(rows) == 4 * n_parts
    assert (
        ps.select("ps_partkey", "ps_suppkey").distinct().count() == len(rows)
    )
    s_cnt = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").count()
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r.ps_partkey, []).append(r.ps_suppkey)
        # columns derived exactly from the keys
        assert r.ps_availqty == 1 + (37 * r.ps_partkey + 71 * r.ps_suppkey) % 9999
        assert (
            r.ps_supplycost_cents
            == 1 + (31 * r.ps_partkey + 53 * r.ps_suppkey) % 99900
        )
    for p, ks in by_part.items():
        assert sorted(ks) == sorted(_suppkeys(p, s_cnt)), p


def test_partsupp_build_has_no_shuffle(spark):
    # part x4 via explode + 1-row broadcast count: the physical plan
    # must not contain an Exchange (the build is map-side at any scale).
    plan = partsupp(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan or "BroadcastExchange" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
