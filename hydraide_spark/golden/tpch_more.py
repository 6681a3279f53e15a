"""Golden queries: second TPC-H batch — the relational shapes the first
batch (Q1/Q3/Q5/Q6/Q7/Q18) did not cover: correlated EXISTS
(semi-join), conditional market-share ratios, top-k over an exact
aggregate, outer-join distributions, scalar-subquery thresholds,
disjunctive multi-column pushdown, and anti-join opportunity analysis
(SURVEY.md §2.3/§2.4/§2.6).

The driver's trimmed TPC-H schema lacks partsupp, l_commitdate/
l_receiptdate, p_container and c_phone, so queries whose text needs
those columns are re-anchored on available ones while keeping the
OPERATOR shape the query exists to exercise (noted per query).
Constants use the synthetic testdata domains (NATION_k nations,
single-word p_type) so every result is non-empty at every sf.

Exactness discipline (CLAUDE.md): money sums through DECIMAL(28,2) and
cast to DOUBLE only at the edge; ratio outputs are single IEEE
divisions of bit-identical operands; threshold comparisons
(0.2*avg-style) are restated as exact integer/decimal cross products
so no float boundary exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import golden
from ._util import big, dbl, dec, memo_golden, t

_VOL_SQL = (
    "CAST(l_extendedprice AS DECIMAL(28,2)) * (1 - CAST(l_discount AS DECIMAL(28,2)))"
)


def _vol():
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


@golden(
    "tpch_q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape — correlated EXISTS: count a quarter's orders by
    priority where at least one line shipped after the order date (the
    schema lacks l_commitdate/l_receiptdate, so late-shipment stands in
    for the late-commit predicate; the EXISTS-to-left-semi-join plan is
    the thing under test). The probe side (one quarter of orders)
    broadcasts; lineitem is scanned once and never aggregated — the
    semi-join short-circuits per key."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    sat = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sat.groupBy("o_orderpriority").agg(
        big(F.count(F.lit(1))).alias("order_count")
    )


@golden(
    "tpch_q8_market_share",
    oracle=f"""
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             {_VOL_SQL} AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = nc.n_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(o_year AS INT) AS o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                         ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
@memo_golden("tpch_q8_market_share")
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape — national market share: NATION_2's fraction of
    ECONOMY-part volume sold into ASIA by order year. Every dimension
    broadcasts; the only corpus-scale shuffle is lineitem x orders.
    Both the conditional numerator and the denominator aggregate in
    exact DECIMAL and convert once, so the final division is a single
    IEEE op over bit-identical operands — the ratio needs no
    rounding."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = t(spark, sf_dir, "customer")
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_rkey"))
    cust_asia = c.join(
        F.broadcast(nc.join(F.broadcast(r), nc.nc_rkey == r.r_regionkey)),
        c.c_nationkey == F.col("nc_key"),
    ).select("c_custkey")
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(ns), s.s_nationkey == ns.ns_key)),
              li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            _vol().alias("volume"),
            F.col("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(28,2)")
    return flat.groupBy("o_year").agg(
        (
            dbl(F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero)))
            / dbl(F.sum("volume"))
        ).alias("mkt_share")
    ).select(F.col("o_year").cast("int").alias("o_year"), "mkt_share")


@golden(
    "tpch_q10_returned_revenue",
    oracle=f"""
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
           CAST(SUM({_VOL_SQL}) AS DOUBLE) AS revenue,
           n.n_name, c.c_acctbal
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY SUM({_VOL_SQL}) DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape — returned-item revenue, top 20 customers of a
    quarter: return-flag filter on the scan, quarter filter on orders,
    broadcast customer+nation, one shuffle on the join key, TakeOrdered
    20. The sort key is the EXACT DECIMAL revenue (cast to double only
    for output) with c_custkey as tiebreak, so the limit boundary is
    engine-stable."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_vol()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            big("c_custkey").alias("c_custkey"), "c_name",
            dbl(F.col("_rev")).alias("revenue"), "n_name", "c_acctbal",
        )
    )


@golden(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape — customer order-count distribution: LEFT outer
    join (customers with zero orders must appear at c_count = 0, which
    an inner join would silently drop), inner aggregate per customer,
    outer aggregate per count. Both aggregates partial map-side; the
    distribution is tiny."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        big(F.count(F.lit(1))).alias("custdist")
    ).select(big("c_count").alias("c_count"), "custdist")


@golden(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN {_VOL_SQL}
                              ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
           / CAST(SUM({_VOL_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape — promo revenue percentage for one ship month:
    date range pushed to the fact scan, part dimension broadcast,
    conditional DECIMAL numerator over DECIMAL denominator, percentage
    as (100.0 * num) / den — two IEEE ops over bit-identical operands
    in BOTH engines (same association), so the single output double
    matches unrounded."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(28,2)")
    promo = F.when(F.col("p_type").startswith("PROMO"), _vol()).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            ((F.lit(100.0) * dbl(F.sum(promo))) / dbl(F.sum(_vol()))).alias(
                "promo_revenue"
            )
        )
    )


@golden(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_VOL_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape — top supplier by quarterly revenue: the revenue
    'view' is a grouped aggregate, and the scalar MAX over it joins
    back as a 1-row broadcast equality (never a global window over the
    corpus). Revenue stays EXACT DECIMAL through the max comparison —
    equality on doubles would be engine-noise-prone; on decimals it is
    exact, so ties (multiple top suppliers) resolve identically."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_vol()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            big("s_suppkey").alias("s_suppkey"),
            "s_name",
            dbl(F.col("total_rev")).alias("total_revenue"),
        )
    )


@golden(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH agg AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(28,2))) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN agg a  ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS DECIMAL(28,2)) * 5 * a.cnt < a.sq
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape — small-quantity revenue against a per-part
    scalar average (the p_container filter is unavailable, brand filter
    carries the selectivity): the correlated AVG subquery becomes a
    grouped (sum, count) aggregate joined back to the fact, and the
    float threshold qty < 0.2 * avg is restated EXACTLY as
    qty * 5 * cnt < sum(qty) in DECIMAL/integer arithmetic — no float
    boundary exists, so the filtered set is identical in any engine.
    The brand filter prunes the probe side before the join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(agg, F.col("l_partkey") == F.col("a_partkey"))
        .filter(dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            (dbl(F.sum(dec("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"),
            big(F.count(F.lit(1))).alias("n_lines"),
        )
    )


@golden(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_VOL_SQL}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape — disjunctive multi-column predicate across BOTH
    join sides (the classic OR-of-ANDs that kills naive pushdown):
    Catalyst must derive the common single-side conjuncts (p_size >= 1,
    quantity/brand IN-bounds) and push them below the join while
    keeping the cross-side disjunction above it. Part is broadcast; the
    fact is scanned once."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    def arm(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )
    cond = arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm(
        "Brand#11", 15, 20, 30
    )
    return j.filter(cond).agg(
        dbl(F.sum(_vol())).alias("revenue"),
        big(F.count(F.lit(1))).alias("n_lines"),
    )


@golden(
    "tpch_q22_idle_balance_by_nation",
    oracle="""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
               AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey AS INT) AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS totacctbal
    FROM customer c, thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_idle_balance_by_nation(spark, sf_dir):
    """TPC-H Q22 shape — sales opportunity: DORMANT customers (no
    order since 2000 — ANTI join; the classic no-orders-at-all
    predicate is empty on this testdata, where every customer has
    history) whose balance beats the positive-balance average (scalar
    subquery threshold), grouped by nation (nationkey stands in for
    the generator's missing phone country code). The threshold is a
    1-row DECIMAL-sum / count — computed identically in both engines
    and compared against exact input doubles, so the > boundary cannot
    drift. The anti join broadcasts nothing corpus-scale: orders
    project to o_custkey after the pushed date filter."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    row = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(dbl(F.sum(dec("c_acctbal"))).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    avg_bal = row["s"] / row["n"]  # same IEEE division as the SQL
    return (
        c.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            big(F.count(F.lit(1))).alias("numcust"),
            dbl(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
        .select(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "numcust", "totacctbal",
        )
    )


@golden(
    "tpch_q12_priority_shipment_classes",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_shipment_classes(spark, sf_dir):
    """TPC-H Q12 shape — shipping-mode priority split: one
    orders ⋈ lineitem equi-join feeding two CONDITIONAL counts per
    group (the CASE-in-SUM pattern). The schema lacks l_shipmode /
    l_commitdate / l_receiptdate, so the group key is l_returnflag and
    the year window sits on l_shipdate; the operator payload — a
    map-side-combinable conditional aggregate over a join, no second
    pass per class — is unchanged. The date window pushes into the
    lineitem scan; the join shuffles on orderkey with partial
    aggregation above it."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            big(F.sum(F.when(hi, 1).otherwise(0))).alias("high_line_count"),
            big(F.sum(F.when(hi, 0).otherwise(1))).alias("low_line_count"),
        )
    )


@golden(
    "tpch_q21_waiting_supplier_blame",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
      JOIN orders o ON o.o_orderstatus = 'F'
      JOIN lineitem l1 ON l1.l_orderkey = o.o_orderkey
                      AND l1.l_suppkey = s.s_suppkey
                      AND l1.l_shipdate > o.o_orderdate
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 10
    """,
)
def tpch_q21_waiting_supplier_blame(spark, sf_dir):
    """TPC-H Q21 shape — suppliers who kept orders waiting: the
    hardest relational shape in the suite, a SEMI join AND an ANTI
    join of lineitem against ITSELF per candidate line ("another
    supplier participated" / "no other supplier was late"). Late-ness
    is re-anchored on l_shipdate > o_orderdate (no l_receiptdate /
    l_commitdate in this schema), exactly like tpch_q4. Plan shape:
    the candidate side (one nation's suppliers' late lines on
    finished orders) is narrow; both self-joins are equi-joins on
    l_orderkey with the inequality as residual — lineitem never
    cross-joins and is scanned once per side with orderkey shuffle
    reuse."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem")

    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("l_orderkey", "l_suppkey", "o_orderdate", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("sp2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("sp3"),
        F.col("l_shipdate").alias("ship3"),
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("sp2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("sp3"))
            & (F.col("ship3") > F.col("o_orderdate")),
            "left_anti",
        )
    )
    return (
        waited.groupBy("s_name")
        .agg(big(F.count(F.lit(1))).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )
