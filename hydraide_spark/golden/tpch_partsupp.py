"""Golden queries: third TPC-H batch — the five queries (Q2, Q9, Q11,
Q16, Q20) whose text needs the ``partsupp`` table, which the driver's
trimmed schema does not ship.

``partsupp`` is DERIVED deterministically from the shipped ``part`` and
``supplier`` tables with integer-only arithmetic, computed identically
by the Spark query and the DuckDB oracle (both read the same parquet
inputs — nothing is synthesized outside the query text):

- each part gets 4 suppliers, ``ps_suppkey = (p + p DIV S + i*q) % S``
  for ``i`` in 0..3 with ``q = max(S DIV 4, 1)`` (the dbgen association
  shape — distinct per part because ``3*(S DIV 4) < S``, valid for the
  shipped supplier counts S >= 10);
- ``ps_availqty``      = 1 + (37*p + 71*s) % 9999        (1..9999)
- ``ps_supplycost``    is carried in integer CENTS:
  ``ps_supplycost_cents = 1 + (31*p + 53*s) % 99900``    (1..99900)

so every partsupp column is BIGINT and every threshold / minimum /
product in the five queries is exact integer or DECIMAL arithmetic —
no float boundary exists anywhere (CLAUDE.md exactness discipline).

Predicate re-anchoring (same policy as tpch_more.py — keep the OPERATOR
shape, re-anchor constants on shipped domains):
- Q2  ``p_type LIKE '%BRASS'``      -> ``p_type = 'STANDARD'`` + size band
- Q9  ``p_name LIKE '%green%'``     -> ``p_name LIKE '%red%'``
- Q11 ``> 0.0001/SF * total``       -> ``2*n_parts*value > 3*total``
  (1.5x the average per-part value — scale-free, so it stays non-empty
  and selective at every sf, which is exactly why dbgen divides by SF)
- Q16 complaint-supplier NOT IN     -> ``s_acctbal < 2000`` NOT IN
- Q20 ``p_name LIKE 'forest%'``     -> ``p_name LIKE 'red%'``

Reference parity: hydraide's query surface has no relational join
engine; these queries are capability-layer rows (SURVEY.md §2.3) that
exercise correlated-min, multiway profit joins, scalar-subquery
thresholds, distinct-count anti-joins and nested semi-joins on Spark.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from . import golden
from ._util import big, dbl, dec, memo_golden, t

# ---------------------------------------------------------------------------
# The derived partsupp view, once in each dialect.
# ---------------------------------------------------------------------------

# DuckDB: `//` is integer division on BIGINT; all columns land as BIGINT.
PARTSUPP_SQL = """
  ps0 AS (
    SELECT p_partkey AS ps_partkey,
           (p_partkey + p_partkey // sc.s_cnt + g.i * GREATEST(sc.s_cnt // 4, 1))
             % sc.s_cnt AS ps_suppkey
    FROM part
    CROSS JOIN (SELECT COUNT(*) AS s_cnt FROM supplier) sc
    CROSS JOIN range(4) g(i)
  ),
  partsupp AS (
    SELECT ps_partkey,
           ps_suppkey,
           CAST(1 + (37 * ps_partkey + 71 * ps_suppkey) % 9999  AS BIGINT) AS ps_availqty,
           CAST(1 + (31 * ps_partkey + 53 * ps_suppkey) % 99900 AS BIGINT) AS ps_supplycost_cents
    FROM ps0
  )
"""


def partsupp(spark, sf_dir):
    """The derived partsupp as a DataFrame (BIGINT columns only).

    Scale note: the build is part x4 via explode with the supplier
    count broadcast as a 1-row aggregate — no shuffle, and at any scale
    partsupp is ~4x |part| (a dimension-sized frame: at TPC-H SF-100k
    ``part`` is ~2e10 rows, still far below fact-table size, so
    downstream joins against lineitem keep partsupp on the build side).
    """
    s_cnt = t(spark, sf_dir, "supplier").agg(big(F.count(F.lit(1))).alias("s_cnt"))
    ps0 = (
        t(spark, sf_dir, "part")
        .select("p_partkey")
        .join(F.broadcast(s_cnt))  # 1-row broadcast, not a real cross join
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            "s_cnt",
        )
        .select(
            "ps_partkey",
            (
                (
                    F.col("ps_partkey")
                    + F.expr("ps_partkey DIV s_cnt")
                    + F.col("i") * F.expr("GREATEST(s_cnt DIV 4, 1L)")
                )
                % F.col("s_cnt")
            ).alias("ps_suppkey"),
        )
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        big(F.lit(1) + (37 * F.col("ps_partkey") + 71 * F.col("ps_suppkey")) % 9999).alias(
            "ps_availqty"
        ),
        big(F.lit(1) + (31 * F.col("ps_partkey") + 53 * F.col("ps_suppkey")) % 99900).alias(
            "ps_supplycost_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar-min subquery).
# ---------------------------------------------------------------------------


@golden(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    eligible AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_cents,
             s.s_name, s.s_acctbal, n.n_name
      FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
        AND ps.ps_partkey IN (
          SELECT p_partkey FROM part
          WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        )
    )
    SELECT ps_partkey, s_name, s_acctbal, n_name,
           ps_supplycost_cents AS supplycost_cents
    FROM (
      SELECT *, MIN(ps_supplycost_cents) OVER (PARTITION BY ps_partkey) AS mn
      FROM eligible
    )
    WHERE ps_supplycost_cents = mn
    """,
)
@memo_golden("tpch_q2_min_cost_supplier")
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape — for each STANDARD part in a size band, the
    EUROPE supplier(s) achieving the minimum supply cost. The
    correlated scalar-min subquery becomes a window-min over the
    region-filtered candidate set: ONE shuffle on ps_partkey computes
    the minimum and filters to the argmin rows in the same stage
    (groupBy-min + join-back would shuffle twice). All dimensions
    (supplier/nation/region, and the part semi-join) broadcast; cost is
    integer cents so the min/equality comparison is exact."""
    ps = partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    eligible = (
        ps.join(F.broadcast(p.select("p_partkey")), ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select("ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("mn", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("mn"))
        .select(
            "ps_partkey",
            "s_name",
            "s_acctbal",
            "n_name",
            F.col("ps_supplycost_cents").alias("supplycost_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year.
# ---------------------------------------------------------------------------


@golden(
    "tpch_q9_product_profit",
    oracle=f"""
    WITH {PARTSUPP_SQL}
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(
             CAST(l.l_extendedprice AS DECIMAL(28,2))
               * (1 - CAST(l.l_discount AS DECIMAL(28,2)))
             - CAST(ps.ps_supplycost_cents * CAST(FLOOR(l.l_quantity) AS BIGINT)
                    AS DECIMAL(28,2)) * CAST(0.01 AS DECIMAL(3,2))
           ) AS DOUBLE), 6) AS profit
    FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
@memo_golden("tpch_q9_product_profit")
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 — profit on 'red' parts by supplier nation and order
    year: revenue minus supply cost. The five dimension sides (part
    filter, supplier, partsupp, nation — all dimension-sized even at
    SF-100k) broadcast against ONE lineitem scan; the only
    corpus-scale shuffle is lineitem x orders on orderkey, then the
    group-by. Exactness: revenue in DECIMAL(28,2); cost is integer
    cents x integer quantity scaled by an exact DECIMAL(3,2) 0.01
    multiply (never `/` — DuckDB promotes decimal division to DOUBLE,
    which would make the sum order-dependent); both terms exact, summed
    in DECIMAL, one DOUBLE cast at the edge rounded to 6 decimals (the
    decimal->double cast can differ in the last ulp between engines —
    CLAUDE.md; 6 decimals is ~5 orders above the drift at this
    magnitude). l_quantity is integral; FLOOR before the BIGINT cast
    per the round/truncate engine difference."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf_dir, "supplier")
    ps = partsupp(spark, sf_dir)
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    amount = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - (
        F.col("ps_supplycost_cents") * F.floor("l_quantity").cast("bigint")
    ).cast("decimal(28,2)") * F.expr("CAST(0.01 AS DECIMAL(3,2))")
    flat = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(ps),
            (li.l_partkey == F.col("ps_partkey")) & (li.l_suppkey == F.col("ps_suppkey")),
        )
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        flat.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(dbl(F.sum("amount")), 6).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (scalar-subquery threshold).
# ---------------------------------------------------------------------------


@golden(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    national AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_cents * ps.ps_availqty AS value_cents
      FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    totals AS (
      SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
             CAST(COUNT(DISTINCT ps_partkey) AS BIGINT) AS n_parts
      FROM national
    )
    SELECT g.ps_partkey, g.value_cents
    FROM (
      SELECT ps_partkey, CAST(SUM(value_cents) AS BIGINT) AS value_cents
      FROM national GROUP BY ps_partkey
    ) g, totals
    WHERE 2 * g.value_cents * totals.n_parts > 3 * totals.total_cents
    """,
)
@memo_golden("tpch_q11_important_stock")
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 — parts whose NATION_3 stock value exceeds a fraction
    of the national total. dbgen's ``0.0001/SF`` fraction exists to
    keep the threshold scale-free; here it is restated as 1.5x the
    average per-part value via the exact integer cross-product
    ``2*value*n_parts > 3*total`` (no float boundary, and the result
    stays non-empty and selective at every sf). Plan: partsupp joins
    the broadcast nation-filtered supplier dim, ONE groupBy on
    ps_partkey; the total and part-count reduce to a broadcast 1-row
    frame — at 100TB the per-part aggregate is the only shuffle."""
    ps = partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    national = (
        ps.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")),
                ps.ps_suppkey == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    grouped = national.groupBy("ps_partkey").agg(
        big(F.sum("value_cents")).alias("value_cents")
    )
    totals = national.agg(
        big(F.sum("value_cents")).alias("total_cents"),
        big(F.countDistinct("ps_partkey")).alias("n_parts"),
    )
    return (
        grouped.join(F.broadcast(totals))
        .filter(2 * F.col("value_cents") * F.col("n_parts") > 3 * F.col("total_cents"))
        .select("ps_partkey", "value_cents")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (distinct count + NOT IN anti-join).
# ---------------------------------------------------------------------------


@golden(
    "tpch_q16_supplier_relation",
    oracle=f"""
    WITH {PARTSUPP_SQL}
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
      )
    GROUP BY p.p_brand, p.p_type, p_size
    """,
)
@memo_golden("tpch_q16_supplier_relation")
def tpch_q16_supplier_relation(spark, sf_dir):
    """TPC-H Q16 — how many distinct suppliers can supply each
    (brand, type, size) bucket, excluding blacklisted suppliers (the
    complaint-comment NOT IN, re-anchored on ``s_acctbal < 2000``).
    The NOT IN becomes a broadcast left-anti join (the blacklist is
    supplier-dimension-sized; its keys are non-null by construction so
    NOT IN and anti-join agree); the part predicate broadcasts; the
    only shuffle is the distinct-count aggregate."""
    ps = partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 2000).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              ps.ps_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", big("p_size").alias("p_size"))
        .agg(big(F.countDistinct("ps_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-joins over excess stock).
# ---------------------------------------------------------------------------


@golden(
    "tpch_q20_excess_stock_suppliers",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
        JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND 2 * ps.ps_availqty > sh.qty
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT ps_suppkey FROM excess)
    """,
)
@memo_golden("tpch_q20_excess_stock_suppliers")
def tpch_q20_excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 — ASIA suppliers holding excess stock of 'red' parts
    (the single-nation filter is re-anchored to the region so the
    result is non-empty at sf0.001, where only 10 supplier rows exist):
    availqty > half the 1996 shipped quantity for that
    (part, supplier). The ``> 0.5 * sum(qty)`` threshold is the exact
    integer comparison ``2*availqty > qty`` (quantities are integral).
    Plan: ONE lineitem scan with the ship-year filter pushed down
    aggregates to (part,supp) grain; partsupp (semi-joined to the
    broadcast 'red' part list) joins it on both keys; the distinct
    supplier set is dimension-sized and broadcasts into the final
    supplier semi-join — lineitem is the only corpus-scale input and
    shuffles once."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        big(F.sum(F.floor("l_quantity").cast("bigint"))).alias("qty")
    )
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    ps = partsupp(spark, sf_dir)
    excess = (
        ps.join(F.broadcast(red), ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(shipped, (ps.ps_partkey == F.col("l_partkey")) & (ps.ps_suppkey == F.col("l_suppkey")))
        .filter(2 * F.col("ps_availqty") > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(excess), s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
