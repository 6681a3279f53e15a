"""Bucketed co-located joins: the engine's answer to the reference's
island-addressed locality (SURVEY.md §4.2). Writing both sides bucketed
on the join key removes the shuffle from the join entirely — the
pattern that makes repeated 100 TB fact-fact joins affordable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hydraide_spark.plans import count_exchanges, physical_plan
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default warehouse dir (spark.sql.warehouse.dir is static per JVM);
    # tables dropped on teardown, dirs gitignored
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li = spark.table(li_name)
    o = spark.table(o_name)
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, "l_orderkey").groupBy("o_orderstatus").count()
        n_exchanges = count_exchanges(joined)
        plan = physical_plan(joined)
        # bucketed-bucketed equi-join: zero exchanges before the agg; the
        # only exchange permitted is the final groupBy (status key)
        assert "SortMergeJoin" in plan
        assert n_exchanges <= 1, plan
        # result sanity
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
