"""Deterministic-sampling tests: partition-invariance (the property
seeded ``df.sample`` lacks), split disjointness/exhaustiveness,
per-stratum rates, and agreement between the md5 and xxhash64 modes'
statistical behavior.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hydraide_spark.functions.sampling import (
    hash_sample,
    sample_bucket,
    stratified_sample,
    train_test_split,
)


def _ids(spark, n=2000, parts=4):
    return spark.range(0, n, 1, parts).withColumnRenamed("id", "key")


def test_sample_is_partition_invariant(spark):
    a = {r["key"] for r in hash_sample(_ids(spark, parts=2), "key", 0.3).collect()}
    b = {r["key"] for r in hash_sample(_ids(spark, parts=13), "key", 0.3).collect()}
    assert a == b  # same rows regardless of physical layout


def test_sample_fraction_and_nesting(spark):
    df = _ids(spark)
    s30 = hash_sample(df, "key", 0.3)
    s10 = hash_sample(df, "key", 0.1)
    n30, n10 = s30.count(), s10.count()
    assert abs(n30 / 2000 - 0.3) < 0.05 and abs(n10 / 2000 - 0.1) < 0.05
    # smaller fraction is a SUBSET of the larger (same hash, lower cut):
    # shrinking a sample never rotates membership
    assert {r["key"] for r in s10.collect()} <= {r["key"] for r in s30.collect()}


def test_train_test_split_disjoint_exhaustive(spark):
    df = _ids(spark)
    out = train_test_split(df, "key", 0.2)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["test"] + counts["train"] == 2000
    assert abs(counts["test"] / 2000 - 0.2) < 0.05
    # append new rows: existing assignments unchanged
    bigger = train_test_split(_ids(spark, 3000), "key", 0.2)
    old = {r["key"]: r["split"] for r in out.collect()}
    new = {r["key"]: r["split"] for r in bigger.collect() if r["key"] < 2000}
    assert old == new


def test_stratified_rates_and_drop(spark):
    df = _ids(spark).withColumn(
        "stratum", F.when(F.col("key") % 3 == 0, "a").when(F.col("key") % 3 == 1, "b").otherwise("c")
    )
    out = stratified_sample(df, "stratum", {"a": 1.0, "b": 0.25}, "key")
    counts = {r["stratum"]: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert counts["a"] == df.filter("stratum = 'a'").count()  # rate 1.0 keeps all
    assert abs(counts["b"] / df.filter("stratum = 'b'").count() - 0.25) < 0.07
    assert "c" not in counts  # absent stratum dropped


def test_xxhash_mode_uniform_and_deterministic(spark):
    df = _ids(spark)
    s = hash_sample(df, "key", 0.5, method="xxhash64")
    n = s.count()
    assert abs(n / 2000 - 0.5) < 0.05
    assert {r["key"] for r in s.collect()} == {r["key"] for r in s.collect()}
    # salt decorrelates
    b1 = df.select(sample_bucket(F.col("key"), "s1", "xxhash64").alias("b")).collect()
    b2 = df.select(sample_bucket(F.col("key"), "s2", "xxhash64").alias("b")).collect()
    assert [r["b"] for r in b1] != [r["b"] for r in b2]


def test_pack_token_shards_matches_naive_global_window(spark):
    from pyspark.sql.window import Window
    from hydraide_spark.functions.sampling import pack_token_shards

    rng = random.Random(11)
    rows = [(i, rng.randrange(1, 120)) for i in range(500)]
    rng.shuffle(rows)  # arrival order and partitioning must not matter
    df = spark.createDataFrame(rows, "id long, n_tok long").repartition(13)

    got = {
        r["id"]: (r["cum_tokens"], r["shard_id"])
        for r in pack_token_shards(df, "id", "n_tok", 700, bucket_size=37).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    naive = {
        r["id"]: (r["cum"], (r["cum"] - r["n_tok"]) // 700)
        for r in df.withColumn("cum", F.sum("n_tok").over(w)).collect()
    }
    assert got == naive


def test_pack_token_shards_contiguous_and_bounded(spark):
    from hydraide_spark.functions.sampling import pack_token_shards

    rows = [(i, 10 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, n_tok long")
    out = pack_token_shards(df, "id", "n_tok", 100, bucket_size=16).collect()
    by_id = sorted(out, key=lambda r: r["id"])
    shards = [r["shard_id"] for r in by_id]
    # shard ids are non-decreasing in id order and start at 0
    assert shards[0] == 0 and all(a <= b for a, b in zip(shards, shards[1:]))
    # every shard except the last holds within one max-doc of the
    # budget on both sides: a boundary-straddling doc can donate up to
    # max_tok-1 tokens of a shard's budget to its predecessor
    max_tok = max(r["n_tok"] for r in by_id)
    totals = {}
    for r in by_id:
        totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["n_tok"]
    last = max(totals)
    assert all(
        100 - max_tok < v < 100 + max_tok for s, v in totals.items() if s != last
    )


def test_temperature_mix_rates_and_balance(spark):
    """sqrt-temperature fractions: rates follow min(1, target*w/n) with
    w = sqrt(n)/sum(sqrt(n)); dominant strata are downweighted relative
    to rare ones, and the realized sample tracks the expected per-
    stratum sizes."""
    import math

    from hydraide_spark.functions.sampling import (
        temperature_mix_fractions,
        temperature_mix_sample,
    )
    from hydraide_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    counts = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    fracs = temperature_mix_fractions(docs, "lang", target_fraction=0.5)
    ssum = sum(math.sqrt(c) for c in sorted(counts.values()))  # order-free check
    target = 0.5 * sum(counts.values())
    for s, n in counts.items():
        expected = min(1.0, target * (math.sqrt(n) / sum(math.sqrt(counts[t]) for t in sorted(counts))) / n)
        assert abs(fracs[s] - expected) < 1e-12
    # dominant language keeps a LOWER rate than rare ones
    dom = max(counts, key=counts.get)
    rare = min(counts, key=counts.get)
    assert fracs[dom] < fracs[rare]
    out = temperature_mix_sample(docs, "lang", key_col="doc_id", target_fraction=0.5, salt="corpus_v1")
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    for s in counts:
        exp = fracs[s] * counts[s]
        assert abs(got.get(s, 0) - exp) < 0.15 * counts[s] + 10


def test_weighted_sample_topk_deterministic_and_weight_monotone(spark):
    """A-ES weighted sampling: identical draw across runs and
    partitionings; heavier rows get included materially more often
    (inclusion probability monotone in weight); the plan is a
    distributed top-k, not a global sort."""
    from hydraide_spark.functions.sampling import weighted_sample_topk
    from hydraide_spark.plans import physical_plan

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # weights 1.0 for even ids, 10.0 for every 10th: heavy minority
        F.when(F.col("id") % 10 == 0, F.lit(10.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    a = {r["doc_id"] for r in weighted_sample_topk(df, "doc_id", "w", k=200, salt="s1").collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample_topk(
            df.repartition(13), "doc_id", "w", k=200, salt="s1"
        ).collect()
    }
    assert a == b and len(a) == 200
    heavy = sum(1 for d in a if d % 10 == 0)
    light = len(a) - heavy
    # 200 heavy rows at weight 10 vs 1800 light at weight 1: the heavy
    # class must be strongly over-represented relative to its 10% share
    assert heavy > 80, f"only {heavy} heavy rows sampled"
    assert heavy > light * 0.5
    # different salt -> different draw (not a fixed top slice)
    c = {r["doc_id"] for r in weighted_sample_topk(df, "doc_id", "w", k=200, salt="s2").collect()}
    assert a != c
    plan = physical_plan(weighted_sample_topk(df, "doc_id", "w", k=200, salt="s1"))
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_guards_nonpositive_weights(spark):
    """A-ES is only defined for positive weights: w=0 gives a -inf
    priority (silently never sampled) and w<0 flips ln(u)/w positive so
    corrupt rows would deterministically dominate the draw. Both are
    dropped before ranking."""
    from hydraide_spark.functions.sampling import weighted_sample_topk

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5, F.lit(-3.0))
        .when(F.col("id") < 10, F.lit(0.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    got = {r["doc_id"] for r in weighted_sample_topk(df, "doc_id", "w", k=95).collect()}
    # exactly the 90 valid rows survive; no corrupt row outranks them
    assert got == set(range(10, 100))


def test_weighted_sample_rounded_priority_margin(spark):
    """The weighted_sample_docs oracle compares the selected id-set
    after rounding priorities to 6 decimals; that is only sound if no
    priority sits near a rounding boundary (cross-engine ln() drift is
    ~1e-16 relative). Pin the measured margin at >= 1e-11 absolute for
    every document at every sf — ~1e5 x the worst drift."""
    import math

    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        rows = con.execute(
            f"""
            SELECT ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|corpus_v1'), 1, 8))::UBIGINT::DOUBLE + 0.5)
                      / 4294967296::DOUBLE) / CAST(n_chars AS DOUBLE)
            FROM '/root/testdata/sf{sf}/documents.parquet'
            WHERE n_chars > 0
            """
        ).fetchall()
        margin = min(abs(p * 1e6 - math.floor(p * 1e6) - 0.5) for (p,) in rows) * 1e-6
        assert margin >= 1e-11, (sf, margin)


def test_weighted_sample_rounded_mode_same_set_as_raw(spark):
    """Rounding to 6 decimals is an engine-stability device, not a
    semantic change: on the documents corpus it selects the same 200
    ids as full-resolution priorities (boundary gaps far exceed the
    rounding step's reordering reach only when no two rows straddle a
    cell — verified by construction here)."""
    from hydraide_spark.functions.sampling import weighted_sample_topk
    from hydraide_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("w")
    )
    raw = {
        r["doc_id"]
        for r in weighted_sample_topk(docs, "doc_id", "w", k=200, salt="corpus_v1").collect()
    }
    rounded = {
        r["doc_id"]
        for r in weighted_sample_topk(
            docs, "doc_id", "w", k=200, salt="corpus_v1", priority_decimals=6
        ).collect()
    }
    assert raw == rounded


def test_temperature_mix_strata_cardinality_guard(spark):
    """Stratifying on a high-cardinality key must raise loudly instead
    of silently collecting an unbounded per-stratum map to the
    driver."""
    import pytest as _pytest

    from hydraide_spark.functions.sampling import temperature_mix_fractions

    df = spark.range(500).selectExpr("CAST(id AS STRING) AS stratum")
    with _pytest.raises(ValueError, match="distinct strata"):
        temperature_mix_fractions(df, "stratum", 0.5, max_strata=100)
    # bounded strata still work under the same cap
    ok = spark.range(500).selectExpr("CAST(id % 5 AS STRING) AS stratum")
    fr = temperature_mix_fractions(ok, "stratum", 0.5, max_strata=100)
    assert len(fr) == 5 and all(0 < v <= 1.0 for v in fr.values())


def test_mixing_plan_by_hand(spark):
    from hydraide_spark.functions.sampling import mixing_plan

    df = spark.createDataFrame(
        [("a", 100), ("a", 50), ("b", 10)], "source string, n_tok int"
    )
    rows = {
        r["source"]: r
        for r in mixing_plan(
            df, "source", "n_tok", {"a": 0.5, "b": 0.4, "c": 0.1}, 100
        ).collect()
    }
    a = rows["a"]
    assert (a["available_tokens"], a["planned_tokens"]) == (150, 50)
    assert a["sample_fraction"] == 50 / 150 and a["deficit_tokens"] == 0
    b = rows["b"]
    assert (b["available_tokens"], b["planned_tokens"]) == (10, 40)
    assert b["sample_fraction"] == 1.0 and b["deficit_tokens"] == 30
    c = rows["c"]  # target with no data
    assert (c["available_tokens"], c["planned_tokens"]) == (0, 10)
    assert c["sample_fraction"] == 0.0 and c["deficit_tokens"] == 10


def test_apply_mixing_plan_deficit_and_share_zero(spark):
    """Deficit strata (fraction 1 -> threshold 2^32 > every bucket)
    keep EVERY row; strata absent from targets (share 0) drop
    entirely; a budget-constrained stratum keeps a strict subset."""
    from hydraide_spark.functions.sampling import apply_mixing_plan

    rows = [(i, "a", 10) for i in range(40)] + [
        (100 + i, "b", 10) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")

    # huge budget: both targeted strata in deficit -> all rows kept
    out = apply_mixing_plan(
        df, "source", "n_tok", {"a": 0.5, "b": 0.5},
        token_budget=10**6, key_col="doc_id",
    )
    m = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert m == {"a": 40, "b": 5}

    # half budget on 'a' only: 'b' (share 0) drops; 'a' downsamples
    # (fraction 0.5 -> threshold 2^31; with 40 keys the kept count is
    # concentrated well inside (0, 40))
    out2 = apply_mixing_plan(
        df, "source", "n_tok", {"a": 1.0}, token_budget=200, key_col="doc_id"
    )
    m2 = {r["source"]: r["count"] for r in out2.groupBy("source").count().collect()}
    assert "b" not in m2
    assert 0 < m2.get("a", 0) < 40


def test_cluster_balanced_sample_quota(spark):
    """Quota semantics: dense clusters cap at per_cluster; sparse ones
    keep every row; pick ranks are 1..n per cluster; the cut never
    routes the corpus through one window partition (two_stage_topk —
    plan carries the two-stage shape, not a global window)."""
    import numpy as np

    from hydraide_spark.functions.sampling import cluster_balanced_sample

    rng = np.random.RandomState(0)
    rows = []
    # cluster 0: 30 rows near e0; cluster 1: 3 rows near e1
    for i in range(30):
        v = np.array([10.0, 0.0, 0.0, 0.0]) + rng.normal(0, 0.01, 4)
        rows.append((i, [float(x) for x in v]))
    for i in range(3):
        v = np.array([0.0, 10.0, 0.0, 0.0]) + rng.normal(0, 0.01, 4)
        rows.append((100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [10.0, 0.0, 0.0, 0.0]), (1, [0.0, 10.0, 0.0, 0.0])]
    out = cluster_balanced_sample(df, "vec_id", "embedding", cents, per_cluster=5)
    got = out.collect()
    by_cluster: dict = {}
    for r in got:
        by_cluster.setdefault(r.cluster, []).append(r.pick_rank)
    assert len(by_cluster[0]) == 5, "dense cluster must cap at quota"
    assert len(by_cluster[1]) == 3, "sparse cluster keeps every row"
    assert sorted(by_cluster[0]) == [1, 2, 3, 4, 5]
    assert sorted(by_cluster[1]) == [1, 2, 3]
    # determinism: same salt -> same picked set
    again = {r.vec_id for r in cluster_balanced_sample(
        df, "vec_id", "embedding", cents, per_cluster=5).collect()}
    assert again == {r.vec_id for r in got}


# --- trainable naive-Bayes language ID (r13) ----------------------------------


def test_langid_nb_learns_separable_languages(spark):
    from pyspark.sql import functions as F

    from hydraide_spark.functions.sampling import langid_nb_predict, langid_nb_train

    rows = []
    for i in range(30):
        rows.append((i, "xx", "der hund läuft schnell und der ball rollt"))
        rows.append((100 + i, "yy", "the dog runs fast and the ball rolls"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = langid_nb_train(df, "lang", "text", n_buckets=512, smoothing=0.1)
    assert model["labels"] == ["xx", "yy"]
    pred = langid_nb_predict(df, "doc_id", "text", model)
    got = {r.doc_id: r.predicted for r in pred.collect()}
    assert all(got[i] == "xx" for i in range(30))
    assert all(got[100 + i] == "yy" for i in range(30))
    # an unseen-vocabulary doc falls back to priors+unseen penalties —
    # deterministic, never an error
    probe = spark.createDataFrame([(999, "zzz qqq www")], "doc_id long, text string")
    assert langid_nb_predict(probe, "doc_id", "text", model).count() == 1


def test_langid_nb_empty_text_predicts_by_prior(spark):
    """Zero grams -> score = prior only; the majority label wins, and
    ties break toward the ASC label (exact decimal compares)."""
    from hydraide_spark.functions.sampling import langid_nb_predict, langid_nb_train

    rows = [(1, "aa", "foo bar"), (2, "aa", "foo baz"), (3, "bb", "qux zot")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = langid_nb_train(df, "lang", "text", n_buckets=64)
    probe = spark.createDataFrame([(9, "")], "doc_id long, text string")
    (r,) = langid_nb_predict(probe, "doc_id", "text", model).collect()
    assert r.predicted == "aa"  # prior 2/3 beats 1/3

    # exact tie (equal priors, empty text): ASC-label tiebreak
    even = spark.createDataFrame(
        [(1, "aa", "foo"), (2, "bb", "foo")], "doc_id long, lang string, text string"
    )
    m2 = langid_nb_train(even, "lang", "text", n_buckets=64)
    (r2,) = langid_nb_predict(probe, "doc_id", "text", m2).collect()
    assert r2.predicted == "aa"


def test_langid_nb_train_guards(spark):
    import pytest as _pytest

    from hydraide_spark.functions.sampling import langid_nb_train

    empty = spark.createDataFrame([], "doc_id long, lang string, text string")
    with _pytest.raises(ValueError, match="empty"):
        langid_nb_train(empty, "lang", "text")


def test_langid_nb_broadcast_equals_literal(spark):
    """r14 broadcast-model scoring path: decimal arithmetic is exactly
    associative, so regrouping the gram sum by bucket changes NOTHING —
    the two strategies must agree on every prediction, including the
    empty-text prior fallback and unseen-vocabulary docs."""
    from hydraide_spark.functions.sampling import (
        langid_nb_predict,
        langid_nb_train,
    )

    rows = []
    texts = {
        "de": "der hund läuft schnell und der ball rollt weit",
        "en": "the dog runs fast and the ball rolls far today",
        "fr": "le chien court vite et la balle roule loin",
        "es": "el perro corre rapido y la pelota rueda lejos",
        "it": "il cane corre veloce e la palla rotola lontano",
    }
    i = 0
    for lang, base in texts.items():
        for j in range(6):
            rows.append((i, lang, base + f" extra{j % 3}"))
            i += 1
    rows.append((900, "en", ""))  # empty text in the corpus too
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = langid_nb_train(df, "lang", "text", n_buckets=256, smoothing=0.5)
    probe = df.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(991, ""), (992, "zzz qqq unseen vocabulary entirely")],
            "doc_id long, text string",
        )
    )
    lit_pred = {
        r.doc_id: r.predicted
        for r in langid_nb_predict(
            probe, "doc_id", "text", model, strategy="literal"
        ).collect()
    }
    bc_pred = {
        r.doc_id: r.predicted
        for r in langid_nb_predict(
            probe, "doc_id", "text", model, strategy="broadcast"
        ).collect()
    }
    assert lit_pred == bc_pred
    assert len(lit_pred) == probe.count()


def test_langid_nb_large_label_count_routes_broadcast(spark):
    """r14 plan-size pin: at L=64/B=2048 the literal plan would carry
    131K decimal literals (the expression-tree-size trap); the default
    strategy must route to broadcast and its ANALYZED plan must stay
    O(1) in L·B (pinned: not ~10x the L=2 plan)."""
    from decimal import Decimal

    from hydraide_spark.functions.sampling import (
        LANGID_LITERAL_MAX_CELLS,
        langid_nb_predict,
    )

    def synth_model(L, B):
        q = Decimal("0.000000000001")
        return {
            "labels": [f"l{i:03d}" for i in range(L)],
            "priors": [Decimal(-i).quantize(q) for i in range(L)],
            "logprobs": {
                f"l{i:03d}": [
                    (Decimal(-(i + b % 7)) / 10).quantize(q) for b in range(B)
                ]
                for i in range(L)
            },
            "n_buckets": B,
            "salt": "",
            "method": "md5",
            "decimals": 12,
        }

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    big_model = synth_model(64, 2048)
    assert 64 * 2048 > LANGID_LITERAL_MAX_CELLS
    out = langid_nb_predict(df, "doc_id", "text", big_model)  # auto-routes
    plan_big = out._jdf.queryExecution().analyzed().toString()
    small = langid_nb_predict(
        df, "doc_id", "text", synth_model(2, 64), strategy="broadcast"
    )
    plan_small = small._jdf.queryExecution().analyzed().toString()
    # model constants are DATA, not expression nodes: the plan text may
    # not blow up with the model (the literal path's would be ~100x)
    assert len(plan_big) < 10 * max(1, len(plan_small))
    assert out.count() == 2


def test_langid_nb_broadcast_exact_at_sub_ulp_score_gaps(spark):
    """r15 ADVICE regression: sum over decimal(32,12) yields (38,12),
    and prior(20,12) + that needs precision 39 — pre-fix Spark reduced
    the add to (38,11) and HALF_UP-rounded the 12th scale digit, so
    two labels whose exact scores differ only at the 12th decimal
    could TIE after rounding and flip the argmax to the lower-index
    label. Crafted model: score(a)=6e-12, score(b)=1.4e-11 — both
    round to 1e-11 at scale 11, tying in favor of 'a'; the exact
    arithmetic (and the literal strategy) picks 'b'."""
    from decimal import Decimal

    from hydraide_spark.functions.sampling import langid_nb_predict

    q = Decimal("0.000000000001")
    B = 8
    model = {
        "labels": ["a", "b"],
        "priors": [Decimal(0).quantize(q), Decimal(0).quantize(q)],
        "logprobs": {
            # same value in every bucket: the doc's gram hash is
            # irrelevant, only the count (exactly 1 gram) matters
            "a": [Decimal("6e-12").quantize(q)] * B,
            "b": [Decimal("1.4e-11").quantize(q)] * B,
        },
        "n_buckets": B,
        "salt": "",
        "method": "md5",
        "decimals": 12,
    }
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    lit = langid_nb_predict(df, "doc_id", "text", model, strategy="literal")
    bc = langid_nb_predict(df, "doc_id", "text", model, strategy="broadcast")
    assert [r.predicted for r in lit.collect()] == ["b"]
    assert [r.predicted for r in bc.collect()] == ["b"]
