"""Skew hardening for the near-dup verify joins (r10 VERDICT #5).

The verify join fetches both pair members' shingle sets by id
equi-join; ONE boilerplate document that near-dups a large slice of
the corpus makes its id a hot key — every pair it belongs to lands on
one reducer ("full shuffle on a skewed key", the CLAUDE.md killer).
Pins, on the REAL operator shapes:

- AQE's skew-join split ENGAGES on the verify join under a
  deliberately skewed corpus (SortMergeJoin(skew=true) in the final
  adaptive plan),
- salting (the plan-level guard, wired as ``n_salts``) preserves the
  pair set exactly,
- salting provably bounds the worst reducer: max rows per shuffle
  partition drops by ~n_salts on a hot-key frame.

The ×30 measured record (worst/median task and wall, AQE vs salted)
is tools/skew_stress.py → BENCH_skew.json, summarized in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hydraide_spark.functions.dedup import minhash_neardup_pairs, ngram_jaccard_pairs


def _skewed_corpus(spark, n_family=250, n_other=80):
    """One near-identical boilerplate family (same 12-token template,
    one unique trailing token — NOT byte-identical, so exact-set
    collapse cannot absorb it) plus unrelated filler docs."""
    base = "terms of service apply to all users of this web site today"
    rows = [(i, f"{base} t{i}") for i in range(n_family)]
    rows += [
        (10_000 + j, f"doc {j} unique words alpha{j} beta{j} gamma{j} delta{j}")
        for j in range(n_other)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_salted_verify_join_preserves_pairs(spark):
    df = _skewed_corpus(spark, n_family=60, n_other=30)
    plain = {
        (r["id_a"], r["id_b"], r["inter"], r["union"])
        for r in ngram_jaccard_pairs(df, tau=0.8, n=3).collect()
    }
    salted = {
        (r["id_a"], r["id_b"], r["inter"], r["union"])
        for r in ngram_jaccard_pairs(df, tau=0.8, n=3, n_salts=8).collect()
    }
    assert plain and salted == plain
    plain_mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_neardup_pairs(df, tau=0.8, n=3, k=16, bands=4).collect()
    }
    salted_mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_neardup_pairs(
            df, tau=0.8, n=3, k=16, bands=4, n_salts=8
        ).collect()
    }
    assert plain_mh and salted_mh == plain_mh


def test_salting_bounds_worst_reducer(spark):
    """The deterministic skew metric: a hot join key owns max-partition
    ≈ its row count under plain hash partitioning; salting divides the
    hot key over n_salts sub-keys."""
    n_hot, n_salts, parts = 8000, 8, 16
    cand = spark.range(n_hot + 1000).select(
        F.when(F.col("id") < n_hot, F.lit(7)).otherwise(F.col("id")).alias("id_a")
    )

    def max_part(df, *keys):
        counts = (
            df.repartition(parts, *[F.col(k) for k in keys])
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .collect()
        )
        return max(r["count"] for r in counts)

    plain = max_part(cand, "id_a")
    from hydraide_spark.operators.skew import SALT_COL

    salted = max_part(
        cand.withColumn(
            SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
        ),
        "id_a",
        SALT_COL,
    )
    assert plain >= n_hot  # the hot key really is one reducer's load
    assert salted <= plain / (n_salts / 2)  # spread over the salt space


def test_aqe_skew_split_engages_on_verify_join(spark):
    """The single-hot-key shape the crawl ingest produces: ONE
    persisted boilerplate doc pairs with every new doc, so the
    candidate frame carries one dominant id_a. (The batch self-pair
    path spreads a family triangularly over its member ids — many warm
    keys, which plain hash partitioning already balances; the
    streaming probe is where one literal key goes hot.) With broadcast
    disabled (at scale the shingle side is corpus-sized) and
    test-scale skew thresholds, the verify join — `_verify_pair_join`,
    the one implementation both near-dup paths call — must finalize
    with SortMergeJoin(skew=true): the runtime guard fires on the real
    operator."""
    from hydraide_spark.functions.dedup import _verify_pair_join, shingles

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n_new = 6000
        docs = spark.range(n_new + 1).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(
                    "terms of service apply to all users of this very "
                    "large web site operated by the company in question "
                ),
                F.lit("suffix "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        sizes = docs.select(
            F.col("doc_id"),
            shingles(F.col("text"), 3).alias("sh"),
        ).select(F.col("doc_id"), F.col("sh"), F.size("sh").alias("n_sh"))
        # the ingest-probe candidate shape: hot persisted doc 0 vs
        # (nearly) all new docs. The hot id must be DATA-dependent —
        # a literal 0 constant-folds into a pushed filter on the
        # shingle side and the join skew disappears from the plan.
        cand = spark.range(1, n_new + 1).select(
            F.when(F.col("id") % 24 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .cast("long")
            .alias("id_a"),
            F.col("id").alias("id_b"),
        ).filter(F.col("id_a") != F.col("id_b"))
        out = _verify_pair_join(cand, sizes, "doc_id", num=4, den=5)
        rows = out.collect()  # finalize the adaptive plan
        assert len(rows) > n_new * 0.9  # hub pairs all pass tau=0.8
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
