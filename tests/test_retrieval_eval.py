"""Hand-computed fixture for retrieval_eval (recall@k / MRR@k /
NDCG@k): every expected number below is derived by hand from the
definitions — gains 2^grade−1, discounts 1/log2(rank+1) quantized to
12 decimals (functions.retrieval.dcg_denominators), ideal ranking =
grades desc over the judged-relevant set.
"""

from __future__ import annotations

from decimal import Decimal

from hydraide_spark.functions.retrieval import dcg_denominators, retrieval_eval

D2 = Decimal("0.630929753571")  # rank-2 discount
D3 = Decimal("0.500000000000")  # rank-3 discount


def test_denominators_are_quantized_decimals():
    ds = dcg_denominators(3)
    assert ds == ["1.000000000000", str(D2), str(D3)]


def test_metrics_match_hand_computation(spark):
    ranked = spark.createDataFrame(
        # q1: d1@1 (g3), d5@2 (unjudged), d3@3 (g2), d7@4 (beyond k)
        [(1, 1, 1), (1, 5, 2), (1, 3, 3), (1, 7, 4),
         # q2: only query with no relevant label -> dropped from output
         (2, 1, 1),
         # q3: ranked list misses every relevant doc
         (3, 50, 1), (3, 51, 2)],
        "query_id int, doc_id int, rank int",
    )
    labels = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 1), (1, 3, 2), (1, 9, 0),
         (2, 4, 0),
         (3, 6, 2)],
        "query_id int, doc_id int, grade int",
    )
    rows = {
        r["query_id"]: r
        for r in retrieval_eval(ranked, labels, k=3).collect()
    }
    assert set(rows) == {1, 3}  # q2 has no relevant judgment

    q1 = rows[1]
    assert q1["n_rel"] == 3 and q1["hits_at_k"] == 2
    assert q1["recall_at_k"] == 2.0 / 3.0
    assert q1["mrr_at_k"] == 1.0
    # dcg = 7*1 + 3*0.5 = 8.5 ; idcg = 7*1 + 3*D2 + 1*D3
    dcg = Decimal(7) + Decimal(3) * D3
    idcg = Decimal(7) + Decimal(3) * D2 + Decimal(1) * D3
    assert q1["dcg_at_k"] == dcg
    assert q1["idcg_at_k"] == idcg
    assert q1["ndcg_at_k"] == round(float(dcg) / float(idcg), 10)

    q3 = rows[3]
    assert q3["hits_at_k"] == 0 and q3["recall_at_k"] == 0.0
    assert q3["mrr_at_k"] == 0.0 and q3["ndcg_at_k"] == 0.0
    assert q3["dcg_at_k"] == Decimal(0)
    assert q3["idcg_at_k"] == Decimal(3)  # grade 2 at ideal rank 1


def test_rank_beyond_k_excluded_and_grade_zero_is_irrelevant(spark):
    # d7 sits at rank 4 with grade 3 — k=3 must ignore it; a judged
    # grade-0 doc inside top-k must not count as a hit.
    ranked = spark.createDataFrame(
        [(1, 9, 1), (1, 7, 4)], "query_id int, doc_id int, rank int"
    )
    labels = spark.createDataFrame(
        [(1, 7, 3), (1, 9, 0)], "query_id int, doc_id int, grade int"
    )
    row = retrieval_eval(ranked, labels, k=3).collect()[0]
    assert row["hits_at_k"] == 0 and row["mrr_at_k"] == 0.0
    assert row["dcg_at_k"] == Decimal(0)
    assert row["idcg_at_k"] == Decimal(7)


def test_compare_runs_outcomes(spark):
    from hydraide_spark.functions.retrieval import compare_retrieval_runs

    labels = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 1), (2, 5, 2)],
        "query_id int, doc_id int, grade int",
    )
    # run A finds q1's best doc at rank 1; run B finds it at rank 2.
    # On q2 both miss everything -> TIE at zero.
    run_a = spark.createDataFrame(
        [(1, 1, 1), (1, 9, 2), (2, 8, 1)],
        "query_id int, doc_id int, rank int",
    )
    run_b = spark.createDataFrame(
        [(1, 9, 1), (1, 1, 2), (2, 8, 1)],
        "query_id int, doc_id int, rank int",
    )
    rows = {
        r["query_id"]: r
        for r in compare_retrieval_runs(run_a, run_b, labels, k=3).collect()
    }
    q1 = rows[1]
    assert q1["recall_outcome"] == "TIE"  # same hit set
    assert q1["mrr_outcome"] == "WIN_A" and q1["mrr_a"] == 1.0 and q1["mrr_b"] == 0.5
    assert q1["ndcg_outcome"] == "WIN_A"  # rank-1 beats rank-2 discount
    q2 = rows[2]
    assert (
        q2["recall_outcome"] == q2["mrr_outcome"] == q2["ndcg_outcome"] == "TIE"
    )
    assert q2["ndcg_a"] == q2["ndcg_b"] == 0.0


def test_sign_test_table_exact_values():
    """Exact two-sided binomial sign-test values, pinned against
    hand-computed fractions (denominator 2^n — finite decimals)."""
    from hydraide_spark.functions.retrieval import sign_test_p_table

    t = sign_test_p_table(10)
    assert t[(8, 0)] == "0.007812500000"  # 2*1/256
    assert t[(8, 1)] == "0.070312500000"  # 2*9/256
    assert t[(10, 1)] == "0.021484375000"  # 2*11/1024
    assert t[(5, 2)] == "1.000000000000"  # clamped at 1
    assert t[(0, 0)] == "1.000000000000"  # all-ties degenerate case


def test_retrieval_sign_test_macro_verdict(spark):
    """8 paired queries where B wins every non-tied comparison: MRR
    has n_eff=8, m=0 -> p=0.0078 < 0.05 -> winner B; recall is all
    ties -> n_eff=0, p=1, NONE. Counts/n are exact integers and the
    p-values are the injected driver-quantized literals."""
    from hydraide_spark.functions.retrieval import retrieval_sign_test

    # one relevant doc (id q) per query; A ranks it 2nd, B ranks it 1st
    labels = spark.createDataFrame(
        [(q, q, 1) for q in range(8)], "query_id int, doc_id int, grade int"
    )
    run_a = spark.createDataFrame(
        [(q, 100 + q, 1) for q in range(8)]
        + [(q, q, 2) for q in range(8)],
        "query_id int, doc_id int, rank int",
    )
    run_b = spark.createDataFrame(
        [(q, q, 1) for q in range(8)]
        + [(q, 100 + q, 2) for q in range(8)],
        "query_id int, doc_id int, rank int",
    )
    rows = {
        r["metric"]: r
        for r in retrieval_sign_test(run_a, run_b, labels, k=3).collect()
    }
    mrr = rows["mrr"]
    assert (mrr["wins_a"], mrr["wins_b"], mrr["ties"]) == (0, 8, 0)
    assert mrr["n_effective"] == 8
    assert mrr["p_value"] == 0.0078125
    assert mrr["significant_winner"] == "B"
    # both runs retrieve the one relevant doc within k -> recall ties
    rec = rows["recall"]
    assert (rec["wins_a"], rec["wins_b"], rec["ties"]) == (0, 0, 8)
    assert rec["n_effective"] == 0
    assert rec["p_value"] == 1.0 and rec["significant_winner"] == "NONE"
    # NDCG follows MRR here (rank-1 discount beats rank-2)
    assert rows["ndcg"]["significant_winner"] == "B"


def test_param_sweep_best_selection_and_one_pass(spark):
    """rrf_param_sweep: exactly one is_best row (max NDCG sum, ties to
    the smaller k0); per-k0 rows cover the literal grid; and the joined
    candidate frame appears ONCE in the plan as a cached reuse (the
    one-candidate-pass claim — grid points must not re-scan)."""
    from hydraide_spark.functions.retrieval import rrf_param_sweep

    labels = spark.createDataFrame(
        [(q, q, 1) for q in range(4)], "query_id int, doc_id int, grade int"
    )
    la = spark.createDataFrame(
        [(q, q, 2) for q in range(4)] + [(q, 50 + q, 1) for q in range(4)],
        "query_id int, doc_id int, rank int",
    )
    lb = spark.createDataFrame(
        [(q, q, 1) for q in range(4)] + [(q, 50 + q, 2) for q in range(4)],
        "query_id int, doc_id int, rank int",
    )
    out = rrf_param_sweep([la, lb], labels, [5, 60], k=2)
    rows = {r["k0"]: r for r in out.collect()}
    assert sorted(rows) == [5, 60]
    assert sum(1 for r in rows.values() if r["is_best"]) == 1
    # identical metrics across k0 here (same fused order) -> tiebreak
    # must pick the smaller k0
    if rows[5]["sum_ndcg"] == rows[60]["sum_ndcg"]:
        assert rows[5]["is_best"] and not rows[60]["is_best"]
    for r in rows.values():
        assert r["n_queries"] == 4


def test_mmr_lambda_sweep_rejects_non_dyadic(spark):
    import pytest as _pytest

    from hydraide_spark.functions.retrieval import mmr_lambda_sweep

    cand = spark.createDataFrame(
        [(0, 1, 1.0, [1.0, 0.0])],
        "query_id long, doc_id long, rel double, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="dyadic"):
        mmr_lambda_sweep(cand, k=1, lam_grid=[0.3])


def test_mmr_lambda_sweep_extremes(spark):
    """λ=1 ranks purely by relevance (ties id-asc); λ-variation can
    only reorder AFTER the first pick (first pick is always the max-rel
    candidate)."""
    from hydraide_spark.functions.retrieval import mmr_lambda_sweep

    # two near-identical top docs + one diverse lower-rel doc
    rows = [
        (0, 1, 0.99, [1.0, 0.0]),
        (0, 2, 0.98, [1.0, 0.001]),
        (0, 3, 0.50, [0.0, 1.0]),
    ]
    cand = spark.createDataFrame(
        rows,
        "query_id long, doc_id long, rel double, embedding array<double>",
    )
    out = mmr_lambda_sweep(cand, k=3, lam_grid=[0.125, 1.0]).collect()
    by_lam = {}
    for r in out:
        by_lam.setdefault(r["lam_num"], {})[r["mmr_rank"]] = r["doc_id"]
    assert by_lam[8] == {1: 1, 2: 2, 3: 3}  # pure relevance order
    # heavy diversity weight: the diverse doc 3 jumps ahead of near-dup 2
    assert by_lam[1] == {1: 1, 2: 3, 3: 2}


def test_closed_loop_tuning_sweep_then_sign_test(spark):
    """The r10 tuning loop end to end: sweep k0 over one candidate
    pass, pick the engine-stable best, then A/B-validate the chosen
    configuration against a baseline with the exact sign test — the
    workflow a retrieval stack actually runs. Construction: list A is
    informative (relevant doc first for every query), list B is
    anti-informative; small k0 weights rank-1 agreement more, so the
    sweep must prefer the smallest k0, and fusing with the chosen k0
    must significantly beat a B-only run under the sign test."""
    from hydraide_spark.functions.retrieval import (
        retrieval_sign_test,
        rrf_fuse,
        rrf_param_sweep,
    )

    n_q = 8
    labels = spark.createDataFrame(
        [(q, q, 1) for q in range(n_q)], "query_id int, doc_id int, grade int"
    )
    la = spark.createDataFrame(
        [(q, q, 1) for q in range(n_q)] + [(q, 100 + q, 2) for q in range(n_q)],
        "query_id int, doc_id int, rank int",
    )
    lb = spark.createDataFrame(
        [(q, 100 + q, 1) for q in range(n_q)] + [(q, q, 2) for q in range(n_q)],
        "query_id int, doc_id int, rank int",
    )
    sweep = rrf_param_sweep([la, lb], labels, [5, 60, 240], k=1)
    best = [r for r in sweep.collect() if r["is_best"]]
    assert len(best) == 1
    best_k0 = best[0]["k0"]
    # k=1 cut: only the fused rank-1 doc counts; smaller k0 sharpens
    # the rank-1-vs-rank-2 contrast but every k0 ranks A's doc first
    # here, so NDCG ties across the grid — the tiebreak contract picks
    # the SMALLEST k0 deterministically
    assert best_k0 == 5

    fused = rrf_fuse(
        [la, lb], id_col="doc_id", k0=best_k0, topk=1, group_col="query_id"
    )
    from pyspark.sql import functions as F

    run_best = fused.select(
        "query_id", "doc_id", F.lit(1).cast("int").alias("rank")
    )
    verdict = {
        r["metric"]: r
        for r in retrieval_sign_test(run_best, lb, labels, k=1).collect()
    }
    # the tuned fusion finds the relevant doc at rank 1 for all 8
    # queries; the anti-informative baseline never does -> A wins 8/8,
    # p = 2/256 < 0.05
    m = verdict["mrr"]
    assert (m["wins_a"], m["wins_b"]) == (8, 0)
    assert m["significant_winner"] == "A"


def test_mmr_rerankers_accept_string_ids(spark):
    """Output schemas derive from the candidates frame's own types —
    string query/doc ids (the standard IR run-file shape) must work."""
    from hydraide_spark.functions.retrieval import (
        mmr_lambda_sweep,
        mmr_rerank,
        mmr_rerank_batch,
    )

    cand = spark.createDataFrame(
        [
            ("q1", "docA", 0.9, [1.0, 0.0]),
            ("q1", "docB", 0.8, [0.0, 1.0]),
            ("q2", "docC", 0.7, [1.0, 0.0]),
        ],
        "query_id string, doc_id string, rel double, embedding array<double>",
    )
    single = mmr_rerank(
        cand.filter("query_id = 'q1'").drop("query_id"), k=2
    ).collect()
    assert {r["doc_id"] for r in single} == {"docA", "docB"}
    batch = mmr_rerank_batch(cand, k=2).collect()
    assert {(r["query_id"], r["doc_id"]) for r in batch} == {
        ("q1", "docA"), ("q1", "docB"), ("q2", "docC"),
    }
    sweep = mmr_lambda_sweep(cand, k=2, lam_grid=[0.5]).collect()
    assert all(isinstance(r["doc_id"], str) for r in sweep)


def test_hard_negative_mining_excludes_positives(spark):
    """Gold positives never leak into the negative set; labeled and
    auto (pseudo) positives combine; ranks are dense 1..k over the
    survivors."""
    from hydraide_spark.functions.retrieval import hard_negative_mining

    docs = spark.createDataFrame(
        [
            (1, "stream data query engine"),
            (2, "stream data query"),
            (3, "stream data"),
            (4, "stream query plan"),
            (5, "data stream"),
            (6, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    bags = [(0, ["stream", "data", "query"])]
    pos = spark.createDataFrame([(0, 2)], "query_id long, doc_id long")

    out = hard_negative_mining(docs, bags, k=3, positives=pos).collect()
    ids = [r.doc_id for r in sorted(out, key=lambda r: r.neg_rank)]
    assert 2 not in ids, "labeled positive leaked into negatives"
    assert [r.neg_rank for r in sorted(out, key=lambda r: r.neg_rank)] == [1, 2, 3]
    assert 6 not in ids, "doc with no query term cannot be a candidate"

    # auto-positives: the GLOBAL BM25 top-1 (doc 2 — the exact-match
    # shortest doc) is the pseudo-positive; with no labels it must drop
    auto = hard_negative_mining(docs, bags, k=3, n_auto_positives=1).collect()
    auto_ids = {r.doc_id for r in auto}
    assert 2 not in auto_ids, "pseudo-positive (global top-1) must drop"
    # labeled + auto combine: label 5 removes doc 5 as well
    both = hard_negative_mining(
        docs,
        bags,
        k=3,
        positives=spark.createDataFrame([(0, 5)], "query_id long, doc_id long"),
        n_auto_positives=1,
    ).collect()
    both_ids = {r.doc_id for r in both}
    assert 2 not in both_ids and 5 not in both_ids


def test_prf_expansion_terms_and_search(spark):
    """Expansion picks the most frequent FRESH tokens from the
    feedback docs (originals excluded, word-asc tiebreak), and the
    expanded search can retrieve a doc that shares no original term
    with the query (the recall lever PRF exists for)."""
    from hydraide_spark.functions.retrieval import (
        prf_expanded_search,
        prf_expansion_terms,
    )

    docs = spark.createDataFrame(
        [
            (1, "stream data query topic alpha alpha"),
            (2, "stream data query topic alpha"),
            (3, "stream data topic"),
            (4, "topic alpha only here"),
            (5, "unrelated entirely words"),
        ],
        "doc_id long, text string",
    )
    bags = [(0, ["stream", "data", "query"])]
    exp = prf_expansion_terms(docs, bags, k_docs=3, n_terms=2).collect()
    got = [(r.word, r.fb_count) for r in sorted(exp, key=lambda r: r.term_rank)]
    # feedback set = docs 1,2,3; fresh counts: topic 3, alpha 3 -> word-asc tie
    assert got == [("alpha", 3), ("topic", 3)]

    out = prf_expanded_search(docs, bags, k=5, k_docs=3, n_terms=2)
    ids = {r.doc_id for r in out.collect()}
    assert 4 in ids, "doc sharing only EXPANSION terms must be retrievable"
    assert 5 not in ids
