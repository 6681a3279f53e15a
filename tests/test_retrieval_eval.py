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
