"""Golden queries: hybrid retrieval — reciprocal-rank fusion of the
BM25 lexical ranking and the dense cosine ranking over the same corpus
(documents ⟷ embeddings aligned on doc_id = vec_id).

The oracle replays BOTH rankings and the fusion arithmetic exactly:
BM25 term scores round to 6 decimals and sum as DECIMAL (rank order
cannot drift), cosine is the same sequential double fold pinned by the
*_stable ANN oracles, and 1/(k0+rank) + 1/(k0+rank) is two correctly-
rounded divisions added in list order — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.retrieval import ranked_list, rrf_fuse
from . import golden
from ._util import big, t
from .vectors import _cos_sql, _query_vec

_BM25_LEX_SQL = """
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word IN ('stream', 'data', 'query')
      GROUP BY doc_id, word
    ),
    dfreq AS (SELECT word, COUNT(*) AS dfreq FROM tf GROUP BY word),
    term AS (
      SELECT tf.doc_id,
             CAST(round(
               ln(1.0::DOUBLE + (n_docs - dfreq + 0.5::DOUBLE) / (dfreq + 0.5::DOUBLE))
               * (tf * 2.2::DOUBLE)
               / (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)),
               6) AS DECIMAL(28,6)) AS term_score
      FROM tf
      JOIN dfreq USING (word)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    ),
    lex_scored AS (
      SELECT doc_id, SUM(term_score) AS score FROM term GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, rn AS rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
        FROM lex_scored
      ) WHERE rn <= 50
    )
"""


@golden(
    "hybrid_search_rrf",
    oracle=f"""
    WITH {_BM25_LEX_SQL},
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    dense_scored AS (
      SELECT e.vec_id AS doc_id,
             {_cos_sql('e.embedding::DOUBLE[]', 'q.qv')} AS score
      FROM embeddings e, q
    ),
    dense AS (
      SELECT doc_id, rn AS rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
        FROM dense_scored
      ) WHERE rn <= 50
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             CAST(l.rank AS BIGINT) AS rank_0,
             CAST(d.rank AS BIGINT) AS rank_1,
             (CASE WHEN l.rank IS NOT NULL
                   THEN 1.0::DOUBLE / (60.0::DOUBLE + l.rank) ELSE 0.0::DOUBLE END)
             + (CASE WHEN d.rank IS NOT NULL
                     THEN 1.0::DOUBLE / (60.0::DOUBLE + d.rank) ELSE 0.0::DOUBLE END)
               AS rrf
      FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, rank_0, rank_1, rrf FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS rn
      FROM fused
    ) WHERE rn <= 20
    """,
)
def hybrid_search_rrf(spark, sf_dir):
    """Hybrid search: BM25 (bag {stream,data,query}, k1=1.2, b=0.75,
    exact-decimal sums) top-50 fused with dense cosine (query = doc 0's
    embedding, the corpus-aligned vec_id) top-50 via reciprocal-rank
    fusion (k0=60), top-20 returned. The two candidate generators keep
    their scale plans (postings equi-join; broadcast-query brute force
    with LSH/IVF drop-ins); fusion itself joins two ≤50-row lists —
    broadcast-sized at any corpus size. rank_0 = lexical, rank_1 =
    dense; a doc missing from a list contributes 0 to rrf."""
    from ..functions.text import bm25_terms

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")

    lex_scored = (
        bm25_terms(docs, "doc_id", "text", ["stream", "data", "query"])
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    lex = ranked_list(lex_scored, "doc_id", "score", topk=50)

    qv = _query_vec(spark, sf_dir, 0)
    from ..query.filters import cosine_similarity

    dense_scored = emb.select(
        F.col("vec_id").alias("doc_id"),
        cosine_similarity(
            F.col("embedding"),
            F.array(*[F.lit(x) for x in qv]).cast("array<double>"),
        ).alias("score"),
    )
    dense = ranked_list(dense_scored, "doc_id", "score", topk=50)

    fused = rrf_fuse([lex, dense], id_col="doc_id", k0=60, topk=20)
    return fused.select(
        big("doc_id").alias("doc_id"), "rank_0", "rank_1", "rrf"
    )
