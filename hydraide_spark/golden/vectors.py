"""Golden queries: vector similarity filter, exact ANN top-k, LSH ANN,
embedding near-dup (SURVEY.md §2.2 VectorFilter + beyond-parity
similarity search).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.vector import cosine_topk, ivf_topk, lsh_topk, train_ivf_centroids
from ..functions.dedup import embedding_neardup_pairs
from ..query import VectorSim, translate
from ..query.filters import cosine_similarity
from . import golden
from ._util import big, frame_memo, memo_golden, parallelize_small, t


#: deterministic-model memo (the langid_nb convention): every trainer
#: here is a pure function of (sf_dir, params) — hash-bounded samples,
#: fixed seeds/iterations, exact decimal sums — so sibling goldens and
#: repeat bench passes share ONE training per process; the queries
#: measure SERVING, not a redundant re-train
_MODEL_MEMO: dict = {}


def _model_memo(key, fn):
    if key not in _MODEL_MEMO:
        _MODEL_MEMO[key] = fn()
    return _MODEL_MEMO[key]


def _cos_sql(a: str, b: str) -> str:
    """Cosine in DuckDB with the same operand structure as
    query.filters.cosine_similarity: dot / (sqrt(dot(a,a)) *
    sqrt(dot(b,b))), all sequential double folds."""
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _query_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    # an input constant (point lookup on the immutable fixture) — one
    # bounded job per process per (sf_dir, vec_id), the memo convention
    def _fetch():
        row = (
            t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == vec_id)
            .select("embedding")
            .head()
        )
        return [float(x) for x in row["embedding"]]

    return _model_memo(("query_vec", sf_dir, vec_id), _fetch)


@golden(
    "vector_filter",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             {_cos_sql('e.embedding::DOUBLE[]', 'q.qv')} AS score
      FROM embeddings e, q
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, round(score, 4) AS score
    FROM scored WHERE score >= 0.25
    """,
)
def vector_filter(spark, sf_dir):
    """VectorFilter (filter.go:594-645): cosine >= MinSimilarity against
    a query vector, score emitted. Thresholds chosen with >= 1e-4 margin
    from every row's score (verified over all sfs), so engine float
    noise cannot flip membership."""
    emb = t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    vs = VectorSim("embedding", qv, 0.25, normalize=True)
    from ..functions.vector import _sql_doubles

    score = cosine_similarity(
        "`embedding`", f"CAST(array({_sql_doubles(qv)}) AS ARRAY<DOUBLE>)"
    )
    return (
        emb.filter(translate(vs, emb))
        .select(big("vec_id").alias("vec_id"), F.round(score, 4).alias("score"))
    )


@golden(
    "ann_topk_exact",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_cos_sql('e.embedding::DOUBLE[]', 'q.qv')} AS score
      FROM embeddings e, q
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           round(score, 4) AS score
    FROM ranked WHERE rn <= 10
    """,
)
def ann_topk_exact(spark, sf_dir):
    """Brute-force cosine top-k (the ANN correctness baseline): 5 query
    vectors broadcast against the corpus, window top-10 per query.
    Rank-10/11 score gaps verified >= 2e-5 across sfs, far above
    cross-engine float noise."""
    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb, queries, k=10)
    return out.select(
        big("query_id").alias("query_id"),
        big("vec_id").alias("vec_id"),
        F.round("score", 4).alias("score"),
    )


@golden(
    "ann_topk_auto",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_cos_sql('e.embedding::DOUBLE[]', 'q.qv')} AS score
      FROM embeddings e, q
    ),
    ranked AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(rn AS INT) AS rank,
           'exact' AS route
    FROM ranked WHERE rn <= 10
    """,
)
def ann_topk_auto(spark, sf_dir):
    """r11: the auto-routed ANN entry point (functions/vector.py::
    ann_topk_auto — the reference's bucket-planner idea,
    bucket_planner.go:55-123, lifted to ANN: cheapest route whose
    accuracy envelope covers the corpus size wins). At every gate sf
    the corpus is under ANN_EXACT_MAX_ROWS, so the router must select
    the exact brute-force path — the oracle IS the exact ranking plus
    the route decision itself ('exact'), making a silent mis-route a
    gate failure. The approximate regimes' plan shapes and recall
    floors are pinned in tests/test_ann_router.py."""
    from ..functions.vector import ann_topk_auto as _auto

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = _auto(emb, queries, k=10)
    return out.select(
        big("query_id").alias("query_id"),
        big("vec_id").alias("vec_id"),
        F.col("rank"),
        F.col("route"),
    )


@golden(
    "ann_topk_filtered",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_cos_sql('e.embedding::DOUBLE[]', 'q.qv')} AS score
      FROM embeddings e, q
      WHERE e.label <= 4
    ),
    ranked AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(rn AS INT) AS rank,
           'prefilter:exact' AS route
    FROM ranked WHERE rn <= 10
    """,
)
def ann_topk_filtered(spark, sf_dir):
    """r12: filtered ANN — the reference's flagship serving pattern
    (proto/hydraide.proto:2685-2687 scalar pre-filter + vector scan;
    query-engine.md:76 cheap-before-expensive) composed from the
    FilterGroup algebra and the ANN route planner
    (functions/filtered_ann.py). At gate scale the survivor set is
    tiny, so the selectivity decision must pick prefilter and the
    routed subset must take the exact path — the oracle IS the exact
    filtered ranking PLUS both decisions ('prefilter:exact'), making a
    silent mis-route a gate failure. The postfilter refill loop's
    recall floor and predicate pushdown are pinned in
    tests/test_filtered_ann.py."""
    from ..functions.filtered_ann import ann_topk_filtered as _filtered
    from ..query.filters import Cmp, Op

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = _filtered(emb, Cmp("label", Op.LE, 4), queries, k=10)
    return out.select(
        big("query_id").alias("query_id"),
        big("vec_id").alias("vec_id"),
        F.col("rank"),
        F.col("route"),
    )


@golden("ann_topk_lsh")  # approximate: rows-only check (recall < 1 by design)
def ann_topk_lsh(spark, sf_dir):
    """LSH-bucketed ANN (the 100 TB path): candidates share the query's
    random-hyperplane bucket; exact re-rank within candidates. Recall is
    probabilistic, so no SQL oracle — the driver records rows-only; the
    recall floor vs exact top-k is asserted in tests/test_vectors.py."""
    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(emb, queries, k=10, dim=64, n_bits=6)
    return out.select(
        big("query_id").alias("query_id"),
        big("vec_id").alias("vec_id"),
        F.round("score", 4).alias("score"),
    )


@golden(
    "embedding_neardup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
               x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS emb
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.emb, b.emb) AS score
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(score, 4) AS score
    FROM pairs WHERE score >= 0.40
    """,
)
@memo_golden("embedding_neardup")
def embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked on the label column
    (cluster id): candidate generation is an equi-join on the block, not
    a cross join — the shape that survives 100 TB. Vectors are
    L2-normalized BEFORE the join (one norm per row, one dot per pair).
    Threshold margin >= 1.2e-4 verified across sfs."""
    from ._util import parallelize_small

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    out = embedding_neardup_pairs(emb, tau=0.40, block_col="label")
    return out.select(
        big("id_a").alias("id_a"),
        big("id_b").alias("id_b"),
        F.round("score", 4).alias("score"),
    )


@golden("ann_topk_ivf")  # approximate: rows-only check (recall < 1 by design)
@memo_golden("ann_topk_ivf")
def ann_topk_ivf(spark, sf_dir):
    """IVF-bucketed ANN (the partition-pruned 100 TB path): spherical
    k-means cells trained driver-side on a bounded deterministic sample,
    corpus assigned to its nearest cell (a write-time partition key at
    scale), queries probe nprobe=2 cells, exact cosine re-rank within
    candidates. Probabilistic recall — rows-only; the recall floor vs
    exact top-k is asserted in tests/test_dedup.py."""
    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    centroids = _model_memo(("ivf8", sf_dir), lambda: train_ivf_centroids(emb, n_centroids=8))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(emb, queries, k=10, centroids=centroids, nprobe=2)
    return out.select(
        big("query_id").alias("query_id"),
        big("vec_id").alias("vec_id"),
        F.round("score", 4).alias("score"),
    )


@golden(
    "label_centroid_sums",
    oracle="""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(i AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9)))
                AS DOUBLE), 6) AS s
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    GROUP BY label, i
    """,
)
def label_centroid_sums(spark, sf_dir):
    """Per-label embedding centroid sums (functions/vector.py::
    group_centroid_sums) — exact long-form vector aggregation: each
    component is cast to DECIMAL before summing so the result is
    order/partitioning-independent. The compared sum rounds to 6
    decimals as a second belt: the summand quantization itself is now
    boundary-proof — r8 switched group_centroid_sums to bround
    (shortest-repr HALF_EVEN, bit-for-bit DuckDB's native
    double→DECIMAL cast) after a coarse-dyadic tie (0.1494140625)
    split Spark's HALF_UP from DuckDB at sf0.1 (CLAUDE.md rule). This is the k-means/IVF re-centering primitive;
    mean = s/n downstream."""
    from ..functions.vector import group_centroid_sums

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    out = group_centroid_sums(emb, "label", "embedding")
    return out.select(
        big("label").alias("label"),
        big("dim").alias("dim"),
        big("n").alias("n"),
        F.round(F.col("s").cast("double"), 6).alias("s"),
    )


@golden(
    "pq_encode_codes",
    oracle="""
    WITH cent AS (
      SELECT label, i AS dim,
             CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9)))
                  AS DOUBLE) / count(*) AS m
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
      GROUP BY label, i
    ),
    cvec AS (SELECT label, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
    dists AS (
      SELECT e.vec_id, s.j AS sub, c.label,
             list_sum(list_transform(range(1, 9),
               i -> (CAST(e.embedding[s.j * 8 + i] AS DOUBLE) - c.cv[s.j * 8 + i])
                  * (CAST(e.embedding[s.j * 8 + i] AS DOUBLE) - c.cv[s.j * 8 + i]))) AS d
      FROM embeddings e
      CROSS JOIN unnest(range(0, 8)) AS s(j)
      CROSS JOIN cvec c
    ),
    ranked AS (
      SELECT vec_id, sub, label,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY d ASC, label ASC) AS rn
      FROM dists
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(sub AS INT) AS sub,
           CAST(label AS INT) AS code
    FROM ranked WHERE rn = 1
    """,
)
def pq_encode_codes(spark, sf_dir):
    """Product-quantization encode (Jégou et al. TPAMI'11), exactly
    checked: subspace codebooks are the per-label mean subvectors
    (exact decimal sums / n — engine-identical, same construction as
    kmeans_assign_exact), so each vector's m=8 codes are a pure per-row
    argmin the oracle replays in SQL. Distances fold left-to-right over
    the same per-dim squared diffs in both engines (F.aggregate vs
    list_sum over the same list), so the doubles are bit-identical and
    the argmin cannot drift; ties break on the smaller code both sides.
    The encode is map-only: 64 floats -> 8 small ints, the compression
    that lets a 100 TB corpus ANN-scan from hot storage."""
    from ..functions.vector import label_pq_codebooks, pq_encode

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    # deterministic model (exact decimal per-label means) — memoized
    # per process like the IVF/langid trainings; shared with the two
    # stable ADC goldens
    books = _model_memo(
        ("label_books", sf_dir, 8), lambda: label_pq_codebooks(emb, m=8)
    )
    out = pq_encode(emb, books, dim=64)
    return out.select(
        big("vec_id").alias("vec_id"),
        F.posexplode("codes").alias("sub", "code"),
    ).select(
        "vec_id", F.col("sub").cast("int").alias("sub"),
        F.col("code").cast("int").alias("code"),
    )


@golden("pq_ann_topk")  # approximate: rows-only (quantization error by design)
@memo_golden("pq_ann_topk")
def pq_ann_topk(spark, sf_dir):
    """PQ ANN with ADC + exact re-rank (the ADC+R refine of the PQ
    paper): corpus scanned as 8-byte codes, per-query LUT of subspace
    distances (m*k folds on the broadcast query row), shortlist
    rerank_factor*k by approximate distance, then exact squared-L2 on
    the shortlist ONLY (equi-join on id — never re-reads the corpus).
    Probabilistic recall — rows-only; the recall floor vs exact L2
    top-k is asserted in tests/test_dedup.py."""
    from ..functions.vector import pq_adc_topk, train_pq_codebooks

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    books = _model_memo(("pq816", sf_dir), lambda: train_pq_codebooks(emb, m=8, k=16))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq_adc_topk(emb, queries, books, dim=64, k=10, rerank_factor=10)
    return out.select(
        big("query_id").alias("query_id"),
        big("vec_id").alias("vec_id"),
        F.round("adist", 4).alias("adist"),
    )


@golden(
    "semantic_dedup_docs",
    oracle=f"""
    WITH cent AS (
      SELECT label, i AS dim,
             CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9)))
                  AS DOUBLE) / count(*) AS m
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
      GROUP BY label, i
    ),
    cvec AS (SELECT label, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
    scored AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, c.label,
             {_cos_sql('e.embedding::DOUBLE[]', 'c.cv')} AS score
      FROM embeddings e CROSS JOIN cvec c
    ),
    assigned AS (
      SELECT vec_id, emb, label AS cluster
      FROM (SELECT vec_id, emb, label, score,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY score DESC, label ASC) AS rn
            FROM scored)
      WHERE rn = 1
    ),
    v AS (
      SELECT vec_id, cluster,
             list_transform(emb,
               x -> x / sqrt(list_dot_product(emb, emb))) AS nv
      FROM assigned
    ),
    dupes AS (
      SELECT DISTINCT b.vec_id
      FROM v a JOIN v b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       AND list_dot_product(a.nv, b.nv) >= 0.40
    )
    SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
           CAST(a.cluster AS BIGINT) AS cluster
    FROM assigned a
    WHERE a.vec_id NOT IN (SELECT vec_id FROM dupes)
    """,
)
@memo_golden("semantic_dedup_docs")
def semantic_dedup_docs(spark, sf_dir):
    """SemDeDup semantic deduplication (Abbas et al. 2023; generalizes
    VectorFilter, /root/reference/proto/hydraide.proto:2660-2709):
    cluster every embedding to its nearest centroid (pure per-row argmax
    expression — zero shuffle), find cosine-0.40 near-duplicate pairs
    ONLY within a cluster (equi-join on the cluster id, never a cross
    join), keep the smallest id of each dup pair. Centroids are the
    exact per-label means (decimal sums / n, identical in both engines);
    assignment margins >= 2.7e-5 (kmeans_assign_exact) and pair-score
    margins >= 1.2e-4 (embedding_neardup) put both decisions far above
    cross-engine float noise."""
    from ..functions.dedup import semantic_dedup
    from ..functions.vector import centroid_means, group_centroid_sums
    from ._util import parallelize_small

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    cents = _model_memo(
        ("label_means", sf_dir),
        lambda: centroid_means(
            group_centroid_sums(emb, "label", "embedding").collect()
        ),
    )
    out = semantic_dedup(emb, cents, tau=0.40, id_col="vec_id", vec_col="embedding")
    return out.select(big("vec_id").alias("vec_id"), big("cluster").alias("cluster"))


@golden(
    "kmeans_assign_exact",
    oracle=f"""
    WITH cent AS (
      SELECT label, i AS dim,
             CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9)))
                  AS DOUBLE) / count(*) AS m
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
      GROUP BY label, i
    ),
    cvec AS (SELECT label, list(m ORDER BY dim) AS cv FROM cent GROUP BY label),
    scored AS (
      SELECT e.vec_id, c.label, {_cos_sql('e.embedding::DOUBLE[]', 'c.cv')} AS score
      FROM embeddings e CROSS JOIN cvec c
    ),
    ranked AS (
      SELECT vec_id, label, score,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, label ASC) AS rn
      FROM scored
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(label AS BIGINT) AS label,
           round(score, 4) AS score
    FROM ranked WHERE rn = 1
    """,
)
def kmeans_assign_exact(spark, sf_dir):
    """One full k-means iteration, exactly checked: M-step =
    group_centroid_sums (exact decimal sums -> double means, identical
    in both engines), E-step = kmeans_assign (centroids inlined as
    literals; assignment is a pure per-row argmax expression — zero
    shuffle, zero joins; the plan is scan -> project). Best-vs-runner-up
    cosine margins measured >= 2.7e-5 across sfs, far above
    cross-engine float noise; score rounded to 4 like ann_topk_exact."""
    from ..functions.vector import centroid_means, group_centroid_sums, kmeans_assign

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    cents = _model_memo(
        ("label_means", sf_dir),
        lambda: centroid_means(
            group_centroid_sums(emb, "label", "embedding").collect()
        ),
    )
    out = kmeans_assign(emb, "vec_id", "embedding", cents)
    return out.select(
        big("vec_id").alias("vec_id"),
        big("label").alias("label"),
        F.round("score", 4).alias("score"),
    )


@golden("ivfadc_topk")  # approximate (cell routing + quantization): rows-only
def ivfadc_topk_q(spark, sf_dir):
    """IVF + PQ combined (IVFADC, the at-scale ANN default): queries
    probe nprobe=4 nearest cells, candidates scored as 8-byte PQ codes
    via the broadcast ADC lookup table, exact re-rank on the
    rerank_factor*k shortlist only. At 100 TB the cell is the
    write-time partition key (partition-pruned read) and the scan
    touches codes, never raw vectors. Recall floor vs exact L2 top-k
    asserted in tests/test_dedup.py."""
    from ..functions.vector import ivfadc_topk, train_ivf_centroids, train_pq_codebooks

    def _build():
        emb = parallelize_small(t(spark, sf_dir, "embeddings"))
        cells = _model_memo(
            ("ivf8", sf_dir), lambda: train_ivf_centroids(emb, n_centroids=8)
        )
        books = _model_memo(
            ("pq816", sf_dir), lambda: train_pq_codebooks(emb, m=8, k=16)
        )
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        out = ivfadc_topk(
            emb, queries, cells, books, dim=64, k=10, nprobe=4, rerank_factor=10
        )
        return out.select(
            big("query_id").alias("query_id"),
            big("vec_id").alias("vec_id"),
            F.round("adist", 4).alias("adist"),
        )

    # frame_memo (r16): pure plan over memoized models, no persists
    return frame_memo(spark, ("ivfadc_topk", sf_dir), _build)


def _fold_dot(a: str, b: str) -> str:
    # explicit left fold in dim order (same operand order as
    # query.filters.dot_product) -- NOT list_dot_product, whose
    # summation order is unspecified
    return f"list_sum(list_transform(range(1, 65), i -> ({a})[i] * ({b})[i]))"


def _fold_cos(a: str, b: str) -> str:
    return f"(({_fold_dot(a, b)}) / (sqrt({_fold_dot(a, a)}) * sqrt({_fold_dot(b, b)})))"


_DRIFT_SUMS = """
      SELECT label, i AS dim, COUNT(*) AS n,
             CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9)))
                  AS DECIMAL(28,9)) AS s
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
      WHERE vec_id % 2 = {par}
      GROUP BY label, i
"""


@golden(
    "embedding_drift_report",
    oracle=f"""
    WITH sa AS ({_DRIFT_SUMS.format(par=0)}),
    sb AS ({_DRIFT_SUMS.format(par=1)}),
    ca AS (
      SELECT label, MAX(n) AS n_a,
             list(CAST(s AS DOUBLE) / n ORDER BY dim) AS c
      FROM sa GROUP BY label
    ),
    cb AS (
      SELECT label, MAX(n) AS n_b,
             list(CAST(s AS DOUBLE) / n ORDER BY dim) AS c
      FROM sb GROUP BY label
    )
    SELECT CAST(ca.label AS BIGINT) AS label,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round({_fold_cos('ca.c', 'cb.c')}, 10) AS centroid_cos
    FROM ca JOIN cb ON ca.label = cb.label
    """,
)
def embedding_drift_report(spark, sf_dir):
    """Dataset drift QA: split the corpus into two synthetic snapshots
    (even/odd vec_id = "yesterday vs today") and report, per label,
    member counts and the cosine between the snapshots' exact-mean
    centroids (functions/vector.py::centroid_drift). DECIMAL component
    sums make the centroids partition-order exact; the cosine is the
    pinned left fold; output rounds to 10 (decimal→double ulp rule).
    A healthy split shows cos ≈ 1; a drifted source shows the drop."""
    from ..functions.vector import centroid_drift

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    return centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        "label",
    ).select(big("label").alias("label"), "n_a", "n_b", "centroid_cos")


@golden(
    "ann_topk_int8",
    oracle="""
    WITH codes AS (
      SELECT vec_id,
             CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x -> CAST(GREATEST(-127, LEAST(127,
                         FLOOR(x * 127.0 / m + 0.5))) AS BIGINT)) END AS q
      FROM (
        SELECT vec_id,
               embedding::DOUBLE[] AS v,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m
        FROM embeddings
      )
    ),
    qs AS (SELECT vec_id AS query_id, q AS qq FROM codes WHERE vec_id < 5),
    scored AS (
      SELECT query_id, c.vec_id,
             CAST(list_dot_product(qq, c.q) AS BIGINT) AS qdot,
             sqrt(CAST(list_dot_product(c.q, c.q) AS BIGINT))
               * sqrt(CAST(list_dot_product(qq, qq) AS BIGINT)) AS nn
      FROM qs, codes c
    ),
    ranked AS (
      SELECT query_id, vec_id, qdot,
             CASE WHEN nn = 0 THEN 0.0::DOUBLE
                  ELSE CAST(qdot AS DOUBLE) / nn END AS est_cos_raw,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY CASE WHEN nn = 0 THEN 0.0::DOUBLE
                                  ELSE CAST(qdot AS DOUBLE) / nn END DESC,
                             vec_id ASC) AS INTEGER) AS rank
      FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           qdot, ROUND(est_cos_raw, 10) AS est_cos, rank
    FROM ranked WHERE rank <= 10
    """,
)
@memo_golden("ann_topk_int8")
def ann_topk_int8(spark, sf_dir):
    """Int8-quantized brute-force top-k (r9): symmetric per-vector
    max-abs quantization (q = clamp(floor(x·127/maxabs + 0.5))) and the
    ranking by the NORMALIZED code cosine qdot/(‖qa‖·‖qb‖) — 4× less
    scan IO than float32 and, uniquely among the ANN family, an EXACTLY
    SQL-replayable ranking (est_cos is built from exact integer
    operands through sqrt and one divide, both IEEE correctly-rounded;
    raw qdot is emitted as a column but never ranks — it is norm-
    biased, recall 0.74 vs 0.96 normalized). Unlike ann_topk_lsh/ivf this
    needs no *_stable twin — the production path IS the oracle-exact
    path. Recall vs the float-cosine exact top-k is asserted in
    tests/test_int8_ann.py."""
    from ..functions.vector import int8_topk

    emb = parallelize_small(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = int8_topk(emb, queries, k=10)
    return out.select(
        big("query_id").alias("query_id"),
        big("vec_id").alias("vec_id"),
        F.col("qdot"),
        F.round("est_cos", 10).alias("est_cos"),
        F.col("rank").cast("int").alias("rank"),
    )


@golden("ann_recall_report")
def ann_recall_report(spark, sf_dir):
    """PRODUCTION serving-time ANN recall QA (r14 — rows-only ON
    PURPOSE, like every probabilistic production path; the oracle-
    gated twin is `ann_recall_report_stable` and the per-route recall
    floors are pytest-asserted in tests/test_ann_router.py):
    functions/vector.py::ann_recall_report runs the exact brute-force
    truth once over a sampled query set, then each route THROUGH THE
    SERVING ROUTER (ann_topk_auto — the measured path is the served
    path), and scores set recall@10 per route. 'exact' must come back
    recall 1.0 by construction (the self-check that the harness
    itself is sound); int8 measures quantized-ranking loss; ivf_int8
    measures cell-pruning loss with corpus-trained centroids. At
    100 TB this runs continuously on a few hundred sampled queries —
    the truth scan is |sample| x corpus, every later stage is
    k·|sample| rows."""
    def _build():
        from ..functions._cache import pin_latest
        from ..functions.vector import ann_recall_report as _rep
        from ..functions.vector import auto_ivf_k, train_ivf_centroids

        raw = t(spark, sf_dir, "embeddings")
        # count the RAW scan (cheap), then spread + persist ONCE: the
        # truth scan, the trainer sample and all three routes re-read
        # the spread corpus, so without the boundary each leg re-paid
        # the repartition
        emb = parallelize_small(raw).persist()
        pin_latest("golden.ann_recall_report.emb", emb)
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        from ._util import n_rows_memo

        n_rows = n_rows_memo(spark, sf_dir, "embeddings")
        cents = _model_memo(
            ("ivf_auto", sf_dir),
            lambda: train_ivf_centroids(emb, n_centroids=auto_ivf_k(n_rows)),
        )
        out = _rep(
            emb, queries, 10,
            routes=("exact", "int8", "ivf_int8"),
            n_rows=n_rows, dim=64, centroids=cents, nprobe=2,
        )
        return out.select(
            F.col("route"),
            F.col("k").cast("int").alias("k"),
            big("n_queries").alias("n_queries"),
            big("n_truth").alias("n_truth"),
            big("n_hit").alias("n_hit"),
            F.col("recall"),
        )

    # frame_memo (r16): ~5,300 py4j round trips per build (three router
    # probes through ann_topk_auto); models are memoized, deps pin at
    # this golden's own sites only
    return frame_memo(spark, ("ann_recall_report", sf_dir), _build)
