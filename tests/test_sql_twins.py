"""SQL-text twins build the IDENTICAL analyzed tree as the Column API.

The r16 build-cost work (guide §1.2 step 2 / §7.3: driver-side planning
cost) replaces per-model Column-API expression loops (one py4j round
trip per JVM op, ~25-40 ms per dot/cosine) with a single F.expr parse.
That is only an optimization if the tree — and therefore the execution
plan and every computed value — is unchanged. These tests pin analyzed-
tree equality per builder, normalizing only:

- expression ids (``#123``),
- pyspark's positional lambda-variable counter (``x_7`` vs the twins'
  literal ``x_0`` — pyspark names lambda parameters x/y/z plus a global
  counter, so the letter carries the binding and the digit is noise).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from hydraide_spark.functions import vector as V
from hydraide_spark.query import filters as Q


def _norm(s: str) -> str:
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"\b([a-z])_\d+\b", r"\1_", s)
    return s


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


@pytest.fixture(scope="module")
def frame(spark):
    return spark.range(4).select(
        F.expr("transform(sequence(1, 6), x -> CAST(x * id AS DOUBLE))").alias("v"),
        F.expr("transform(sequence(1, 6), x -> CAST(x + id AS DOUBLE))").alias("w"),
        F.expr("transform(sequence(1, 6), x -> CAST(x AS FLOAT))").alias("f"),
    )


def _assert_twin(frame, api_col, sql_col):
    a = _norm(_analyzed(frame.select(api_col.alias("out"))))
    b = _norm(_analyzed(frame.select(sql_col.alias("out"))))
    assert a == b


def test_dot_product_twin(frame):
    _assert_twin(
        frame, Q.dot_product(F.col("v"), F.col("w")), Q.dot_product("`v`", "`w`")
    )


def test_l2_norm_twin(frame):
    _assert_twin(frame, Q.l2_norm(F.col("v")), Q.l2_norm("`v`"))


def test_cosine_similarity_twin(frame):
    _assert_twin(
        frame,
        Q.cosine_similarity(F.col("v"), F.col("w")),
        Q.cosine_similarity("`v`", "`w`"),
    )


def test_cosine_similarity_fragment_twin(frame):
    """The knn float-array call site passes transform(...) fragments."""
    _assert_twin(
        frame,
        Q.cosine_similarity(
            F.transform(F.col("f"), lambda x: x.cast("double")),
            F.transform(F.col("v"), lambda x: x.cast("double")),
        ),
        Q.cosine_similarity(
            "transform(`f`, x_0 -> CAST(x_0 AS DOUBLE))",
            "transform(`v`, x_0 -> CAST(x_0 AS DOUBLE))",
        ),
    )


_PLANES = [[0.5, -1.25, 2.0, 0.125, -3.5, 1.0], [1.5, 0.25, -0.75, 2.5, 0.0, -1.0]]
_CENTROIDS = [[1.0, 0.0, 0.5, -0.5, 0.25, 2.0], [-1.0, 2.0, 0.0, 1.5, 0.75, -0.25]]


def test_lsh_bucket_twin(frame):
    _assert_twin(
        frame,
        V.lsh_bucket_expr(F.col("v"), _PLANES),
        V.lsh_bucket_expr("`v`", _PLANES),
    )


def test_lsh_bucket_cast_fragment_twin(frame):
    """multiprobe buckets the query vector through a cast fragment."""
    _assert_twin(
        frame,
        V.lsh_bucket_expr(F.col("f").cast("array<double>"), _PLANES),
        V.lsh_bucket_expr("CAST(`f` AS ARRAY<DOUBLE>)", _PLANES),
    )


def test_centroid_scores_twin(frame):
    _assert_twin(
        frame,
        V._centroid_scores(F.col("v"), _CENTROIDS),
        V._centroid_scores("`v`", _CENTROIDS),
    )


def test_ivf_cell_twin(frame):
    _assert_twin(
        frame,
        V.ivf_cell_expr(F.col("v"), _CENTROIDS),
        V.ivf_cell_expr("`v`", _CENTROIDS),
    )


def test_nearest_centroid_struct_twin(frame):
    labeled = [(3, _CENTROIDS[0]), (7, _CENTROIDS[1])]
    _assert_twin(
        frame,
        V.nearest_centroid_struct(F.col("v"), labeled),
        V.nearest_centroid_struct("`v`", labeled),
    )


def test_multiprobe_confidence_twin(frame):
    """The multiprobe confidence array moved to one SQL parse; pin it
    against the pre-r16 Column construction."""
    api = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(
                        Q.dot_product(F.col("v"), V._as_double_array(p))
                    ).alias("a"),
                    F.lit(i).alias("p"),
                )
                for i, p in enumerate(_PLANES)
            ]
        )
    )
    body = ",".join(
        f"struct(abs({Q.dot_product_sql('`v`', f'array({V._sql_doubles(p)})')}) AS a,"
        f" {i} AS p)"
        for i, p in enumerate(_PLANES)
    )
    _assert_twin(frame, api, F.expr(f"array_sort(array({body}))"))
