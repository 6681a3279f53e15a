"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (join + decimal-exact grouped
aggregation + top-k) on sf0.001. ``queries()`` / ``oracle_sql()`` expose
the golden registry in ``hydraide_spark.golden`` — one entry per
implemented operator from SURVEY.md §2, each with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from hydraide_spark import golden  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = golden.queries()
    return qs["join_star_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return golden.queries()


def oracle_sql() -> dict[str, str]:
    return golden.oracle_sql()
