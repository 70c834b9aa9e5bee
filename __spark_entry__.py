"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship invoice-request pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2 + the training-data-pipeline extensions) with DuckDB oracles.
Implementation lives in ``flink_invoice_processor_spark.plans.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's core dataflow — packet parse →
    explode → validate/derive → valid-record split — over packets
    deterministically synthesized from the sf0.001 orders table."""
    from flink_invoice_processor_spark.plans.queries import request_parse_explode

    return request_parse_explode(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from flink_invoice_processor_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, column-aliased to match.
    Every query in ``queries()`` has an oracle entry."""
    from flink_invoice_processor_spark.plans.queries import ORACLES

    return dict(ORACLES)
