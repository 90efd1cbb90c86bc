"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship full-engine CDC replay at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline ops); ``oracle_sql()`` gives the DuckDB
equivalent for each.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full changefeed replay (resolved-ts micro-batches,
    pandas-UDF mount, LWW dedup, DDL barrier, exactly-once MERGE) of a
    transcript binlog derived from sf0.001 events, returning the final
    lake-table state."""
    from ticdc_spark.queries import q_cdc_pipeline_e2e

    return q_cdc_pipeline_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ticdc_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ticdc_spark.queries import ORACLES

    return dict(ORACLES)
