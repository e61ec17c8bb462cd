"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship validation pipeline at sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator (SURVEY.md §2 + the
LLM-pipeline operators) with DuckDB oracles. Implementations live in
``nci_seronet_proc_data_validator_spark/driver_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nci_seronet_proc_data_validator_spark.driver_queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the validation engine over sf0.001 — in-list, numeric
    range, ID-format and duplicate-ID rules compiled into findings, plus
    the severity summary driving row count > 0."""
    from nci_seronet_proc_data_validator_spark.driver_queries import (
        q_c1_in_list,
        q_c3_number_range,
        q_c5_id_format,
        q_c6_dup_ids,
    )
    from nci_seronet_proc_data_validator_spark.errors import (
        dedup_findings,
        union_findings,
    )
    sf_dir = "/root/testdata/sf0.001"
    parts = [
        q_c1_in_list(spark, sf_dir),
        q_c3_number_range(spark, sf_dir),
        q_c5_id_format(spark, sf_dir),
        q_c6_dup_ids(spark, sf_dir),
    ]
    return dedup_findings(union_findings(parts))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
