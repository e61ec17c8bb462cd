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
    """Flagship: the FULL rulebook — every rule of every sheet
    (``plans/rulebook.py``, the semantic port of ``Validation_Rules.py``)
    bound, compiled and evaluated over a 10-sheet synthetic SeroNet
    submission at sf0.001, producing the canonical findings table."""
    from nci_seronet_proc_data_validator_spark.driver_queries import (
        q_rulebook_full,
    )
    return q_rulebook_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
