"""Rule compiler: bound column rules → ONE findings scan per sheet.

The reference evaluates ~30 rules per sheet sequentially, each rule
re-filtering the pandas table and appending rows
(``Validation_Rules.py:1-36`` driving ``File_Submission_Object.py`` checks).
Here all rules of a sheet compile into a single projection:

    per rule column:  coalesce(when(viol_1, finding), when(viol_2, finding), …)
    sheet findings:   explode(array_compact(array(col_1, …, col_n)))

- one whole-stage-codegen'd pass over the sheet, zero shuffles;
- ``coalesce`` in rule order reproduces pandas ``drop_duplicates(...,
  keep='first')`` per (row, column) (File_Submission_Object.py:153);
- at 100 TB this is a map-only stage — it scales linearly with input
  splits, no coordination.

Aggregation-shaped checks (duplicate IDs) shuffle once on the checked key
and emit sentinel-row findings, mirroring ``check_for_dup_ids``
(File_Submission_Object.py:181-188).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.errors import (
    ROW_DUPLICATE_ID,
    explode_findings,
    finding_struct,
)
from nci_seronet_proc_data_validator_spark.functions.checks import CheckExpr

ROW_INDEX_COL = "row_index"


@dataclass
class ColumnRules:
    """All checks bound to one column of one sheet, in dispatch order."""
    column: str
    checks: list[CheckExpr] = field(default_factory=list)
    rule_found: bool = True


def compile_sheet_findings(df: DataFrame, sheet_name: str | Column,
                           column_rules: list[ColumnRules],
                           row_index_col: str = ROW_INDEX_COL) -> DataFrame:
    """Evaluate every bound rule of a sheet in one projection.

    ``sheet_name`` may be a per-row Column (e.g. a partition label) —
    ``finding_struct`` accepts either."""
    row_idx = F.col(row_index_col)
    candidates = []
    for cr in column_rules:
        cands = [
            F.when(ce.violation,
                   finding_struct(ce.severity, sheet_name, row_idx,
                                  cr.column, F.col(cr.column), ce.msg_col()))
            for ce in cr.checks
        ]
        if not cands:
            continue
        candidates.append(cands[0] if len(cands) == 1 else F.coalesce(*cands))
    return explode_findings(df, candidates)


def dup_id_findings(df: DataFrame, sheet_name: str, column: str) -> DataFrame:
    """A1/C6 ``check_for_dup_ids``: one finding per duplicated ID with its
    repeat count, sentinel Row_Index −3.

    GroupBy on the ID key — the only shuffle in per-sheet validation; with
    AQE it coalesces to the real key cardinality.
    """
    msg = F.concat(F.lit("Id is repeated "), F.col("cnt").cast("string"),
                   F.lit(" times, Multiple repeats are not allowed"))
    return (df.groupBy(column).agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") > 1)
            .select(finding_struct(
                "Error", sheet_name, F.lit(ROW_DUPLICATE_ID), column,
                F.col(column), msg).alias("_f"))
            .select("_f.*"))
