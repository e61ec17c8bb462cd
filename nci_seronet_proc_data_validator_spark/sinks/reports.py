"""Sinks: error reports (S9), findings persistence (S10), job-status rows
(S11), notification payload (S12).

Reference behaviors:
- S9 ``write_error_file`` (File_Submission_Object.py:417-430): split the
  error table by sheet, sort, write one ``*_Errors.csv`` per sheet under
  ``Data_Validation_Results/``. The reference loops sheets and PUTs each
  CSV; Spark writes ALL per-sheet files in one partitioned job.
- S11 ``update_jobs_tables`` (:439-499): per-file SELECT-probe then UPDATE
  or INSERT (an upsert). JDBC has no native merge; the operator stages the
  status rows and a caller-side ``foreachPartition`` (or a staging table +
  MERGE on engines that support it) applies them. Here we derive the status
  DataFrame; the JDBC write is gated on a configured URL.
- S12 Slack notification (nci-seronet-data-validator.py:208-250): a
  driver-side mrkdwn string built from the A2 crosstab — an inherently
  single-row-per-submission concern, so it collects the (tiny) summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.errors import (
    ERROR,
    SHEET_NAME,
)


def write_error_reports(findings: DataFrame, out_dir: str,
                        fmt: str = "csv") -> None:
    """S9: one folder per sheet under ``out_dir`` (Hive-style
    ``CSV_Sheet_Name=<sheet>/``), rows ordered by Row_Index within each
    sheet (the reference sorts cross-sheet reports by accumulator order and
    row reports by Row_Index; we order all by Row_Index — deviation noted).

    ``partitionBy`` writes every sheet's report in ONE job — no per-sheet
    loop, no driver round-trips; at scale each partition writes in
    parallel.
    """
    writer = (findings
              .repartition(SHEET_NAME)
              .sortWithinPartitions(SHEET_NAME, "Row_Index")
              .write.mode("overwrite")
              .partitionBy(SHEET_NAME))
    if fmt == "csv":
        writer.option("header", "true").csv(out_dir)
    else:
        writer.parquet(out_dir)


def write_findings_parquet(findings: DataFrame, path: str) -> None:
    """S10: durable findings store (parquet, overwrite)."""
    findings.write.mode("overwrite").parquet(path)


def job_status_rows(findings: DataFrame, submission_id: str,
                    validation_date: str) -> DataFrame:
    """S11: derive per-sheet job status — the reference's status strings
    come from error counts (File_Submission_Object.py:458-463)."""
    return (findings.groupBy(SHEET_NAME)
            .agg(F.count(F.when(F.col("Message_Type") == ERROR, 1))
                 .alias("n_errors"),
                 F.count(F.when(F.col("Message_Type") != ERROR, 1))
                 .alias("n_warnings"))
            .select(
                F.lit(submission_id).alias("submission_id"),
                F.col(SHEET_NAME).alias("file_name"),
                F.when(F.col("n_errors") > 0, "FILE_Validation_Failure")
                 .otherwise("FILE_Validation_Success")
                 .alias("file_validation_status"),
                "n_errors", "n_warnings",
                F.lit(validation_date).alias("validation_date")))


def write_job_status_jdbc(status: DataFrame, url: str | None,
                          table: str, properties: dict | None = None) -> bool:
    """Gated JDBC append of job-status rows. Returns False (no-op) when no
    URL is configured — the test environment has no database, mirroring
    TEST_MODE's suppressed writes (nci-seronet-data-validator.py:104-105).
    """
    if not url:
        return False
    status.write.jdbc(url=url, table=table, mode="append",
                      properties=properties or {})
    return True


def build_notification_payload(summary_rows: list, submission_name: str,
                               submitted_by: str = "unknown") -> dict:
    """S12: mrkdwn notification payload from the collected A2 summary
    (sheet → Errors/Warnings). Pure driver-side string building; POSTing it
    is the caller's concern (no network in the engine)."""
    lines = [f"*Validation results for {submission_name}* "
             f"(submitted by {submitted_by})"]
    total_err = total_warn = 0
    for row in summary_rows:
        sheet = row[SHEET_NAME] if not isinstance(row, dict) else row[SHEET_NAME]
        errs = row["Errors"]
        warns = row["Warnings"]
        total_err += errs
        total_warn += warns
        lines.append(f"• `{sheet}` — {errs} Errors / {warns} Warnings")
    verdict = ("Submission PASSED validation" if total_err == 0
               else "Submission FAILED validation")
    lines.append(f"*{verdict}* ({total_err} errors, {total_warn} warnings)")
    return {"blocks": [{"type": "section",
                        "text": {"type": "mrkdwn", "text": "\n".join(lines)}}]}
