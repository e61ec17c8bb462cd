"""Concurrent multi-submission orchestration.

The reference processes submissions ONE AT A TIME in the Lambda body
(``for zip_file in file_list`` — nci-seronet-data-validator.py:69): each
submission's sheets load, validate, and sink before the next starts. At
100 TB the inter-submission axis is the cheap parallelism: submissions
are independent (separate sheets, separate findings, separate status
rows), so their jobs can share the cluster instead of head-of-line
blocking behind the largest one.

Spark-first shape:

- **One session, many scheduler pools.** Each submission validates on
  its own thread inside the SAME SparkSession, with
  ``spark.scheduler.pool`` set to a per-submission FAIR pool (the
  session factory enables FAIR mode). FAIR pools share executor slots
  round-robin, so a 10-sheet submission cannot starve a 1-sheet one;
  under a FIFO scheduler the same code still overlaps jobs, just
  without the fairness guarantee.
- **Thread-per-submission is driver-side only.** The threads never touch
  each other's state: ``SubmissionValidator.validate`` registers its
  temp views under a per-invocation uuid, and all data movement happens
  in executor tasks. PySpark's pinned-thread mode maps each Python
  thread to its own JVM thread, so the pool-local property cannot leak
  across submissions.
- **Bounded width.** ``max_parallel`` caps in-flight submissions the way
  ``maxFilesPerTrigger`` caps the streaming backlog
  (``streaming/watcher.py``): memory and retry cost stay sized by the
  bound, not the queue length.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import SparkSession

from nci_seronet_proc_data_validator_spark.submission import (
    SubmissionValidator,
    ValidationResult,
)

__all__ = ["ConcurrentOutcome", "validate_concurrent"]


@dataclass
class ConcurrentOutcome:
    """Per-submission outcome of :func:`validate_concurrent`."""
    result: ValidationResult | None     # None when the submission errored
    materialized: Any                   # return of the materialize hook
    seconds: float                      # wall time inside the worker
    error: Exception | None = None


def _default_materialize(res: ValidationResult) -> dict[str, int]:
    """Force execution inside the worker (so jobs overlap across pools)
    and return the error/warning counts — the same numbers the
    reference's job-status row carries (File_Submission_Object.py:458)."""
    counts = {r["Message_Type"]: r["n"] for r in
              (res.findings.groupBy("Message_Type").count()
               .withColumnRenamed("count", "n").collect())}
    return {"errors": counts.get("Error", 0),
            "warnings": counts.get("Warning", 0)}


def validate_concurrent(
        spark: SparkSession,
        submissions: dict[str, dict],
        max_parallel: int = 4,
        materialize: Callable[[ValidationResult], Any] | None = None,
) -> dict[str, ConcurrentOutcome]:
    """Validate many submissions concurrently in one SparkSession.

    ``submissions`` maps a submission id to the ``SubmissionValidator``
    keyword arguments (everything but ``spark``): ``sheets`` plus any of
    ``cbc_id``, ``declared_participants``, ``icd10_codes``,
    ``expected_columns``, ``today``, ... Results are keyed back by the
    same ids.

    ``materialize`` runs INSIDE the worker thread after ``validate()``
    and must touch the findings (default: severity counts) — Spark plans
    are lazy, so without an action per thread nothing would actually
    overlap. A submission that raises is captured in its outcome
    (``error`` set, ``result`` None) without failing the others — the
    reference's per-submission retry model, where one bad zip marks its
    own status row and the batch continues.
    """
    materialize = materialize or _default_materialize

    def _run(item: tuple[str, dict]) -> tuple[str, ConcurrentOutcome]:
        sub_id, kwargs = item
        return sub_id, _run_one(spark, sub_id, kwargs, materialize)

    width = max(1, min(max_parallel, len(submissions) or 1))
    with ThreadPoolExecutor(max_workers=width,
                            thread_name_prefix="submission") as pool:
        return dict(pool.map(_run, submissions.items()))


def _run_one(spark: SparkSession, sub_id: str, kwargs: dict,
             materialize: Callable[[ValidationResult], Any]
             ) -> ConcurrentOutcome:
    """One submission's worker body. Pool + description are THREAD-LOCAL
    job properties (pinned thread mode) tagging exactly this submission's
    jobs; the finally clears them so nothing later on the same thread
    inherits a submission's pool."""
    sc = spark.sparkContext
    t0 = time.time()
    sc.setLocalProperty("spark.scheduler.pool", f"submission-{sub_id}")
    sc.setJobDescription(f"validate submission {sub_id}")
    try:
        res = SubmissionValidator(spark, **kwargs).validate()
        mat = materialize(res)
        return ConcurrentOutcome(
            result=res, materialized=mat, seconds=time.time() - t0)
    except Exception as exc:  # noqa: BLE001 — isolate per submission
        return ConcurrentOutcome(
            result=None, materialized=None,
            seconds=time.time() - t0, error=exc)
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)
        sc.setJobDescription(None)
