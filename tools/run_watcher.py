"""Run the multi-submission streaming watcher — the CLI face of
``streaming.validate_stream_multi`` (the continuous twin of
``tools/run_submission.py --batched``).

    python tools/run_watcher.py ROOT_DIR --sheet SHEET.csv
        --out OUT_DIR --checkpoint CP_DIR
        [--cbc SUBDIR=ID ...] [--max-files N] [--timeout SECONDS]

Submissions land as ``ROOT_DIR/<submission>/<SHEET.csv>`` (mixed labs
fine — each row validates against ITS submission's CBC; submissions not
named by ``--cbc`` get lab code '0', the reference's unknown-lab
behavior). One availableNow query drains the backlog and stops; re-run
to drain what landed since (the checkpoint carries the offset — the
reference's Lambda-trigger pattern, nci-seronet-data-validator.py:62-117,
with the jobs-table bookkeeping replaced by engine checkpoints).
Findings parquet lands under OUT_DIR partitioned by epoch
(idempotent under batch replay — see validate_stream's docstring).

Sheet columns come from the expected-columns catalog
(``sources.catalog.static_expected_columns``), the same catalog the
batch header check validates against.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir")
    ap.add_argument("--sheet", required=True,
                    help="sheet file name to watch (e.g. demographic.csv)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cbc", action="append", default=[],
                    metavar="SUBDIR=ID",
                    help="submission dir name -> 2-digit lab code "
                         "(unlisted submissions validate under '0')")
    ap.add_argument("--max-files", type=int, default=None,
                    help="maxFilesPerTrigger bound (backlog sizing)")
    ap.add_argument("--timeout", type=int, default=600,
                    help="seconds to wait for the drain to finish")
    args = ap.parse_args()

    from nci_seronet_proc_data_validator_spark.session import get_spark
    from nci_seronet_proc_data_validator_spark.sources.catalog import (
        static_expected_columns,
    )
    from nci_seronet_proc_data_validator_spark.streaming import (
        validate_stream_multi,
    )

    catalog = static_expected_columns()
    columns = catalog.get(args.sheet)
    if not columns:
        print(f"unknown sheet {args.sheet}; catalog has: "
              f"{', '.join(sorted(catalog))}")
        return 2
    cbc_by_sub = dict(kv.split("=", 1) for kv in args.cbc)

    spark = get_spark("run_watcher")
    from nci_seronet_proc_data_validator_spark.sources.icd10 import (
        load_icd10_codes,
    )
    glob = os.path.join(args.root_dir, "*", args.sheet)
    # OUT_DIR is epoch-partitioned and accumulates across drains; the
    # summary below must cover THIS run only, so record the epochs this
    # drain writes (status_cb fires once per committed micro-batch).
    run_epochs: list[int] = []
    q = validate_stream_multi(
        spark, glob, args.checkpoint, args.sheet, list(columns),
        cbc_by_sub, args.out, max_files_per_trigger=args.max_files,
        status_cb=lambda _f, epoch_id: run_epochs.append(int(epoch_id)),
        icd10_codes=load_icd10_codes(spark))
    q.awaitTermination(args.timeout)
    if q.isActive:
        q.stop()
        print(f"TIMEOUT after {args.timeout}s — backlog not fully "
              f"drained; re-run to continue from the checkpoint")
        return 1
    from pyspark.sql import functions as F
    try:
        got = spark.read.parquet(args.out)
    except Exception:
        print("drained: no findings written (no files, or all rows clean)")
        return 0
    if not run_epochs:
        print(f"drained: no new files this run; cumulative findings "
              f"remain under {args.out} ({got.count()} rows)")
        return 0
    # epoch is the partition column — this filter prunes to exactly the
    # directories this drain wrote, so re-drains don't overstate counts.
    got = got.filter(F.col("epoch").isin(run_epochs))
    (got.groupBy("__submission_id", "Message_Type")
     .count().orderBy("__submission_id", "Message_Type")
     .show(100, truncate=False))
    n_err = got.filter(F.col("Message_Type") == "Error").count()
    print(f"drained epoch(s) {sorted(run_epochs)}; findings under "
          f"{args.out} ({got.count()} rows this run, {n_err} errors)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
