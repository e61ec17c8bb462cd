"""Validate a submission directory end-to-end — the engine's CLI face for
the reference's Lambda flow (nci-seronet-data-validator.py:33-117).

    python tools/run_submission.py SUBMISSION_DIR [--out OUT_DIR]
        [--cbc NAME=ID ...] [--keep-reference-bugs]

SUBMISSION_DIR holds the sheet CSVs (submission.csv, demographic.csv, …).
Writes per-sheet error reports + findings parquet under OUT_DIR and prints
the summary + notification text.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("submission_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cbc", action="append", default=[],
                    metavar="NAME=ID", help="CBC name → 2-digit id mapping")
    ap.add_argument("--keep-reference-bugs", action="store_true",
                    help="reproduce the reference's buggy behaviors instead "
                         "of the documented fixes")
    args = ap.parse_args()

    from nci_seronet_proc_data_validator_spark.session import get_spark
    from nci_seronet_proc_data_validator_spark.sinks import (
        build_notification_payload,
        write_error_reports,
        write_findings_parquet,
    )
    from nci_seronet_proc_data_validator_spark.sources import read_sheet_csv
    from nci_seronet_proc_data_validator_spark.sources.catalog import (
        static_expected_columns,
    )
    from nci_seronet_proc_data_validator_spark.sources.icd10 import (
        load_icd10_codes,
    )
    from nci_seronet_proc_data_validator_spark.submission import (
        SubmissionValidator,
        check_submission_quality,
        parse_submission_metadata,
    )

    spark = get_spark("run_submission")
    paths = sorted(glob.glob(os.path.join(args.submission_dir, "*.csv")))
    if not paths:
        print(f"no CSV sheets found in {args.submission_dir}")
        return 2
    sheets = {os.path.basename(p): read_sheet_csv(spark, p) for p in paths}
    print(f"loaded {len(sheets)} sheets: {', '.join(sorted(sheets))}")

    cbc_map = dict(kv.split("=", 1) for kv in args.cbc)
    meta = {"cbc_id": "0", "declared_participants": None,
            "declared_biospecimens": None}
    if "submission.csv" in sheets:
        meta = parse_submission_metadata(sheets["submission.csv"], cbc_map)
        print(f"submission metadata: {meta}")

    validator = SubmissionValidator(
        spark, sheets, cbc_id=str(meta["cbc_id"]),
        declared_participants=meta.get("declared_participants"),
        declared_biospecimens=meta.get("declared_biospecimens"),
        icd10_codes=load_icd10_codes(spark),
        expected_columns=static_expected_columns(),
        fix_reference_bugs=not args.keep_reference_bugs)
    result = validator.validate()

    n_col_errors = result.column_findings.count()
    ok, why = check_submission_quality(sheets, n_col_errors,
                                       str(meta["cbc_id"]))
    if not ok:
        print(f"QUALITY GATE FAILED: {why}")
        result.column_findings.show(50, truncate=False)
        # the reference still notifies and records job status on gate
        # failure (nci:76-80) — we print and stop before per-sheet reports

    summary_rows = [r.asDict() for r in result.summary.collect()]
    result.summary.show(50, truncate=False)
    payload = build_notification_payload(
        summary_rows, os.path.basename(args.submission_dir.rstrip("/")))
    print(payload["blocks"][0]["text"]["text"])

    if args.out:
        write_error_reports(result.findings, os.path.join(args.out,
                                                          "Data_Validation_Results"))
        write_findings_parquet(result.findings,
                               os.path.join(args.out, "findings.parquet"))
        print(f"reports written under {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
