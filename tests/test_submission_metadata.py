"""submission.csv metadata parsing (O4) and the quality gate."""

from nci_seronet_proc_data_validator_spark.sources.readers import (
    read_sheet_csv,
)
from nci_seronet_proc_data_validator_spark.submission import (
    check_submission_quality,
    parse_submission_metadata,
)


def test_parse_submission_metadata(spark, tmp_path):
    p = tmp_path / "submission.csv"
    p.write_text("Submission_Item,Feinstein_CBC\n"
                 "Submitting for,SeroNet\n"
                 "Number_of_Participant_IDs,3\n"
                 "Number_of_Biospecimen_IDs,7\n")
    df = read_sheet_csv(spark, str(p))
    meta = parse_submission_metadata(df, {"Feinstein_CBC": "14"})
    assert meta == {"cbc_name": "Feinstein_CBC", "cbc_id": "14",
                    "declared_participants": "3",
                    "declared_biospecimens": "7"}
    # unknown CBC resolves to '0' (→ ID checks report missing submission)
    assert parse_submission_metadata(df, {})["cbc_id"] == "0"


def test_quality_gate(spark):
    ok, _ = check_submission_quality({"submission.csv": None}, 0, "14")
    assert ok
    ok, why = check_submission_quality({}, 0, "14")
    assert not ok and "missing" in why
    ok, why = check_submission_quality({"submission.csv": None}, 0, "0")
    assert not ok and "CBC" in why
    ok, why = check_submission_quality({"submission.csv": None}, 2, "14")
    assert not ok and "column errors" in why
