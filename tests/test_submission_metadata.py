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


def test_local_metadata_parse_matches_dataframe_parse(spark, tmp_path):
    """r13: parse_submission_metadata_local is the zero-job driver-side
    twin the completion watcher uses per completing submission — it
    must agree with the DataFrame parse on every shape, and refuse
    (None) exactly where the cheap csv dialect could diverge."""
    from nci_seronet_proc_data_validator_spark.submission import (
        parse_submission_metadata_local)

    cbc = {"Feinstein_CBC": "14", "": "99"}
    shapes = {
        "normal.csv": ("Submission_Item,Feinstein_CBC\n"
                       "Submitting for,SeroNet\n"
                       "Number_of_Participant_IDs,3\n"
                       "Number_of_Biospecimen_IDs,7\n"),
        "short_rows.csv": ("k,Feinstein_CBC\na\nb,5\nc\n"),
        "missing_rows.csv": ("k,Feinstein_CBC\nonly,1\n"),
        "blank_cells.csv": ("k,Feinstein_CBC\nx,\ny,\nz,\n"),
        "extra_cols.csv": ("k,Feinstein_CBC,extra\na,1,x\nb,2,y\nc,3,z\n"),
        "one_col.csv": ("k\na\nb\nc\n"),
        "blank_lines.csv": ("k,Feinstein_CBC\n\na,9\n\nb,8\nc,7\n"),
        "unknown_lab.csv": ("k,NotALab\na,1\nb,2\nc,3\n"),
    }
    for name, content in shapes.items():
        p = tmp_path / name
        p.write_text(content)
        local = parse_submission_metadata_local(str(p), cbc)
        assert local is not None, name
        df = read_sheet_csv(spark, str(p))
        assert local == parse_submission_metadata(df, cbc), name

    # refusal cases fall back to the DataFrame parse
    q = tmp_path / "quoted.csv"
    q.write_text('k,Feinstein_CBC\na,"quoted,val"\nb,2\nc,3\n')
    assert parse_submission_metadata_local(str(q), cbc) is None
    d = tmp_path / "dup.csv"
    d.write_text("k,k\na,1\nb,2\nc,3\n")
    assert parse_submission_metadata_local(str(d), cbc) is None
