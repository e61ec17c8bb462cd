"""JDBC surface without a server (VERDICT r2 #5): the generated SQL text
and rename/pushdown contracts are the observable behavior — pin them.

Reference parity targets:
- per-sheet Merged_Table SELECTs: File_Submission_Object.py:501-527
  (projection lists, the SARS_Cov_2_PCR predicate, the Test_Result →
  SARS_CoV_2_PCR_Test_Result rename);
- jobs-queue query: nci-seronet-data-validator.py:152-159 with the ON-less
  JOIN / double-read bugs fixed as documented (SURVEY.md §2.9.1);
- INFORMATION_SCHEMA catalog + bookkeeping anti-filter: nci:145-150;
- S11 upsert statement shapes: File_Submission_Object.py:439-499.
"""

import pytest

from nci_seronet_proc_data_validator_spark.sinks.reports import (
    build_upsert_statements,
)
from nci_seronet_proc_data_validator_spark.sources.jdbc import (
    IGNORED_CATALOG_COLUMNS,
    MERGED_TABLE_QUERIES,
    apply_sheet_renames,
    expected_columns_sql,
    pending_submissions_sql,
)

# Projections the reference hand-writes per sheet (the pushdown contract:
# ONLY these columns may cross the wire).
EXPECTED_PROJECTIONS = {
    "prior_clinical_test.csv": ["Research_Participant_ID", "Test_Result"],
    "demographic.csv": ["Research_Participant_ID", "Age"],
    "biospecimen.csv": ["Research_Participant_ID", "Biospecimen_ID",
                        "Biospecimen_Type"],
    "aliquot.csv": ["Aliquot_ID", "Biospecimen_ID"],
    "equipment.csv": ["Equipment_ID", "Biospecimen_ID"],
    "reagent.csv": ["Reagent_Name", "Biospecimen_ID"],
    "consumable.csv": ["Consumable_Name", "Biospecimen_ID"],
    "assay.csv": ["Assay_ID", "Assay_Name"],
    "assay_target.csv": ["Assay_ID", "Assay_Target",
                         "Assay_Antigen_Source"],
    "confirmatory_clinical_test.csv": ["Research_Participant_ID",
                                       "Assay_ID"],
}

EXPECTED_TABLES = {
    "prior_clinical_test.csv": "Participant_Prior_Test_Result",
    "demographic.csv": "Participant",
    "biospecimen.csv": "Biospecimen",
    "aliquot.csv": "Aliquot",
    "equipment.csv": "Biospecimen_Equipment",
    "reagent.csv": "Reagent_Biospecimen",
    "consumable.csv": "Consumable_Biospecimen",
    "assay.csv": "Assay",
    "assay_target.csv": "Assay",
    "confirmatory_clinical_test.csv":
        "Participant_Confirmatory_Assay_Result",
}


def test_merged_table_projection_and_source_parity():
    assert set(MERGED_TABLE_QUERIES) == set(EXPECTED_PROJECTIONS)
    for sheet, sql in MERGED_TABLE_QUERIES.items():
        select_list = sql.split("SELECT ", 1)[1].split(" FROM ", 1)[0]
        cols = [c.strip() for c in select_list.split(",")]
        assert cols == EXPECTED_PROJECTIONS[sheet], sheet
        assert EXPECTED_TABLES[sheet] in sql, sheet


def test_prior_clinical_predicate_pushdown():
    sql = MERGED_TABLE_QUERIES["prior_clinical_test.csv"]
    # The reference parameterizes Test_Name with ['SARS_Cov_2_PCR'] (sic —
    # lowercase 'ov'); inlined here, same filter reaches the database.
    assert "WHERE Test_Name = 'SARS_Cov_2_PCR'" in sql


def test_sars_rename_contract(spark):
    df = spark.createDataFrame(
        [("14_000001", "Positive")],
        "Research_Participant_ID string, Test_Result string")
    out = apply_sheet_renames(df, "prior_clinical_test.csv")
    assert out.columns == ["Research_Participant_ID",
                           "SARS_CoV_2_PCR_Test_Result"]
    # other sheets untouched
    assert apply_sheet_renames(df, "demographic.csv").columns == df.columns


def test_jobs_queue_sql_restored_on_clause():
    sql = pending_submissions_sql()
    # the documented bug fix: a real equi-join, not a filtered cross join
    assert ("JOIN table_file_validator AS tbl "
            "ON sub.submission_file_id = tbl.submission_file_id") in sql
    # reference projection, verbatim column names
    for col in ["sub.orig_file_id", "sub.submission_file_id",
                "tbl.unzipped_file_id",
                "sub.submission_validation_file_location",
                "tbl.file_validation_file_location"]:
        assert col in sql, col
    # reference default status params
    assert "sub.batch_validation_status = 'Batch_Validation_SUCCESS'" in sql
    assert ("tbl.file_validation_status = 'FILE_VALIDATION_IN_PROGRESS'"
            in sql)
    with pytest.raises(ValueError):
        pending_submissions_sql(batch_status="x' OR '1'='1")


def test_catalog_sql_and_antifilter():
    assert expected_columns_sql("seronet") == (
        "SELECT TABLE_NAME, COLUMN_NAME FROM INFORMATION_SCHEMA.COLUMNS "
        "WHERE TABLE_SCHEMA = 'seronet'")
    # reference values_to_ignore verbatim (note lowercase Submission_time)
    assert IGNORED_CATALOG_COLUMNS == [
        "Submission_ID", "Submission_CBC", "Biorepository_ID",
        "Shipping_ID", "Test_Agreement", "Submission_time"]
    with pytest.raises(ValueError):
        expected_columns_sql("bad'name")


def test_upsert_statement_shapes():
    probe, update, insert = build_upsert_statements(
        "table_data_validator",
        ["file_name", "status", "updated_at"], "file_name")
    assert probe == ("SELECT 1 FROM table_data_validator "
                     "WHERE file_name = ?")
    assert update == ("UPDATE table_data_validator SET status = ?, "
                      "updated_at = ? WHERE file_name = ?")
    assert insert == ("INSERT INTO table_data_validator "
                      "(file_name, status, updated_at) VALUES (?, ?, ?)")
    # MySQL paramstyle flips placeholders (the reference's %s cursor loop)
    probe_f, _, _ = build_upsert_statements(
        "t", ["k", "v"], "k", paramstyle="format")
    assert probe_f == "SELECT 1 FROM t WHERE k = %s"
    with pytest.raises(ValueError):
        build_upsert_statements("t; DROP TABLE x", ["k"], "k")


def test_upsert_fully_keyed_update_is_none():
    """r11 (ADVICE): a composite key covering every column leaves nothing
    to SET — update_sql must come back None (insert-if-absent semantics),
    not an invalid 'UPDATE t SET  WHERE ...' that fails at execute time
    on the first probe hit."""
    probe, update, insert = build_upsert_statements(
        "t", ["k1", "k2"], ["k1", "k2"])
    assert update is None
    assert probe == "SELECT 1 FROM t WHERE k1 = ? AND k2 = ?"
    assert insert == "INSERT INTO t (k1, k2) VALUES (?, ?)"
