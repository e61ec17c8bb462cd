"""Cross-sheet integrity (J3–J6, A4): all 10 presence patterns + count
reconciliation, per FIXTURES.md's planted-violation matrix."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.sources.readers import with_row_index
from nci_seronet_proc_data_validator_spark.submission import SubmissionValidator


def _df(spark, columns, rows):
    return with_row_index(
        spark.createDataFrame([Row(**dict(zip(columns, r))) for r in rows]))


def _submission(spark):
    prior = _df(spark, ["Research_Participant_ID", "SARS_CoV_2_PCR_Test_Result"], [
        ("14_000001", "Positive"),   # everywhere
        ("14_000002", "Negative"),   # prior only
        ("14_000004", "Positive"),   # prior+demo, no bio
        ("14_000005", "Positive"),   # prior+bio, no demo
    ])
    demo = _df(spark, ["Research_Participant_ID", "Age"], [
        ("14_000001", "30"),
        ("14_000003", "40"),         # demo only
        ("14_000004", "50"),
        ("14_000006", "60"),         # demo+bio, no prior
    ])
    bio = _df(spark, ["Research_Participant_ID", "Biospecimen_ID",
                      "Biospecimen_Type"], [
        ("14_000001", "14_000001_001", "PBMC"),      # everywhere
        ("14_000005", "14_000005_001", "Serum"),
        ("14_000006", "14_000006_001", "PBMC"),
        ("14_000007", "14_000007_001", "Serum"),     # bio only
    ])
    confirm = _df(spark, ["Research_Participant_ID", "Assay_ID"], [
        ("14_000001", "14_001"),
    ])
    aliquot = _df(spark, ["Aliquot_ID", "Biospecimen_ID"], [
        ("14_000001_001_01", "14_000001_001"),
        ("14_000099_001_01", "14_000099_001"),   # aliquot only → missing from bio
    ])
    equipment = _df(spark, ["Equipment_ID", "Biospecimen_ID"], [
        ("equipA", "14_000001_001"),
        ("equipB", "14_000007_001"),  # equipment for non-PBMC bio → NOT PBMC error
    ])
    return {
        "prior_clinical_test.csv": prior,
        "demographic.csv": demo,
        "biospecimen.csv": bio,
        "confirmatory_clinical_test.csv": confirm,
        "aliquot.csv": aliquot,
        "equipment.csv": equipment,
    }


@pytest.fixture(scope="module")
def findings_rows(spark):
    """One validate() + collect for the two presence-pattern tests (the
    validator config is identical — rebuilding it per test was ~40% of
    this file's wall time)."""
    v = SubmissionValidator(spark, _submission(spark), cbc_id="14",
                            today=datetime.date(2026, 1, 1))
    return v.validate().findings.collect()


def test_participant_presence_patterns(findings_rows):
    rows = [r for r in findings_rows
            if r["CSV_Sheet_Name"] == "Cross_Participant_ID.csv"]
    by_id = {r["Column_Value"]: r["Error_Message"] for r in rows}
    assert by_id["14_000002"] == (
        "ID is found in Prior_Clinical_Test, but is missing from Demographic and Biospecimen")
    assert by_id["14_000003"] == (
        "ID is found in Demographic, but is missing from Prior_Clinical_Test and Biospecimen")
    assert by_id["14_000007"] == (
        "ID is found in Biospecimen, but is missing from Prior_Clinical_Test and Demographic")
    assert by_id["14_000004"] == (
        "ID is found in Prior_Clinical_Test and Demographic but is missing from Biospecimen")
    assert by_id["14_000005"] == (
        "ID is found in Prior_Clinical_Test and Biospecimen but is missing from Demographic")
    assert by_id["14_000006"] == (
        "ID is found in Demographic and Biospecimen but is missing from Prior_Clinical_Test")
    # the fully-present participant is NOT flagged (missing only from
    # confirmatory matches none of the 6 patterns)
    assert "14_000001" not in by_id
    assert all(r["Row_Index"] == -10 for r in rows)


def test_biospecimen_presence_patterns(findings_rows):
    rows = [r for r in findings_rows
            if r["CSV_Sheet_Name"] == "Cross_Biospecimen_ID.csv"]
    msgs = {(r["Column_Value"], r["Error_Message"]) for r in rows}
    assert ("14_000099_001",
            "ID is found in Aliquot.csv, however ID is missing from Biospecimen.csv") in msgs
    # Keep-first semantics (reference dedup key omits the message): an ID
    # missing from several tables keeps only its aliquot-rule finding.
    assert ("14_000007_001",
            "ID is found in Biospecimen.csv, however is missing from Aliquot.csv") in msgs
    assert ("14_000006_001",
            "ID is found in Biospecimen.csv, however is missing from Aliquot.csv") in msgs
    assert ("14_000005_001",
            "ID is found in Biospecimen.csv, however is missing from Aliquot.csv") in msgs
    # exactly one finding per ID on the cross sheet
    ids = [r["Column_Value"] for r in rows]
    assert len(ids) == len(set(ids))


def test_count_reconciliation(spark):
    v = SubmissionValidator(spark, _submission(spark), cbc_id="14",
                            declared_participants=3,   # actual distinct passing ≠ 3
                            # bio/aliquot/equipment all register into
                            # Bio_List (Validation_Rules.py:34-35): distinct
                            # passing bio IDs = 5 → matches, no finding
                            declared_biospecimens=5,
                            today=datetime.date(2026, 1, 1))
    res = v.validate()
    recon = res.findings.filter("Row_Index = -5").collect()
    assert len(recon) == 1
    r = recon[0]
    assert r["Column_Name"] == "submit_Participant_IDs"
    assert r["Column_Value"] == "3"
    assert "IDS are valid" in r["Error_Message"]


def test_column_findings(spark):
    sheets = _submission(spark)
    v = SubmissionValidator(
        spark, sheets, cbc_id="14",
        expected_columns={"demographic.csv": ["Research_Participant_ID",
                                              "Age", "Race"]},
        today=datetime.date(2026, 1, 1))
    res = v.validate()
    got = {(r["Column_Name"], r["Error_Message"])
           for r in res.column_findings.collect()}
    assert ("Race", "This Column is Expected and is missing from CSV File") in got


def test_enrichment_skips_columns_the_sheet_already_has(spark):
    """A submitted sheet that carries its own copy of a dependency column
    (e.g. demographic.csv shipping SARS_CoV_2_PCR_Test_Result) keeps the
    SUBMITTED values — merge_tables must not join a second same-named
    column (AMBIGUOUS_REFERENCE on the next selectExpr) and the column
    must NOT land in drop_list (it was not added by the join)."""
    from nci_seronet_proc_data_validator_spark.operators.joins import (
        merge_tables)
    demo = spark.createDataFrame(
        [("14_000001", "30", "White", "OwnValue")],
        "Research_Participant_ID string, Age string, Race string, "
        "SARS_CoV_2_PCR_Test_Result string")
    prior_mt = spark.createDataFrame(
        [("14_000001", "Positive")],
        "Research_Participant_ID string, SARS_CoV_2_PCR_Test_Result string")
    enriched, drop_list = merge_tables(
        "demographic.csv", demo,
        {"prior_clinical_test.csv": prior_mt})
    assert enriched.columns.count("SARS_CoV_2_PCR_Test_Result") == 1
    assert drop_list == []
    row = enriched.collect()[0]
    assert row["SARS_CoV_2_PCR_Test_Result"] == "OwnValue"
    # and the full validate() path no longer raises AMBIGUOUS_REFERENCE
    import datetime
    from nci_seronet_proc_data_validator_spark.submission import (
        SubmissionValidator)
    prior = spark.createDataFrame(
        [("14_000001", "Positive", "From Medical Record", "2020-05-01", 2)],
        "Research_Participant_ID string, SARS_CoV_2_PCR_Test_Result string, "
        "SARS_CoV_2_PCR_Test_Result_Provenance string, "
        "Date_of_SARS_CoV_2_PCR_sample_collection string, row_index long")
    demo_rx = demo.withColumn("row_index", F.lit(2).cast("long"))
    res = SubmissionValidator(
        spark, {"prior_clinical_test.csv": prior,
                "demographic.csv": demo_rx},
        cbc_id="14", today=datetime.date(2026, 1, 1)).validate()
    rows = res.findings.collect()     # must not raise AMBIGUOUS_REFERENCE
    # no finding may carry the parent's value for the duplicated column —
    # the submitted copy is the one in play (demographic's rulebook has
    # no rule for the column, so it simply yields no findings)
    assert not [r for r in rows
                if r["Column_Name"] == "SARS_CoV_2_PCR_Test_Result"
                and r["Column_Value"] == "Positive"
                and r["CSV_Sheet_Name"] == "demographic.csv"]


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_cross_sql_twins_match_dataframe_path(spark):
    """r11: the generated-SQL cross-sheet decoders (driver-build hot
    path) return exactly the DataFrame functions' rows — including
    duplicate-key multiplicity, a missing source leg, blank keys, and
    the PBMC type decode."""
    from nci_seronet_proc_data_validator_spark.operators.joins import (
        biospecimen_cross_findings,
        biospecimen_cross_sql,
        outer_join_spine,
        participant_cross_findings,
        participant_cross_sql,
    )
    from pyspark.sql import functions as F

    def df_ids(ids, extra=None):
        rows = [(i,) if extra is None else (i, extra.get(i, ""))
                for i in ids]
        schema = ("Research_Participant_ID string" if extra is None
                  else "Biospecimen_ID string, Biospecimen_Type string")
        if extra is None:
            schema = "Research_Participant_ID string"
        return spark.createDataFrame(rows, schema)

    # participant: 3 of 4 sources submitted (confirmatory missing),
    # dup key in prior, one malformed id, one blank
    prior = df_ids(["14_000001", "14_000001", "14_000002", "bad", ""])
    demo = df_ids(["14_000002", "14_000003"])
    bio = spark.createDataFrame(
        [("14_000003", "x", "PBMC"), ("14_000004", "y", "Serum")],
        "Research_Participant_ID string, Biospecimen_ID string, "
        "Biospecimen_Type string")
    sources = {"prior_clinical_test.csv": prior, "demographic.csv": demo,
               "biospecimen.csv": bio,
               "confirmatory_clinical_test.csv": None}
    spine = outer_join_spine(
        {k: v for k, v in sources.items() if v is not None},
        "Research_Participant_ID")
    spine = spine.withColumn("__in_confirmatory_clinical_test_csv",
                             F.lit(False))
    submitted = df_ids(["14_000001", "14_000002", "14_000003",
                        "14_000004"])
    want = participant_cross_findings(spine, "14", submitted)

    views = {}
    for n, src in sources.items():
        if src is None:
            views[n] = None
        else:
            v = "t_" + n.replace(".", "_")
            src.createOrReplaceTempView(v)
            views[n] = v
    submitted.createOrReplaceTempView("t_submitted_p")
    got = spark.sql(participant_cross_sql(views, "14", "t_submitted_p"))
    assert _rows(got) == _rows(want) and got.count() > 0

    # without the submitted restriction
    want2 = participant_cross_findings(spine, "14", None)
    got2 = spark.sql(participant_cross_sql(views, "14", None))
    assert _rows(got2) == _rows(want2)

    # biospecimen: bio + aliquot + equipment submitted (reagent,
    # consumable missing); PBMC and non-PBMC; dup key in aliquot
    bio2 = spark.createDataFrame(
        [("14_000001_001", "PBMC"), ("14_000001_002", "Serum"),
         ("14_000001_003", "PBMC")],
        "Biospecimen_ID string, Biospecimen_Type string")
    aliq = spark.createDataFrame(
        [("14_000001_001",), ("14_000001_001",), ("14_000001_004",)],
        "Biospecimen_ID string")
    equip = spark.createDataFrame(
        [("14_000001_002",), ("14_000001_001",)], "Biospecimen_ID string")
    bsources = {"biospecimen.csv": bio2, "aliquot.csv": aliq,
                "equipment.csv": equip, "reagent.csv": None,
                "consumable.csv": None}
    bspine = outer_join_spine(
        {k: v for k, v in bsources.items() if v is not None},
        "Biospecimen_ID")
    for n in ("reagent.csv", "consumable.csv"):
        bspine = bspine.withColumn("__in_" + n.replace(".", "_"),
                                   F.lit(False))
    bwant = biospecimen_cross_findings(bspine, "14", None)
    bviews = {}
    for n, src in bsources.items():
        if src is None:
            bviews[n] = None
        else:
            v = "tb_" + n.replace(".", "_")
            src.createOrReplaceTempView(v)
            bviews[n] = v
    bgot = spark.sql(biospecimen_cross_sql(
        bviews, "14", None, type_sources={"biospecimen.csv"}))
    assert _rows(bgot) == _rows(bwant) and bgot.count() > 0


def test_cross_sql_renders_are_wellformed():
    """Pure-text checks: quote escaping, boolean rendering, missing
    sources as FALSE literals, no stray Python-bool spellings."""
    from nci_seronet_proc_data_validator_spark.operators.joins import (
        biospecimen_cross_sql,
        participant_cross_sql,
    )
    views = {"prior_clinical_test.csv": "vp", "demographic.csv": "vd",
             "biospecimen.csv": "vb",
             "confirmatory_clinical_test.csv": None}
    sql = participant_cross_sql(views, "14", None)
    assert " True" not in sql and " False" not in sql   # SQL booleans only
    # missing confirmatory leg appears as a FALSE literal in any_missing
    assert "AND FALSE)" in sql
    assert "RLIKE '^14[_]{1}[0-9]{6}$'" in sql
    bsql = biospecimen_cross_sql(
        {"biospecimen.csv": "vb", "aliquot.csv": "va",
         "equipment.csv": None, "reagent.csv": None,
         "consumable.csv": None},
        "14", "vsub", type_sources={"biospecimen.csv"})
    assert "BROADCAST(sub)" in bsql and "LEFT SEMI JOIN" in bsql
    assert "Biospecimen_Type = 'PBMC'" in bsql.replace("(", "").replace(")", "")
