"""Full-rulebook driver query: binding↔oracle coherence and DuckDB parity.

The rulebook_full query compiles EVERY rulebook rule over the synthetic
submission (``plans/fixture.py``); its oracle is assembled SESSIONLESS
from the same binding (``plans/sql_oracle.py`` — checks are single-source
SQL templates). These tests pin: (1) binding without a SparkContext works
and every check carries a SQL mirror; (2) Spark and DuckDB agree
row-for-row at sf0.001; (3) the fixture actually exercises every check
family (severities, sentinel dup rows, warnings, SARS-conditional split).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from nci_seronet_proc_data_validator_spark.driver_queries import (
    q_rulebook_full,
)
from nci_seronet_proc_data_validator_spark.plans import sql_oracle

SF_DIR = "/root/testdata/sf0.001"

TABLES = ["customer", "supplier", "part", "orders", "lineitem"]


def _oracle_df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def test_every_bound_check_has_sql_mirror():
    """No spark fixture on purpose: binding and oracle assembly must work
    without a SparkContext (the driver calls oracle_sql() sessionless)."""
    n_checks = 0
    for spec, bound in sql_oracle.rulebook_bound_sheets():
        for cr in bound.column_rules:
            for ce in cr.checks:
                assert ce.sql is not None, (spec.sheet, cr.column)
                assert isinstance(ce.message, str), (spec.sheet, cr.column)
                n_checks += 1
    # The reference rulebook compiles to hundreds of per-column checks
    # (395 over this fixture's 96 columns); a big drop means a dispatch
    # branch stopped matching.
    assert n_checks >= 395, n_checks
    assert len(sql_oracle.rulebook_oracle_sql()) > 10_000


@pytest.fixture(scope="module")
def findings(spark):
    sdf = q_rulebook_full(spark, SF_DIR).toPandas()
    ddf = _oracle_df(sql_oracle.rulebook_oracle_sql())
    return sdf, ddf


def test_spark_matches_duckdb(findings):
    sdf, ddf = findings
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = ddf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_fixture_exercises_all_families(findings):
    sdf, _ = findings
    sheets = set(sdf.CSV_Sheet_Name)
    assert len(sheets) == 12, sheets  # 10 sheets + 2 cross-sheet families
    assert set(sdf.Message_Type) == {"Error", "Warning"}
    # sentinel dup-ID rows on every dup-checked sheet
    dup = sdf[sdf.Row_Index == -3]
    assert {"prior_clinical_test.csv", "demographic.csv",
            "biospecimen.csv", "aliquot.csv", "assay.csv",
            "confirmatory_clinical_test.csv"} <= set(dup.CSV_Sheet_Name)
    # cross-sheet presence findings (J3-J5, sentinel -10) on both spines
    cross = sdf[sdf.Row_Index == -10]
    assert {"Cross_Participant_ID.csv",
            "Cross_Biospecimen_ID.csv"} <= set(cross.CSV_Sheet_Name)
    msgs = " ".join(sdf.Error_Message.unique())
    for marker in [
            "Unexpected Value", "Valid Date", "interger",
            "must be a number", "must be a string",
            "Not Valid Format", "wrong CBC code",
            "is not a substring of", "ICD10",
            "Expiration Date has already passed",
            "Calibration Date has already passed",
            "Live Cell Count", "Viability Count",
            "requred for Sars Positive", "requred for Sars Negative",
            "Missing Values where found", "Id is repeated",
            "is not found in the table of valid"]:
        assert marker in msgs, marker


def test_key_unique_sheets_actually_unique():
    """key_unique=True lets q_rulebook_full skip the global findings
    dedup for a sheet's per-row legs (driver_queries.py) — an unnoticed
    key collision would silently emit duplicate findings. Pin the claim
    against the data itself: every key_unique sheet's row_index must be
    distinct in the fixture at both local scale factors. Sessionless by
    design (DuckDB over the same parquet + identical key expression)."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        for spec, _ in sql_oracle.rulebook_bound_sheets():
            n, d = con.execute(
                f"SELECT count(*), count(DISTINCT CAST({spec.key} AS "
                f"BIGINT)) FROM {spec.base}").fetchone()
            if spec.key_unique:
                assert n == d, (sf_dir, spec.sheet, n, d)
            else:
                # the one non-unique sheet must stay non-unique, or its
                # keyed-dedup arm stops being exercised by the fixture
                assert n > d, (sf_dir, spec.sheet, n, d)
        con.close()
