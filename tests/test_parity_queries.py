"""Round-trip parity queries (``parity.py``): the side-effecting surfaces
(S9 sink, §2.8 streaming, S5/S6/S11 JDBC) executed inside a query callable
and checked against their DuckDB oracles at sf0.001 — the same compare the
driver's correctness gate runs at sf0.01."""

import os

import duckdb
import pandas as pd
import pytest

from nci_seronet_proc_data_validator_spark.parity import (
    SQL_JDBC_ROUNDTRIP,
    SQL_STREAMING_PARITY,
    q_jdbc_roundtrip,
    q_streaming_parity,
    q_submission_misc,
    sql_submission_misc,
)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "events", "documents"]


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _assert_match(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].map(
                lambda v: "<NULL>" if v is None or (isinstance(v, float)
                                                    and pd.isna(v))
                else str(v))
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(sdf), canon(odf))


def test_submission_misc_matches_oracle(spark, sf_dir):
    got = q_submission_misc(spark, sf_dir).toPandas()
    want = _oracle(sf_dir, sql_submission_misc())
    _assert_match(got, want)
    # the sink arm is a real write→readback: it must carry exactly the
    # findings the direct computation produces
    n_sink = (got["arm"] == "sink_csv").sum()
    n_direct = _oracle(sf_dir, "SELECT count(*) AS n FROM customer WHERE "
                       "c_mktsegment IN ('FURNITURE','HOUSEHOLD')")
    assert n_sink == int(n_direct["n"].iloc[0]) > 0
    # the workbook arm round-trips BOTH severities across two worksheets
    assert set(got.loc[got["arm"] == "sink_xlsx", "s2"]) == \
        {"Error", "Warning"}
    # status arm: errors beat warnings per file; clean file gets SUCCESS;
    # submission-wide status is FAILURE on every row
    st = got[got["arm"] == "status"].set_index("s1")["s2"]
    assert st["customer.csv"].startswith("FILE_PROCESSED_ERRORS_FOUND|")
    assert st["orders.csv"].startswith("FILE_PROCESSED_WARNINGS_FOUND|")
    assert st["clean.csv"].startswith("FILE_PROCESSED_SUCCESS|")
    assert all(s.endswith("|FILE_VALIDATION_FAILURE") for s in st)
    # colcmp arm: both directions of the header/catalog set difference
    cc = got[got["arm"] == "colcmp"]
    assert set(cc["s1"]) == {"c_mktsegment", "c_address"}
    # read_any arm reassembles the whole customer table from mixed formats
    n_cust = _oracle(sf_dir, "SELECT count(*) AS n FROM customer")
    assert (got["arm"] == "read_any").sum() == int(n_cust["n"].iloc[0])


def test_streaming_parity_matches_oracle(spark, sf_dir):
    got = q_streaming_parity(spark, sf_dir).toPandas()
    want = _oracle(sf_dir, SQL_STREAMING_PARITY)
    _assert_match(got, want)
    # the dedup arm saw every doc twice (planted duplicates) and must
    # emit exactly one row per distinct content hash
    n_hashes = _oracle(sf_dir, "SELECT count(DISTINCT md5(text)) AS n "
                       "FROM documents")
    assert (got["arm"] == "dedup").sum() == int(n_hashes["n"].iloc[0]) > 0
    # interval arm: stream-stream join emitted at least one anchor-point
    # pair, and every pair is unique
    iv = got[got["arm"] == "interval"]
    assert len(iv) > 0 and not iv.duplicated(["k", "s"]).any()
    # watch arm: the watcher ran the rulebook — planted violations from
    # the equipment fixture must be present as count-aggregated findings
    watch = set(got.loc[got["arm"] == "watch", "s"])
    assert any(s.startswith("Error|Equipment_Type|Toaster|") for s in watch)
    assert any(s.startswith("Warning|Equipment_Calibration_Due_Date|"
                            "2023-02-03|") for s in watch)


def test_jdbc_roundtrip_matches_oracle(spark, sf_dir):
    got = q_jdbc_roundtrip(spark, sf_dir).toPandas()
    want = _oracle(sf_dir, SQL_JDBC_ROUNDTRIP)
    _assert_match(got, want)
    # upsert ran twice: no duplicated job rows, and re-run keys flipped
    # to the second status
    ups = got[got["arm"] == "upsert"]
    assert ups["s1"].is_unique
    assert set(ups["s2"]) == {"FIRST", "SECOND"}


def test_streaming_parity_is_rerunnable(spark, sf_dir):
    """A second invocation in the same session must not collide with the
    first run's memory sinks or temp dirs (the driver may call twice)."""
    a = q_streaming_parity(spark, sf_dir).count()
    b = q_streaming_parity(spark, sf_dir).count()
    assert a == b > 0
