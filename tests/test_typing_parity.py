"""C13 parity: typed-shadow classification vs the reference's
``convert_data_type`` (nci-seronet-data-validator.py:196-206), which tries
``float(x)`` then ``dateutil.parser.parse(x)`` per cell.

Every pool value must either classify identically (string/number/date —
and for dates, parse to the same instant) or appear in DOCUMENTED_GAPS
with a reason. A gap entry whose value starts agreeing fails the test too
(stale documentation), so the divergence list can only shrink knowingly.
"""

import datetime

import pytest
from dateutil import parser as duparser

from nci_seronet_proc_data_validator_spark.operators.typing import (
    with_typed_shadows,
)

# Values drawn from the rulebook's fixture families: ISO/US dates, times,
# month-name dates, numbers, IDs, vocabulary strings, junk.
POOL = [
    "2020-05-01", "2020-05-01 13:45:00", "2020-05-01T13:45:00",
    "5/1/2020", "05/01/2020", "5/1/20", "12/31/1999 23:59:59",
    "1/2/2020 7:05",
    "13:45:00", "7:05",
    "Jan 5 2020", "January 5, 2020", "Jan 5, 2020", "5 Jan 2020",
    "17 March 2021",
    "30", "17.5", "300", "-4", "1e3", "0.0",
    "14_000001", "14_000001_001",            # IDs: '_' exempts from typing
    "Positive", "N/A", "", "PBMC", "Martian",
    "Clerk#000000951", "1-URGENT",
    "2020-13-45",                            # invalid date, invalid float
    "not a date",
]

# Bare times: dateutil backfills TODAY's date, we pin 1970-01-01; the
# reference's Time checks compare .time() only, so parity is on time-of-day.
TIME_ONLY = {"13:45:00", "7:05"}

# value -> why the engines may disagree (accepted, documented divergence).
DOCUMENTED_GAPS = {
    # dateutil backfills missing fields from "today" — non-reproducible
    # output; we intentionally reject partial dates.
    "Jan 5": "partial date: dateutil fills current year",
    "Wednesday": "weekday word: dateutil resolves to a nearby date",
    "March 2021": "month+year only: dateutil fills day=today.day",
    # dateutil accepts dotted dates; the rulebook never uses them.
    "2020.05.01": "dotted date separators not in _TS_FORMATS",
}
POOL += list(DOCUMENTED_GAPS)


def _ref_classify(v: str):
    """The reference's per-cell coercion, verbatim semantics."""
    if "_" in v:
        return ("string", None)
    try:
        float(v)
        return ("number", float(v))
    except (TypeError, ValueError):
        pass
    try:
        return ("date", duparser.parse(v))
    except (TypeError, ValueError, OverflowError):
        return ("string", None)


def test_shadow_classification_matches_dateutil(spark):
    df = spark.createDataFrame([(v,) for v in POOL], "v string") \
        .selectExpr("v", "cast(null as long) as row_index")
    shadowed = with_typed_shadows(df)
    got = {r["v"]: r for r in shadowed.collect()}

    mismatches = []
    for v in POOL:
        ref_kind, ref_val = _ref_classify(v)
        num, ts = got[v]["v__num"], got[v]["v__ts"]
        spark_kind = ("number" if num is not None
                      else "date" if ts is not None else "string")
        agree = spark_kind == ref_kind
        if agree and ref_kind == "date":
            # same classification AND same instant (reference feeds the
            # parsed datetime into range checks); bare times compare on
            # time-of-day only
            agree = (ts.time() == ref_val.time() if v in TIME_ONLY
                     else ts == ref_val)
        if v in DOCUMENTED_GAPS:
            assert not agree, (
                f"{v!r} now agrees ({spark_kind}) — remove stale entry from "
                f"DOCUMENTED_GAPS")
        elif not agree:
            mismatches.append((v, ref_kind, ref_val, spark_kind, num or ts))
    assert not mismatches, f"undocumented divergences: {mismatches}"
