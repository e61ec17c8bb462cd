"""Scalar check operators (SURVEY.md §2.6, C1–C12) as pure Column algebra.

Every reference check (``File_Submission_Object.py``) filtered the pandas
sheet row-by-row with Python lambdas and appended findings. Here each check
compiles to one or more ``CheckExpr`` — (violation predicate, message,
severity) — over the raw string column and its typed shadows
(``c__num``/``c__ts``, see ``operators/typing.py``). No Python executes per
row; everything stays in whole-stage codegen.

Message strings reproduce the reference **verbatim**, including its typos
("interger", "databse", "requred", double spaces) — they are observable
output, i.e. spec.

Blank policy: the reference's ``sort_and_drop(header, keep_blank=False)``
(File_Submission_Object.py:152-156) silently drops findings whose value is
``''`` for most checks; only the missing-value pass reports blanks. We
encode that as a ``value != ''`` guard (``_nonblank``) on every check except
``get_missing_values``.

Keep-first dedup: pandas ``drop_duplicates`` keeps the first finding per
(Row_Index, Column_Name, Column_Value). The compiler reproduces this by
``coalesce``-ing all candidates of one column in rule order (plans/rules.py).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.typing import (
    _DATELIKE,
    num_col,
    ts_col,
)

ERROR = "Error"
WARNING = "Warning"


@dataclass
class CheckExpr:
    """One error class: rows where ``violation`` holds get ``message``.

    ``sql`` is the same violation predicate as DuckDB-dialect SQL text over
    the raw sheet columns — emitted by the SAME builder that compiles the
    Column, so the two backends cannot drift. It powers the full-rulebook
    driver oracle (``plans/sql_oracle.py``). ``None`` for checks whose
    parameters aren't SQL-literal (e.g. Column-valued date bounds).
    """
    violation: Column
    message: Column | str
    severity: str = ERROR
    sql: str | None = None

    def msg_col(self) -> Column:
        return F.lit(self.message) if isinstance(self.message, str) else self.message


@dataclass(frozen=True)
class Dependency:
    """P9 row scoping (``check_multi_rule``, File_Submission_Object.py:534-543).

    ``value`` is ``"Is A Number"`` / ``"Is A Date"`` / a list of strings.
    """
    column: str
    value: str | tuple[str, ...] | list[str] = field(default_factory=list)

    def predicate(self) -> Column:
        if self.value == "Is A Number":
            return F.col(num_col(self.column)).isNotNull()
        if self.value == "Is A Date":
            return F.col(ts_col(self.column)).isNotNull()
        vals = list(self.value) if not isinstance(self.value, str) else [self.value]
        return F.col(self.column).isin(vals)

    def error_str(self) -> str:
        # Trailing spaces match the reference exactly.
        if self.value == "Is A Number":
            return self.column + " is a Number "
        if self.value == "Is A Date":
            return self.column + " is a Date "
        vals = list(self.value) if not isinstance(self.value, str) else [self.value]
        return self.column + " is in " + str(vals)

    def predicate_sql(self) -> str:
        """The same scoping predicate as DuckDB SQL (see CheckExpr.sql)."""
        if self.value == "Is A Number":
            return f"({_sql_num(self.column)} IS NOT NULL)"
        if self.value == "Is A Date":
            return _sql_is_ts(self.column)
        vals = list(self.value) if not isinstance(self.value, str) else [self.value]
        return f"({self.column} IN ({_sql_str_list(vals)}))"


# ---------------------------------------------------------------------------
# DuckDB-dialect SQL mirrors of the typed-shadow predicates. The oracle
# assembler guarantees fixture values stay inside the dialect-shared domain
# (ISO dates, plain decimals — see plans/fixture.py); within that domain
# these are exactly ``operators/typing.py``'s shadows.

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_str_list(vals: list[str]) -> str:
    return ", ".join(_sql_quote(v) for v in vals)


def _sql_num(c: str) -> str:
    """``c__num``: float(x) succeeded and no '_' (ID exemption)."""
    return f"(CASE WHEN NOT contains({c}, '_') THEN TRY_CAST({c} AS DOUBLE) END)"


def _sql_is_ts(c: str) -> str:
    """``c__ts IS NOT NULL``: float failed, datelike, a parse succeeded.

    DuckDB's TIMESTAMP cast covers the ISO family of ``_TS_FORMATS``; the
    TIME cast covers the bare ``HH:mm[:ss]`` family. Fixture values outside
    the shared ISO/HH:MM domain are a parity bug (tests pin this).
    """
    return (f"(NOT contains({c}, '_') AND TRY_CAST({c} AS DOUBLE) IS NULL"
            f" AND regexp_matches({c}, {_sql_quote(_DATELIKE)})"
            f" AND (TRY_CAST({c} AS TIMESTAMP) IS NOT NULL"
            f" OR TRY_CAST({c} AS TIME) IS NOT NULL))")


def _sql_is_str(c: str) -> str:
    return f"({_sql_num(c)} IS NULL AND NOT {_sql_is_ts(c)})"


def _sql_nonblank(c: str) -> str:
    return f"{c} <> ''"


def _sql_ts_date(c: str) -> str:
    return f"CAST(TRY_CAST({c} AS TIMESTAMP) AS DATE)"


def _is_num(c: str) -> Column:
    return F.col(num_col(c)).isNotNull()


def _is_ts(c: str) -> Column:
    return F.col(ts_col(c)).isNotNull()


def _is_str(c: str) -> Column:
    """"is a string" after convert_data_type = neither float nor date."""
    return F.col(num_col(c)).isNull() & F.col(ts_col(c)).isNull()


def _nonblank(c: str) -> Column:
    return F.col(c) != F.lit("")


def _apply_dependency(checks: list[CheckExpr],
                      dependency: Dependency | None) -> list[CheckExpr]:
    if dependency is None:
        return checks
    pred = dependency.predicate()
    psql = dependency.predicate_sql()
    return [CheckExpr(pred & ce.violation, ce.message, ce.severity,
                      sql=None if ce.sql is None else f"({psql} AND {ce.sql})")
            for ce in checks]


def check_in_list(column: str, list_values: list,
                  dependency: Dependency | None = None) -> list[CheckExpr]:
    """C1 (File_Submission_Object.py:194-208): value ∈ list or ``''``.

    The reference compares POST-coercion cells, so numeric list members
    (e.g. ``[0]`` for Covid_Disease_Severity, Validation_Rules.py:149) match
    the float the cell was coerced to — we test those against the numeric
    shadow.
    """
    if dependency is None:
        msg = ("Unexpected Value.  Value must be one of the following: "
               + str(list_values))
    else:
        msg = (dependency.error_str()
               + ".  Value must be one of the following: " + str(list_values))
    strs = [v for v in list_values if isinstance(v, str)]
    nums = [float(v) for v in list_values if not isinstance(v, str)]
    passing = F.col(column).isin(strs) if strs else F.lit(False)
    pass_sql = f"{column} IN ({_sql_str_list(strs)})" if strs else "FALSE"
    if nums:
        passing = passing | F.col(num_col(column)).isin(nums)
        pass_sql += (f" OR {_sql_num(column)} IN "
                     f"({', '.join(repr(v) for v in nums)})")
    viol = ~passing & _nonblank(column)
    sql = f"(NOT ({pass_sql}) AND {_sql_nonblank(column)})"
    return _apply_dependency([CheckExpr(viol, msg, sql=sql)], dependency)


def check_date(column: str, lower_lim, upper_lim, na_allowed: bool,
               time_check: str = "Date",
               dependency: Dependency | None = None) -> list[CheckExpr]:
    """C2 (File_Submission_Object.py:210-243).

    - not a parseable date (and not ``''`` / allowed ``'N/A'``) → Error;
    - valid but out of [lower, upper] → Error, EXCEPT past
      ``*Expiration_Date*`` / ``*Calibration_Due_Date*`` → Warning with a
      dedicated message.
    """
    if time_check == "Date":
        fmt_msg = "Value must be a Valid Date MM/DD/YYYY"
    else:
        fmt_msg = "Value must be a Valid Time HH:MM:SS"
    allowed = [""] if not na_allowed else ["", "N/A"]
    if na_allowed:
        fmt_msg = fmt_msg + " Or N/A"

    not_date = ~_is_ts(column) & ~F.col(column).isin(allowed) & _nonblank(column)
    not_date_sql = (f"(NOT {_sql_is_ts(column)}"
                    f" AND {column} NOT IN ({_sql_str_list(allowed)})"
                    f" AND {_sql_nonblank(column)})")
    out = [CheckExpr(not_date, fmt_msg, sql=not_date_sql)]

    if time_check == "Date":
        lo = F.lit(lower_lim) if not isinstance(lower_lim, Column) else lower_lim
        hi = F.lit(upper_lim) if not isinstance(upper_lim, Column) else upper_lim
        d = F.to_date(F.col(ts_col(column)))
        range_msg = ("Date is valid however must be between "
                     + _fmt_lim(lower_lim) + " and " + _fmt_lim(upper_lim))
        early = _is_ts(column) & (d < F.to_date(lo)) & _nonblank(column)
        late = _is_ts(column) & (d > F.to_date(hi)) & _nonblank(column)

        def _bound_sql(op: str, lim) -> str | None:
            if isinstance(lim, Column) or not isinstance(
                    lim, (_dt.date, _dt.datetime)):
                return None
            day = lim.date() if isinstance(lim, _dt.datetime) else lim
            return (f"({_sql_is_ts(column)} AND {_sql_ts_date(column)}"
                    f" {op} DATE '{day.isoformat()}'"
                    f" AND {_sql_nonblank(column)})")

        early_sql = _bound_sql("<", lower_lim)
        late_sql = _bound_sql(">", upper_lim)
        if "Expiration_Date" in column:
            out.append(CheckExpr(
                early, "Expiration Date has already passed, check to make "
                       "sure date is correct", WARNING, sql=early_sql))
        elif "Calibration_Due_Date" in column:
            out.append(CheckExpr(
                early, "Calibration Date has already passed, check to make "
                       "sure date is correct", WARNING, sql=early_sql))
        else:
            out.append(CheckExpr(early, range_msg, sql=early_sql))
        out.append(CheckExpr(late, range_msg, sql=late_sql))
    return _apply_dependency(out, dependency)


def _fmt_lim(lim) -> str:
    """str() of the limit the way the reference embeds it in messages."""
    if isinstance(lim, (_dt.date, _dt.datetime)):
        return str(lim)
    return str(lim)


def check_if_number(column: str, lower_lim: float, upper_lim: float,
                    na_allowed: bool, num_type: str = "float",
                    dependency: Dependency | None = None) -> list[CheckExpr]:
    """C3 (File_Submission_Object.py:245-269).

    Reference quirk reproduced: when ``num_type == 'int'`` the range/
    not-a-number message is overwritten by the integer message before use,
    so ALL error classes of an int column carry the "interger" text.
    """
    range_msg = ("Value must be a number between " + str(lower_lim)
                 + " and " + str(upper_lim))
    if dependency is not None:
        range_msg = (dependency.error_str()
                     + ".  Value must be a number between "
                     + str(lower_lim) + " and " + str(upper_lim))
    int_msg = ("Value must be an interger between " + str(lower_lim)
               + " and " + str(upper_lim)
               + ", decimal values are not allowed")
    msg = int_msg if num_type == "int" else range_msg

    allowed = [""] if not na_allowed else ["", "N/A"]
    n = F.col(num_col(column))
    ns = _sql_num(column)
    nb = _sql_nonblank(column)
    not_num = n.isNull() & ~F.col(column).isin(allowed) & _nonblank(column)
    out = [CheckExpr(not_num, msg,
                     sql=f"({ns} IS NULL AND {column} NOT IN "
                         f"({_sql_str_list(allowed)}) AND {nb})")]
    if num_type == "int":
        out.append(CheckExpr(n.isNotNull() & (n != F.floor(n)) & _nonblank(column),
                             int_msg,
                             sql=f"({ns} IS NOT NULL AND {ns} <> floor({ns})"
                                 f" AND {nb})"))
    out.append(CheckExpr(n.isNotNull() & (n < F.lit(lower_lim)) & _nonblank(column), msg,
                         sql=f"({ns} IS NOT NULL AND {ns} < {float(lower_lim)!r}"
                             f" AND {nb})"))
    out.append(CheckExpr(n.isNotNull() & (n > F.lit(upper_lim)) & _nonblank(column), msg,
                         sql=f"({ns} IS NOT NULL AND {ns} > {float(upper_lim)!r}"
                             f" AND {nb})"))
    return _apply_dependency(out, dependency)


def check_if_string(column: str, na_allowed: bool = False,
                    dependency: Dependency | None = None) -> list[CheckExpr]:
    """C4 (File_Submission_Object.py:288-301): cell must have stayed a
    string through type coercion (not number, not date)."""
    if dependency is None:
        msg = "Value must be a string and NOT N/A"
    else:
        msg = dependency.error_str() + ".  Value must be a string and NOT N/A"
    viol = ~_is_str(column) & _nonblank(column)
    sql = f"(NOT {_sql_is_str(column)} AND {_sql_nonblank(column)})"
    return _apply_dependency([CheckExpr(viol, msg, sql=sql)], dependency)


def check_id_field(column: str, pattern_str: str, cbc_id: str,
                   pattern_error: str) -> list[CheckExpr]:
    """C5 (File_Submission_Object.py:166-180): format regex then CBC-prefix
    regex. A value failing both gets only the format error (keep-first
    dedup); blanks report nothing (reference skips '' explicitly for the
    format branch and drops '' findings for the CBC branch)."""
    fmt_viol = ~F.col(column).rlike("^[0-9]{2}" + pattern_str) & _nonblank(column)
    cbc_viol = ~F.col(column).rlike("^" + cbc_id + pattern_str) & _nonblank(column)
    if int(cbc_id) == 0:
        cbc_msg = ("ID is Valid however submission file is missing, unable "
                   "to validate CBC code")
    else:
        cbc_msg = ("ID is Valid however has wrong CBC code. Expecting CBC "
                   "Code (" + str(cbc_id) + ")")
    nb = _sql_nonblank(column)
    return [
        CheckExpr(fmt_viol, "ID is Not Valid Format, Expecting " + pattern_error,
                  sql=f"(NOT regexp_matches({column}, "
                      f"{_sql_quote('^[0-9]{2}' + pattern_str)}) AND {nb})"),
        CheckExpr(cbc_viol, cbc_msg,
                  sql=f"(NOT regexp_matches({column}, "
                      f"{_sql_quote('^' + cbc_id + pattern_str)}) AND {nb})"),
    ]


def check_if_substr(column: str, id_1: str, id_2: str) -> list[CheckExpr]:
    """C7 (File_Submission_Object.py:189-192): x[id_1] must be a substring
    of x[id_2]."""
    msg = (id_1 + " is not a substring of " + id_2
           + ".  Data is not Valid, please check data")
    viol = ~F.col(id_2).contains(F.col(id_1)) & _nonblank(column)
    sql = f"(NOT contains({id_2}, {id_1}) AND {_sql_nonblank(column)})"
    return [CheckExpr(viol, msg, sql=sql)]


def check_icd10(column: str, valid_flag_col: str) -> list[CheckExpr]:
    """C8 (File_Submission_Object.py:303-309): non-strings are errors;
    strings must be known ICD-10 codes or 'N/A'.

    ``valid_flag_col`` is a boolean column produced by a broadcast left join
    against the ICD-10 reference table (J8) — true iff the code exists. The
    reference called ``icd10.exists(x)`` per cell; the join keeps the lookup
    distributed and JVM-side.
    """
    msg = ("Invalid or unknown ICD10 code, Value must be Valid ICD10 code "
           "or N/A")
    bad_code = (_is_str(column)
                & ~F.coalesce(F.col(valid_flag_col), F.lit(False))
                & (F.col(column) != "N/A") & _nonblank(column))
    non_string = ~_is_str(column) & _nonblank(column)
    # The oracle assembler must define an ``icd10_dict(code)`` CTE holding
    # the same codes the flag join was built from (plans/sql_oracle.py).
    nb = _sql_nonblank(column)
    # Dot normalization mirrors operators/joins.py:icd10_flag_join.
    sql = (f"(({_sql_is_str(column)}"
           f" AND NOT (replace({column}, '.', '') IN"
           f" (SELECT replace(code, '.', '') FROM icd10_dict))"
           f" AND {column} <> 'N/A' AND {nb})"
           f" OR (NOT {_sql_is_str(column)} AND {nb}))")
    return [CheckExpr(bad_code | non_string, msg, sql=sql)]


def assay_special(column: str, joined_field: str,
                  header_name: str) -> list[CheckExpr]:
    """C9 (File_Submission_Object.py:162-165): value failed to resolve
    against the assay reference — the left-joined field is null."""
    msg = (header_name + " is not found in the table of valid " + header_name
           + "s in databse or submitted file")
    return [CheckExpr(F.col(joined_field).isNull() & _nonblank(column), msg,
                      sql=f"({joined_field} IS NULL"
                          f" AND {_sql_nonblank(column)})")]


def compare_total_to_live(total_column: str) -> list[CheckExpr]:
    """C10 (File_Submission_Object.py:271-277): Live_Cells_* > Total_Cells_*
    (both numeric) is an error. Column pairing by name substitution."""
    live_column = total_column.replace("Total_Cells", "Live_Cells")
    viol = (_is_num(total_column) & _is_num(live_column)
            & (F.col(num_col(live_column)) > F.col(num_col(total_column)))
            & _nonblank(total_column))
    tn, ln = _sql_num(total_column), _sql_num(live_column)
    sql = (f"({tn} IS NOT NULL AND {ln} IS NOT NULL AND {ln} > {tn}"
           f" AND {_sql_nonblank(total_column)})")
    return [CheckExpr(viol, "Live Cell Count must be less than Total Cell Count",
                      sql=sql)]


def compare_viability(viability_column: str) -> list[CheckExpr]:
    """C11 (File_Submission_Object.py:278-286):
    round(live/total*100, 1) != viability (all three numeric)."""
    live = viability_column.replace("Viability", "Live_Cells")
    total = viability_column.replace("Viability", "Total_Cells")
    viol = (_is_num(viability_column) & _is_num(live) & _is_num(total)
            & (F.round(F.col(num_col(live)) / F.col(num_col(total)) * 100, 1)
               != F.col(num_col(viability_column)))
            & _nonblank(viability_column))
    vn, ln, tn = (_sql_num(viability_column), _sql_num(live), _sql_num(total))
    sql = (f"({vn} IS NOT NULL AND {ln} IS NOT NULL AND {tn} IS NOT NULL"
           f" AND round({ln} / {tn} * 100, 1) <> {vn}"
           f" AND {_sql_nonblank(viability_column)})")
    return [CheckExpr(
        viol, "Viability Count must be equal to (Live_Count / Total_Count) * 100",
        sql=sql)]


def get_missing_values(column: str, required_column: str,
                       sars_col: str = "SARS_CoV_2_PCR_Test_Result"
                       ) -> list[CheckExpr]:
    """C12 (File_Submission_Object.py:311-333): '' cells. Severity: Error if
    required, Warning if optional; "Yes: SARS-Positive"/"Yes: SARS-Negative"
    split severity by the PCR result cohort."""
    blank = F.col(column) == F.lit("")
    blank_sql = f"{column} = ''"
    req_msg = "Missing Values are not allowed for this column.  Please recheck data"
    warn_msg = "Missing Values where found, this is a warning.  Please recheck data"
    if required_column == "Yes":
        return [CheckExpr(blank, req_msg, ERROR, sql=f"({blank_sql})")]
    if required_column == "No":
        return [CheckExpr(blank, warn_msg, WARNING, sql=f"({blank_sql})")]
    if required_column == "Yes: SARS-Positive":
        err_msg = ("This column is requred for Sars Positive Patients, "
                   "missing values are not allowed.  Please recheck data")
        return [
            CheckExpr(blank & (F.col(sars_col) == "Positive"), err_msg, ERROR,
                      sql=f"({blank_sql} AND {sars_col} = 'Positive')"),
            CheckExpr(blank & (F.col(sars_col) == "Negative"), warn_msg, WARNING,
                      sql=f"({blank_sql} AND {sars_col} = 'Negative')"),
        ]
    if required_column == "Yes: SARS-Negative":
        err_msg = ("This column is requred for Sars Negative Patients, "
                   "missing values are not allowed.  Please recheck data")
        return [
            CheckExpr(blank & (F.col(sars_col) == "Negative"), err_msg, ERROR,
                      sql=f"({blank_sql} AND {sars_col} = 'Negative')"),
            CheckExpr(blank & (F.col(sars_col) == "Positive"), warn_msg, WARNING,
                      sql=f"({blank_sql} AND {sars_col} = 'Positive')"),
        ]
    return []
