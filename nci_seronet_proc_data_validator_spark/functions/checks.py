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

from nci_seronet_proc_data_validator_spark.operators.typing import num_col, ts_col

ERROR = "Error"
WARNING = "Warning"


@dataclass
class CheckExpr:
    """One error class: rows where ``violation`` holds get ``message``."""
    violation: Column
    message: Column | str
    severity: str = ERROR

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
    return [CheckExpr(pred & ce.violation, ce.message, ce.severity)
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
    if nums:
        passing = passing | F.col(num_col(column)).isin(nums)
    viol = ~passing & _nonblank(column)
    return _apply_dependency([CheckExpr(viol, msg)], dependency)


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
    out = [CheckExpr(not_date, fmt_msg)]

    if time_check == "Date":
        lo = F.lit(lower_lim) if not isinstance(lower_lim, Column) else lower_lim
        hi = F.lit(upper_lim) if not isinstance(upper_lim, Column) else upper_lim
        d = F.to_date(F.col(ts_col(column)))
        range_msg = ("Date is valid however must be between "
                     + _fmt_lim(lower_lim) + " and " + _fmt_lim(upper_lim))
        early = _is_ts(column) & (d < F.to_date(lo)) & _nonblank(column)
        late = _is_ts(column) & (d > F.to_date(hi)) & _nonblank(column)
        if "Expiration_Date" in column:
            out.append(CheckExpr(
                early, "Expiration Date has already passed, check to make "
                       "sure date is correct", WARNING))
        elif "Calibration_Due_Date" in column:
            out.append(CheckExpr(
                early, "Calibration Date has already passed, check to make "
                       "sure date is correct", WARNING))
        else:
            out.append(CheckExpr(early, range_msg))
        out.append(CheckExpr(late, range_msg))
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
    not_num = n.isNull() & ~F.col(column).isin(allowed) & _nonblank(column)
    out = [CheckExpr(not_num, msg)]
    if num_type == "int":
        out.append(CheckExpr(n.isNotNull() & (n != F.floor(n)) & _nonblank(column),
                             int_msg))
    out.append(CheckExpr(n.isNotNull() & (n < F.lit(lower_lim)) & _nonblank(column), msg))
    out.append(CheckExpr(n.isNotNull() & (n > F.lit(upper_lim)) & _nonblank(column), msg))
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
    return _apply_dependency([CheckExpr(viol, msg)], dependency)


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
    return [
        CheckExpr(fmt_viol, "ID is Not Valid Format, Expecting " + pattern_error),
        CheckExpr(cbc_viol, cbc_msg),
    ]


def check_if_substr(column: str, id_1: str, id_2: str) -> list[CheckExpr]:
    """C7 (File_Submission_Object.py:189-192): x[id_1] must be a substring
    of x[id_2]."""
    msg = (id_1 + " is not a substring of " + id_2
           + ".  Data is not Valid, please check data")
    viol = ~F.col(id_2).contains(F.col(id_1)) & _nonblank(column)
    return [CheckExpr(viol, msg)]


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
    return [CheckExpr(bad_code | non_string, msg)]


def assay_special(column: str, joined_field: str,
                  header_name: str) -> list[CheckExpr]:
    """C9 (File_Submission_Object.py:162-165): value failed to resolve
    against the assay reference — the left-joined field is null."""
    msg = (header_name + " is not found in the table of valid " + header_name
           + "s in databse or submitted file")
    return [CheckExpr(F.col(joined_field).isNull() & _nonblank(column), msg)]


def compare_total_to_live(total_column: str) -> list[CheckExpr]:
    """C10 (File_Submission_Object.py:271-277): Live_Cells_* > Total_Cells_*
    (both numeric) is an error. Column pairing by name substitution."""
    live_column = total_column.replace("Total_Cells", "Live_Cells")
    viol = (_is_num(total_column) & _is_num(live_column)
            & (F.col(num_col(live_column)) > F.col(num_col(total_column)))
            & _nonblank(total_column))
    return [CheckExpr(viol, "Live Cell Count must be less than Total Cell Count")]


def compare_viability(viability_column: str) -> list[CheckExpr]:
    """C11 (File_Submission_Object.py:278-286):
    round(live/total*100, 1) != viability (all three numeric)."""
    live = viability_column.replace("Viability", "Live_Cells")
    total = viability_column.replace("Viability", "Total_Cells")
    viol = (_is_num(viability_column) & _is_num(live) & _is_num(total)
            & (F.round(F.col(num_col(live)) / F.col(num_col(total)) * 100, 1)
               != F.col(num_col(viability_column)))
            & _nonblank(viability_column))
    return [CheckExpr(
        viol, "Viability Count must be equal to (Live_Count / Total_Count) * 100")]


def get_missing_values(column: str, required_column: str,
                       sars_col: str = "SARS_CoV_2_PCR_Test_Result"
                       ) -> list[CheckExpr]:
    """C12 (File_Submission_Object.py:311-333): '' cells. Severity: Error if
    required, Warning if optional; "Yes: SARS-Positive"/"Yes: SARS-Negative"
    split severity by the PCR result cohort."""
    blank = F.col(column) == F.lit("")
    req_msg = "Missing Values are not allowed for this column.  Please recheck data"
    warn_msg = "Missing Values where found, this is a warning.  Please recheck data"
    if required_column == "Yes":
        return [CheckExpr(blank, req_msg, ERROR)]
    if required_column == "No":
        return [CheckExpr(blank, warn_msg, WARNING)]
    if required_column == "Yes: SARS-Positive":
        err_msg = ("This column is requred for Sars Positive Patients, "
                   "missing values are not allowed.  Please recheck data")
        return [
            CheckExpr(blank & (F.col(sars_col) == "Positive"), err_msg, ERROR),
            CheckExpr(blank & (F.col(sars_col) == "Negative"), warn_msg, WARNING),
        ]
    if required_column == "Yes: SARS-Negative":
        err_msg = ("This column is requred for Sars Negative Patients, "
                   "missing values are not allowed.  Please recheck data")
        return [
            CheckExpr(blank & (F.col(sars_col) == "Negative"), err_msg, ERROR),
            CheckExpr(blank & (F.col(sars_col) == "Positive"), warn_msg, WARNING),
        ]
    return []
