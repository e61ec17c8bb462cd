"""Join layer: enrichment joins (J1/J2), cross-sheet spines (J3–J5),
submitted-id restriction (J6), reference-dict lookup (J8).

The reference decodes presence/absence after full-outer joins through NaN
arithmetic (``query("X != X")`` = "X is NaN" — ``File_Submission_Object.py:
335-396``). Spark-first design: each source contributes an explicit boolean
indicator column (``lit(True)`` before the outer join), and the 6
participant + 4 biospecimen presence patterns decode as one ``when`` chain —
a single pass over the joined spine, null-safe, and AQE-optimizable.

Scale notes:
- Enrichment joins (J1/J2) broadcast the parent Merged_Table — it is a
  key-column projection, small by construction (the reference pre-projects
  for the same reason, ``File_Submission_Object.py:102``).
- The outer-join spines shuffle on the ID key once; every pattern decodes
  from that single shuffled dataset.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.errors import (
    ROW_CROSS_SHEET,
    finding_struct,
)

# Merge_Cols per sheet (col_valid_dict, nci-seronet-data-validator.py:21-31).
MERGE_COLS = {
    "prior_clinical_test.csv": ["Research_Participant_ID",
                                "SARS_CoV_2_PCR_Test_Result"],
    "demographic.csv": ["Research_Participant_ID", "Age"],
    "biospecimen.csv": ["Research_Participant_ID", "Biospecimen_ID",
                        "Biospecimen_Type"],
    "aliquot.csv": ["Aliquot_ID", "Biospecimen_ID"],
    "equipment.csv": ["Equipment_ID", "Biospecimen_ID"],
    "reagent.csv": ["Reagent_Name", "Biospecimen_ID"],
    "consumable.csv": ["Consumable_Name", "Biospecimen_ID"],
    "assay.csv": ["Assay_ID", "Assay_Name"],
    "assay_target.csv": ["Assay_ID", "Assay_Target", "Assay_Antigen_Source"],
    "confirmatory_clinical_test.csv": ["Research_Participant_ID", "Assay_ID"],
    "submission.csv": [],
}

# Which parents each sheet is enriched from before rule evaluation
# (merge_tables, File_Submission_Object.py:128-147). The duplicate dead
# elif for processing sheets (:137-140, reference bug §2.9.3) collapses to
# one entry.
ENRICH_PARENTS = {
    "prior_clinical_test.csv": [("demographic.csv", ["Research_Participant_ID"])],
    "demographic.csv": [("prior_clinical_test.csv", ["Research_Participant_ID"])],
    "biospecimen.csv": [("prior_clinical_test.csv", ["Research_Participant_ID"]),
                        ("demographic.csv", ["Research_Participant_ID"])],
    "aliquot.csv": [("biospecimen.csv", ["Biospecimen_ID"])],
    "equipment.csv": [("biospecimen.csv", ["Biospecimen_ID"])],
    "reagent.csv": [("biospecimen.csv", ["Biospecimen_ID"])],
    "consumable.csv": [("biospecimen.csv", ["Biospecimen_ID"])],
    "assay_target.csv": [("assay.csv", ["Assay_ID"])],
    "confirmatory_clinical_test.csv": [
        ("assay.csv", ["Assay_ID"]),
        ("assay_target.csv", ["Assay_ID", "Assay_Target"])],
}


def merged_table(sheet_df: DataFrame, sheet_name: str) -> DataFrame | None:
    """P1: the key-column projection used as a join side
    (File_Submission_Object.py:102)."""
    cols = MERGE_COLS.get(sheet_name, [])
    if not cols:
        return None
    have = [c for c in cols if c in sheet_df.columns]
    return sheet_df.select(have)


def merge_tables(sheet_name: str, df: DataFrame,
                 merged: dict[str, DataFrame],
                 extra_keys: tuple[str, ...] = ()) -> tuple[DataFrame, list[str]]:
    """J1/J2 enrichment: left-join parent Merged_Tables (broadcast — they
    are small key projections). Returns (enriched df, drop_list of columns
    the joins added — exempt from rules, Validation_Rules.py:5-6).

    ``extra_keys``: columns prepended to every join key (batched
    multi-submission mode joins on the submission tag too, so a
    participant in one submission never enriches from another's
    parent sheet)."""
    before = set(df.columns)
    for parent, keys in ENRICH_PARENTS.get(sheet_name, []):
        pt = merged.get(parent)
        if pt is None:
            continue
        keys = [*extra_keys, *keys]
        have_keys = [k for k in keys if k in df.columns and k in pt.columns]
        if len(have_keys) != len(keys):
            continue
        # Only join columns the sheet does not already carry: a submitted
        # sheet that includes a dependency column (e.g. demographic.csv
        # shipping its own SARS_CoV_2_PCR_Test_Result) keeps ITS values
        # and the column stays subject to rules (it is not in drop_list).
        # Joining the parent copy anyway would produce two same-named
        # columns and AMBIGUOUS_REFERENCE on the first downstream
        # selectExpr. (The reference's pandas merge would suffix the
        # duplicate to _x/_y and silently break rule lookup —
        # File_Submission_Object.py:96-105; taking the submitted values
        # is the defined behavior here.)
        add = [c for c in pt.columns
               if c not in have_keys and c not in df.columns]
        if not add:
            continue
        df = df.join(F.broadcast(pt.select(*have_keys, *add)),
                     on=have_keys, how="left")
    drop_list = [c for c in df.columns if c not in before]
    return df, drop_list


def _indicator(name: str) -> str:
    # '.' would parse as struct access in column references.
    return "__in_" + name.replace(".", "_")


def outer_join_spine(sources: dict[str, DataFrame], key: str | list[str]
                     ) -> DataFrame:
    """J3/J4: chained full-outer join of Merged_Tables on ``key``, with one
    boolean presence indicator per source (replaces NaN-decoding, J5)."""
    keys = [key] if isinstance(key, str) else list(key)
    parts = []
    for name, df in sources.items():
        if df is None:
            continue
        parts.append(df.withColumn(_indicator(name), F.lit(True)))
    if not parts:
        raise ValueError("no sources for spine")
    spine = reduce(lambda a, b: a.join(b, on=keys, how="outer"), parts)
    fills = {_indicator(n): False for n in sources if sources[n] is not None}
    return spine.na.fill(fills)


def presence_spine(sources: dict[str, DataFrame], key: str | list[str],
                   carry: dict[str, list[str]] | None = None) -> DataFrame:
    """J3/J4 spine as ONE shuffle: UNION ALL of tagged ID projections →
    a single ``groupBy(key)`` with one ``max(__src = name)`` presence flag
    per source.

    Same output schema as :func:`outer_join_spine` (key + boolean
    indicators + carried columns) but a chain of k−1 full-outer joins —
    k−1 serialized exchanges of a growing spine, which at 100 TB is the
    long pole of the cross-sheet pass and in a multi-leg plan gates every
    sibling stage behind the join chain — becomes one map-side-combinable
    aggregation. Mirrors the reference's cross-sheet ID reconciliation
    intent (``File_Submission_Object.py:335-396``) without its join shape.

    Semantics notes:
    - Sources need NOT be pre-distinct: the groupBy collapses duplicate
      keys within a source (presence stays true). ``outer_join_spine``
      instead REPLICATES rows per key combination — callers that rely on
      that multi-row behavior (non-unique Merged_Tables in
      ``submission.py``) must keep using it.
    - NULL keys: groupBy unifies NULLs into ONE group across all sources
      (a NULL-keyed row in two sources yields one spine row with both
      flags true), while the full-outer join keeps each source's NULL
      rows as separate never-matching rows. Filter NULLs out first — or
      use ``outer_join_spine`` — when NULL-keyed rows are meaningful.
      (The rulebook callers are unaffected: ingest stores blanks as
      ``''``, and the cross-finding decoders rlike-filter malformed IDs.)
    - ``carry``: {source_name: [column, ...]} — non-key columns carried
      through as ``min(CASE WHEN __src = name THEN col END)``; for keys
      with several rows in that source this is the deterministic min,
      matching the explicit ``groupBy(key).agg(min(col))`` pre-aggregation
      the outer-join callers do by hand. NULL for keys absent from the
      source, exactly like the outer join.
    """
    keys = [key] if isinstance(key, str) else list(key)
    carry = carry or {}
    srcs = [(n, df) for n, df in sources.items() if df is not None]
    if not srcs:
        raise ValueError("no sources for spine")
    all_carry = [(n, c) for n, cols in carry.items() for c in cols]
    legs = []
    for name, df in srcs:
        cols = [*(F.col(k) for k in keys), F.lit(name).alias("__src")]
        for src_of, c in all_carry:
            cols.append(
                (F.col(c) if src_of == name
                 else F.lit(None).cast(sources[src_of].schema[c].dataType))
                .alias(c))
        legs.append(df.select(*cols))
    u = reduce(lambda a, b: a.unionByName(b), legs)
    aggs = [F.max(F.col("__src") == F.lit(name)).alias(_indicator(name))
            for name, _ in srcs]
    aggs += [F.min(F.when(F.col("__src") == F.lit(src_of), F.col(c)))
             .alias(c) for src_of, c in all_carry]
    return u.groupBy(*keys).agg(*aggs)


def present(name: str) -> Column:
    return F.col(_indicator(name))


# --- participant presence patterns (File_Submission_Object.py:379-396) ----
_PART_PATTERNS = [
    # (in_prior, in_demo, in_bio) → message
    ((True, False, False),
     "ID is found in Prior_Clinical_Test, but is missing from Demographic and Biospecimen"),
    ((False, True, False),
     "ID is found in Demographic, but is missing from Prior_Clinical_Test and Biospecimen"),
    ((False, False, True),
     "ID is found in Biospecimen, but is missing from Prior_Clinical_Test and Demographic"),
    ((True, True, False),
     "ID is found in Prior_Clinical_Test and Demographic but is missing from Biospecimen"),
    ((True, False, True),
     "ID is found in Prior_Clinical_Test and Biospecimen but is missing from Demographic"),
    ((False, True, True),
     "ID is found in Demographic and Biospecimen but is missing from Prior_Clinical_Test"),
]


def participant_cross_findings(spine: DataFrame, cbc_id: str,
                               submitted_ids: DataFrame | None = None
                               ) -> DataFrame:
    """Decode the 6 participant presence patterns into findings
    (sheet ``Cross_Participant_ID.csv``, sentinel row −10).

    ``spine`` — outer_join_spine of prior/demographic/biospecimen/
    confirmatory Merged_Tables on Research_Participant_ID.
    ``submitted_ids`` — distinct IDs actually present in submitted sheets;
    when given, restricts findings to them (the evident intent of the
    reference's discarded ``get_submitted_ids`` merge, bug §2.9.2).
    """
    key = "Research_Participant_ID"
    # Only well-formed IDs of this CBC (File_Submission_Object.py:382).
    scoped = spine.filter(F.col(key).rlike("^" + cbc_id + "[_]{1}[0-9]{6}$"))
    # Reference prefilter: missing from at least one source (:380).
    any_missing = ~(present("prior_clinical_test.csv")
                    & present("demographic.csv")
                    & present("biospecimen.csv")
                    & present("confirmatory_clinical_test.csv"))
    scoped = scoped.filter(any_missing)
    if submitted_ids is not None:
        scoped = scoped.join(F.broadcast(submitted_ids.select(key).distinct()),
                             on=key, how="left_semi")

    msg = None
    for (p, d, b), text in _PART_PATTERNS:
        cond = ((present("prior_clinical_test.csv") == F.lit(p))
                & (present("demographic.csv") == F.lit(d))
                & (present("biospecimen.csv") == F.lit(b)))
        msg = F.when(cond, text) if msg is None else msg.when(cond, text)
    return (scoped.withColumn("_msg", msg)
            .filter(F.col("_msg").isNotNull())
            .select(finding_struct("Error", "Cross_Participant_ID.csv",
                                   F.lit(ROW_CROSS_SHEET), key, F.col(key),
                                   F.col("_msg")).alias("_f"))
            .select("_f.*")
            .dropDuplicates())


# --- biospecimen presence patterns (File_Submission_Object.py:341-355) ----
_BIO_TABLES = [
    # (spine source sheet, display sheet name in messages)
    ("aliquot.csv", "Aliquot.csv"),
    ("equipment.csv", "Equipment.csv"),
    ("reagent.csv", "Reagent.csv"),
    ("consumable.csv", "Consumable.csv"),
]

# Message templates shared by the Column decoder AND the DuckDB oracle
# builder below — single-sourced so a wording edit cannot break parity.
_BIO_MSG_IN_T_NOT_BIO = ("ID is found in {display}, however ID is missing "
                         "from Biospecimen.csv")
_BIO_MSG_BIO_NOT_T = ("ID is found in Biospecimen.csv, however is missing "
                      "from {display}")
_BIO_MSG_NOT_PBMC = ("ID is found in {display}, and ID is found in "
                     "Biospecimen.csv however has Biospecimen_Type NOT PBMC")
_BIO_MSG_PBMC_MISSING = ("ID is found in Biospecimen.csv and has "
                         "Biospecimen_Type of PBMC, however ID is missing "
                         "from {display}")


def biospecimen_cross_findings(spine: DataFrame, cbc_id: str,
                               submitted_ids: DataFrame | None = None
                               ) -> DataFrame:
    """Decode the 4 biospecimen patterns per processing table
    (``write_cross_bio_errors``). All messages land on sheet
    ``Cross_Biospecimen_ID.csv``, column ``Biospecimen_ID``.

    Deviation (documented): the reference stamps these findings with the
    joined frame's positional index + 2 — a meaningless artifact of the
    pandas join; we use the cross-sheet sentinel −10 consistently.
    """
    key = "Biospecimen_ID"
    scoped = spine.filter(
        F.col(key).rlike("^" + cbc_id + "[_]{1}[0-9]{6}[_]{1}[0-9]{3}$"))
    all_present = reduce(lambda a, b: a & b,
                         [present(s) for s, _ in _BIO_TABLES]
                         + [present("biospecimen.csv")])
    scoped = scoped.filter(~all_present)
    if submitted_ids is not None:
        scoped = scoped.join(F.broadcast(submitted_ids.select(key).distinct()),
                             on=key, how="left_semi")

    in_bio = present("biospecimen.csv")
    is_pbmc = F.col("Biospecimen_Type") == "PBMC"
    candidates = []
    for source, display in _BIO_TABLES:
        in_t = present(source)
        candidates.append(
            F.when(in_t & ~in_bio,
                   F.lit(_BIO_MSG_IN_T_NOT_BIO.format(display=display))))
        if source == "aliquot.csv":
            candidates.append(
                F.when(in_bio & ~in_t,
                       F.lit(_BIO_MSG_BIO_NOT_T.format(display=display))))
        else:
            candidates.append(F.when(
                in_t & in_bio & ~is_pbmc,
                F.lit(_BIO_MSG_NOT_PBMC.format(display=display))))
            candidates.append(F.when(
                ~in_t & in_bio & is_pbmc,
                F.lit(_BIO_MSG_PBMC_MISSING.format(display=display))))
    # Keep-first across tables: the reference's dedup key is (Row_Index,
    # Column_Name, Column_Value), so one ID keeps only its FIRST matching
    # table's message (aliquot → equipment → reagent → consumable).
    msg = F.coalesce(*candidates)
    return (scoped.withColumn("_msg", msg)
            .filter(F.col("_msg").isNotNull())
            .select(finding_struct("Error", "Cross_Biospecimen_ID.csv",
                                   F.lit(ROW_CROSS_SHEET), key, F.col(key),
                                   F.col("_msg")).alias("_f"))
            .select("_f.*")
            .dropDuplicates())


# --- SQL-text twins of the cross-sheet decoders (r11) ---------------------
# Generated-SQL forms of outer_join_spine + participant/biospecimen decode
# for the per-submission driver-build hot path: the Column-object
# composition above costs ~0.35 s of py4j round-trips per submission
# (cProfile r11) repeated for every submission; one rendered statement
# parses and analyzes once. The DataFrame functions stay as the
# oracle-checked reference implementations (j3/j4 queries);
# tests/test_cross_sheet.py pins text/DataFrame equivalence, including
# duplicate-key multiplicity and missing-source legs.


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _cross_spine_from(legs: list[tuple[str, str, list[str]]],
                      keys: list[str]) -> str:
    """FROM-clause text: chained FULL OUTER JOIN ... USING(keys) of tagged
    projections — the exact join shape (and key-coalescing and
    duplicate-key multiplicity) of :func:`outer_join_spine`, projected to
    the columns the decoders read. ``keys`` may be composite (batched
    multi-submission mode prepends the submission tag so IDs never match
    across submissions)."""
    parts = []
    using = ", ".join(keys)
    for i, (name, view, extras) in enumerate(legs):
        sel = [*keys, f"TRUE AS {_indicator(name)}", *extras]
        parts.append(f"(SELECT {', '.join(sel)} FROM {view}) s{i}")
    out = parts[0]
    for p_ in parts[1:]:
        out += f" FULL OUTER JOIN {p_} USING ({using})"
    return out


def _ind_sql(name: str, have: set[str]) -> str:
    """Indicator expression: coalesce(flag, FALSE) for joined sources
    (outer_join_spine's na.fill), FALSE literal for missing ones
    (_fill_missing_indicators)."""
    return (f"coalesce({_indicator(name)}, FALSE)"
            if name in have else "FALSE")


def _cbc_scope_sql(key: str, cbc_id, suffix_re: str) -> str:
    """The well-formed-ID scope filter of the cross-sheet decoders
    (participant/biospecimen_cross_findings): ``key RLIKE '^CBC<suffix>'``.

    ``cbc_id`` may be a ``PerRowCbc`` (batched multi-CBC mode): the scope
    then renders as a CASE over the per-row CBC column with one
    LITERAL-regex branch per distinct CBC — foldable patterns keep
    Spark's compiled-regex cache hot, and a row is scoped by ITS
    submission's lab code exactly as the serial path scopes by the
    literal."""
    from nci_seronet_proc_data_validator_spark.functions.checks import (
        PerRowCbc,
    )
    if isinstance(cbc_id, PerRowCbc):
        branches = " ".join(
            f"WHEN {_sql_str(v)} THEN {key} RLIKE"
            f" {_sql_str('^' + v + suffix_re)}"
            for v in cbc_id.values)
        return f"(CASE {cbc_id.column} {branches} ELSE FALSE END)"
    return f"{key} RLIKE {_sql_str('^' + cbc_id + suffix_re)}"


def participant_cross_sql(views: dict[str, str | None], cbc_id,
                          submitted_view: str | None,
                          group_col: str | None = None,
                          extra_keys: tuple[str, ...] = ()) -> str:
    """Text twin of :func:`participant_cross_findings` over temp views of
    the participant Merged_Tables (None = sheet not submitted, indicator
    pinned FALSE). ``group_col``: batched multi-submission tag — joined
    into every key and projected first in the output. ``extra_keys``:
    further columns joined into every key but NOT projected (batched
    multi-CBC mode rides ``__cbc_id`` through the spine this way — it is
    functionally dependent on the submission tag, so adding it to the
    USING keys never changes multiplicity). ``cbc_id`` may be a
    ``PerRowCbc`` (see :func:`_cbc_scope_sql`)."""
    key = "Research_Participant_ID"
    keys = ([group_col, *extra_keys, key] if group_col
            else [*extra_keys, key])
    g_out = f"{group_col}, " if group_col else ""
    order = ["prior_clinical_test.csv", "demographic.csv",
             "biospecimen.csv", "confirmatory_clinical_test.csv"]
    have = {n for n in order if views.get(n) is not None}
    legs = [(n, views[n], []) for n in order if n in have]
    ind = {n: _ind_sql(n, have) for n in order}
    any_missing = ("NOT (" + " AND ".join(ind[n] for n in order) + ")")
    def _b(v: bool) -> str:
        return "TRUE" if v else "FALSE"
    whens = "".join(
        f" WHEN {ind['prior_clinical_test.csv']} = {_b(p)}"
        f" AND {ind['demographic.csv']} = {_b(d)}"
        f" AND {ind['biospecimen.csv']} = {_b(b)}"
        f" THEN {_sql_str(text)}"
        for (p, d, b), text in _PART_PATTERNS)
    using = ", ".join(keys)
    semi = (f" LEFT SEMI JOIN (SELECT DISTINCT {using} FROM"
            f" {submitted_view}) sub USING ({using})"
            if submitted_view is not None else "")
    hint = " /*+ BROADCAST(sub) */" if semi else ""
    return (
        f"SELECT DISTINCT {g_out}'Error' AS Message_Type,"
        f" 'Cross_Participant_ID.csv' AS CSV_Sheet_Name,"
        f" CAST({ROW_CROSS_SHEET} AS BIGINT) AS Row_Index,"
        f" {_sql_str(key)} AS Column_Name,"
        f" CAST({key} AS STRING) AS Column_Value,"
        f" _msg AS Error_Message"
        f" FROM (SELECT{hint} {g_out}{key}, CASE{whens} END AS _msg"
        f" FROM (SELECT * FROM {_cross_spine_from(legs, keys)}"
        f" WHERE {_cbc_scope_sql(key, cbc_id, '[_]{1}[0-9]{6}$')}"
        f" AND {any_missing}){semi}) WHERE _msg IS NOT NULL")


def biospecimen_cross_sql(views: dict[str, str | None], cbc_id,
                          submitted_view: str | None,
                          type_sources: set[str] = frozenset(),
                          group_col: str | None = None,
                          extra_keys: tuple[str, ...] = ()) -> str:
    """Text twin of :func:`biospecimen_cross_findings`. ``type_sources``
    — which submitted sources actually carry ``Biospecimen_Type`` (the
    outer-join spine would carry it from them); empty set renders the
    ``''`` fill of the DataFrame path. ``group_col`` / ``extra_keys`` /
    PerRowCbc ``cbc_id``: batched multi-submission / multi-CBC tags, as
    in :func:`participant_cross_sql`."""
    key = "Biospecimen_ID"
    keys = ([group_col, *extra_keys, key] if group_col
            else [*extra_keys, key])
    g_out = f"{group_col}, " if group_col else ""
    order = ["biospecimen.csv"] + [s for s, _ in _BIO_TABLES]
    have = {n for n in order if views.get(n) is not None}
    legs = [(n, views[n],
             ["Biospecimen_Type"] if n in type_sources else [])
            for n in order if n in have]
    ind = {n: _ind_sql(n, have) for n in order}
    all_present = " AND ".join(ind[n] for n in order)
    bio = ind["biospecimen.csv"]
    btype = ("Biospecimen_Type" if (type_sources & have) else "''")
    is_pbmc = f"({btype} = 'PBMC')"
    cands = []
    for source, display in _BIO_TABLES:
        in_t = ind[source]
        cands.append(f"CASE WHEN {in_t} AND NOT {bio} THEN "
                     f"{_sql_str(_BIO_MSG_IN_T_NOT_BIO.format(display=display))} END")
        if source == "aliquot.csv":
            cands.append(f"CASE WHEN {bio} AND NOT {in_t} THEN "
                         f"{_sql_str(_BIO_MSG_BIO_NOT_T.format(display=display))} END")
        else:
            cands.append(
                f"CASE WHEN {in_t} AND {bio} AND NOT {is_pbmc} THEN "
                f"{_sql_str(_BIO_MSG_NOT_PBMC.format(display=display))} END")
            cands.append(
                f"CASE WHEN NOT {in_t} AND {bio} AND {is_pbmc} THEN "
                f"{_sql_str(_BIO_MSG_PBMC_MISSING.format(display=display))} END")
    using = ", ".join(keys)
    semi = (f" LEFT SEMI JOIN (SELECT DISTINCT {using} FROM"
            f" {submitted_view}) sub USING ({using})"
            if submitted_view is not None else "")
    hint = " /*+ BROADCAST(sub) */" if semi else ""
    return (
        f"SELECT DISTINCT {g_out}'Error' AS Message_Type,"
        f" 'Cross_Biospecimen_ID.csv' AS CSV_Sheet_Name,"
        f" CAST({ROW_CROSS_SHEET} AS BIGINT) AS Row_Index,"
        f" {_sql_str(key)} AS Column_Name,"
        f" CAST({key} AS STRING) AS Column_Value,"
        f" _msg AS Error_Message"
        f" FROM (SELECT{hint} {g_out}{key},"
        f" coalesce({', '.join(cands)}) AS _msg"
        f" FROM (SELECT * FROM {_cross_spine_from(legs, keys)}"
        f" WHERE {_cbc_scope_sql(key, cbc_id, '[_]{1}[0-9]{6}[_]{1}[0-9]{3}$')}"
        f" AND NOT ({all_present})){semi}) WHERE _msg IS NOT NULL")


def icd10_flag_join(df: DataFrame, column: str, icd10_codes: DataFrame,
                    flag_col: str) -> DataFrame:
    """J8: broadcast left join against the ICD-10 code table; ``flag_col``
    is true iff the value is a known code. Replaces the reference's per-cell
    ``icd10.exists`` (File_Submission_Object.py:303-309, vendored package
    icd10/__init__.py:98-107) with a JVM-side hash join.

    Dot normalization: the reference strips dots before lookup
    (``codes.get(s.replace('.', ''))``), accepting both 'E11.9' and 'E119'
    — both sides of the join are normalized the same way here."""
    codes = icd10_codes.select(
        F.translate(F.col(icd10_codes.columns[0]), ".", "")
        .alias("__icd10_code"),
        F.lit(True).alias(flag_col)).distinct()
    out = df.join(F.broadcast(codes),
                  F.translate(df[column], ".", "") == F.col("__icd10_code"),
                  "left")
    return out.drop("__icd10_code")


# --- DuckDB oracle mirrors for the cross-sheet findings -------------------
# Generated from the SAME _PART_PATTERNS/_BIO_TABLES the Column decoders
# use, so messages and keep-first priority cannot drift. Presence flags
# are membership tests per distinct key — equivalent to the outer-join
# spine's indicators (they are per-key constants).

def participant_cross_oracle_sql(prior: str, demo: str, bio: str,
                                 conf: str, cbc_id: str) -> str:
    key = "Research_Participant_ID"
    branches = " ".join(
        f"WHEN {'' if p else 'NOT '}in_p AND {'' if d else 'NOT '}in_d"
        f" AND {'' if b else 'NOT '}in_b THEN "
        + "'" + text.replace("'", "''") + "'"
        for (p, d, b), text in _PART_PATTERNS)
    return f"""
SELECT DISTINCT 'Error' AS Message_Type,
  'Cross_Participant_ID.csv' AS CSV_Sheet_Name,
  CAST({ROW_CROSS_SHEET} AS BIGINT) AS Row_Index,
  '{key}' AS Column_Name, k AS Column_Value,
  CASE {branches} END AS Error_Message
FROM (
  SELECT k,
    k IN (SELECT {key} FROM {prior}) AS in_p,
    k IN (SELECT {key} FROM {demo}) AS in_d,
    k IN (SELECT {key} FROM {bio}) AS in_b,
    k IN (SELECT {key} FROM {conf}) AS in_c
  FROM (SELECT DISTINCT {key} AS k FROM {prior}
        UNION SELECT {key} FROM {demo}
        UNION SELECT {key} FROM {bio}
        UNION SELECT {key} FROM {conf}))
WHERE regexp_matches(k, '^{cbc_id}[_]{{1}}[0-9]{{6}}$')
  AND NOT (in_p AND in_d AND in_b AND in_c)
  AND (CASE {branches} END) IS NOT NULL
"""


def biospecimen_cross_oracle_sql(bio: str, ali: str, eq: str, re_: str,
                                 co: str, cbc_id: str) -> str:
    """Contract: the oracle resolves a duplicate ID's type with
    min(Biospecimen_Type); the Spark spine must therefore be built from a
    per-ID min-aggregated biospecimen source (as q_rulebook_full does) —
    a raw multi-typed spine would decode nondeterministically under the
    key-based findings dedup."""
    key = "Biospecimen_ID"
    ctes = {"aliquot.csv": ali, "equipment.csv": eq,
            "reagent.csv": re_, "consumable.csv": co}
    flags = {"aliquot.csv": "in_al", "equipment.csv": "in_eq",
             "reagent.csv": "in_re", "consumable.csv": "in_co"}
    def _lit(template: str, display: str) -> str:
        return "'" + template.format(display=display).replace("'", "''") + "'"

    branches = []
    for source, display in _BIO_TABLES:
        t = flags[source]
        branches.append(f"WHEN {t} AND NOT in_bio THEN "
                        + _lit(_BIO_MSG_IN_T_NOT_BIO, display))
        if source == "aliquot.csv":
            branches.append(f"WHEN in_bio AND NOT {t} THEN "
                            + _lit(_BIO_MSG_BIO_NOT_T, display))
        else:
            branches.append(f"WHEN {t} AND in_bio AND NOT is_pbmc THEN "
                            + _lit(_BIO_MSG_NOT_PBMC, display))
            branches.append(f"WHEN NOT {t} AND in_bio AND is_pbmc THEN "
                            + _lit(_BIO_MSG_PBMC_MISSING, display))
    chain = " ".join(branches)
    member = " ".join(
        f"k IN (SELECT {key} FROM {cte}) AS {flags[s]},"
        for s, cte in ctes.items())
    return f"""
SELECT DISTINCT 'Error' AS Message_Type,
  'Cross_Biospecimen_ID.csv' AS CSV_Sheet_Name,
  CAST({ROW_CROSS_SHEET} AS BIGINT) AS Row_Index,
  '{key}' AS Column_Name, k AS Column_Value,
  CASE {chain} END AS Error_Message
FROM (
  SELECT k,
    k IN (SELECT {key} FROM {bio}) AS in_bio,
    {member}
    coalesce((SELECT min(Biospecimen_Type) FROM {bio} b
              WHERE b.{key} = ids.k), '') = 'PBMC' AS is_pbmc
  FROM (SELECT DISTINCT {key} AS k FROM {bio}
        UNION SELECT {key} FROM {ali}
        UNION SELECT {key} FROM {eq}
        UNION SELECT {key} FROM {re_}
        UNION SELECT {key} FROM {co}) ids)
WHERE regexp_matches(k, '^{cbc_id}[_]{{1}}[0-9]{{6}}[_]{{1}}[0-9]{{3}}$')
  AND NOT (in_bio AND in_al AND in_eq AND in_re AND in_co)
  AND (CASE {chain} END) IS NOT NULL
"""
