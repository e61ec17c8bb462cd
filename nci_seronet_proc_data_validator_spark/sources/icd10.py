"""ICD-10 reference table (J8/C8 support).

The reference vendors the ``icd10-cm`` package and calls ``icd10.exists(x)``
per cell against its gzip-JSON code map (icd10/__init__.py:98-107). The
Spark-native shape is a small reference DataFrame broadcast-joined against
the checked column (operators/joins.icd10_flag_join).

Resolution order:
1. an explicit file (csv/parquet, one ``code`` column) — production mounts
   the full table;
2. the ``icd10`` PyPI package if importable (same data source the
   reference vendors) — codes enumerated once, driver-side;
3. a small built-in demo subset (publicly documented common codes) so the
   operator is exercisable out of the box. NOT a complete code list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Publicly documented, commonly cited ICD-10-CM codes (demo subset only).
DEMO_CODES = [
    "A00", "B20", "C34.90", "D64.9", "E11.9", "E66.9", "E78.5", "F32.9",
    "G47.33", "I10", "I25.10", "I50.9", "J44.9", "J45.909", "K21.9",
    "M54.5", "N18.9", "R05", "U07.1", "Z00.00",
]


def _dotless(df: DataFrame) -> DataFrame:
    """Store codes dotless — the reference's ``exists`` strips dots before
    lookup (icd10/__init__.py: ``codes.get(s.replace('.', ''))``), so
    'E11.9' and 'E119' are the same code."""
    from pyspark.sql import functions as F

    return df.select(F.translate("code", ".", "").alias("code")).distinct()


def load_icd10_codes(spark: SparkSession,
                     path: str | None = None) -> DataFrame:
    if path:
        if path.endswith(".parquet"):
            return _dotless(spark.read.parquet(path).select("code"))
        return _dotless(spark.read.option("header", "true").csv(path)
                        .select("code"))
    try:
        import icd10  # optional; vendored by the reference

        codes = sorted(icd10.codes.keys()) if hasattr(icd10, "codes") else []
        # Validate eagerly while still inside the try: local_rows_df
        # verifies rows lazily (at first action), so malformed package
        # data would otherwise escape this fallback and fail mid-query
        # instead of degrading to DEMO_CODES (r14, ADVICE).
        if codes and not all(isinstance(c, str) for c in codes):
            raise TypeError("icd10.codes keys must all be strings")
        if codes:
            from nci_seronet_proc_data_validator_spark.errors import (
                local_rows_df)
            return local_rows_df(spark, [(c,) for c in codes],
                                 "code string")
    except Exception:
        pass
    from nci_seronet_proc_data_validator_spark.errors import local_rows_df
    return _dotless(
        local_rows_df(spark, [(c,) for c in DEMO_CODES], "code string"))
