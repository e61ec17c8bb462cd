"""Driver-side artifact writers completing S10 (``put_df``, s3.py:45-113).

The reference writes csv (optionally gzip), xlsx, parquet, and pickle. CSV
and parquet are distributed sinks (``sinks/reports.py``); xlsx and pickle
are inherently single-file pandas artifacts, so they are DRIVER-side
conveniences: collect a (small!) DataFrame via Arrow and write locally.
Guarded by a row cap — these are for summaries and reports, never data.

xlsx uses pandas/openpyxl when present, else the dependency-free
SpreadsheetML writer (``sinks/xlsx_minimal.py``); pickle works with
pandas alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_local_artifact(df: DataFrame, path: str, fmt: str = "csv",
                         compression: str | None = None,
                         max_rows: int = 1_000_000) -> str:
    """Collect ``df`` (≤ ``max_rows``) to pandas and write one local file.

    fmt: 'csv' (compression='gzip' supported), 'pickle', 'xlsx' (needs
    openpyxl), 'parquet'. Returns the path written.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"refusing to collect {n}+ rows to the driver (cap {max_rows}); "
            "use the distributed sinks in sinks/reports.py for data-scale "
            "outputs")
    pdf = df.toPandas()
    if fmt == "csv":
        pdf.to_csv(path, index=False,
                   compression=compression or "infer")
    elif fmt == "pickle":
        pdf.to_pickle(path)
    elif fmt == "parquet":
        pdf.to_parquet(path)
    elif fmt == "xlsx":
        try:
            import openpyxl  # noqa: F401
            pdf.to_excel(path, index=False)
        except ImportError:
            from nci_seronet_proc_data_validator_spark.sinks.xlsx_minimal \
                import write_xlsx
            write_xlsx(path, [str(c) for c in pdf.columns],
                       pdf.astype(object).where(pdf.notna(), "")
                       .values.tolist())
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return path
