"""Deterministic stratified sampling — training-data curation's mix-rate
control (e.g. downsample common languages, keep rare ones), expressed so
the sample is reproducible across engines, runs, and partitionings.

Spark-first shape: the keep/drop decision is a **map-only** predicate on a
content-derived hash (md5 of a salt + the row key), so the filter pushes
to the scan, nothing shuffles, and re-running on re-partitioned input
yields the byte-identical sample — unlike ``DataFrame.sample``, whose
output depends on partition layout. Thresholds are integer basis points
(rate × 10000) compared against ``hash % 10000``; no float compare in the
cut, so both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BP = 10_000  # basis-point resolution of sampling rates
_SALT = "s:"  # hash domain separator — decouples the sample from other
              # md5-keyed operators (fingerprints, shingle hashes)


def _bucket(key_col: Column) -> Column:
    """Stable 0..9999 bucket: first 8 md5 hex digits as an integer (the
    same portable 32-bit-hash idiom the dedup oracles use)."""
    return (F.conv(F.substring(F.md5(key_col), 1, 8), 16, 10)
            .cast("long") % _BP)


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], default_rate: float,
                      key_col: str = "doc_id") -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → sampling fraction; strata not listed
    fall back to ``default_rate``. Fractions are snapped to basis points.
    """
    key = F.concat(F.lit(_SALT), F.col(key_col).cast("string"))
    threshold = F.lit(int(round(default_rate * _BP)))
    for value, rate in sorted(rates.items()):
        threshold = F.when(F.col(strata_col) == value,
                           int(round(rate * _BP))).otherwise(threshold)
    return df.filter(_bucket(key) < threshold)


def stratified_sample_oracle_sql(strata_col: str, rates: dict[str, float],
                                 default_rate: float,
                                 key_col: str = "doc_id",
                                 select: str = "doc_id, lang",
                                 table: str = "documents") -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {int(round(r * _BP))}"
        for v, r in sorted(rates.items()))
    return f"""
SELECT {select}
FROM {table}
WHERE CAST(concat('0x', substr(md5('{_SALT}' || CAST({key_col} AS VARCHAR)),
                               1, 8)) AS BIGINT) % {_BP}
      < CASE {cases} ELSE {int(round(default_rate * _BP))} END
ORDER BY {key_col}
"""
