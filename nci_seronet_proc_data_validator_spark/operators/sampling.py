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


def mixture_sample(df: DataFrame, strata_col: str,
                   shares: dict[str, float],
                   key_col: str = "doc_id") -> DataFrame:
    """Sample to a TARGET MIXTURE: given desired corpus proportions
    (e.g. ``{"web": .5, "wiki": .3, "code": .2}``), derive the largest
    per-stratum keep-rates that realize those proportions without
    upsampling (the scarcest stratum relative to its share keeps 100%;
    the rest downsample to match — water-filling), then cut with the same
    deterministic content-hash predicate as ``stratified_sample``.

    Fully distributed: one small keyed count (#strata rows), the
    min-ratio reduction, and a broadcast of the per-stratum thresholds
    back onto the scan — no driver collect, no full-data shuffle. All
    threshold math is INTEGER (basis-point weights, integral division)
    so both engines derive bit-identical cuts. Strata not in ``shares``
    are dropped (share 0).
    """
    if not shares:
        raise ValueError("shares must be non-empty")
    w_rows = [(k, int(round(v * _BP))) for k, v in sorted(shares.items())]
    if any(w <= 0 for _, w in w_rows):
        raise ValueError(f"shares must be > 0: {shares}")
    spark = df.sparkSession
    from nci_seronet_proc_data_validator_spark.errors import local_rows_df
    weights = local_rows_df(spark, w_rows, f"{strata_col} string, w long")
    counts = (df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n")))
    j = counts.join(F.broadcast(weights), strata_col)
    # largest total sample size consistent with every rate <= 1:
    # lim = min_s floor(n_s * BP / w_s); stratum keep-threshold (basis
    # points) = ceil(lim * w_s / n_s). Ceiling division keeps bp <= BP
    # for every stratum (lim <= n_s*BP/w_s) and makes bp == BP EXACTLY
    # for the binding stratum even when w does not divide n*BP — floor
    # here would give BP-1 and silently drop ~1bp of the rarest stratum.
    lim = j.agg(F.min(F.expr(f"n * {_BP} div w")).alias("lim"))
    thr = (j.crossJoin(F.broadcast(lim))
           .select(strata_col,
                   F.expr("(lim * w + n - 1) div n").alias("bp")))
    key = F.concat(F.lit(_SALT), F.col(key_col).cast("string"))
    return (df.join(F.broadcast(thr), strata_col)
            .filter(_bucket(key) < F.col("bp"))
            .drop("bp"))


def temperature_sample(df: DataFrame, strata_col: str,
                       key_col: str = "doc_id") -> DataFrame:
    """Temperature-flattened mixture (mT5/UNIMAX-style alpha = 0.5):
    target shares proportional to ``sqrt(n_s)`` instead of ``n_s``, so
    rare strata are upweighted relative to their raw frequency and the
    rarest keeps 100% (no upsampling) — the standard multilingual
    rebalance before pretraining.

    Same fully-distributed integer water-filling as ``mixture_sample``
    with the weights DERIVED from the counts: ``w_s = floor(sqrt(n_s))``
    (IEEE sqrt is correctly rounded and exact for n < 2^52, so both
    engines derive bit-identical weights), then the same basis-point
    hash cut. One small keyed count, a scalar min, a broadcast back.
    """
    counts = (df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n")))
    j = counts.select(strata_col, "n",
                      F.floor(F.sqrt(F.col("n"))).cast("long").alias("w")) \
        .filter(F.col("w") > 0)
    # ceil(lim*w/n): == BP exactly for the argmin stratum (the rarest
    # really keeps 100%), <= BP for the rest — see mixture_sample.
    lim = j.agg(F.min(F.expr(f"n * {_BP} div w")).alias("lim"))
    thr = (j.crossJoin(F.broadcast(lim))
           .select(strata_col,
                   F.expr("(lim * w + n - 1) div n").alias("bp")))
    key = F.concat(F.lit(_SALT), F.col(key_col).cast("string"))
    return (df.join(F.broadcast(thr), strata_col)
            .filter(_bucket(key) < F.col("bp"))
            .drop("bp"))


def temperature_sample_oracle_sql(strata_col: str,
                                  key_col: str = "doc_id",
                                  select: str = "doc_id, lang",
                                  table: str = "documents") -> str:
    """DuckDB mirror — sqrt-derived integer weights, same water-fill."""
    return f"""
WITH c AS (SELECT {strata_col} AS strata, count(*) AS n
           FROM {table} GROUP BY 1),
j AS (SELECT strata, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt
      FROM c WHERE n > 0),
l AS (SELECT min(n * {_BP} // wt) AS lim FROM j),
thr AS (SELECT strata, (lim * wt + n - 1) // n AS bp FROM j, l)
SELECT {select}
FROM {table} t JOIN thr ON t.{strata_col} = thr.strata
WHERE CAST(concat('0x', substr(md5('{_SALT}' || CAST({key_col} AS VARCHAR)),
                               1, 8)) AS BIGINT) % {_BP} < bp
ORDER BY {key_col}
"""


def mixture_sample_oracle_sql(strata_col: str, shares: dict[str, float],
                              key_col: str = "doc_id",
                              select: str = "doc_id, lang",
                              table: str = "documents") -> str:
    """DuckDB mirror — same integer water-filling, same hash cut."""
    vals = ", ".join(f"('{k}', {int(round(v * _BP))})"
                     for k, v in sorted(shares.items()))
    return f"""
WITH w(strata, wt) AS (VALUES {vals}),
c AS (SELECT {strata_col} AS strata, count(*) AS n FROM {table} GROUP BY 1),
j AS (SELECT c.strata, n, wt FROM c JOIN w USING (strata)),
l AS (SELECT min(n * {_BP} // wt) AS lim FROM j),
thr AS (SELECT strata, (lim * wt + n - 1) // n AS bp FROM j, l)
SELECT {select}
FROM {table} t JOIN thr ON t.{strata_col} = thr.strata
WHERE CAST(concat('0x', substr(md5('{_SALT}' || CAST({key_col} AS VARCHAR)),
                               1, 8)) AS BIGINT) % {_BP} < bp
ORDER BY {key_col}
"""


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
