"""Hashed-linear text-classifier inference — the "apply a trained quality
classifier to the whole crawl" stage of an LLM curation pipeline
(fastText-style models in CCNet/LLaMA data prep; the reference validates
CSVs and has no model-inference stage).

Spark-first shape for 100 TB:

- **Model-as-literal.** A hashed bag-of-ngrams linear model is just a
  weight vector indexed by feature bucket. The whole vector rides into
  the plan as ONE array literal (the same model-sync idiom as
  ``operators/kmeans.py`` centroid literals), so scoring is a map-only
  ``aggregate`` over the token array — zero shuffles, zero joins, scales
  with the scan. A 4k..1M-bucket model is kilobytes-to-megabytes of task
  binary, the regime broadcast variables are built for; beyond that,
  switch to a broadcast weights DataFrame + explode/sum (one shuffle).
- **Integer-exact.** Weights are integer milli-units and scores are LONG
  sums, so the oracle comparison never rides on float formatting and the
  decision boundary (``score > 0``) is exact on both engines.
- **Portable hashing.** Feature bucket = first 8 md5 hex digits of the
  token mod ``len(weights)`` — the same engine-portable 32-bit idiom as
  the dedup family (``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.dedup import (
    spread_small_input,
)


def demo_weights(buckets: int = 4096, spread: int = 1000) -> list[int]:
    """Deterministic stand-in model: integer weights in
    ``[-spread, spread]`` from the same LCG family as the MinHash
    coefficients. A real deployment passes trained weights; every
    consumer (Spark query, DuckDB oracle, tests) embeds the SAME
    literals, so parity is by construction."""
    out = []
    for b in range(buckets):
        out.append(((1103515245 * (b + 1) + 12345) % (2 * spread + 1))
                   - spread)
    return out


def hashed_linear_score(docs: DataFrame, weights: list[int],
                        bias: int = 0, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Score every document with a hashed unigram linear model.

    ``clf_score = bias + Σ_tokens weights[bucket(token)]`` (LONG,
    milli-units), ``clf_pred = clf_score > 0``. Map-only: one aggregate
    over the token array against the weight-array literal; empty-token
    documents score exactly ``bias``.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    n = len(weights)
    w_lit = "array(" + ", ".join(f"{w}L" for w in weights) + ")"
    # coalesce: regexp_extract_all(NULL) is NULL and aggregate(NULL) is
    # NULL — a NULL-text doc must score exactly `bias` (like empty text),
    # matching the oracle's LEFT JOIN + COALESCE
    toks = (f"coalesce(regexp_extract_all(lower({text_col}), "
            f"'[a-z0-9]+', 0), array())")
    bucket = ("CAST(conv(substring(md5(t), 1, 8), 16, 10) AS LONG)"
              f" % {n}")
    score = (f"aggregate({toks}, CAST({bias} AS LONG), "
             f"(acc, t) -> acc + element_at({w_lit}, "
             f"CAST({bucket} AS INT) + 1))")
    return (spread_small_input(docs)
            .select(F.col(id_col), F.expr(score).alias("clf_score"))
            .withColumn("clf_pred", F.col("clf_score") > 0))


def classifier_oracle_sql(weights: list[int], bias: int = 0,
                          table: str = "documents",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB mirror: same weight literals, same md5 bucketing, same
    integer sum (CAST to BIGINT — DuckDB integer SUM is HUGEINT)."""
    n = len(weights)
    w_lit = "[" + ", ".join(str(w) for w in weights) + "]"
    return f"""
WITH t AS (
  SELECT {id_col},
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS tok
  FROM {table}),
s AS (
  SELECT {id_col},
         CAST(sum(({w_lit})[
           (CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {n})
           + 1]) AS BIGINT) AS sw
  FROM t GROUP BY {id_col})
SELECT d.{id_col},
       {bias} + COALESCE(s.sw, 0) AS clf_score,
       ({bias} + COALESCE(s.sw, 0)) > 0 AS clf_pred
FROM {table} d LEFT JOIN s ON d.{id_col} = s.{id_col}
ORDER BY d.{id_col}
"""
