"""Benchmark-contamination detection — the decontamination stage of an
LLM training-data pipeline (beyond the reference's surface): flag corpus
documents sharing word n-grams with a held-out benchmark/eval set, so
training data can be scrubbed of test-set leakage.

Semantics follow the published decontamination recipes (n-gram collision
against the eval set, e.g. GPT-3 appendix C / PaLM): a document is
contaminated in proportion to the fraction of its distinct n-grams that
appear anywhere in the benchmark set.

Design notes (100 TB posture):

- The benchmark n-gram set is **small by construction** (eval suites are
  MBs, corpora are TBs) → build it once, ``distinct()``, and
  **broadcast** it; the corpus side then probes map-side with no wide
  shuffle for the join.
- Corpus documents explode to (doc_id, ngram_hash) — high-cardinality
  keys, and the per-doc hit count aggregates with map-side partial
  aggregation on ``doc_id``.
- n-grams ride as 32-bit hashes (same md5-prefix scheme as the MinHash
  shingles — ``operators/dedup.shingle_hashes``), so the broadcast set
  is longs, not strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.dedup import (
    shingle_hashes, shingles, spread_small_input, tokens,
)


def benchmark_overlap(corpus: DataFrame, bench: DataFrame, n: int = 5,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> DataFrame:
    """Per-corpus-document contamination against ``bench``.

    Returns ``(id, n_ngrams, n_contaminated, contamination,
    is_contaminated)`` for every corpus document; ``contamination`` is the
    fraction of the document's distinct n-grams found in the benchmark
    set, rounded to 6 (cross-engine double contract).
    """
    def sh(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            shingle_hashes(shingles(tokens(text_col), n)).alias("sh"))

    bench_hashes = (sh(bench)
                    .select(F.explode("sh").alias("h"))
                    .distinct())
    corpus_sh = sh(spread_small_input(corpus))
    exploded = corpus_sh.select(id_col, F.explode("sh").alias("h"))
    hits = (exploded.join(F.broadcast(bench_hashes), "h")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_contaminated")))
    ratio = (F.col("n_contaminated").cast("double")
             / F.greatest(F.size("sh"), F.lit(1)).cast("double"))
    return (corpus_sh.join(hits, id_col, "left")
            .na.fill({"n_contaminated": 0})
            .select(F.col(id_col),
                    F.size("sh").cast("long").alias("n_ngrams"),
                    F.col("n_contaminated").cast("long")
                    .alias("n_contaminated"),
                    F.round(ratio, 6).alias("contamination"),
                    (F.col("n_contaminated") > 0).alias("is_contaminated"))
            .orderBy(id_col))


def _shingle_sql(n: int) -> str:
    terms = ", ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return (
        f"list_distinct(CASE WHEN len(t) >= {n} "
        f"THEN list_transform(generate_series(1, len(t) - {n - 1}), "
        f"i -> CAST(concat('0x', substr(md5(concat_ws(' ', {terms})), 1, 8))"
        f" AS BIGINT)) ELSE [] END)")


def benchmark_overlap_oracle_sql(bench_pred: str, n: int = 5,
                                 table: str = "documents") -> str:
    """DuckDB twin; ``bench_pred`` selects the benchmark slice (e.g.
    ``doc_id % 97 = 0``) — corpus is its complement."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM {table}),
shing AS (SELECT doc_id, {_shingle_sql(n)} AS sh FROM toks),
bh AS (
  SELECT DISTINCT h
  FROM (SELECT unnest(sh) AS h FROM shing WHERE {bench_pred})),
corpus AS (SELECT doc_id, sh FROM shing WHERE NOT ({bench_pred})),
hits AS (
  SELECT doc_id, count(*) AS n_hit
  FROM (SELECT doc_id, unnest(sh) AS h FROM corpus) c
  JOIN bh USING (h) GROUP BY 1)
SELECT c.doc_id,
       CAST(len(c.sh) AS BIGINT) AS n_ngrams,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_contaminated,
       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
             / CAST(greatest(len(c.sh), 1) AS DOUBLE), 6) AS contamination,
       coalesce(h.n_hit, 0) > 0 AS is_contaminated
FROM corpus c LEFT JOIN hits h USING (doc_id)
ORDER BY c.doc_id
"""


def contamination_with_bloom_oracle_sql(bench_pred: str, n: int = 5,
                                        table: str = "documents") -> str:
    """Exact-join contamination joined with the Bloom-gate columns
    (``operators/bloom``) — one row per corpus doc, both engines build
    the identical bitset so even Bloom false positives agree."""
    from nci_seronet_proc_data_validator_spark.operators.bloom import (
        bloom_oracle_sql)
    shing = (f"SELECT doc_id, {_shingle_sql(n)} AS sh FROM "
             f"(SELECT doc_id, regexp_extract_all(lower(text), "
             f"'[a-z0-9]+') AS t FROM {table})")
    bench_h = (f"SELECT DISTINCT h FROM (SELECT unnest(sh) AS h "
               f"FROM ({shing}) WHERE {bench_pred})")
    probes = (f"SELECT doc_id, unnest(sh) AS h FROM ({shing}) "
              f"WHERE NOT ({bench_pred})")
    bloom = bloom_oracle_sql(bench_h, probes)
    return f"""
WITH exact_side AS ({benchmark_overlap_oracle_sql(bench_pred, n, table).strip()}),
bloom_side AS ({bloom.strip()})
SELECT e.*,
       CAST(coalesce(b.n_bloom_hits, 0) AS BIGINT) AS n_bloom_hits,
       coalesce(b.n_bloom_hits, 0) > 0 AS bloom_flag
FROM exact_side e LEFT JOIN bloom_side b USING (doc_id)
ORDER BY e.doc_id
"""
