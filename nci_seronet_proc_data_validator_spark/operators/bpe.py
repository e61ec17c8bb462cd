"""BPE merge training — learn a byte-pair-encoding merge table from the
corpus (Sennrich et al. 2016, arXiv:1508.07909). The learned-tokenizer
step between vocabulary building (``q_vocab_pipeline``) and token-id
encoding: production pipelines train the tokenizer ON the corpus the
engine curates.

Spark-first shape (the ``kmeans`` model-sync template):

- **Train on the word-frequency table, not the corpus.** Classic BPE
  counts pairs per unique word weighted by its frequency; the word table
  is vocabulary-sized (≈1e8 rows at 100 TB — executor scale), produced by
  ONE corpus scan + keyed agg, then persisted across rounds. The 100 TB
  of text is touched exactly once.
- **The model rides the plan.** Each round aggregates adjacent-symbol
  pairs (map + keyed agg with partial aggregation), collects the single
  argmax row driver-side (model sync, 1 row), and applies the merge
  map-only via string replace on the symbol sequence. No shuffle of
  sequences, ever — only pair counts move.
- **Merging is leftmost-non-overlapping string replace.** A word's symbol
  sequence is a DOUBLE-space-delimited string with sentinel double
  spaces (``  a  b  c  </w>  ``); merging pair (a,b) is
  ``replace(seq, ' a  b ', ' ab ')`` — each match consumes the inner
  delimiter plus ONE space of each outer delimiter, so adjacent matches
  (symbol runs like ``aaaa``) still have their own leading space and
  merge exactly like the classic greedy left-to-right pass
  (``aaaa`` → ``aa aa``; a single-space encoding under-merges runs
  because the first match eats the next match's boundary). Both Spark's
  and DuckDB's ``replace`` scan left to right and continue after each
  replacement, so the DuckDB oracle is bit-identical.
- **Deterministic.** Ties on pair count break on the pair string
  ascending; both engines compare strings bytewise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# double-space-delimited symbol sequence with sentinel double spaces —
# see the merge-semantics note in the module docstring
_SEQ0 = ("concat('  ', concat_ws('  ', transform(sequence(1, length(w)),"
         " i -> substring(w, i, 1))), '  </w>  ')")
_TOKS = "filter(split(_s, ' +'), x -> x != '')"
_PAIRS = ("transform(sequence(1, size(_t) - 1),"
          " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))")


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns one row per merge:
    ``(step, left_sym, right_sym, merged, weight)`` in training order."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    from nci_seronet_proc_data_validator_spark.operators.dedup import (
        spread_small_input,
    )
    spark = docs.sparkSession
    words = (spread_small_input(docs)
             .select(F.explode(F.regexp_extract_all(
                 F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
             .selectExpr(f"{_SEQ0} AS seq", "freq")
             .persist())
    merges = []
    seq = F.col("seq")
    for step in range(1, n_merges + 1):
        pairs = (words.select(F.col("freq"), seq.alias("_s"))
                 .withColumn("_t", F.expr(_TOKS))
                 .select("freq", F.explode(F.expr(_PAIRS)).alias("pair"))
                 .groupBy("pair").agg(F.sum("freq").alias("cnt")))
        top = pairs.orderBy(F.col("cnt").desc(), F.col("pair")).limit(1) \
            .collect()
        if not top:
            break
        pair, cnt = top[0]["pair"], top[0]["cnt"]
        left, right = pair.split(" ", 1)
        merges.append((step, left, right, left + right, cnt))
        seq = F.replace(seq, F.lit(f" {left}  {right} "),
                        F.lit(f" {left}{right} "))
    words.unpersist()
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, merged string, "
                "weight bigint")


def bpe_train_oracle_sql(n_merges: int = 8,
                         table: str = "documents") -> str:
    """DuckDB twin with the merge rounds unrolled as CTEs (same word
    weighting, same sentinel-space replace, same tiebreak)."""
    # AS MATERIALIZED: p{r} and s{r} each reference s{r-1}; DuckDB inlines
    # plain CTEs per reference, which doubles the expansion every round
    # (2^n base-scan copies -> "too many open files" past ~10 merges).
    ctes = [f"""w0 AS MATERIALIZED (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM {table})
  GROUP BY w)""", """s0 AS MATERIALIZED (
  SELECT '  ' || array_to_string(list_transform(generate_series(1, len(w)),
                                                i -> w[i:i]), '  ')
         || '  </w>  ' AS seq, freq
  FROM w0)"""]
    selects = []
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        ctes.append(f"""p{r} AS (
  SELECT pair, SUM(freq) AS cnt FROM (
    SELECT unnest(list_transform(
             generate_series(1, len(t) - 1),
             i -> t[i] || ' ' || t[i + 1])) AS pair, freq
    FROM (SELECT list_filter(string_split_regex(seq, ' +'),
                             x -> x <> '') AS t, freq FROM {prev}))
  GROUP BY pair)""")
        ctes.append(f"""m{r} AS (
  SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1)""")
        ctes.append(f"""s{r} AS MATERIALIZED (
  SELECT replace(seq,
                 ' ' || (SELECT replace(pair, ' ', '  ') FROM m{r}) || ' ',
                 ' ' || (SELECT replace(pair, ' ', '') FROM m{r}) || ' ')
           AS seq, freq
  FROM {prev})""")
        selects.append(
            f"SELECT {r} AS step, split_part(pair, ' ', 1) AS left_sym,"
            f" split_part(pair, ' ', 2) AS right_sym,"
            f" replace(pair, ' ', '') AS merged,"
            f" CAST(cnt AS BIGINT) AS weight FROM m{r}")
    joined = ",\n".join(ctes)
    body = "\nUNION ALL\n".join(selects)
    return f"WITH {joined}\n{body}\nORDER BY step"
