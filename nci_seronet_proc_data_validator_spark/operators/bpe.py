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
# guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) — a fully-merged
# single-symbol sequence must yield NO pairs, not an index error
_PAIRS = ("CASE WHEN size(_t) >= 2 THEN"
          " transform(sequence(1, size(_t) - 1),"
          " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
          " ELSE array() END")
#: materialize the accumulated merge chain every this many training
#: rounds — bounds per-round replace work at O(window) passes without
#: paying a vocab-wide persist every round (see bpe_train). Width set by
#: measurement (r14, sf0.01 corpus, 100-merge training, warm JVM,
#: alternating arms): window=8 33-41 s vs UNBOUNDED 19-22 s (the r13
#: width spent ~1.5 s/materialization to save sub-millisecond replace
#: passes), window=32 20.2 s, window=64 15.5 s vs unbounded 16.1 s —
#: i.e. 64 is free where 8 was a 2x tax, while still capping the chain
#: at 2·64−1 replaces/round (30k-merge trainings stay O(n·window)
#: instead of O(n²/2) ≈ 4.5e8 string passes).
_MATERIALIZE_EVERY = 64


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
    # The replace chain accumulates on the persisted words table; every
    # _MATERIALIZE_EVERY rounds the merged sequences are materialized
    # (persist, realized by the following round's collect) and the chain
    # resets. Rationale (r13, measured): with an UNBOUNDED chain, round
    # r re-runs r replaces over every word — O(n_merges²) string passes
    # at tokenizer-training merge counts (real vocabularies: thousands)
    # — but materializing EVERY round doubles the per-round fixed cost
    # at bench scale (A/B: 3.34 → 5.08 s best), because a persist write
    # of the whole vocab costs more than the few replaces it saves.
    # The window bounds work at O(n_merges · window) passes while the
    # registered 8-merge query never crosses the boundary and keeps its
    # exact pre-r13 plan. The outgoing cache is released only AFTER the
    # next round's action has materialized its successor, so nothing
    # recomputes from lineage.
    cur, prev = words, None
    seq = F.col("seq")
    pending = 0
    for step in range(1, n_merges + 1):
        pairs = (cur.select(F.col("freq"), seq.alias("_s"))
                 .withColumn("_t", F.expr(_TOKS))
                 .select("freq", F.explode(F.expr(_PAIRS)).alias("pair"))
                 .groupBy("pair").agg(F.sum("freq").alias("cnt")))
        top = pairs.orderBy(F.col("cnt").desc(), F.col("pair")).limit(1) \
            .collect()
        if prev is not None and prev is not words:
            prev.unpersist()
        prev = None
        if not top:
            break
        pair, cnt = top[0]["pair"], top[0]["cnt"]
        left, right = pair.split(" ", 1)
        merges.append((step, left, right, left + right, cnt))
        seq = F.replace(seq, F.lit(f" {left}  {right} "),
                        F.lit(f" {left}{right} "))
        pending += 1
        # Payback-horizon trigger (r14): materialize only when at least
        # a full window of LATER rounds will amortize the persist — the
        # r13 unconditional every-8-rounds trigger charged the 12-merge
        # registered query one vocab-wide materialization (bench +13%,
        # sf1 +5-9%) that only 4 trailing rounds ever repaid (a persist
        # costs more than the few replaces it saves, the same
        # measurement that rejected per-round materialization). With the
        # horizon check the 12-merge query keeps its exact pre-r13 plan
        # (zero materializations), while long trainings (30k-50k merges)
        # still materialize every window; the accumulated chain is
        # bounded at 2·window−1 replaces (window−1 pending at the last
        # materialization + window−1 skipped tail rounds), so per-round
        # work stays O(window) and the O(n_merges²) blowup stays fixed.
        if (pending >= _MATERIALIZE_EVERY
                and step + _MATERIALIZE_EVERY <= n_merges):
            nxt = cur.select(seq.alias("seq"), "freq").persist()
            prev, cur = cur, nxt
            seq = F.col("seq")
            pending = 0
    if cur is not words:
        cur.unpersist()
    words.unpersist()
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, merged string, "
                "weight bigint")


def _bpe_train_ctes(n_merges: int, table: str) -> list[str]:
    """The unrolled training CTE chain (shared by the train and encode
    oracles): ``m{r}`` is round r's merge pick, ``s{r}`` the word
    sequences after applying it."""
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
        # coalesce: if round r found no pair (fully merged corpus), m{r}
        # is empty, the scalar subquery is NULL and replace() would
        # NULL the sequence — keep it unchanged instead (the Spark loop
        # simply stops early; row counts still agree).
        ctes.append(f"""s{r} AS MATERIALIZED (
  SELECT coalesce(replace(seq,
                 ' ' || (SELECT replace(pair, ' ', '  ') FROM m{r}) || ' ',
                 ' ' || (SELECT replace(pair, ' ', '') FROM m{r}) || ' '),
                 seq) AS seq, freq
  FROM {prev})""")
    return ctes


def bpe_train_oracle_sql(n_merges: int = 8,
                         table: str = "documents") -> str:
    """DuckDB twin with the merge rounds unrolled as CTEs (same word
    weighting, same sentinel-space replace, same tiebreak)."""
    selects = [
        f"SELECT {r} AS step, split_part(pair, ' ', 1) AS left_sym,"
        f" split_part(pair, ' ', 2) AS right_sym,"
        f" replace(pair, ' ', '') AS merged,"
        f" CAST(cnt AS BIGINT) AS weight FROM m{r}"
        for r in range(1, n_merges + 1)]
    joined = ",\n".join(_bpe_train_ctes(n_merges, table))
    body = "\nUNION ALL\n".join(selects)
    return f"WITH {joined}\n{body}\nORDER BY step"


# doc text → double-space-delimited symbol stream ( per word: chars then
# </w> ), same representation bpe_train trains on
_DOC_SEQ = ("concat('  ', concat_ws('  ', transform("
            "regexp_extract_all(lower({c}), '[a-z]+', 0),"
            " w -> concat(concat_ws('  ', transform(sequence(1, length(w)),"
            " i -> substring(w, i, 1))), '  </w>'))), '  ')")


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list to every document — the tokenizer's
    APPLY side. The model rides the plan as replace literals (one
    leftmost-non-overlapping ``replace`` per merge, map-only, zero
    shuffles); returns ``(doc_id, n_bpe_tokens, seq_hash)`` where
    ``seq_hash`` is the md5 of the single-space-joined token stream (the
    compare moves hashes, not token sequences)."""
    seq = F.expr(_DOC_SEQ.format(c=text_col))
    for left, right in merges:
        seq = F.replace(seq, F.lit(f" {left}  {right} "),
                        F.lit(f" {left}{right} "))
    toks = F.expr("filter(split(_seq, ' +'), x -> x != '')")
    from nci_seronet_proc_data_validator_spark.operators.dedup import (
        spread_small_input,
    )
    return (spread_small_input(docs)
            .select(F.col(id_col), seq.alias("_seq"))
            .select(id_col, toks.alias("_t"))
            .select(F.col(id_col),
                    F.size("_t").cast("long").alias("n_bpe_tokens"),
                    F.md5(F.concat_ws(" ", F.col("_t"))).alias("seq_hash")))


def bpe_encode_oracle_sql(n_merges: int = 8,
                          table: str = "documents") -> str:
    """DuckDB twin: reuses the training CTE chain (``m{r}`` merge picks)
    and applies the same replaces to every document."""
    ctes = ",\n".join(_bpe_train_ctes(n_merges, table))
    doc_seq = ("'  ' || array_to_string(list_transform("
               f"regexp_extract_all(lower(text), '[a-z]+'),"
               " w -> array_to_string(list_transform("
               "generate_series(1, len(w)), i -> w[i:i]), '  ')"
               " || '  </w>'), '  ') || '  '")
    enc = [f"e0 AS MATERIALIZED (SELECT doc_id, {doc_seq} AS seq"
           f" FROM {table})"]
    for r in range(1, n_merges + 1):
        enc.append(
            f"e{r} AS MATERIALIZED (SELECT doc_id, coalesce(replace(seq,"
            f" ' ' || (SELECT replace(pair, ' ', '  ') FROM m{r}) || ' ',"
            f" ' ' || (SELECT replace(pair, ' ', '') FROM m{r}) || ' '),"
            f" seq) AS seq FROM e{r - 1})")
    joined = ",\n".join(enc)
    return f"""WITH {ctes},
{joined}
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_bpe_tokens,
       md5(array_to_string(t, ' ')) AS seq_hash
FROM (SELECT doc_id, list_filter(string_split_regex(seq, ' +'),
                                 x -> x <> '') AS t
      FROM e{n_merges})
"""
