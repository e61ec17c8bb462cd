"""BM25 full-text ranking over the documents table — the retrieval-side
companion to the dedup/similarity operators (training-data pipelines use
it for corpus search, contamination checks, and quality-weighted mixes).

Scale shape (100 TB posture):

- The tokenizer is the same JVM ``regexp_extract_all`` the dedup operators
  use; document length is computed from the token array map-only, without
  exploding.
- The explode for term frequencies is **filtered to the query terms before
  the shuffle** — the (doc, term) aggregation only ever sees rows whose
  term is in the query, so the shuffle volume is O(matching postings), not
  O(total tokens).
- Corpus statistics (N, avgdl) are a single aggregate broadcast back into
  the plan (no driver-side ``count()``; the whole query is one lazy plan).
- Document frequencies ride the already-tiny filtered tf relation.
- Ranking ties: ``(round(score, 12) DESC, doc_id)`` — the same
  float-stable tiebreak contract the similarity oracles use.
- Top-N is a ``TakeOrdered`` (``orderBy(...).limit(n)``), never a global
  window: at 100 TB the scored set is O(docs matching any query term), and
  an unpartitioned ``row_number`` would move all of it to ONE task. Ranks
  are assigned *after* the take, over the ≤``top_n`` survivors, via a
  broadcast rank-count join — no ``WindowExec`` anywhere in the plan
  (guarded by ``tests/test_plan_shape.py``).

The IEEE contract with the DuckDB oracle: every arithmetic expression is
written with the identical tree shape on both engines; integer-valued
doubles (tf, df, N, dl) are exact, ``avgdl`` is an exact-integer sum over
a count, and the one ``ln`` plus the final ≤|query|-term sum round through
6 digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def bm25_topk(docs: DataFrame, terms: list[str], top_n: int = 10,
              k1: float = DEFAULT_K1, b: float = DEFAULT_B,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``top_n`` documents by BM25 score for a bag of query terms.

    Returns ``(doc_id, score6, rank)`` — score rounded to 6 digits, rank
    1-based dense over ``(round(score,12) DESC, doc_id)``.
    """
    toks = docs.select(
        F.col(id_col),
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        .alias("t"))
    dl = toks.select(id_col, F.size("t").cast("double").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).cast("double").alias("N"),
                   F.avg("dl").alias("avgdl"))
    tf = (toks.select(id_col, F.explode("t").alias("term"))
          .filter(F.col("term").isin(list(terms)))
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).cast("double").alias("tf")))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(1 + (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (idf * F.col("tf") * (k1 + 1)
               / (F.col("tf")
                  + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(dl, id_col)
              .crossJoin(F.broadcast(stats))
              .select(F.col(id_col), contrib.alias("contrib")))
    agg = scored.groupBy(id_col).agg(F.sum("contrib").alias("score"))
    # TakeOrdered top-N (per-partition heaps + driver merge of N rows) —
    # the global sort never materializes, unlike a partition-less window.
    topn = (agg.orderBy(F.round(F.col("score"), 12).desc(), F.col(id_col))
            .limit(top_n)
            .select(F.col(id_col), "score",
                    F.round(F.col("score"), 12).alias("s12")))
    # rank(d) = 1 + |{peer : peer sorts strictly before d}| over the
    # <= top_n survivors: a broadcast self-join on the tiny take result,
    # identical tie-break, zero WindowExec.
    peers = topn.select(F.col("s12").alias("peer_s12"),
                        F.col(id_col).alias("peer_id"))
    before = ((F.col("peer_s12") > F.col("s12"))
              | ((F.col("peer_s12") == F.col("s12"))
                 & (F.col("peer_id") < F.col(id_col))))
    return (topn.join(F.broadcast(peers), before, "left")
            .groupBy(id_col, "score")
            .agg((F.count("peer_id") + 1).cast("int").alias("rank"))
            .select(id_col, F.round("score", 6).alias("score6"), "rank")
            .orderBy("rank"))


def bm25_oracle_sql(terms: list[str], top_n: int = 10,
                    k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                    table: str = "documents") -> str:
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM {table}),
dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS N, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE term IN ({term_list})
  GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (stats.N - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
           AS contrib
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats),
agg AS (SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1)
SELECT doc_id, round(score, 6) AS score6, rank
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY round(score, 12) DESC, doc_id)
               AS rank
      FROM agg)
WHERE rank <= {top_n}
ORDER BY rank
"""


def rrf_fuse(rankings: list[DataFrame], k_const: int = 60,
             max_rank: int = 10, top_k: int = 5,
             qid_col: str = "query_id", id_col: str = "neighbor_id"
             ) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) over N retriever
    rankings — the standard hybrid-retrieval ensemble (e.g. lexical +
    dense + quantized channels): score(d) = Σ_r 1/(k + rank_r(d)),
    re-ranked per query.

    Exactness contract: the fractional sum is computed over a COMMON
    integer denominator — numerator Σ lcm(k+1..k+max_rank)/(k+rank) as
    int64 — so accumulation order (nondeterministic under partial
    aggregation) cannot perturb ties; the single float op is one IEEE
    division for the reported score. Docs surfaced by only some channels
    score on those alone (standard RRF). Plan shape: union of the
    (already tiny, ≤ Q·k-row) rankings → one keyed sum → per-query
    window — never touches corpus-scale data."""
    import math
    from functools import reduce

    from pyspark.sql import Window
    lcm = math.lcm(*range(k_const + 1, k_const + max_rank + 1))
    un = reduce(lambda a, b: a.unionByName(b),
                [r.select(qid_col, id_col, "rank") for r in rankings])
    fused = (un.withColumn("_num", F.expr(f"{lcm} DIV ({k_const} + rank)"))
             .groupBy(qid_col, id_col)
             .agg(F.sum("_num").alias("_num")))
    w = Window.partitionBy(qid_col).orderBy(F.col("_num").desc(),
                                            F.col(id_col))
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(qid_col, id_col,
                    F.round(F.col("_num").cast("double") / float(lcm), 6)
                    .alias("rrf6"), "rank"))


def rrf_oracle_sql(ranking_ctes: list[str], k_const: int = 60,
                   max_rank: int = 10, top_k: int = 5) -> str:
    """DuckDB twin of ``rrf_fuse`` over named CTEs each exposing
    (query_id, neighbor_id, rank). CAST the HUGEINT sum back to BIGINT
    (the engine-parity contract)."""
    import math
    lcm = math.lcm(*range(k_const + 1, k_const + max_rank + 1))
    un = " UNION ALL ".join(
        f"SELECT query_id, neighbor_id, rank FROM {c}"
        for c in ranking_ctes)
    return f"""
SELECT query_id, neighbor_id, rrf6, rank FROM (
  SELECT query_id, neighbor_id,
         round(CAST(num AS DOUBLE) / {lcm}, 6) AS rrf6,
         row_number() OVER (PARTITION BY query_id
           ORDER BY num DESC, neighbor_id) AS rank
  FROM (SELECT query_id, neighbor_id,
               CAST(SUM({lcm} // ({k_const} + rank)) AS BIGINT) AS num
        FROM ({un}) GROUP BY 1, 2))
WHERE rank <= {top_k}
"""
