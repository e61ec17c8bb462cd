"""SemDeDup — semantic deduplication via embedding-cluster pruning.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates — documents whose embeddings are nearly identical even when
their text is not — by (1) k-means-clustering the embedding space and
(2) comparing pairs ONLY within a cluster, dropping all but one of each
near-identical group. The reference repo has no vector pipeline; this is
part of the LLM-curation surface the Spark engine adds.

Spark-first shape, and why it scales to 100 TB:

- **Clustering bounds the candidate set.** The all-pairs cosine matrix is
  O(N²); within-cluster pairs are O(Σ|c|²) ≈ N²/k for balanced clusters —
  with production k in the tens of thousands, a ~10⁴-10⁵× cut, same idea
  as the LSH band buckets in ``operators/dedup``. The pair join is an
  equi-join on ``cid``: one shuffle of (id, vector) keyed by cluster,
  bucket-local pairing, AQE skew-split if a cluster runs hot.
- **The model rides the plan.** Cluster assignment reuses
  ``kmeans.kmeans_assignments`` — per-row argmin against a centroid
  literal, map-only (no shuffle of vector data for assignment).
- **Integer-exact pair similarity.** Pairs are compared on the QUANTIZED
  vectors (micro-unit longs, ``kmeans.QUANT``): the dot product and the
  squared norms are exact integer folds (|q|≤~1e6, 64 dims → partial sums
  ≤ 6.4e13, far inside both int64 and the 2^53 double-exact range), so
  the only float op is one sqrt+divide per pair — bit-identical on Spark
  and DuckDB; the decision threshold compares ``round(sim, 12)``.
- **Deterministic keep rule.** A vector is dropped iff some SMALLER-id
  vector in its cluster is within the threshold. This keeps exactly the
  per-cluster id-minimal representatives of the above-threshold
  neighborhood graph — deterministic, anti-join expressible, and
  one-pass. (The paper keeps the member farthest from the centroid;
  id-order is the engine-portable tiebreak — documented deviation.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.kmeans import (
    kmeans_assignments,
    kmeans_ctes,
)


def _idot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized (long) vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


# Auto-k when ``k=None``: k = max(8, isqrt(N)). The two cost terms pull
# against each other — centroid assignment is O(N·k·d) (per-row argmin
# over k literal centroids), within-cluster pairing is O(N²/k) — and
# k ∝ √N balances them at O(N^1.5) each. Measured at sf1 (20k vectors,
# noop sink, BENCH_NOTES r8): fixed k=8 27.5 s (pairing quadratic,
# ×13.4/decade), k=N/64 10.7 s (assignment is the growing term under
# exact Lloyd), k=√N 6.7 s (×3.6/decade). The paper's constant-cluster-
# size regime works because it assigns with ANN (faiss), whose
# engine-side analogue is the IVF coarse quantizer in
# ``operators/pq.py``. Fixed k stays available for oracle-pinned callers
# (the driver query needs a compile-time k in its DuckDB CTE chain).


def semdedup(emb: DataFrame, k: int | None = 8, iters: int = 2,
             threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_rows: int | None = None) -> DataFrame:
    """Per-vector SemDeDup verdict: ``(vec_id, cluster_id, keep)``.

    ``keep`` is False iff a smaller-id vector in the same k-means cluster
    has cosine similarity ≥ ``threshold``.

    ``k=None`` scales the cluster count with the corpus —
    ``max(8, isqrt(N))`` via one count job — balancing assignment
    (O(N·k·d)) against pairing (O(N²/k)) at O(N^1.5): 4.1× faster than
    the fixed default at sf1 and sublinear per decade (BENCH_NOTES r8).
    Pass an explicit k when a deterministic model shape is required
    (oracle parity, tests) — and declare the input bound you are relying
    on via ``max_rows=``, or the scale advisor flags the call
    (``plans.advisor.warn_fixed_k``): a compile-time k over unbounded
    input makes within-cluster pairing a quadratic time bomb.
    ``max_rows`` is a TRUSTED declaration at call time (validating it
    would cost the count job whose absence is the point of declaring);
    a false bound disarms the advisor, not the blowup — it is the
    declared-intent audit trail, the analogue of the plan-guard
    allowances in tests/test_advisor.py. The auto-k path (``k=None``)
    computes the true N anyway and there the declaration IS checked
    (``plans.advisor.check_declared_bound``) — a breach warns at the
    point N becomes known, at zero added jobs.
    """
    from nci_seronet_proc_data_validator_spark.plans.advisor import (
        check_declared_bound, warn_fixed_k)
    warn_fixed_k("semdedup", k, max_rows)
    if k is None:
        import math
        n = emb.count()
        # The auto-k path learns the true N anyway — validate any
        # max_rows declaration for free (advisor.check_declared_bound):
        # a false bound disarms the advisor on OTHER calls that trust it.
        check_declared_bound("semdedup", max_rows, n)
        k = max(8, math.isqrt(n))
    # localCheckpoint: the assignment feeds BOTH pair-join sides and the
    # final verdict join — unmaterialized, the Lloyd assignment subtree
    # would execute three times. Blocks are freed by the ContextCleaner
    # when the plan is garbage-collected (no session-lifetime pin).
    # advise=False: the fixed-k hazard for this call was already judged
    # above (semdedup's pairing term is the binding constraint, not the
    # linear-in-N assignment kmeans itself would flag).
    assigned = kmeans_assignments(emb, k=k, iters=iters,
                                  id_col=id_col, vec_col=vec_col,
                                  advise=False).localCheckpoint()
    a = assigned.select(F.col("vid").alias("id_a"),
                        F.col("qv").alias("qa"), "cid")
    b = assigned.select(F.col("vid").alias("id_b"),
                        F.col("qv").alias("qb"), "cid")
    # One shuffle on cid; pairing + cosine stay bucket-local.
    sim = (_idot(F.col("qa"), F.col("qb")).cast("double")
           / (F.sqrt(_idot(F.col("qa"), F.col("qa")).cast("double"))
              * F.sqrt(_idot(F.col("qb"), F.col("qb")).cast("double"))))
    dropped = (a.join(b, "cid")
               .where(F.col("id_a") < F.col("id_b"))
               .where(F.round(sim, 12) >= threshold)
               .select(F.col("id_b").alias("vid"))
               .distinct())
    return (assigned.join(dropped.withColumn("_drop", F.lit(True)),
                          "vid", "left")
            .select(F.col("vid").alias(id_col),
                    F.col("cid").alias("cluster_id"),
                    F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
            )


def semdedup_oracle_sql(k: int | str = 8, iters: int = 2,
                        threshold: float = 0.95,
                        table: str = "embeddings") -> str:
    """DuckDB twin over the shared unrolled-Lloyd CTE chain
    (``kmeans.kmeans_ctes``): pairs from the final assignment ``a{iters}``,
    the same integer dot / sqrt ratio, the same keep rule."""
    idot = ("list_reduce(list_transform(list_zip({a}, {b}), "
            "s -> s[1] * s[2]), (x, y) -> x + y)")
    sim = (f"CAST({idot.format(a='x.qv', b='y.qv')} AS DOUBLE)"
           f" / (sqrt(CAST({idot.format(a='x.qv', b='x.qv')} AS DOUBLE))"
           f" * sqrt(CAST({idot.format(a='y.qv', b='y.qv')} AS DOUBLE)))")
    ctes = ",\n".join(kmeans_ctes(k, iters, table))
    return f"""
WITH {ctes},
dropped AS (
  SELECT DISTINCT y.vid
  FROM a{iters} x JOIN a{iters} y ON x.cid = y.cid AND x.vid < y.vid
  WHERE round({sim}, 12) >= {threshold})
SELECT a.vid AS vec_id, a.cid AS cluster_id,
       (d.vid IS NULL) AS keep
FROM a{iters} a LEFT JOIN dropped d ON a.vid = d.vid
"""
