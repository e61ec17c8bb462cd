"""Similarity search over embedding columns.

Two tiers, mirroring how ANN systems scale:

- ``brute_force_topk`` — exact cosine top-k; the correctness baseline
  (also exposed as the ``embedding_topk`` driver query). O(N·Q) dot
  products, fine up to ~10^6×10^3.
- ``ivf_assign`` / ``ivf_topk`` — IVF (inverted-file) ANN: vectors are
  bucketed by nearest centroid once (a build-side scan + broadcast of K
  centroids), and each query probes only the ``nprobe`` nearest clusters.
  At 100 TB the candidate join hits ~nprobe/K of the data, the cluster id
  is a partition/bucket key (co-located join, no full shuffle per query
  batch), and centroids stay broadcast-small.

Determinism contract (shared with the DuckDB oracles): dot products fold
left-to-right from 0.0 (IEEE-identical across engines), ranking keys are
``round(sim, 12)`` with id tie-breaks, reported sims round to 6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.dedup import (
    spread_small_input,
)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "query_id", qvec_col: str = "qe"
                     ) -> DataFrame:
    """Exact cosine top-k for each query vector (queries broadcast)."""
    c = spread_small_input(emb).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ne"),
        _norm(F.col(vec_col)).alias("n_nrm"))
    q = queries.select(F.col(qid_col).alias("query_id"),
                       F.col(qvec_col).alias("qe"),
                       _norm(F.col(qvec_col)).alias("q_nrm"))
    sim = _dot(F.col("qe"), F.col("ne")) / (F.col("q_nrm") * F.col("n_nrm"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("sim"), 12).desc(), F.col("neighbor_id"))
    return (F.broadcast(q).crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("sim", 6).alias("sim6"), "rank"))


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cid_col: str = "centroid_id", cvec_col: str = "ce"
               ) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (ties → lowest
    centroid id). Centroids are broadcast; output carries (vec, cluster).

    At scale, write the result bucketed by ``cluster_id``
    (``.write.bucketBy(K, 'cluster_id')``) so probe-time joins co-locate.
    """
    sim = _dot(F.col(vec_col), F.col(cvec_col)) \
        / (_norm(F.col(vec_col)) * _norm(F.col(cvec_col)))
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("_csim"), 12).desc(), F.col(cid_col))
    return (spread_small_input(emb).crossJoin(F.broadcast(centroids))
            .withColumn("_csim", sim)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, vec_col, F.col(cid_col).alias("cluster_id")))


def ivf_topk(emb: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: int = 5, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id", qvec_col: str = "qe") -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest clusters per query, exact
    cosine within candidates only."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)

    qsim = _dot(F.col(qvec_col), F.col("ce")) \
        / (_norm(F.col(qvec_col)) * _norm(F.col("ce")))
    wq = Window.partitionBy(qid_col).orderBy(
        F.round(F.col("_qsim"), 12).desc(), F.col("centroid_id"))
    probes = (queries.crossJoin(F.broadcast(centroids))
              .withColumn("_qsim", qsim)
              .withColumn("_rn", F.row_number().over(wq))
              .filter(F.col("_rn") <= nprobe)
              .select(qid_col, qvec_col,
                      F.col("centroid_id").alias("cluster_id")))

    sim = _dot(F.col(qvec_col), F.col(vec_col)) \
        / (_norm(F.col(qvec_col)) * _norm(F.col(vec_col)))
    w = Window.partitionBy(qid_col).orderBy(
        F.round(F.col("_sim"), 12).desc(), F.col(id_col))
    return (probes.join(assigned, "cluster_id")
            .filter(F.col(qid_col) != F.col(id_col))
            .withColumn("_sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(qid_col), F.col(id_col).alias("neighbor_id"),
                    F.round("_sim", 6).alias("sim6"), "rank"))


def ivf_topk_oracle_sql(n_centroids: int = 16, n_queries: int = 5,
                        k: int = 5, nprobe: int = 2,
                        cent_cte: str | None = None,
                        prefix_ctes: list[str] | None = None) -> str:
    """DuckDB oracle for the full IVF pipeline. By default centroids are
    the first ``n_centroids`` vectors; pass ``cent_cte`` (a CTE named
    ``cent(centroid_id, ce)``, plus any ``prefix_ctes`` it builds on) to
    oracle-check a trained index, e.g. k-means centroids
    (``kmeans.kmeans_centroid_vectors_cte``)."""
    dot = ("list_reduce(list_transform(list_zip({a}, {b}), "
           "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), "
           "(x, y) -> x + y)")
    nrm = ("sqrt(list_reduce(list_transform({a}, "
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))")

    def cos(a, b):
        return (f"{dot.format(a=a, b=b)} / "
                f"({nrm.format(a=a)} * {nrm.format(a=b)})")

    default_cent = (f"cent AS (\n  SELECT vec_id AS centroid_id, "
                    f"embedding AS ce FROM embeddings\n"
                    f"  WHERE vec_id < {n_centroids})")
    lead = ",\n".join([*(prefix_ctes or []), cent_cte or default_cent])
    return f"""
WITH {lead},
assigned AS (
  SELECT vec_id, embedding, centroid_id AS cluster_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round({cos('e.embedding', 'c.ce')}, 12) DESC,
                      c.centroid_id) AS rn
    FROM embeddings e CROSS JOIN cent c)
  WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qe, centroid_id AS cluster_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round({cos('q.qe', 'c.ce')}, 12) DESC,
                      c.centroid_id) AS rn
    FROM q CROSS JOIN cent c)
  WHERE rn <= {nprobe})
SELECT query_id, neighbor_id, sim6, rank FROM (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round({cos('p.qe', 'a.embedding')}, 6) AS sim6,
         row_number() OVER (PARTITION BY p.query_id
           ORDER BY round({cos('p.qe', 'a.embedding')}, 12) DESC,
                    a.vec_id) AS rank
  FROM probes p JOIN assigned a ON p.cluster_id = a.cluster_id
  WHERE p.query_id <> a.vec_id)
WHERE rank <= {k}
ORDER BY query_id, rank
"""
