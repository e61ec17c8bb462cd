"""Product quantization (PQ) — the codebook compression tier of the ANN
stack (Jégou et al. 2011), completing the engine's similarity family:
brute-force → IVF (coarse clusters) → int8 scalar quantization → PQ
(vector codebooks, ~dim·32/m·log2(ksub)× compression).

Spark-first shape for 100 TB:

- **Fit** trains one k-means codebook per subspace by reusing the
  engine's distributed Lloyd (``operators/kmeans``) over a SLICED
  embedding column — every subspace fit is the same
  assignment-map/aggregate-reduce rounds, and only m·ksub·(dim/m)
  scalars ever reach the driver (model sync, the k-means contract).
  The m fits run as separate jobs here; a fused single-pass variant
  (explode per subspace, one keyed Lloyd over (subspace, centroid))
  drops in when fit-time scans dominate.
- **Encode is map-only.** All m codebooks ride the plan as literal
  arithmetic; each row's code is m argmins computed in one projection —
  no shuffle, no join, streaming-safe (the k-means/classifier/PCA
  model-as-literal idiom).
- **ADC search never touches raw vectors.** Asymmetric distance
  computation expands the query against the codebook literals and sums
  per-subspace lookup terms over the stored codes — the scan reads
  m bytes of code per row instead of dim floats.

Float contract: IEEE double throughout; ties in argmin break to the
LOWEST centroid id (``array_position`` returns the first minimum), so
codes are deterministic. Test-verified against a numpy twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pq_fit(emb: DataFrame, dim: int, m: int = 8, ksub: int = 16,
           iters: int = 2, id_col: str = "vec_id",
           vec_col: str = "embedding") -> list[list[list[float]]]:
    """Train ``m`` subspace codebooks of ``ksub`` centroids each.
    Returns ``codebooks[m][ksub][dim/m]`` (missing/empty clusters are
    dropped by the underlying Lloyd; ksub is an upper bound)."""
    from nci_seronet_proc_data_validator_spark.operators.kmeans import (
        kmeans_centroid_vectors)
    if dim % m != 0:
        raise ValueError(f"dim must divide into m subspaces: {dim=} {m=}")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col))
        cents = (kmeans_centroid_vectors(sub, k=ksub, iters=iters,
                                         id_col=id_col, vec_col=vec_col)
                 .orderBy("centroid_id").collect())
        books.append([[float(x) for x in r["ce"]] for r in cents])
    return books


def _sub_dist_sql(vec_col: str, s: int, dsub: int,
                  centroid: list[float], query: bool) -> str:
    """Squared L2 of subspace ``s`` of ``vec_col`` vs a centroid literal.
    ``query=False`` indexes the subvector slice of a full data vector."""
    terms = []
    for j, c in enumerate(centroid):
        idx = s * dsub + j
        terms.append(f"power(CAST({vec_col}[{idx}] AS DOUBLE)"
                     f" - ({c!r}), 2)")
    return "(" + " + ".join(terms) + ")"


def pq_encode(emb: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              out_col: str = "pq_code") -> DataFrame:
    """Append ``out_col``: array<int> of m codebook indices (0-based),
    one argmin per subspace, computed entirely map-side."""
    dsub = len(codebooks[0][0])
    codes = []
    for s, book in enumerate(codebooks):
        dists = ", ".join(_sub_dist_sql(vec_col, s, dsub, c, False)
                          for c in book)
        codes.append(f"CAST(array_position(array({dists}), "
                     f"array_min(array({dists}))) - 1 AS INT)")
    return emb.withColumn(out_col,
                          F.expr(f"array({', '.join(codes)})"))


def pq_adc_topk(codes: DataFrame, queries: DataFrame,
                codebooks: list[list[list[float]]], k: int = 5,
                id_col: str = "vec_id", code_col: str = "pq_code",
                query_id: str = "query_id",
                query_vec: str = "qe") -> DataFrame:
    """Asymmetric-distance top-k: for every query, the k nearest stored
    CODES (approximate L2). The query side is broadcast; the code scan
    computes Σ_s table_s[code_s] from codebook literals — no raw-vector
    reads, no shuffle keyed on content; ranking is a per-query window
    (partitioned — never global)."""
    from pyspark.sql import Window as W
    dsub = len(codebooks[0][0])
    terms = []
    for s, book in enumerate(codebooks):
        luts = ", ".join(_sub_dist_sql(query_vec, s, dsub, c, True)
                         for c in book)
        terms.append(f"element_at(array({luts}), "
                     f"CAST({code_col}[{s}] AS INT) + 1)")
    dist = F.expr(" + ".join(terms))
    scored = (codes.crossJoin(F.broadcast(queries))
              .select(query_id, id_col, F.round(dist, 6).alias("adc_dist")))
    w = W.partitionBy(query_id).orderBy("adc_dist", id_col)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy(query_id, "rank"))


def ivfpq_topk(emb: DataFrame, centroids: DataFrame,
               codebooks: list[list[list[float]]], queries: DataFrame,
               k: int = 5, nprobe: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding", query_id: str = "query_id",
               query_vec: str = "qe") -> DataFrame:
    """Bounded-probe PQ search — the FAISS IVF-PQ shape (codes quantize
    raw vectors; residual encoding is the drop-in refinement): coarse IVF
    routing picks ``nprobe`` clusters per query, ADC runs ONLY over the
    codes of those clusters. Candidate count is corpus_fraction ×
    nprobe/K instead of the whole scan — the scale path
    ``pq_adc_topk``'s compressed-domain full scan needs at real corpus
    sizes. Probe routing is cosine (matching ``similarity.ivf_assign``,
    so a bucketBy(cluster_id) code index co-locates both consumers);
    within candidates the ranking is ADC L2 over codebook literals.
    """
    from pyspark.sql import Window as W
    from nci_seronet_proc_data_validator_spark.operators.similarity import (
        _dot, _norm, ivf_assign)
    codes = pq_encode(
        ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col),
        codebooks, vec_col=vec_col).select(id_col, "cluster_id", "pq_code")
    qsim = (_dot(F.col(query_vec), F.col("ce"))
            / (_norm(F.col(query_vec)) * _norm(F.col("ce"))))
    wq = W.partitionBy(query_id).orderBy(
        F.round(F.col("_qsim"), 12).desc(), F.col("centroid_id"))
    probes = (queries.crossJoin(F.broadcast(centroids))
              .withColumn("_qsim", qsim)
              .withColumn("_rn", F.row_number().over(wq))
              .filter(F.col("_rn") <= nprobe)
              .select(query_id, query_vec,
                      F.col("centroid_id").alias("cluster_id")))
    dsub = len(codebooks[0][0])
    terms = []
    for s, book in enumerate(codebooks):
        luts = ", ".join(_sub_dist_sql(query_vec, s, dsub, c, True)
                         for c in book)
        terms.append(f"element_at(array({luts}), "
                     f"CAST(pq_code[{s}] AS INT) + 1)")
    dist = F.expr(" + ".join(terms))
    w = W.partitionBy(query_id).orderBy("adc_dist", id_col)
    return (probes.join(codes, "cluster_id")
            .select(query_id, id_col, F.round(dist, 6).alias("adc_dist"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy(query_id, "rank"))
