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
    # MAP-ONLY argmin (guide §2.4 remove shuffles outright): the old
    # form cross-joined K centroid rows onto every vector and ran
    # row_number over Window.partitionBy(vec_id) — a K·N-row exchange
    # CARRYING THE EMBEDDINGS, just to pick a per-row maximum. The
    # centroids are model-scale by contract, so fold them into ONE row
    # (sorted struct array, ascending cid) broadcast to every task and
    # take the per-row struct max: (round(sim,12) desc, cid asc) via
    # max over (s, -cid) — the same ranking rule, zero shuffles, and
    # the vector never leaves its input partition.
    # The centroid norm is a constant per centroid: fold it into the
    # broadcast struct ONCE instead of re-running an O(dim) aggregate
    # per (vector, centroid) in the scoring lambda (measured at sf1:
    # the per-row transform was ~50% slower than the old join form
    # until this hoist; cid is unique, so the extra struct field does
    # not perturb sort_array's order).
    cents = F.broadcast(
        centroids.select(F.struct(F.col(cid_col).alias("cid"),
                                  F.col(cvec_col).alias("ce"),
                                  _norm(F.col(cvec_col)).alias("nrm"))
                         .alias("c"))
        .agg(F.sort_array(F.collect_list("c")).alias("_cents")))

    def scored(c):
        s = _dot(F.col(vec_col), c["ce"]) \
            / (F.col("_nrm") * c["nrm"])
        return F.struct(F.round(s, 12).alias("s"),
                        (-c["cid"]).alias("nc"), c["cid"].alias("cid"))

    best = F.array_max(F.transform(F.col("_cents"), scored))
    return (spread_small_input(emb).crossJoin(cents)
            .withColumn("_nrm", _norm(F.col(vec_col)))
            .select(F.col(id_col), F.col(vec_col),
                    best["cid"].alias("cluster_id"))
            # the 1-row aggregate exists even for an EMPTY centroid
            # table (cluster_id NULL there) where the old join emitted
            # zero rows — keep that contract
            .filter(F.col("cluster_id").isNotNull()))


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
    # The probe list is (queries × nprobe) rows — query-batch-scale by
    # contract — so BROADCAST it (guide §3.2): the corpus-sized
    # ``assigned`` side stays in place instead of shuffling by
    # cluster_id through a sort-merge join.
    return (F.broadcast(probes).join(assigned, "cluster_id")
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


def quantize_embeddings(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization: per-vector symmetric scale
    ``s = max(|x|)``, code ``q_i = floor(x_i * 127 / s + 0.5)``.

    Why this shape at 100 TB: the quantized index is ~4x smaller than the
    float32 column (int8 codes + one float scale), so the candidate scan
    is memory-bandwidth-bound on a quarter of the bytes, and the integer
    dot products are exact cross-engine (the float rerank touches only
    the tiny candidate set). ``floor(v + 0.5)`` instead of ``round`` —
    half-up on both engines regardless of each engine's round() tie rule.
    Zero vectors quantize to all-zero codes (scale clamps to 1).
    """
    s = F.aggregate(F.col(vec_col), F.lit(0.0),
                    lambda a, x: F.greatest(a, F.abs(x.cast("double"))))
    out = emb.select(F.col(id_col), F.col(vec_col),
                     F.when(s == 0.0, F.lit(1.0)).otherwise(s)
                     .alias("q_scale"))
    codes = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 127.0 / F.col("q_scale")
                          + 0.5).cast("int"))
    return out.select(id_col, vec_col, "q_scale", codes.alias("q_codes"))


def _idot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def quantized_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                   cand: int = 20, id_col: str = "vec_id",
                   vec_col: str = "embedding", qid_col: str = "query_id",
                   qvec_col: str = "qe") -> DataFrame:
    """Quantize-then-rerank ANN: int8 cosine picks ``cand`` candidates per
    query, exact float cosine reranks them to the final top-``k``.

    Plan shape: one map-only quantize pass over the corpus, a broadcast
    cross join against the (small) quantized query set scored by integer
    dot products, per-query TakeOrdered to ``cand``, then the candidate
    ids — O(Q * cand) rows — broadcast back against the float corpus for
    the exact rerank. The full-precision vectors are never shuffled and
    only ``cand`` of them per query are ever read at rerank; composes
    with IVF bucketing (quantize within each probed bucket).

    Candidate selection is deterministic cross-engine: integer dots are
    exact, the one double divide is IEEE-identical, ranking keys are
    ``round(sim, 12)`` with id tie-breaks (the package-wide contract).
    """
    qd = quantize_embeddings(spread_small_input(emb), id_col, vec_col) \
        .select(F.col(id_col).alias("neighbor_id"),
                F.col("q_codes").alias("nq"))
    qq = quantize_embeddings(
        queries.select(F.col(qid_col).alias("query_id"),
                       F.col(qvec_col).alias("embedding")),
        "query_id", "embedding") \
        .select("query_id", F.col("q_codes").alias("qq"))
    approx = _idot(F.col("qq"), F.col("nq")).cast("double") / (
        F.sqrt(_idot(F.col("qq"), F.col("qq")).cast("double"))
        * F.sqrt(_idot(F.col("nq"), F.col("nq")).cast("double")))
    wc = Window.partitionBy("query_id").orderBy(
        F.round(F.col("asim"), 12).desc(), F.col("neighbor_id"))
    cands = (F.broadcast(qq).crossJoin(qd)
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("asim", approx)
             .withColumn("_rn", F.row_number().over(wc))
             .filter(F.col("_rn") <= cand)
             .select("query_id", "neighbor_id"))

    nvec = emb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("ne"))
    qvec = queries.select(F.col(qid_col).alias("query_id"),
                          F.col(qvec_col).alias("qe"))
    sim = _dot(F.col("qe"), F.col("ne")) / (_norm(F.col("qe"))
                                            * _norm(F.col("ne")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("sim"), 12).desc(), F.col("neighbor_id"))
    return (F.broadcast(cands).join(nvec, "neighbor_id")
            .join(F.broadcast(qvec), "query_id")
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("sim", 6).alias("sim6"), "rank"))


def quantized_topk_oracle_sql(n_queries: int = 5, k: int = 5,
                              cand: int = 20) -> str:
    """DuckDB oracle for the quantize-then-rerank pipeline (queries are
    the first ``n_queries`` vectors, mirroring the driver query)."""
    dot = ("list_reduce(list_transform(list_zip({a}, {b}), "
           "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), "
           "(x, y) -> x + y)")
    idot = ("list_reduce(list_transform(list_zip({a}, {b}), "
            "s -> CAST(s[1] AS BIGINT) * CAST(s[2] AS BIGINT)), "
            "(x, y) -> x + y)")
    nrm = ("sqrt(list_reduce(list_transform({a}, "
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))")
    return f"""
WITH qz AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> CAST(floor(
           CAST(x AS DOUBLE) * 127.0 / (CASE WHEN s = 0 THEN 1.0 ELSE s END)
           + 0.5) AS INTEGER)) AS q_codes
  FROM (SELECT vec_id, embedding,
               list_reduce(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE))),
                 (a, x) -> CASE WHEN x > a THEN x ELSE a END) AS s
        FROM embeddings)),
qq AS (SELECT vec_id AS query_id, q_codes AS qqc FROM qz
       WHERE vec_id < {n_queries}),
cands AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, d.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(CAST({idot.format(a='q.qqc', b='d.q_codes')}
                 AS DOUBLE)
               / (sqrt(CAST({idot.format(a='q.qqc', b='q.qqc')} AS DOUBLE))
                  * sqrt(CAST({idot.format(a='d.q_codes', b='d.q_codes')}
                         AS DOUBLE))), 12) DESC,
               d.vec_id) AS rn
    FROM qq q CROSS JOIN qz d WHERE q.query_id <> d.vec_id)
  WHERE rn <= {cand})
SELECT query_id, neighbor_id, sim6, rank FROM (
  SELECT c.query_id, c.neighbor_id,
         round({dot.format(a='qv.embedding', b='nv.embedding')}
           / ({nrm.format(a='qv.embedding')}
              * {nrm.format(a='nv.embedding')}), 6) AS sim6,
         row_number() OVER (PARTITION BY c.query_id
           ORDER BY round({dot.format(a='qv.embedding', b='nv.embedding')}
               / ({nrm.format(a='qv.embedding')}
                  * {nrm.format(a='nv.embedding')}), 12) DESC,
             c.neighbor_id) AS rank
  FROM cands c
  JOIN embeddings nv ON nv.vec_id = c.neighbor_id
  JOIN embeddings qv ON qv.vec_id = c.query_id)
WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _py_norm(ce: list[float]) -> float:
    """Driver-side mirror of the ``_norm`` fold over a literal — same
    left-to-right IEEE accumulation, so the value is the bit the SQL
    oracle computes for the same centroid."""
    import math
    acc = 0.0
    for x in ce:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _cos_lit(vec: Column, nrm: Column, ce: list[float]) -> Column:
    """Cosine of a vector column (norm pre-staged in ``nrm`` — computed
    once per row, not once per centroid) against a centroid LITERAL —
    dot is the same left-to-right double fold as ``_dot``, the centroid
    norm is the driver-side mirror fold, so values are bit-identical to
    the broadcast-join path."""
    # one generated literal expression (CAST-from-repr parses to the
    # bit-identical double), not a py4j call per component
    lit = F.expr("array(" + ", ".join(
        f"CAST('{float(x)!r}' AS DOUBLE)" for x in ce) + ")")
    return _dot(vec, lit) / (nrm * F.lit(_py_norm(ce)))


def ivf_assign_literal(emb: DataFrame,
                       centroids: list[tuple[int, list[float]]],
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """MAP-ONLY IVF assignment against driver-known centroids (the
    k-means model-as-literal idiom): per-row argmax over K cosine
    expressions — no crossJoin row inflation, no per-row window, no
    shuffle at all; streaming-safe. Bit-equal to ``ivf_assign`` (same
    fold arithmetic; ties on round(sim, 12) go to the lowest centroid
    id — the literal is in ascending-cid order and ``array_position``
    takes the FIRST maximum). Prefer this form whenever the centroids
    came from a driver-side fit; the broadcast-join ``ivf_assign``
    remains for centroid TABLES that never touch the driver."""
    cents = sorted(centroids)
    sims = F.array(*[F.round(_cos_lit(F.col(vec_col), F.col("_nrm"), ce),
                             12)
                     for _, ce in cents])
    cid_lit = F.array(*[F.lit(int(c)) for c, _ in cents])
    return (spread_small_input(emb)
            .withColumn("_nrm", _norm(F.col(vec_col)))
            .withColumn("_sims", sims)
            .select(id_col, vec_col,
                    F.element_at(
                        cid_lit,
                        F.array_position("_sims", F.array_max("_sims"))
                        .cast("int")).alias("cluster_id")))


def ivf_probes_literal(queries: DataFrame,
                       centroids: list[tuple[int, list[float]]],
                       nprobe: int = 2, qid_col: str = "query_id",
                       qvec_col: str = "qe") -> DataFrame:
    """MAP-ONLY probe routing: the ``nprobe`` nearest centroids per
    query via an array_sort over (−round(sim,12), cid) structs — the
    exact (sim DESC, cid ASC) ranking of the window path, one row out
    per (query, probe)."""
    cents = sorted(centroids)
    ranked = F.array_sort(F.array(*[
        F.struct((-F.round(_cos_lit(F.col(qvec_col), F.col("_qnrm"), ce),
                           12)).alias("negsim"),
                 F.lit(int(c)).alias("cid"))
        for c, ce in cents]))
    return (queries
            .withColumn("_qnrm", _norm(F.col(qvec_col)))
            .withColumn("_probe",
                        F.explode(F.slice(ranked, 1, nprobe)))
            .select(qid_col, qvec_col,
                    F.col("_probe.cid").alias("cluster_id")))
