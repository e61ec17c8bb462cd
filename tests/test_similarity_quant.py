"""Int8 quantize-then-rerank ANN (operators/similarity.py)."""

from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.similarity import (
    brute_force_topk,
    quantize_embeddings,
    quantized_topk,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_quantize_codes_hand_computed(spark):
    df = _emb(spark, [
        (1, [1.0, -0.5, 0.25]),   # scale 1.0 -> [127, -63, 32]
        (2, [0.0, 0.0, 0.0]),     # zero vector -> scale clamps to 1
        (3, [-2.0, 4.0, 0.0]),    # scale 4.0 -> [-63, 127, 0]
    ])
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # floor(v + 0.5): -0.5*127 = -63.5 -> floor(-63) = -63 (half-up)
    assert rows[1]["q_codes"] == [127, -63, 32]
    assert rows[1]["q_scale"] == 1.0
    assert rows[2]["q_codes"] == [0, 0, 0] and rows[2]["q_scale"] == 1.0
    assert rows[3]["q_codes"] == [-63, 127, 0] and rows[3]["q_scale"] == 4.0


def test_quantized_rerank_matches_brute_force_when_cand_covers(spark):
    """With cand >= corpus size the rerank sees every vector, so the
    final top-k must equal the exact brute-force ranking."""
    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = _emb(spark, rows)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))
    exact = brute_force_topk(emb, queries, k=5).collect()
    quant = quantized_topk(emb, queries, k=5, cand=30).collect()
    key = lambda r: (r["query_id"], r["rank"])
    exact_m = {key(r): (r["neighbor_id"], r["sim6"]) for r in exact
               if r["rank"] <= 5}
    quant_m = {key(r): (r["neighbor_id"], r["sim6"]) for r in quant}
    assert exact_m == quant_m


def test_quantized_candidates_recall_narrow_cand(spark):
    """Even with a narrow candidate budget the int8 approximation keeps
    the true nearest neighbor (planted near-duplicate) in the top-1."""
    base = [0.9, -0.2, 0.4, 0.1]
    near = [0.89, -0.21, 0.41, 0.1]
    far = [[-0.5, 0.8, -0.1, 0.3], [0.1, 0.9, 0.2, -0.7],
           [-0.9, -0.1, 0.5, 0.2]]
    emb = _emb(spark, [(0, base), (1, near)]
               + [(i + 2, v) for i, v in enumerate(far)])
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))
    top = quantized_topk(emb, queries, k=1, cand=2).collect()
    assert len(top) == 1 and top[0]["neighbor_id"] == 1


def test_ivf_assign_literal_matches_broadcast_join_path(spark):
    """Map-only literal assignment/probing is value-identical to the
    broadcast-join + window path, and plans with no content shuffle."""
    import numpy as np
    from nci_seronet_proc_data_validator_spark.operators.similarity import (
        ivf_assign, ivf_assign_literal, ivf_probes_literal)
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    rng = np.random.RandomState(7)
    X = rng.randn(80, 8)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")
    cents = [(int(i), [float(v) for v in X[i]]) for i in (3, 11, 40)]
    cdf = spark.createDataFrame(cents, "centroid_id int, ce array<double>")
    a = {r["vec_id"]: r["cluster_id"]
         for r in ivf_assign(emb, cdf).collect()}
    b = {r["vec_id"]: r["cluster_id"]
         for r in ivf_assign_literal(emb, cents).collect()}
    assert a == b
    plan = (ivf_assign_literal(emb, cents)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan and "Window" not in plan

    qs = emb.filter("vec_id < 4").selectExpr(
        "vec_id AS query_id", "embedding AS qe")
    lit = {(r["query_id"], r["cluster_id"])
           for r in ivf_probes_literal(qs, cents, nprobe=2).collect()}
    # window-path twin (the ivf_topk probe block)
    from nci_seronet_proc_data_validator_spark.operators.similarity import (
        _dot, _norm)
    qsim = _dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe"))
                                             * _norm(F.col("ce")))
    wq = Window.partitionBy("query_id").orderBy(
        F.round(F.col("_qsim"), 12).desc(), F.col("centroid_id"))
    win = {(r["query_id"], r["centroid_id"]) for r in
           (qs.crossJoin(F.broadcast(cdf)).withColumn("_qsim", qsim)
            .withColumn("_rn", F.row_number().over(wq))
            .filter(F.col("_rn") <= 2)
            .select("query_id", "centroid_id")).collect()}
    assert lit == win


def test_ivf_assign_empty_centroids_and_tiebreak(spark):
    """Pins the r13 map-only ivf_assign contracts the broadcast-struct
    rewrite must preserve: an EMPTY centroid table emits zero rows (the
    old join's semantics — the 1-row collect_list aggregate still exists
    there, so the NULL-cluster filter is load-bearing), equal-similarity
    ties go to the LOWEST centroid id, and the per-vector plan keeps the
    zero-shuffle shape (no Window, no SortMergeJoin)."""
    from nci_seronet_proc_data_validator_spark.operators.similarity import (
        ivf_assign)
    emb = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    empty = spark.createDataFrame([], "centroid_id int, ce array<double>")
    assert ivf_assign(emb, empty).count() == 0
    # centroids 7 and 3 are the same direction as each other (identical
    # cosine to every vector); the (round(sim,12) desc, cid asc) rule
    # must pick cid 3 for both vectors
    ties = spark.createDataFrame(
        [(7, [1.0, 1.0]), (3, [2.0, 2.0])],
        "centroid_id int, ce array<double>")
    got = {r["vec_id"]: r["cluster_id"]
           for r in ivf_assign(emb, ties).collect()}
    assert got == {1: 3, 2: 3}
    plan = (ivf_assign(emb, ties)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan and "SortMergeJoin" not in plan
