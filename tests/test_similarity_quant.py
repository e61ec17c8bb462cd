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
