"""Connected components (operators/graph.py)."""

from nci_seronet_proc_data_validator_spark.operators.graph import (
    connected_components,
)


def test_cc_chain_and_clique(spark):
    # Component A: chain 1-2-3-4 (diameter 3); component B: triangle
    # 10-11-12; component C: isolated pair 20-21.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "id_a long, id_b long")
    out = {r["id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_cc_long_chain_converges(spark):
    # Diameter 9 chain — exercises multiple propagation rounds and the
    # periodic localCheckpoint path.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "id_a long, id_b long")
    out = {r["id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert set(out.values()) == {1}
    assert len(out) == 10


def test_pagerank_star_graph_exact(spark):
    """Star: hub 0 ↔ leaves 1..4. After symmetrization deg(hub)=4,
    deg(leaf)=1. Exact fixed-point hand-check (N=5, scale 1e9):
    r0 = 200_000_000 for all; every iteration keeps leaves equal by
    symmetry and hub = base + 85% of the sum of 4 equal leaf
    contributions. DuckDB oracle must agree bit-for-bit."""
    import duckdb
    import pandas as pd

    from nci_seronet_proc_data_validator_spark.operators.graph import (
        pagerank, pagerank_oracle_sql)
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long")
    from pyspark.sql import functions as F
    got = [(r["node_id"], r["rank"])
           for r in pagerank(edges, iters=3)
           .orderBy(F.col("rank").desc(), "node_id").collect()]
    # leaves all equal, hub strictly higher
    leaf_ranks = {rk for n, rk in got if n != 0}
    hub_rank = dict(got)[0]
    assert len(leaf_ranks) == 1 and hub_rank > leaf_ranks.pop()
    con = duckdb.connect()
    con.register("edges_t", pd.DataFrame(
        {"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]}))
    want = [tuple(r) for r in con.execute(
        pagerank_oracle_sql("SELECT src, dst FROM edges_t",
                            iters=3)).fetchall()]
    assert got == want


def test_keep_best_in_cluster_prefers_quality(spark):
    """Within a dup cluster the highest-score doc survives (min-id loses
    if lower quality); singletons and unclustered docs pass through;
    ties break to the smaller id."""
    from nci_seronet_proc_data_validator_spark.operators.graph import (
        keep_best_in_cluster)
    corpus = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0),    # cluster A: 2 wins (not min-id 1)
         (4, 7.0), (5, 7.0),                 # cluster B: tie -> 4 (smaller id)
         (9, 1.0)],                          # unclustered -> survives
        "doc_id long, quality double")
    components = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "id long, cluster_id long")
    kept = sorted(r["doc_id"] for r in
                  keep_best_in_cluster(corpus, components, "quality")
                  .collect())
    assert kept == [2, 4, 9]


def test_keep_best_in_cluster_string_ids(spark):
    """Regression (review r4): the tie-break must not negate the id —
    string ids would cast to NULL and silently drop every clustered doc."""
    from nci_seronet_proc_data_validator_spark.operators.graph import (
        keep_best_in_cluster)
    corpus = spark.createDataFrame(
        [("doc-a", 10.0), ("doc-b", 99.0), ("doc-c", 7.0), ("doc-d", 7.0)],
        "doc_id string, quality double")
    components = spark.createDataFrame(
        [("doc-a", "doc-a"), ("doc-b", "doc-a"),
         ("doc-c", "doc-c"), ("doc-d", "doc-c")],
        "id string, cluster_id string")
    kept = sorted(r["doc_id"] for r in
                  keep_best_in_cluster(corpus, components, "quality")
                  .collect())
    assert kept == ["doc-b", "doc-c"]   # max score; tie -> smaller id


def test_keep_best_in_cluster_null_score_never_wins(spark):
    """Regression (review r5): a NULL negated score sorts first under
    min(struct(...)), so an unscored doc used to silently beat every
    scored sibling. It must lose to any scored doc; a cluster that is
    ALL-NULL degrades to the min-id pick."""
    from nci_seronet_proc_data_validator_spark.operators.graph import (
        keep_best_in_cluster)
    corpus = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 99.0),   # cluster A: 3 wins, not NULL 1
         (7, None), (8, None)],            # cluster B all-NULL: min id 7
        "doc_id long, quality double")
    components = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, cluster_id long")
    kept = sorted(r["doc_id"] for r in
                  keep_best_in_cluster(corpus, components, "quality")
                  .collect())
    assert kept == [3, 7]


def test_keep_best_in_cluster_string_score_raises(spark):
    """Regression (review r5): the numeric-score contract was
    comment-only; a string score column NULLed out the argmax silently.
    Now it raises at call time."""
    import pytest
    from nci_seronet_proc_data_validator_spark.operators.graph import (
        keep_best_in_cluster)
    corpus = spark.createDataFrame(
        [(1, "high"), (2, "low")], "doc_id long, quality string")
    components = spark.createDataFrame(
        [(1, 1), (2, 1)], "id long, cluster_id long")
    with pytest.raises(TypeError, match="must be numeric"):
        keep_best_in_cluster(corpus, components, "quality")
