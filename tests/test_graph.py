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
