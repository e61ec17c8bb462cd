"""SemDeDup — planted semantic duplicates, keep-rule determinism, plan
shape (cluster-bucketed pair join, never a cartesian)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.semdedup import (
    semdedup,
    semdedup_oracle_sql,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_planted_semantic_dups_dropped(spark):
    # three tight groups; init takes the k lowest ids as seed centroids,
    # so the group leaders get ids 0/1/2 and the near-dups higher ids
    rows = [
        (0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0]),
        (3, [0.999, 0.01, 0.0]), (4, [0.998, 0.02, 0.0]),
        (11, [0.0, 0.999, 0.02]),
    ]
    out = {r["vec_id"]: r["keep"]
           for r in semdedup(_emb(spark, rows), k=3, iters=2, max_rows=100,
                             threshold=0.99).collect()}
    # id-minimal representatives survive
    assert out[0] and out[1] and out[2]
    assert not out[3] and not out[4] and not out[11]


def test_threshold_boundary_keeps_distinct(spark):
    # orthogonal vectors in one cluster: cosine 0 < any threshold
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = semdedup(_emb(spark, rows), k=1, iters=1, threshold=0.5, max_rows=100)
    assert all(r["keep"] for r in out.collect())


def test_semdedup_matches_duckdb_oracle(spark, sf_dir):
    from nci_seronet_proc_data_validator_spark.sources.readers import (
        read_table,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    got = sorted(
        (r["vec_id"], r["cluster_id"], r["keep"])
        for r in semdedup(emb, k=4, iters=1, threshold=0.4, max_rows=100).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = sorted(map(tuple, con.execute(
        semdedup_oracle_sql(k=4, iters=1, threshold=0.4)).fetchall()))
    assert got == want
    assert any(not k for _, _, k in got)      # threshold low enough to drop


def test_pair_join_is_cluster_bucketed(spark, sf_dir):
    """The pair stage must be an equi-join on cid — a cartesian between
    the two assignment sides would be the O(N^2) shape SemDeDup exists
    to avoid."""
    from nci_seronet_proc_data_validator_spark.sources.readers import (
        read_table,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    plan = semdedup(emb, k=4, iters=1, max_rows=100) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validates_args(spark):
    with pytest.raises(ValueError):
        semdedup(_emb(spark, [(0, [1.0])]), k=0, iters=1)


def test_auto_k_matches_dynamic_oracle(spark, sf_dir):
    """The production auto-k arm (k=None → max(8, isqrt(N))) against the
    dynamic-k oracle, whose centroid-init LIMIT computes the same k with
    a scalar subquery (exact-isqrt correction of floor(sqrt(N))). Pins
    that the two k derivations agree on real data — a mismatch would
    cluster differently and cascade into every verdict."""
    from nci_seronet_proc_data_validator_spark.driver_queries import (
        _sql_semdedup_auto,
        q_semdedup_auto,
    )
    got = sorted(tuple(r) for r in q_semdedup_auto(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = sorted(tuple(r) for r in con.execute(_sql_semdedup_auto()).fetchall())
    assert got == want


def test_auto_k_isqrt_correction_exact():
    """The oracle's SQL isqrt must equal Python math.isqrt for every N,
    including perfect squares and off-by-one-ulp edges."""
    import math

    con = duckdb.connect()
    for n in [1, 2, 3, 63, 64, 65, 80, 81, 82, 499, 500, 2000,
              10**6, 10**6 - 1, (10**3 + 1) ** 2, (10**3 + 1) ** 2 - 1]:
        (k,) = con.execute(
            "SELECT GREATEST(8, CASE WHEN (s + 1) * (s + 1) <= n THEN s + 1 "
            "WHEN s * s > n THEN s - 1 ELSE s END) FROM (SELECT "
            "CAST(floor(sqrt(CAST(? AS DOUBLE))) AS BIGINT) AS s, "
            "CAST(? AS BIGINT) AS n)", [n, n]).fetchone()
        assert k == max(8, math.isqrt(n)), (n, k)
