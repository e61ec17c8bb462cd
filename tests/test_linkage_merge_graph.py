"""Unit tests: blocked fuzzy join, MERGE upsert, k-NN graph + triangles.

Each operator is also driver-oracle-checked (fuzzy_join, merge_upsert,
graph_metrics); these tests pin the semantics on hand-computable inputs.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.graph import (
    knn_graph,
    knn_graph_oracle_sql,
    triangle_counts,
    triangle_counts_oracle_sql,
)
from nci_seronet_proc_data_validator_spark.operators.linkage import (
    fuzzy_join,
)
from nci_seronet_proc_data_validator_spark.operators.mergeop import (
    merge_upsert,
)


def test_fuzzy_join_links_single_edits(spark):
    clean = spark.createDataFrame(
        [(1, "chocolate lace"), (2, "goldenrod spring"),
         (3, "midnight azure")], "id long, name string")
    dirty = spark.createDataFrame(
        [(11, "chocolate lac"),     # 1 deletion at the end
         (12, "Xoldenrod spring"),  # 1 substitution at the front
         (13, "totally unrelated")],
        "did long, name string")
    got = {(r.did, r.id, r.dist)
           for r in fuzzy_join(dirty, clean, "did", "name",
                               "id", "name", max_dist=2).collect()}
    # 11 keeps the prefix block of 1; 12 keeps the suffix block of 2
    # (front edit breaks the prefix key — the second key catches it).
    assert (11, 1, 1) in got
    assert (12, 2, 1) in got
    assert all(d != 13 for d, _, _ in got)


def test_fuzzy_join_self_match_distance_zero(spark):
    t = spark.createDataFrame([(1, "alpha"), (2, "beta")],
                              "id long, name string")
    got = {(r.id, r.rid) for r in
           fuzzy_join(t, t.select(F.col("id").alias("rid"), "name"),
                      "id", "name", "rid", "name", max_dist=0).collect()}
    assert got == {(1, 1), (2, 2)}


def test_merge_upsert_update_insert_delete_keep(spark):
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long")
    src = spark.createDataFrame(
        [(2, "B", 200),   # matched -> update
         (9, "z", 900)],  # not matched -> insert
        "k long, s string, v long")
    dels = spark.createDataFrame([(3,), (77,)], "k long")  # 77: no-op
    got = {(r.k, r.s, r.v)
           for r in merge_upsert(tgt, src, "k", deletes=dels).collect()}
    assert got == {(1, "a", 10), (2, "B", 200), (4, "d", 40),
                   (9, "z", 900)}


def test_merge_upsert_null_delete_key_is_noop_and_oracle_agrees(spark):
    """Regression (review r5): a NULL delete key is a no-op for the
    operator (left_anti: NULL matches nothing) — and used to empty the
    ORACLE's entire target via NOT IN's three-valued logic. Both engines
    must now keep every non-deleted row."""
    import duckdb
    import pandas as pd
    from nci_seronet_proc_data_validator_spark.operators.mergeop import (
        merge_upsert_oracle_sql)
    tgt = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                "k long, v long")
    src = spark.createDataFrame([(2, 200)], "k long, v long")
    dels = spark.createDataFrame([(3,), (None,)], "k long")
    got = {(r.k, r.v)
           for r in merge_upsert(tgt, src, "k", deletes=dels).collect()}
    assert got == {(1, 10), (2, 200)}
    con = duckdb.connect()
    con.register("tgt_t", pd.DataFrame({"k": [1, 2, 3],
                                        "v": [10, 20, 30]}))
    con.register("src_t", pd.DataFrame({"k": [2], "v": [200]}))
    con.register("del_t", pd.DataFrame({"k": [3.0, None]}))
    sql = merge_upsert_oracle_sql(
        "SELECT * FROM tgt_t", "SELECT * FROM src_t", "k", ["v"],
        deletes_sql="SELECT CAST(k AS BIGINT) AS k FROM del_t")
    assert {tuple(r) for r in con.execute(sql).fetchall()} == got


def test_merge_upsert_schema_mismatch_raises(spark):
    tgt = spark.createDataFrame([(1, "a")], "k long, s string")
    src = spark.createDataFrame([(1, 2)], "k long, other long")
    with pytest.raises(ValueError):
        merge_upsert(tgt, src, "k")


def test_knn_graph_keeps_topk_and_symmetrizes(spark):
    # node 1's candidates by weight: 2 (w=9), 3 (w=5), 4 (w=1)
    pairs = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 5), (1, 4, 1), (3, 4, 7)],
        "a long, b long, w long")
    got = {(r.a, r.b) for r in knn_graph(pairs, k=2).collect()}
    # 1 drops 4 (rank 3); but 4 keeps 1 (its own top-2: 3 then 1) so the
    # undirected union restores (1, 4): k-NN graphs are union-symmetrized.
    assert got == {(1, 2), (1, 3), (1, 4), (3, 4)}
    got1 = {(r.a, r.b) for r in knn_graph(pairs, k=1).collect()}
    # per-node top-1: 1->2, 2->1, 3->4, 4->3
    assert got1 == {(1, 2), (3, 4)}


def test_triangle_counts_hand_graph(spark):
    # K4 minus edge (3,4): triangles = (1,2,3), (1,2,4)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a long, b long")
    got = {(r.node_id, r.triangles)
           for r in triangle_counts(edges).collect()}
    assert got == {(1, 2), (2, 2), (3, 1), (4, 1)}


def test_graph_oracles_match_spark(spark):
    """The SQL twins produce identical rows on a small random-ish graph."""
    rows = [(a, b, (a * 7 + b * 13) % 23)
            for a in range(1, 12) for b in range(a + 1, 12)
            if (a * 31 + b * 17) % 5 < 2]
    pairs = spark.createDataFrame(rows, "a long, b long, w long")
    knn = knn_graph(pairs, k=3)
    tri = triangle_counts(knn)
    con = duckdb.connect()
    con.execute("CREATE TABLE p (a BIGINT, b BIGINT, w BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
    knn_sql = knn_graph_oracle_sql("SELECT * FROM p", k=3)
    oracle_knn = set(map(tuple, con.sql(knn_sql).fetchall()))
    assert {(r.a, r.b) for r in knn.collect()} == oracle_knn
    oracle_tri = set(map(tuple, con.sql(
        triangle_counts_oracle_sql(knn_sql)).fetchall()))
    assert {(r.node_id, r.triangles)
            for r in tri.collect()} == oracle_tri


def test_fuzzy_join_qgram_blocking_is_lossless(spark):
    """ED-Join q-gram recall option (review r5 backlog #10): strings
    edited at BOTH ends defeat the default prefix/suffix keys; with
    qgrams=3 every true pair within max_dist survives blocking —
    verified against a brute-force levenshtein cross join."""
    from nci_seronet_proc_data_validator_spark.operators.linkage import (
        fuzzy_join)
    base = ["chartreuse goldenrod lavender", "midnight turquoise salmon",
            "burnished antique metallic", "polished chocolate caramel"]
    # one substitution at each end: d=2, both default keys broken
    def both_ends(s):
        return "X" + s[1:-1] + "Z"
    clean = spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "pid long, name string")
    dirty = spark.createDataFrame(
        [(100 + i, both_ends(s)) for i, s in enumerate(base)],
        "did long, name string")

    # brute-force truth
    truth = {(r.did, r.pid)
             for r in dirty.crossJoin(
                 clean.select(F.col("pid"), F.col("name").alias("cname")))
             .filter(F.levenshtein("name", "cname") <= 2)
             .collect()}
    assert len(truth) == len(base)

    default = {(r.did, r.pid)
               for r in fuzzy_join(dirty, clean, "did", "name",
                                   "pid", "name", max_dist=2).collect()}
    with_q = {(r.did, r.pid)
              for r in fuzzy_join(dirty, clean, "did", "name",
                                  "pid", "name", max_dist=2,
                                  qgrams=3).collect()}
    assert default < truth        # the documented miss mode is real
    assert with_q == truth        # lossless with q-gram keys


def test_fuzzy_join_qgram_oracle_parity(spark):
    """The q-gram arm must derive the identical candidate set in DuckDB
    (same md5 global order, same prefix length)."""
    import duckdb
    import pandas as pd
    from nci_seronet_proc_data_validator_spark.operators.linkage import (
        fuzzy_join, fuzzy_join_oracle_sql)
    clean_pd = pd.DataFrame({
        "pid": [0, 1, 2],
        "name": ["alpha beta gamma", "delta epsilon zeta", "et"]})
    dirty_pd = pd.DataFrame({
        "did": [100, 101, 102],
        "name": ["Xlpha beta gammZ", "delta epsilon zeta!", "eta"]})
    clean = spark.createDataFrame(clean_pd)
    dirty = spark.createDataFrame(dirty_pd)
    got = {(r.did, r.pid, r.dist)
           for r in fuzzy_join(dirty, clean, "did", "name", "pid", "name",
                               max_dist=2, qgrams=3).collect()}
    con = duckdb.connect()
    con.register("clean_t", clean_pd)
    con.register("dirty_t", dirty_pd)
    sql = fuzzy_join_oracle_sql(
        "SELECT * FROM dirty_t", "SELECT * FROM clean_t",
        "did", "name", "pid", "name", max_dist=2, qgrams=3)
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want and len(got) >= 2


def test_triangle_counts_materialize_false_identical(spark):
    """materialize=False (r13: callers whose edge set is already a
    checkpoint skip the defensive localCheckpoint) must not change
    values — the flag only controls lineage truncation."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)],
        "a long, b long").localCheckpoint()
    res = lambda m: {(r.node_id, r.triangles)
                     for r in triangle_counts(edges,
                                              materialize=m).collect()}
    assert res(False) == res(True) == {(1, 2), (2, 2), (3, 1), (4, 1)}
