"""Physical-plan shape assertions — the scale-posture invariants:

- findings compilation is ONE scan with no shuffle;
- parquet scans prune columns (ReadSchema) and push filters;
- small join sides broadcast;
- the LSH pipeline shuffles on band buckets, not on raw docs.

These are regression guards: a refactor that silently de-optimizes a plan
fails here, not in a 100 TB run.
"""

from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.driver_queries import (
    q_c1_in_list,
    q_j1_enrich_revenue,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_findings_scan_has_no_shuffle(spark, sf_dir):
    plan = _plan(q_c1_in_list(spark, sf_dir))
    assert "Exchange" not in plan          # map-only: scan → project → explode
    assert plan.count("Scan parquet") == 1


def test_scan_prunes_and_pushes(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .filter(F.col("l_quantity") > 49)
          .select("l_orderkey", "l_quantity"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" \
        in plan
    # column pruning: the read schema carries only the two needed columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[-1]


def test_enrich_join_broadcasts_customer(spark, sf_dir):
    plan = _plan(q_j1_enrich_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_lsh_shuffles_on_band_buckets_only(spark, sf_dir):
    from nci_seronet_proc_data_validator_spark.operators.dedup import (
        minhash_lsh_pairs)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(minhash_lsh_pairs(docs))
    assert "band_hash" in plan
    # signature build itself is map-side; shuffles belong to the bucket
    # join + dedup, not to a groupBy over raw text
    assert "Scan parquet" in plan
