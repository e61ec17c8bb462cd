"""HLL + Count-Min sketches: cross-engine register parity, sketch laws
(HLL merge-by-max, CMS never undercounts), and plan shape."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_oracle_sql,
    cms_point_query,
    hll_distinct,
    hll_distinct_oracle_sql,
)

DOCS = [
    (0, "en", "the quick brown fox jumps over the lazy dog"),
    (1, "en", "pack my box with five dozen liquor jugs"),
    (2, "en", "the dog jumps  again   and again"),
    (3, "de", "der schnelle braune fuchs springt"),
    (4, "de", "der hund springt wieder und wieder und wieder"),
]
WORDS = ["the", "und", "jumps", "zebra"]


def _spark_docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, lang string, text string")


def _duck():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        DOCS, columns=["doc_id", "lang", "text"]))
    return con


def test_hll_matches_duckdb_and_estimates_sanely(spark):
    got = {r["key"]: (r["hll_estimate"], r["zero_buckets"], r["n_tokens"])
           for r in hll_distinct(_spark_docs(spark), "lang").collect()}
    want = {k: (e, z, n) for k, e, z, n in
            _duck().execute(hll_distinct_oracle_sql("lang")).fetchall()}
    assert got == want
    # n_tokens is the exact token count; the raw harmonic estimate on a
    # tiny set overestimates (no LinearCounting correction by design) but
    # must stay positive and bounded
    assert got["en"][2] == 23 and got["de"][2] == 13
    assert all(0 < e and z <= 256 for e, z, _ in got.values())


def test_hll_registers_merge_by_max(spark):
    """The sketch law that makes partial aggregation = sketch union:
    splitting the corpus and max-merging registers gives the whole-corpus
    estimate exactly."""
    whole = {r["key"]: r["hll_estimate"]
             for r in hll_distinct(_spark_docs(spark), "lang").collect()}
    df = _spark_docs(spark)
    merged = hll_distinct(
        df.filter("doc_id < 2").unionByName(df.filter("doc_id >= 2")),
        "lang")
    got = {r["key"]: r["hll_estimate"] for r in merged.collect()}
    assert got == whole


def test_cms_matches_duckdb_and_never_undercounts(spark):
    docs = _spark_docs(spark)
    got = {r["word"]: r["cms_count"]
           for r in cms_point_query(cms_build(docs), spark,
                                    WORDS).collect()}
    want = dict(_duck().execute(cms_oracle_sql(WORDS)).fetchall())
    assert got == want
    exact = {"the": 3, "und": 2, "jumps": 2, "zebra": 0}
    for w, e in exact.items():
        assert got[w] >= e, w   # CMS one-sided error
    # with 5 docs in a 4x512 table, collisions are absent: exact equality
    assert got == exact


def test_cms_counter_table_is_bounded_and_two_shuffles(spark):
    counters = cms_build(_spark_docs(spark))
    assert counters.count() <= CMS_D * CMS_W
    plan = counters._jdf.queryExecution().executedPlan().toString()
    # r13: counters build from the token_counts aggregate — one keyed
    # token count (md5 ×d runs once per DISTINCT token, not per
    # occurrence) + the keyed counter sum; both partial-agg map-side.
    # The second groupBy(tok) inside cms_build reuses the first's
    # hash(tok) partitioning, so the dedup adds no third exchange.
    assert plan.count("Exchange") == 2
    assert "HashAggregate" in plan       # partial agg combines map-side


def test_sketches_stream_as_single_agg_state(spark, tmp_path):
    """The register/counter tables are single monotone aggregations, so
    both sketches run unchanged on a stream: after all micro-batches the
    streamed state equals the batch sketch of the full data."""
    from nci_seronet_proc_data_validator_spark.operators.sketches import (
        hll_finalize, hll_registers)
    batch = _spark_docs(spark)
    # two files -> at least the availableNow source can split batches
    src = str(tmp_path / "docs")
    batch.filter("doc_id < 2").write.parquet(src)
    batch.filter("doc_id >= 2").write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, lang string, text string").parquet(src)

    q1 = (hll_registers(stream, "lang")
          .writeStream.outputMode("complete").format("memory")
          .queryName("hll_regs").trigger(availableNow=True).start())
    q2 = (cms_build(stream)
          .writeStream.outputMode("complete").format("memory")
          .queryName("cms_tab").trigger(availableNow=True).start())
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    got_hll = {r["key"]: (r["hll_estimate"], r["zero_buckets"],
                          r["n_tokens"])
               for r in hll_finalize(
                   spark.sql("SELECT * FROM hll_regs")).collect()}
    want_hll = {r["key"]: (r["hll_estimate"], r["zero_buckets"],
                           r["n_tokens"])
                for r in hll_distinct(batch, "lang").collect()}
    assert got_hll == want_hll

    got_cms = {(r["r"], r["bucket"]): r["cnt"]
               for r in spark.sql("SELECT * FROM cms_tab").collect()}
    want_cms = {(r["r"], r["bucket"]): r["cnt"]
                for r in cms_build(batch).collect()}
    assert got_cms == want_cms


def test_hist_quantiles_matches_duckdb_and_bounds_error(spark):
    from nci_seronet_proc_data_validator_spark.operators.sketches import (
        hist_quantiles, hist_quantiles_oracle_sql)
    rows = [(i, "a" if i % 3 else "b", i * 7 % 400) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {(r["key"], r["q_num"], r["q_den"]): r["est"]
           for r in hist_quantiles(df, "n_chars", "lang").collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "lang", "n_chars"]))
    want = {(k, n, d): e for k, n, d, e in con.execute(
        hist_quantiles_oracle_sql("n_chars", "lang")).fetchall()}
    assert got == want
    # error bounded by bin_width vs the true quantile
    import numpy as np
    vals = {"a": sorted(v for _, l, v in rows if l == "a"),
            "b": sorted(v for _, l, v in rows if l == "b")}
    for (k, n, d), est in got.items():
        true = np.percentile(vals[k], 100 * n / d, method="lower")
        assert abs(est - true) <= 16, (k, n, d, est, true)
