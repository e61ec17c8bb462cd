"""Smoke test for the curation CLI: the full funnel runs on the smallest
scale factor and writes non-empty train shards + the funnel summary."""

import json
import os
import runpy
import sys


def test_curation_cli_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    argv = ["run_curation.py",
            os.path.join(sf_dir, "documents.parquet"), out,
            "--max-records", "1000"]
    old = sys.argv
    sys.argv = argv
    try:
        try:
            runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                        "tools", "run_curation.py"),
                           run_name="__main__")
        except SystemExit as e:
            assert e.code == 0
    finally:
        sys.argv = old

    funnel = json.load(open(os.path.join(out, "funnel.json")))
    assert funnel["input"] > funnel["after_quality"] >= funnel["after_dedup"]
    assert funnel["train_sequences"] > 0
    train = spark.read.parquet(os.path.join(out, "train"))
    assert train.count() == funnel["train_sequences"]
    assert set(train.columns) == {"shard", "seq_id", "n_docs",
                                  "total_tokens"}


def test_curation_single_execution(spark, sf_dir, tmp_path):
    """The funnel's persist discipline means the input corpus is scanned
    a bounded, constant number of times: once for the input count and
    twice inside the one materialization of the quality join (qf branch +
    raw branch). Every later stage reads a persisted frame. An
    accumulator-ticking mapInPandas wrapper on the input counts actual
    row passes — the pre-fix pipeline re-executed the quality join and
    the LSH+CC chain per downstream action (≥7 passes)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from run_curation import run_pipeline

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    acc = spark.sparkContext.accumulator(0)

    def tick(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    counted = docs.mapInPandas(tick, docs.schema)
    funnel = run_pipeline(spark, counted, str(tmp_path / "curated1"),
                          max_records=1000)
    assert funnel["input"] == n
    assert acc.value <= 3 * n, (
        f"input scanned {acc.value / n:.1f}x; persist discipline broken")
