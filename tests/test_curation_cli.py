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
