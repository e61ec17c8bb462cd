"""Curate a document corpus end-to-end — the engine's CLI face for the
LLM-training-data pipeline (the beyond-reference tier: quality gate →
near-dup removal → PII redaction → train/val split → packed shards).

    python tools/run_curation.py DOCS_PARQUET OUT_DIR
        [--min-words 5] [--val-pct 10] [--budget 2048]
        [--max-records 100000] [--skip-pii]

DOCS_PARQUET is a parquet table with (doc_id BIGINT, text STRING, ...);
``/root/testdata/sf0.01/documents.parquet`` works as-is. Writes
``OUT_DIR/train`` and ``OUT_DIR/val`` parquet shard directories plus a
``funnel.json`` with per-stage survivor counts, and prints the funnel.

Every stage is the same operator a driver query oracle-checks
(quality_features, minhash_lsh_pairs, connected_components,
keep_canonical, redact_pii, train_val_split, pack_sequences,
write_training_shards) — this script only composes them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pipeline(spark, docs, out_dir, *, min_words=5, min_jaccard=0.8,
                 val_pct=10, budget=2048, max_records=100_000,
                 skip_pii=False) -> dict:
    """Run the curation funnel over ``docs`` and write shards + counts.

    Single-execution discipline: each expensive stage output is persisted
    and its funnel count doubles as the materializing action, so the
    quality join, the MinHash-LSH + connected-components chain, and each
    pack chain execute exactly once (the input parquet is scanned a
    bounded, constant number of times — pinned by
    ``test_curation_single_execution``)."""
    from pyspark.sql import functions as F

    from nci_seronet_proc_data_validator_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from nci_seronet_proc_data_validator_spark.operators.graph import (
        connected_components,
        keep_canonical,
    )
    from nci_seronet_proc_data_validator_spark.operators.pii import (
        pii_features,
    )
    from nci_seronet_proc_data_validator_spark.operators.text_quality import (
        quality_features,
    )
    from nci_seronet_proc_data_validator_spark.operators.training import (
        pack_sequences,
        train_val_split,
        write_training_shards,
    )

    funnel: dict[str, int] = {}
    funnel["input"] = docs.count()

    # 1. quality gate (Gopher-style integer-math features, map-only).
    #    Persist the survivors: the dedup chain reads them several times
    #    (LSH signatures, CC seed, canonical anti-join).
    qf = quality_features(docs).select("doc_id", "n_words", "is_quality")
    gated = (docs.join(qf, "doc_id")
             .filter((F.col("n_words") >= min_words)
                     & F.col("is_quality"))
             .drop("n_words", "is_quality")).persist()
    funnel["after_quality"] = gated.count()

    # 2. near-dup removal: MinHash LSH pairs (exact-Jaccard verified —
    #    at threshold 0 every band collision, including the shared
    #    empty-shingle sentinel, would merge non-duplicates) → connected
    #    components → keep the canonical representative per cluster.
    #    Persist BEFORE counting so the count is the one execution.
    pairs = minhash_lsh_pairs(gated, min_jaccard=min_jaccard)
    canon = keep_canonical(gated, connected_components(pairs)).persist()
    funnel["after_dedup"] = canon.count()
    gated.unpersist()

    # 3. PII redaction (map-only regexp): swap text for the redacted form
    kept = canon
    if not skip_pii:
        red = pii_features(canon).select("doc_id", "redacted")
        kept = (canon.join(red, "doc_id")
                .drop("text")
                .withColumnRenamed("redacted", "text"))

    # 4. deterministic split (id-hash projection joined back), then
    #    token-budget sequence packing. The split frame feeds two
    #    pack+write chains; each packed frame feeds a count + the shard
    #    writer — persist both levels so nothing runs per-action.
    split = kept.join(
        train_val_split(kept, val_pct=val_pct).select("doc_id", "split"),
        "doc_id").persist()
    for part in ("train", "val"):
        sub = split.filter(F.col("split") == part).drop("split")
        packed = pack_sequences(sub, budget=budget).persist()
        n_seq = packed.count()
        funnel[f"{part}_sequences"] = n_seq
        write_training_shards(packed, os.path.join(out_dir, part),
                              max_records_per_file=max_records,
                              n_shards=max(1, -(-n_seq // max_records)),
                              id_col="shard")
        packed.unpersist()
    split.unpersist()
    canon.unpersist()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "funnel.json"), "w") as f:
        json.dump(funnel, f, indent=2)
    return funnel


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("docs_parquet")
    ap.add_argument("out_dir")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--min-jaccard", type=float, default=0.8,
                    help="exact-Jaccard threshold for near-dup pairs "
                         "(band collisions alone are NOT duplicates)")
    ap.add_argument("--val-pct", type=int, default=10)
    ap.add_argument("--budget", type=int, default=2048,
                    help="token budget per packed sequence")
    ap.add_argument("--max-records", type=int, default=100_000,
                    help="records per output shard file")
    ap.add_argument("--skip-pii", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from nci_seronet_proc_data_validator_spark import get_spark

    spark = get_spark("curation", cpus=args.cpus)
    docs = spark.read.parquet(args.docs_parquet)
    funnel = run_pipeline(spark, docs, args.out_dir,
                          min_words=args.min_words,
                          min_jaccard=args.min_jaccard,
                          val_pct=args.val_pct, budget=args.budget,
                          max_records=args.max_records,
                          skip_pii=args.skip_pii)
    for k, v in funnel.items():
        print(f"{k:>18}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
