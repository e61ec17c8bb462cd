"""Scale up a testdata dir by an integer factor for scaling measurements.

    python tools/gen_scale.py --src /root/testdata/sf0.1 \
        --out .scale/sf1 --factor 10

The driver's testdata is read-only and capped at sf0.1; every 100 TB
claim in this repo otherwise rests on plan shape. This tool builds a
larger, statistically-equivalent dataset so ``tools/bench_scaling.py``
can measure how the heavy queries actually grow with rows.

Construction: K disjoint copies of the source, each shifted into its own
key space (referential integrity preserved: lineitem copy i references
orders/part/supplier copy i, orders copy i references customers copy i).
Two columns get per-copy *content* transforms so the dedup/ANN operators
see K independent corpora instead of K exact replicas (which would turn
every duplicate cluster into a K-clique and grow candidate pairs
quadratically in K — a data artifact, not an engine property):

- ``documents.text``: a per-copy alphabet rotation (substitution cipher,
  rotation ``(copy * 7) % 26``). Length, word boundaries, case pattern
  and punctuation are preserved, so token/shingle statistics match the
  source while shingle *identities* differ across copies.
- ``embeddings.embedding``: deterministic per-(vector, component, copy)
  jitter of ±0.02, so no two copies share an exact vector but the
  cluster geometry stays intact.

Everything is a single Spark pass per table: source × range(K) broadcast
cross join, then column shifts — no driver-side rows.
"""

from __future__ import annotations

import argparse
import math
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Tables replicated K times; the rest (region, nation) are fixed-size
# dimensions at every TPC-H scale factor.
SCALED = {"customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"}

# key column -> table whose key space defines its span
KEY_SPANS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# which span each shifted column uses (primary-key table)
SPAN_OF = {
    "c_custkey": "customer", "o_custkey": "customer",
    "s_suppkey": "supplier", "l_suppkey": "supplier",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "orders", "l_orderkey": "orders",
    "event_id": "events", "user_id": "events_user",
    "doc_id": "documents", "vec_id": "embeddings",
}


def _pow10_span(max_val: int) -> int:
    return 10 ** (int(math.floor(math.log10(max(max_val, 1)))) + 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=False)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--files-per-table", type=int, default=16,
                    help="output parquet files for scaled fact tables "
                         "(scan parallelism at read time)")
    ap.add_argument("--clean", action="store_true",
                    help="delete the generated scale trees under .scale/ "
                         "(they are regenerate-on-demand; leaving multi-GB "
                         "parquet resident skews page-cache state for "
                         "later bench runs — BENCH_NOTES r9/r10)")
    args = ap.parse_args()

    if args.clean:
        import shutil
        root = args.out or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale")
        if not os.path.isdir(root):
            print(f"nothing to clean at {root}")
            return 0
        for entry in sorted(os.listdir(root)):
            p = os.path.join(root, entry)
            print(f"removing {p}")
            shutil.rmtree(p)
        return 0
    if not args.out:
        ap.error("--out is required unless --clean")

    from pyspark.sql import functions as F

    from nci_seronet_proc_data_validator_spark import get_spark

    spark = get_spark("gen_scale", cpus=args.cpus)
    K = args.factor
    os.makedirs(args.out, exist_ok=True)

    # one tiny job per key table to size the spans
    spans: dict[str, int] = {}
    for tbl, cols in KEY_SPANS.items():
        df = spark.read.parquet(os.path.join(args.src, f"{tbl}.parquet"))
        pk = cols[0]
        spans[tbl] = _pow10_span(df.agg(F.max(pk)).collect()[0][0])
        if tbl == "events":
            spans["events_user"] = _pow10_span(
                df.agg(F.max("user_id")).collect()[0][0])
    print("key spans:", spans)

    lower = string.ascii_lowercase

    # Per-copy affine cipher x -> a*x + b (mod 26): 12 units × 26 shifts
    # = 312 distinct substitutions, so copies stay content-distinct up to
    # factor 312 (a bare rotation cycles at 26 — copies 0 and 26 would be
    # byte-identical, quadratically inflating dedup candidate pairs).
    _UNITS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    if K > len(_UNITS) * 26:
        raise SystemExit(f"--factor {K} exceeds the {len(_UNITS) * 26} "
                         "distinct substitution ciphers available")

    def cipher_expr(col: str, copy_col: str):
        """Per-copy affine substitution via a CASE over the K mappings
        (translate() needs literal mappings)."""
        expr = None
        for i in range(K):
            a = _UNITS[(i // 26) % len(_UNITS)]
            b = (i * 7) % 26
            tgt = "".join(lower[(a * j + b) % 26] for j in range(26))
            mapped = F.translate(F.col(col), lower + lower.upper(),
                                 tgt + tgt.upper())
            expr = (F.when(F.col(copy_col) == i, mapped) if expr is None
                    else expr.when(F.col(copy_col) == i, mapped))
        return expr.otherwise(F.col(col))

    copies = spark.range(K).withColumnRenamed("id", "__copy")

    for tbl in TABLES:
        src = spark.read.parquet(os.path.join(args.src, f"{tbl}.parquet"))
        out_path = os.path.join(args.out, f"{tbl}.parquet")
        if tbl not in SCALED:
            df = src
        else:
            df = src.crossJoin(F.broadcast(copies))
            for col in KEY_SPANS[tbl]:
                span = spans[SPAN_OF[col]]
                df = df.withColumn(
                    col, (F.col(col) + F.col("__copy") * F.lit(span))
                    .cast("long"))
            if tbl == "documents":
                df = df.withColumn("text", cipher_expr("text", "__copy"))
            if tbl == "embeddings":
                jit = F.transform(
                    F.col("embedding"),
                    lambda x, j: (x + F.sin(F.col("vec_id") * 31 + j * 17)
                                  * F.lit(0.02)).cast("float"))
                df = df.withColumn("embedding", jit)
            if tbl in ("customer", "supplier"):
                name_col = "c_name" if tbl == "customer" else "s_name"
                if name_col in df.columns:
                    df = df.withColumn(
                        name_col,
                        F.when(F.col("__copy") == 0, F.col(name_col))
                        .otherwise(F.concat_ws(
                            "_", F.col(name_col),
                            F.col("__copy").cast("string"))))
            df = df.drop("__copy")
        n_files = args.files_per_table if tbl in SCALED else 1
        df.repartition(n_files).write.mode("overwrite").parquet(out_path)
        print(f"{tbl}: wrote {out_path}")

    for tbl in TABLES:
        n = spark.read.parquet(
            os.path.join(args.out, f"{tbl}.parquet")).count()
        print(f"{tbl:>12}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
