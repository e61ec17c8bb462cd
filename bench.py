"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Queries are executed to completion with the noop sink (full pipeline runs,
nothing collected to the driver).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.driver_queries import (
    QUERIES,
    q_semdedup_auto,
    q_semdedup_pinned,
    q_asof_join,
    q_c6_dup_ids,
    q_dedup_clusters,
    q_dsir_importance,
    q_events_hourly,
    q_embedding_topk,
    q_events_sliding,
    q_interval_join,
    q_ivf_topk,
    q_kmeans,
    q_quality_score,
    q_vocab_topn,
    read_events,
)


def q_classifier_score(spark, sf_dir):
    from nci_seronet_proc_data_validator_spark.operators.classifier import (
        demo_weights, hashed_linear_score)
    docs = read_table(spark, sf_dir, "documents")
    return hashed_linear_score(docs, demo_weights(4096))


def q_data_profile_approx(spark, sf_dir):
    from nci_seronet_proc_data_validator_spark.driver_queries import (
        q_data_profile)
    return q_data_profile(spark, sf_dir, approx=True)


def q_funnel_conversion(spark, sf_dir):
    from nci_seronet_proc_data_validator_spark.driver_queries import (
        FUNNEL_STEPS, read_events)
    from nci_seronet_proc_data_validator_spark.operators.funnel import (
        funnel_counts)
    return funnel_counts(read_events(spark, sf_dir), FUNNEL_STEPS)
from nci_seronet_proc_data_validator_spark.functions.checks import (
    check_date,
    check_if_number,
    check_in_list,
)
from nci_seronet_proc_data_validator_spark.operators.typing import with_typed_shadows
from nci_seronet_proc_data_validator_spark.plans.rules import (
    ColumnRules,
    compile_sheet_findings,
)
from nci_seronet_proc_data_validator_spark.session import get_spark
from nci_seronet_proc_data_validator_spark.sources.readers import read_table


def _spread(df, spark):
    """Local testdata is a single parquet with ~3 row groups; scan
    parallelism is row-group-bound, so CPU-heavy downstream stages idle 29
    of 32 cores. One narrow repartition spreads the work. On a real
    cluster (inputs already split into many files) this is a no-op cost.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return df.repartition(cpus)


def validation_lineitem(spark, sf_dir):
    """Flagship scale query: the single-pass rule engine over the largest
    table — 5 rule families on 4 columns of lineitem in ONE projection."""
    li = _spread(read_table(spark, sf_dir, "lineitem"), spark)
    sheet = with_typed_shadows(li.select(
        F.col("l_orderkey").cast("long").alias("row_index"),
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
        F.col("l_linestatus").cast("string").alias("l_linestatus"),
        F.col("l_quantity").cast("string").alias("l_quantity"),
        F.col("l_shipdate").cast("string").alias("l_shipdate"),
    ))
    import datetime
    rules = [
        ColumnRules("l_returnflag", check_in_list("l_returnflag", ["A", "N", "R"])),
        ColumnRules("l_linestatus", check_in_list("l_linestatus", ["O", "F"])),
        ColumnRules("l_quantity", check_if_number("l_quantity", 1, 49, False, "int")),
        ColumnRules("l_shipdate", check_date("l_shipdate",
                                             datetime.date(1996, 1, 1),
                                             datetime.date(1999, 12, 31),
                                             False, "Date")),
    ]
    return compile_sheet_findings(sheet, "lineitem.csv", rules)


def c2_date_range_spread(spark, sf_dir):
    """The c2 driver query with the orders scan spread across cores —
    locally the single-file scan would run the 15-format date parse on
    one task (same no-op-at-scale rationale as _spread)."""
    import datetime
    from nci_seronet_proc_data_validator_spark.driver_queries import (
        _as_sheet, _findings)
    orders = _spread(read_table(spark, sf_dir, "orders"), spark)
    sheet = _as_sheet(orders, "o_orderkey", ["o_orderdate"])
    return _findings(sheet, "orders.csv", "o_orderdate",
                     check_date("o_orderdate", datetime.date(1996, 1, 1),
                                datetime.date(1997, 12, 31), False, "Date"))


def q_quantized_topk(spark, sf_dir):
    from pyspark.sql import functions as F
    from nci_seronet_proc_data_validator_spark.operators.similarity import (
        quantized_topk)
    from nci_seronet_proc_data_validator_spark.sources.readers import (
        read_table)
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    return quantized_topk(emb, queries, k=5, cand=20)


BENCH_QUERIES = {
    "validation_lineitem": validation_lineitem,
    "c2_date_range": c2_date_range_spread,
    "c6_dup_ids": q_c6_dup_ids,
    "j1_enrich_revenue": QUERIES["j1_enrich_revenue"][0],
    "j3_presence_patterns": QUERIES["j3_presence_patterns"][0],
    "a2_crosstab": QUERIES["a2_crosstab"][0],
    "dedup_normalized": QUERIES["dedup_normalized"][0],
    "minhash_lsh_pairs": QUERIES["minhash_lsh_pairs"][0],
    "embedding_topk": q_embedding_topk,
    "ivf_topk": q_ivf_topk,
    "events_hourly": q_events_hourly,
    "sessionize": QUERIES["sessionize"][0],
    # absorbed into temporal_joins in the registry; standalone function
    # keeps the timing series unbroken
    "asof_join": q_asof_join,
    # round-2 additions (new keys only — r1 keys above are unchanged so
    # per-query timings stay comparable across rounds; registry-
    # consolidated queries keep their standalone functions here so the
    # per-operator timing series stays unbroken)
    "quality_score": q_quality_score,
    "bm25_topk": QUERIES["bm25_topk"][0],
    "dedup_clusters": q_dedup_clusters,
    "interval_join": q_interval_join,
    "kmeans_centroids": q_kmeans,
    "vocab_topn": q_vocab_topn,
    "events_sliding": q_events_sliding,
    "tpch_q1": QUERIES["tpch_q1"][0],
    "tpch_q3": QUERIES["tpch_q3"][0],
    "tpch_q5": QUERIES["tpch_q5"][0],
    # round-3: the flagship — ALL rulebook rules over the 10-sheet
    # synthetic submission (one map-only findings scan per sheet + one
    # dup-ID shuffle per ID column).
    "rulebook_full": QUERIES["rulebook_full"][0],
    # round-3 curation operators
    "quantized_topk": q_quantized_topk,
    "dsir_importance": q_dsir_importance,
    "boilerplate_removal": QUERIES["boilerplate_removal"][0],
    "vocab_pipeline": QUERIES["vocab_pipeline"][0],
    # "semdedup" times the PINNED arm (the registry query unions both
    # arms since r9); the production auto-k arm gets its own key. SERIES
    # BREAK at r9 (see BENCH_NOTES): the pre-r9 bench arm ended in
    # .orderBy("vec_id") — a global range exchange + sort the pinned arm
    # no longer pays — so r9+ cells sit a step BELOW r8- cells for
    # reasons unrelated to dedup work.
    "semdedup": q_semdedup_pinned,
    "semdedup_auto": q_semdedup_auto,
    "bpe_train": QUERIES["bpe_train"][0],
    # round-4: substring-level dedup (winnowing posting lists) + hashed
    # linear classifier inference (model-as-literal, map-only)
    "substr_dup_pairs": QUERIES["substr_dup_pairs"][0],
    "classifier_score": q_classifier_score,
    # round-4: PQ codebook ANN (compressed-domain ADC + bounded-probe
    # IVF-PQ, integer-exact)
    "pq_ann": QUERIES["pq_ann"][0],
    # round-4: mergeable sketches (HLL registers + CMS counters + exact
    # twins + percentiles)
    "sketch_profile": QUERIES["sketch_profile"][0],
    # round-4: sequential conversion funnel over events
    "funnel_conversion": q_funnel_conversion,
    # round-4 continuations: blocked edit-distance record linkage, ANSI
    # MERGE snapshot upsert, k-NN graph + triangle counting (w/ pagerank)
    "fuzzy_join": QUERIES["fuzzy_join"][0],
    "merge_upsert": QUERIES["merge_upsert"][0],
    "graph_metrics": QUERIES["graph_metrics"][0],
    # round-6: the schema-driven profile/verify/fk/drift tier (new key)
    "data_profile": QUERIES["data_profile"][0],
    # production approx_count_distinct switch (no Expand) — NON-canonical
    # scale-evidence key: values are approximate, no oracle; see
    # BENCH_NOTES "Canonical bench comparison set"
    "data_profile_approx": q_data_profile_approx,
}

# Keys whose registered plan is the operator's production shape and which
# are not subsumed by a larger composite — the ONLY keys to read for
# round-over-round regression (BENCH_NOTES "Canonical bench comparison
# set"). Excluded: validation_lineitem / c2_date_range / c6_dup_ids
# (rulebook_full subsumes them), semdedup_auto (new series r9) and
# data_profile_approx (approximate values, scale-evidence only).
CANONICAL_SET = [
    "rulebook_full", "dedup_clusters", "substr_dup_pairs", "pq_ann",
    "data_profile", "graph_metrics", "minhash_lsh_pairs",
    "dedup_normalized", "embedding_topk", "ivf_topk", "quantized_topk",
    "bm25_topk", "sketch_profile", "bpe_train", "vocab_pipeline",
    "boilerplate_removal", "classifier_score", "dsir_importance",
    "quality_score", "sessionize", "funnel_conversion", "asof_join",
    "interval_join", "fuzzy_join", "merge_upsert", "tpch_q1", "tpch_q3",
    "tpch_q5", "j1_enrich_revenue", "j3_presence_patterns", "a2_crosstab",
    "events_hourly", "events_sliding", "kmeans_centroids", "vocab_topn",
    "semdedup",
]


# --- drift probes (r12) ----------------------------------------------------
# Three consecutive rounds re-adjudicated suite drift by hand: the in-run
# env_drift (median/best of the SUITE) under-predicts how much box
# interference inflates SHORT queries, because fixed per-job overhead
# swamps sub-second runtimes disproportionately (r11: short keys read
# 3-7.6x while env_drift said 1.2). Fix: interleave two REFERENCE
# measurements per query — code-independent workloads whose idle-box cost
# is a pinned calibration constant — and emit a drift-adjusted dict next
# to the raw one, so BENCH_rN vs BENCH_rN-1 comparisons self-normalize.
#
# - cpu probe: 6M-row sha2+sum, fixed 32 partitions, pure built-ins —
#   tracks compute contention (long queries' inflation mode);
# - sched probe: a single tiny job, min of 5 — tracks per-job scheduler/
#   driver latency (short queries' inflation mode).
# Both are repo-code-independent, so their definition stays comparable
# across rounds. Normalization is WITHIN-RUN: each query's drift factor
# is its probe reading over the run's MEDIAN probe reading (per probe
# type) — the median is the run's typical box state, so a query whose
# probe spiked 1.8x (someone else's burst) gets its raw time deflated
# accordingly, while queries measured in typical state keep f ~ 1.
# (An absolute calibration was tried first and is kept as reference
# info: the probe floor depends on JIT depth — 0.21 s deep in a suite
# vs 0.27 s after a 15-run warm — so absolute anchoring drifts ~25%
# where the within-run median does not. Cross-round box-speed shifts
# remain visible as probe_baseline / probe_calibration.)
# The adjustment is FIRST-ORDER: the probe samples the instant before
# the query's runs, not during them. Read adjusted values as "raw with
# the box-state excuse removed", not as ground truth.
_PROBE_CAL = {"cpu": 0.21, "sched": 0.032}   # r12 deep-warm idle floor
_SHORT_QUERY_SEC = 2.0


def _probe_cpu(spark, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        (spark.range(0, 6_000_000, 1, 32)
         .selectExpr("sum(length(sha2(cast(id AS string), 256))) AS s")
         .write.format("noop").mode("overwrite").save())
        best = min(best, time.time() - t0)
    return best


def _probe_sched(spark, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        spark.range(0, 1000, 1, 4).count()
        best = min(best, time.time() - t0)
    return best


#: Per-sample drift factors are CLAMPED to this band before adjusting:
#: the probe samples the instant before a run, not during it, so an
#: unclamped spike (someone else's 2-second burst hitting the probe but
#: not the 13-second query after it) would overcorrect — observed r12:
#: rulebook_full adjusted to 6.5 s from a 2.1x probe spike while its raw
#: best matched the idle-box value. Within the band the adjustment
#: removes the box-state excuse; beyond it, trust best-of-n instead.
_DRIFT_CLAMP = (0.8, 1.75)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cpus=cpus)
    # Warm the JVM: run the same plans at the smallest scale factor first
    # so codegen/JIT compilation is excluded from the timed runs.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for fn in BENCH_QUERIES.values():
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # Best-of-n per query (n=3 default, raised from 2 in r2; override
    # with SPARK_GRAFT_BENCH_N — the r5 verdict measured a uniform 1.23×
    # machine-load swing across byte-identical code, so the JSON now also
    # carries the median and per-suite spread to separate environment
    # drift from plan regressions). Repeated execution of the identical
    # plan isolates engine time from one-off costs (codegen cache misses,
    # OS page cache, concurrent machine load).
    # clearCache() before every timed run so a query that persists an
    # intermediate internally (e.g. the LSH signature index) never gets the
    # second run for free from the CacheManager — each sample is a full
    # cold-cache execution.
    # n=5 default (raised from 3 in r8 per the judge: environment drift
    # has eaten the 2x gate to 1.23x before; five samples make the
    # best/median pair robust to a transient load spike mid-suite).
    n = int(os.environ.get("SPARK_GRAFT_BENCH_N", "5"))
    # comma-separated allowlist for isolated reruns (in-suite vs isolated
    # comparisons, single-query bisects); unset = full suite
    only = {q for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
            .split(",") if q}
    unknown = only - set(BENCH_QUERIES)
    if unknown:
        raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY names unknown queries: "
                         f"{sorted(unknown)} (known: "
                         f"{sorted(BENCH_QUERIES)})")
    probes_on = os.environ.get("SPARK_GRAFT_BENCH_PROBES", "1") != "0"
    if probes_on:    # warm the probe plans (codegen) before any timing
        _probe_cpu(spark)
        _probe_sched(spark)
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    probe_cpu: dict[str, float] = {}
    probe_sched: dict[str, float] = {}
    probed: dict[str, list] = {}
    for name, fn in BENCH_QUERIES.items():
        if only and name not in only:
            continue
        samples = []
        probed[name] = []
        for _ in range(n):
            spark.catalog.clearCache()
            if probes_on:    # box state RIGHT BEFORE this sample
                probed[name].append((_probe_cpu(spark, reps=1),
                                     _probe_sched(spark, reps=3)))
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        if probes_on:    # report the probes paired with the BEST sample
            i_best = min(range(len(samples)), key=samples.__getitem__)
            probe_cpu[name] = round(probed[name][i_best][0], 3)
            probe_sched[name] = round(probed[name][i_best][1], 3)
        raw = list(samples)
        samples.sort()
        timings[name] = round(samples[0], 3)
        medians[name] = round(samples[len(samples) // 2], 3)
        probed[name] = list(zip(raw, probed[name])) if probes_on else []
        # localCheckpoint blocks (semdedup/graph/kmeans) are released by
        # the ContextCleaner only after Python drops the plan refs — at
        # sf1 the accumulated blocks from 38 prior queries distorted
        # later queries up to 12× (semdedup 26.8 s in-suite vs 2.3 s
        # isolated, BENCH_NOTES r8). Collect both heaps between queries.
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    best_total = round(sum(timings.values()), 3)
    med_total = round(sum(medians.values()), 3)
    # A filtered run's totals cover only the allowlisted queries —
    # stamp the filter so the artifact can't be misread as a full-suite
    # total when comparing across rounds.
    partial = {"only": sorted(only)} if only else {}
    payload = {
        "metric": ("bench_suite_partial" if only else "bench_suite_total"),
        **partial,
        "value": best_total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "samples": n,
        "queries_median": medians,
        "median_total": med_total,
        # median/best ≈ 1.0 on an idle machine; a broad-based gap means
        # environment load, not a plan change (r5's 1.23× lesson)
        "env_drift": round(med_total / best_total, 3) if best_total else 1.0,
    }
    if probes_on and timings:
        # PER-SAMPLE drift correction (v2): every sample carries the
        # probes measured right before it; each is individually scaled
        # by its clamped factor (probe / run-median-probe, probe type by
        # the query's duration class) and the adjusted value is the MIN
        # of corrected samples. A single pre-query probe (v1) paired one
        # box-state reading with five samples and overcorrected when a
        # transient burst hit the probe but not the samples. Cross-round
        # readers should compare queries_drift_adjusted — raw
        # short-query swings on a loaded box are NOT plan changes.
        def _med(vals: list[float]) -> float:
            s = sorted(vals)
            return s[len(s) // 2]
        all_cpu = [pc for rows in probed.values() for _dt, (pc, _ps) in rows]
        all_sched = [ps for rows in probed.values()
                     for _dt, (_pc, ps) in rows]
        base = {"cpu": _med(all_cpu), "sched": _med(all_sched)}
        lo, hi = _DRIFT_CLAMP
        adjusted = {}
        factors = {}
        for q, best in timings.items():
            corrected = []
            for dt, (pc, ps) in probed[q]:
                f = ((ps / max(base["sched"], 1e-6))
                     if best < _SHORT_QUERY_SEC
                     else (pc / max(base["cpu"], 1e-6)))
                corrected.append(dt / min(max(f, lo), hi))
            adjusted[q] = round(min(corrected), 3)
            factors[q] = round(best / adjusted[q], 3)
        payload["probe_calibration"] = _PROBE_CAL
        payload["probe_baseline"] = {k: round(v, 3)
                                     for k, v in base.items()}
        payload["probe_cpu"] = probe_cpu
        payload["probe_sched"] = probe_sched
        payload["queries_drift_factor"] = factors
        payload["queries_drift_adjusted"] = adjusted
        payload["adjusted_total"] = round(sum(adjusted.values()), 3)
    # Self-written full artifact (verdict-r9 item 4): the driver's
    # BENCH_r*.json keeps only a truncated tail of this stdout, so
    # round comparisons had to reconstruct the best-of dict. Write the
    # complete payload — plus the canonical-set total (BENCH_NOTES
    # "Canonical bench comparison set") that excludes coverage-only keys
    # — to a tracked file whenever SPARK_GRAFT_ROUND is set (and always
    # to BENCH_SELF_last.json for ad-hoc runs).
    canon = [k for k in CANONICAL_SET if k in timings]
    payload["canonical_set"] = canon
    payload["canonical_total_best"] = round(
        sum(timings[k] for k in canon), 3)
    payload["canonical_total_median"] = round(
        sum(medians[k] for k in canon), 3)
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "")
    out_names = ["BENCH_SELF_last.json"]
    if rnd:
        out_names.append(f"BENCH_SELF_r{int(rnd):02d}.json")
    here = os.path.dirname(os.path.abspath(__file__))
    for fn in out_names:
        with open(os.path.join(here, fn), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    # Full payload first (human/log consumption) ...
    print(json.dumps(payload))
    # ... canonical compact line LAST (verdict-r12 item 1): the driver
    # keeps only the final ~2000 chars of stdout, and the full payload
    # outgrew that — its tail truncated MID-dict, leaving BENCH_r12.json
    # unparseable. This closing line carries the raw headline numbers
    # (value = best-of total, queries_median = raw per-query medians)
    # compactly enough to always survive the tail capture and parse.
    compact = {
        "metric": payload["metric"],
        **partial,
        "value": best_total,
        "unit": "sec",
        # the driver contract's per-query dict (best-of seconds, same as
        # the full payload's "queries") — must survive the tail capture
        "queries": timings,
        "sf": payload["sf"],
        "samples": n,
        "median_total": med_total,
        "env_drift": payload["env_drift"],
        "canonical_total_best": payload["canonical_total_best"],
        "canonical_total_median": payload["canonical_total_median"],
        "adjusted_total": payload.get("adjusted_total"),
        "queries_median": medians,
    }
    line = json.dumps(compact, separators=(",", ":"))
    # Shed optional dicts (NEVER "queries" — the driver contract) until
    # the line fits the driver's ~2000-char stdout tail capture.
    for drop in ("queries_median", "adjusted_total",
                 "canonical_total_median", "canonical_total_best"):
        if len(line) <= 1900:
            break
        compact.pop(drop, None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
