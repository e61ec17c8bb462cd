"""Quick timing harness for rulebook_full chunk tuning.

Usage: python tools/time_rulebook.py [chunk ...]
Monkeypatches the codegen_chunk of the findings compiler (the SQL-text
path ``sheet_findings_sql`` since r8 — q_rulebook_full no longer goes
through compile_sheet_findings), runs q_rulebook_full at
$SPARK_GRAFT_SF_DIR (default sf0.1) n times per value.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import nci_seronet_proc_data_validator_spark.plans.rules as rules_mod
from nci_seronet_proc_data_validator_spark.driver_queries import QUERIES

orig = rules_mod.sheet_findings_sql

chunks = [None if a == "none" else int(a) for a in sys.argv[1:]] or [None, 3, 9]
for chunk in chunks:
    def patched(view, sheet_name, column_rules,
                row_index_col=rules_mod.ROW_INDEX_COL,
                codegen_chunk=None, _c=chunk):
        return orig(view, sheet_name, column_rules, row_index_col,
                    codegen_chunk=_c)
    rules_mod.sheet_findings_sql = patched
    # re-import binding in driver_queries uses `from ... import` inside the
    # function body, so patching the module attribute is enough
    times = []
    for i in range(2):
        t0 = time.time()
        n = QUERIES["rulebook_full"][0](spark, sf_dir).count()
        times.append(time.time() - t0)
        spark.catalog.clearCache()
    print(f"chunk={chunk}: rows={n} times={[round(t,2) for t in times]} "
          f"best={min(times):.2f}", flush=True)
rules_mod.sheet_findings_sql = orig
