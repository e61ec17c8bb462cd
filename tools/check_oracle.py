"""Self-check harness mimicking the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize like the driver's value-hash: int widths unify to
    int64, but int-vs-float is a REAL mismatch (the driver stringifies
    values, and '5' != '5.0' — DuckDB HUGEINT sums surface as float64 and
    must be CAST AS BIGINT in the oracle SQL, not papered over here)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else "<NULL>")
        elif str(s.dtype).startswith(("int", "uint", "Int")):
            df[c] = s.astype("int64")
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == bool:
            df[c] = s.astype("bool")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _family(dtype) -> str:
    s = str(dtype)
    if s.startswith(("int", "uint", "Int")):
        return "int"
    if s.startswith("float"):
        return "float"
    if s == "bool":
        return "bool"
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as entrymod
    from nci_seronet_proc_data_validator_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; generated scale dirs
        # (tools/gen_scale.py) are Spark-written DIRECTORIES — glob them
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle — rows-only)")
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        a, b = _canon(sdf), _canon(ddf)
        status = "PASS"
        detail = ""
        fam_bad = [c for c in a.columns if c in b.columns
                   and _family(a[c].dtype) != _family(b[c].dtype)]
        if list(a.columns) != list(b.columns):
            status, detail = "FAIL", f"cols {list(a.columns)} vs {list(b.columns)}"
        elif fam_bad:
            status = "FAIL"
            detail = ("dtype family mismatch (driver hash would differ): "
                      + ", ".join(f"{c}: {a[c].dtype} vs {b[c].dtype}"
                                  for c in fam_bad))
        elif len(a) != len(b):
            status, detail = "FAIL", f"rows {len(a)} vs {len(b)}"
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            status = "FAIL"
            detail = (f"values differ in {bad_cols}; first row {i}: "
                      f"{a.loc[i].to_dict()} vs {b.loc[i].to_dict()}")
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: rows={len(a)} ({time.time()-t0:.1f}s) {detail}")

    print(f"\n{n_run - len(failures)}/{n_run} queries match the oracle")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
