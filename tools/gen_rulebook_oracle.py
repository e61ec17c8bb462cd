"""Regenerate the full-rulebook DuckDB oracle artifact.

``plans/sql_oracle.rulebook_oracle_sql()`` needs an active SparkContext
(binding the rulebook builds Column objects alongside the SQL mirrors), so
the oracle ships as a generated file that ``oracle_sql()`` can serve
sessionless. Run this after touching ``plans/rulebook.py``,
``plans/fixture.py`` or ``functions/checks.py``;
``tests/test_rulebook_full.py`` fails if the artifact is stale.

Usage: python tools/gen_rulebook_oracle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from nci_seronet_proc_data_validator_spark.session import get_spark

    get_spark("gen_rulebook_oracle", cpus=2)  # Column building needs a JVM
    from nci_seronet_proc_data_validator_spark.plans import sql_oracle

    sql = sql_oracle.rulebook_oracle_sql()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "nci_seronet_proc_data_validator_spark", "plans",
        "rulebook_oracle.sql")
    with open(out, "w", encoding="utf-8") as fh:
        fh.write(sql)
    print(f"wrote {out} ({len(sql)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
