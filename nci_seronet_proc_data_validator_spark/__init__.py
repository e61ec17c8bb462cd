"""PySpark-native analytics/validation engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of CBIIT/nci-seronet-proc-data-validator (a pandas/Lambda CSV
submission validator), generalized into a declarative rule-spec →
Column-expression compiler → findings-table engine, plus the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) such an engine needs at 100 TB.

Design tenets (see SURVEY.md):
- DataFrame/SQL only; rules compile to pure Column predicates evaluated in a
  SINGLE projection per sheet (array-of-struct + explode), so validation is
  one whole-stage-codegen'd scan — no per-rule passes, no Python in the row
  path.
- Mixed-type pandas "object columns" of the reference become typed shadow
  columns (``c__num``, ``c__ts``) derived with try_cast/to_timestamp.
- Error accumulation is bulk DataFrame construction, never row appends.
- Joins broadcast small sides (Merged_Table projections, reference dicts).
"""

__version__ = "0.1.0"

from nci_seronet_proc_data_validator_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
