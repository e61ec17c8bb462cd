from nci_seronet_proc_data_validator_spark.operators.typing import (
    NUM_SUFFIX,
    TS_SUFFIX,
    num_col,
    ts_col,
    with_typed_shadows,
)

__all__ = ["with_typed_shadows", "num_col", "ts_col", "NUM_SUFFIX",
           "TS_SUFFIX"]
