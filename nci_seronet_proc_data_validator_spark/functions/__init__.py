from nci_seronet_proc_data_validator_spark.functions.checks import (
    CheckExpr,
    Dependency,
    assay_special,
    check_date,
    check_icd10,
    check_id_field,
    check_if_number,
    check_if_string,
    check_if_substr,
    check_in_list,
    compare_total_to_live,
    compare_viability,
    get_missing_values,
)

__all__ = [
    "CheckExpr", "Dependency", "check_in_list", "check_date",
    "check_if_number", "check_if_string", "check_id_field",
    "check_if_substr", "check_icd10", "assay_special",
    "compare_total_to_live", "compare_viability", "get_missing_values",
]
