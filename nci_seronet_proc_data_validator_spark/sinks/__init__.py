from nci_seronet_proc_data_validator_spark.sinks.reports import (
    build_notification_payload,
    write_error_reports,
    write_findings_parquet,
)

__all__ = ["write_error_reports", "write_findings_parquet",
           "build_notification_payload"]
