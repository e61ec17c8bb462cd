from nci_seronet_proc_data_validator_spark.streaming.watcher import (
    dedup_stream,
    enrich_stream,
    hourly_rollup_stream,
    interval_join_stream,
    validate_stream,
    validate_stream_multi,
    validate_stream_submissions,
)

__all__ = ["validate_stream", "validate_stream_multi",
           "validate_stream_submissions",
           "hourly_rollup_stream", "dedup_stream",
           "interval_join_stream", "enrich_stream"]
