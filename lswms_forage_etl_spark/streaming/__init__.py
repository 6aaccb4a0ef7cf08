from lswms_forage_etl_spark.streaming.incremental import (
    complete_periods_only,
    incremental_composite_run,
    resume_start_date,
    stream_windowed_counts,
)
from lswms_forage_etl_spark.streaming.stateful import (
    running_composite_state,
    stream_session_stats,
)

__all__ = [
    "resume_start_date", "complete_periods_only",
    "incremental_composite_run", "stream_windowed_counts",
    "stream_session_stats", "running_composite_state",
]
from lswms_forage_etl_spark.streaming.ingest import (  # noqa: F401
    ingest_stream,
    run_ingest_once,
)
