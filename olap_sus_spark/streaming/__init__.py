"""Structured Streaming surface (forward-looking extension, SURVEY.md §2.9).

The reference has no streaming operators — its incrementality is daily batch
partitions.  This package extends the engine with the streaming twins of the
batch event-time queries (olap_sus_spark/queries/events_windows.py): the
same expressions over ``readStream``, plus watermarked dedup and a custom
stateful operator.
"""

from olap_sus_spark.streaming.streams import (  # noqa: F401
    dedup_events_stream,
    interval_join_attribution,
    read_event_stream,
    run_available_now,
    running_user_totals,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
