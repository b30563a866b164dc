"""Driver-registered streaming queries (rows compared against DuckDB SQL).

Each runs the full Structured Streaming machinery (file source → watermarked
stateful operator → memory sink) drained with Trigger.AvailableNow, then
returns the materialized result — so the driver's oracle gate verifies the
*streaming* path end-to-end, not a batch re-expression.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries.events_windows import _TUMBLING_ORACLE
from olap_sus_spark.registry import register
from olap_sus_spark.streaming import (
    dedup_events_stream,
    read_event_stream,
    run_available_now,
    tumbling_counts,
)

_STAGED: dict[str, str] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The file stream source requires a *directory*; the driver fixture is a
    single parquet file.  Stage it once per sf_dir into a temp landing dir
    (batch rewrite also normalizes the nanos timestamp to micros)."""
    if sf_dir not in _STAGED:
        d = os.path.join(tempfile.mkdtemp(prefix="olap_sus_stream_"), "events")
        load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
        _STAGED[sf_dir] = d
    return read_event_stream(spark, _STAGED[sf_dir])


@register("streaming_tumbling_window", oracle=_TUMBLING_ORACLE)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling counts, run as a stream (same oracle as
    the batch twin events_tumbling_window)."""
    return run_available_now(tumbling_counts(_events_stream(spark, sf_dir)), "complete")


_DEDUP_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


@register("streaming_dedup", oracle=_DEDUP_ORACLE)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over a stream; the fixture has unique
    event ids, so the result must be exactly the input relation."""
    return run_available_now(dedup_events_stream(_events_stream(spark, sf_dir)), "append")
