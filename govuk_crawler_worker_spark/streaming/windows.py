"""Event-time windowed aggregation with watermarked late-data handling.

The reference worker has no event-time surface, but the training-data
pipeline around a crawl does (fetch logs, metric firehoses) — this is the
standard Structured Streaming shape the engine exposes for it:

    events(ts timestamp, event_type string, value double)
      → withWatermark(ts, late_horizon)
      → groupBy(window(ts, width), event_type).agg(...)

* **append mode**: a window emits exactly once, when the watermark passes
  its end — the exactly-once aggregation contract downstream sinks want;
* **late data**: events older than the watermark are DROPPED (bounded
  state), events within the horizon still merge into their window;
* state store size is bounded by (windows in horizon × keys) — the
  watermark is what makes per-key state safe at firehose scale.

The batch twin of this aggregation is the `events_windowed` driver query
(DuckDB-oracled); this module is its streaming form, tested with real late
rows through a file-source stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 seconds",
    late_horizon: str = "5 seconds",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, late_horizon)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "10 seconds",
    late_horizon: str = "5 seconds",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming session windows — the state-store form of
    ``operators/sessions.sessionize``: `F.session_window` merges events into
    per-key sessions that CLOSE after ``gap`` of inactivity (sessions can
    merge across micro-batches in the state store), finalized once the
    watermark passes session end + gap."""
    return (
        events.withWatermark(ts_col, late_horizon)
        .groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
