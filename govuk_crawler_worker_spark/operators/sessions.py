"""Event sessionization — gap-based session windows over an event stream.

A crawl/metrics firehose groups into sessions by inactivity gaps (the
classic lag + cumulative-sum construction):

    session boundary  = gap to the previous event of the key > gap_s
    session id        = running count of boundaries per key
    one row per session: span, event count, value sum

All window functions — JVM-side, shuffle key = the entity key; skew bounded
by per-key event volume.  (Streaming twin: ``F.session_window`` in a
watermarked aggregation — same semantics, state-store backed.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    # microsecond-exact gap arithmetic (a seconds cast truncates fractions
    # and shifts boundaries); NTZ→TS cast is gap-invariant
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    with_gap = events.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) > gap_s * 1_000_000, 1)
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_gap.groupBy(key_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )
