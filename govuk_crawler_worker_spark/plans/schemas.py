"""Table schemas for the frontier engine state tables.

These replace the reference's implicit runtime state:
frontier  ← the RabbitMQ queue (workflow.go:21-55, queue_connection.go)
seen      ← the Redis TTL hash set (ttl_hash_set.go:57-189)
fetched   ← the disk mirror (workflow.go:153-216) carrying the image+caption
            payload (BASELINE input_hint schema embedded)
dead      ← reject-drop outcomes (Reject(false) call sites, workflow.go)
metrics   ← StatsD timings/gauges (util/util.go:97-111)

State integers keep the reference protocol exactly (workflow.go:18-19,
ttl_hash_set.go semantics): 0 = ReadyToEnqueue, 1 = Enqueued, >1 = enqueued
with (state-1) 5XX retries recorded.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_READY_TO_ENQUEUE = 0
STATE_ENQUEUED = 1

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("priority", IntegerType(), False),
        StructField("priority_bucket", IntegerType(), False),
        StructField("attempt_count", IntegerType(), False),
        StructField("not_before_batch", LongType(), False),
        StructField("enqueued_batch", LongType(), False),
        StructField("lineage", StringType(), True),  # src url that published it
    ]
)

SEEN_SCHEMA = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("url_canon", StringType(), False),
        StructField("state", IntegerType(), False),
        StructField("updated_batch", LongType(), False),
    ]
)

FETCHED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_canon", StringType(), False),
        StructField("host", StringType(), False),
        StructField("batch_id", LongType(), False),
        StructField("content_type", StringType(), True),
        StructField("rel_path", StringType(), True),
        # BASELINE input_hint payload columns (null for non-image rows)
        StructField("image_id", StringType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

DEAD_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_canon", StringType(), False),
        StructField("reason", StringType(), False),
        StructField("batch_id", LongType(), False),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("batch_id", LongType(), False),
        StructField("stage", StringType(), False),
        StructField("duration_ms", DoubleType(), False),
        StructField("rows", LongType(), False),
        StructField("status", IntegerType(), False),  # 0 ok / 1 warning / 2 critical
    ]
)

CONTENT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("status", IntegerType(), False),
        StructField("content_type", StringType(), True),
        StructField("image_id", StringType(), True),
        StructField("body_html", StringType(), True),
        StructField("redirect_to", StringType(), True),
        StructField("fail_5xx_n", IntegerType(), False),
        StructField("busy_429_n", IntegerType(), False),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

SEEDS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("priority", IntegerType(), False),
    ]
)
