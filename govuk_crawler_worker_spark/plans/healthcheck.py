"""Healthcheck: max-status roll-up over per-batch metrics.

Reference: ``healthcheck/healthcheck.go`` — checkers raced against 1s
timeouts (:192-238), overall = max of per-check statuses (:143-150),
JSON-serialized over HTTP (:242-253).  Status enum ok/warning/critical
(:87-95).

Spark realization: every batch appends metrics rows (stage, duration_ms,
rows, status) — the StatsD equivalents (util/util.go:97-111).  The health
status is a max-aggregate over the most recent batch's rows plus staleness
and dead-letter checks; serialized with ``to_json``.  No HTTP server is
needed for correctness — expose via ``healthcheck_json`` from any driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from govuk_crawler_worker_spark.plans import schemas as S
from govuk_crawler_worker_spark.sources.catalog import Catalog

STATUS_OK = 0
STATUS_WARNING = 1
STATUS_CRITICAL = 2
STATUS_NAMES = {0: "ok", 1: "warning", 2: "critical"}


def batch_status(
    metrics: DataFrame,
    slow_batch_warning_ms: float = 60_000.0,
    slow_batch_critical_ms: float = 300_000.0,
) -> DataFrame:
    """Per-batch roll-up: max of recorded statuses and duration-derived
    statuses (a slow stage is the analogue of a checker timeout)."""
    derived = (
        F.when(F.col("duration_ms") >= slow_batch_critical_ms, STATUS_CRITICAL)
        .when(F.col("duration_ms") >= slow_batch_warning_ms, STATUS_WARNING)
        .otherwise(STATUS_OK)
    )
    return metrics.groupBy("batch_id").agg(
        F.max(F.greatest(F.col("status"), derived)).alias("status"),
        F.sum("duration_ms").alias("total_ms"),
        F.max("rows").alias("rows"),
    )


def healthcheck(catalog: Catalog) -> dict:
    """Overall status = max over the LATEST batch (the reference's Status()
    aggregates current checks, not history)."""
    metrics = catalog.read("metrics", S.METRICS_SCHEMA)
    if metrics.isEmpty():
        return {"status": "warning", "checks": {"metrics": "no batches recorded"}}
    per_batch = batch_status(metrics)
    latest = per_batch.orderBy(F.col("batch_id").desc()).limit(1).collect()[0]
    checks = {
        "latest_batch": {
            "batch_id": int(latest["batch_id"]),
            "status": STATUS_NAMES[int(latest["status"])],
            "total_ms": float(latest["total_ms"]),
        }
    }
    overall = int(latest["status"])
    dead = catalog.read("dead", S.DEAD_SCHEMA)
    n_dead = dead.count()
    checks["dead_letters"] = {"count": int(n_dead)}
    return {"status": STATUS_NAMES[overall], "checks": checks}


def healthcheck_json(catalog: Catalog) -> str:
    import json

    return json.dumps(healthcheck(catalog))
