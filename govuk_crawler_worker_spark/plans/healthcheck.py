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


# -- HTTP serving surface (healthcheck.go:192-253) ---------------------------


def run_checks(checks: dict, timeout_s: float = 1.0) -> dict:
    """Race every named checker against a shared timeout, exactly the
    reference semantics (healthcheck.go:192-238): each check runs in its own
    thread; one that misses the deadline reports ``critical: timeout`` and
    overall = max of per-check statuses (:143-150).

    ``checks`` maps name → zero-arg callable returning an int status (or
    raising → critical)."""
    import concurrent.futures as cf
    import time as _time

    results: dict[str, dict] = {}
    overall = STATUS_OK
    pool = cf.ThreadPoolExecutor(max_workers=max(len(checks), 1))
    futs = {name: pool.submit(fn) for name, fn in checks.items()}
    deadline = _time.monotonic() + timeout_s  # ONE shared deadline, like the
    for name, fut in futs.items():  # reference's single context timeout
        try:
            status = int(fut.result(timeout=max(deadline - _time.monotonic(), 0)))
            results[name] = {"status": STATUS_NAMES.get(status, "critical")}
        except cf.TimeoutError:
            status = STATUS_CRITICAL
            results[name] = {"status": "critical", "error": "timeout"}
        except Exception as e:  # noqa: BLE001 — checker failure → critical
            status = STATUS_CRITICAL
            results[name] = {"status": "critical", "error": str(e)}
        overall = max(overall, status)
    # do NOT wait for stragglers — a hung checker must not hang the endpoint
    pool.shutdown(wait=False)
    return {"status": STATUS_NAMES[overall], "checks": results}


class HealthServer:
    """Serve ``GET /healthcheck`` as JSON from a daemon thread — the
    reference's HTTP surface (healthcheck.go:242-253).  The status supplier
    is called per request; pair with ``run_checks`` (for live checkers) or
    ``healthcheck`` (for the catalog roll-up)."""

    def __init__(self, supplier, port: int = 0):
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        class H(BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path.rstrip("/") not in ("", "/healthcheck".rstrip("/")):
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    payload = supplier()
                except Exception as e:  # noqa: BLE001
                    payload = {"status": "critical", "checks": {"supplier": str(e)}}
                body = json.dumps(payload).encode()
                # the reference serves 200 with the JSON body regardless of
                # status; monitors read the "status" field
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", port), H)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()

    def close(self) -> None:
        self._srv.shutdown()
