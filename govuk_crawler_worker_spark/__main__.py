"""Deployable entrypoint — the reference's ``main`` (main.go:22-145) as
``python -m govuk_crawler_worker_spark`` / ``spark-submit --py-files``.

Env surface (reference-compatible names where they exist, engine knobs
otherwise):

    ROOT_URLS            comma list of root URLs (whitelist + default seeds)
    BLACKLIST_PATHS      comma list of path prefixes
    MAX_CRAWL_RETRIES    retry budget (default 4)
    TTL_EXPIRE_TIME_S    seen-set TTL seconds (default 12h)
    CLAIM_LIMIT          per-batch claim size (Qos analogue)
    SEED_URLS            comma list of seeds (default = ROOT_URLS)
    CHECKPOINT_DIR       catalog root (resume point; default ./crawl_catalog)
    MIRROR_ROOT          optional disk-mirror export root
    HEALTHCHECK_PORT     optional /healthcheck HTTP port (0 = ephemeral)
    MAX_BATCHES          drain budget (default: run to empty frontier)
    SPARK_MASTER         default local[*]
    SEEN_BUCKETS         seen-table bucket count for NEW catalogs (default 32)
    FRONTIER_HOST_BUCKETS  frontier host-bucket count for NEW catalogs (default 8)
    BLOOM_SEGMENTS       segmented-bloom row count (default 16)
    COMPACT_BATCHES      MOR/TTL compaction cadence in batches (default 1024)
    MOR_MAX_CHAIN        merge-on-read chain cap before inline fold (default 16)
    FETCH_ROBOTS         1 = live robots.txt fetch + enforcement (default 0)

The wiring is exactly the tested components: Catalog (atomic resume),
HttpFetcher (paced real GETs; injectable opener for tests), DrainLoop
(status-driven routing, bucketed commits), HealthServer.
"""

from __future__ import annotations

import os


def build_session(master: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName("govuk_crawler_worker_spark")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main(env=None, spark=None, opener=None, progress=None):
    """Run the crawl; returns (catalog, list[BatchStats], health_server).

    ``env``/``spark``/``opener`` are injectable for tests; production uses
    os.environ, a fresh session, and the real urllib opener."""
    from govuk_crawler_worker_spark.config import CrawlConfig
    from govuk_crawler_worker_spark.plans.fetch import HttpFetcher
    from govuk_crawler_worker_spark.plans.healthcheck import HealthServer, healthcheck
    from govuk_crawler_worker_spark.plans.pipeline import DrainLoop
    from govuk_crawler_worker_spark.sources.catalog import Catalog

    e = os.environ if env is None else env
    cfg = CrawlConfig.from_env(e)
    own_session = spark is None
    if spark is None:
        spark = build_session(e.get("SPARK_MASTER", "local[*]"))
        spark.sparkContext.setLogLevel("WARN")

    catalog = Catalog(spark, e.get("CHECKPOINT_DIR", "./crawl_catalog"))
    fetcher = HttpFetcher(cfg, opener=opener)
    loop = DrainLoop(
        spark,
        catalog,
        cfg,
        fetcher=fetcher,
        mirror_root=e.get("MIRROR_ROOT") or None,
        # state-table bucket geometry: applied to NEW catalogs (stamped into
        # the seed commit); a stamped catalog's stored counts win on resume
        seen_buckets=int(e.get("SEEN_BUCKETS", "0")) or None,
        frontier_host_buckets=int(e.get("FRONTIER_HOST_BUCKETS", "0")) or None,
        bloom_segments=int(e.get("BLOOM_SEGMENTS", "0")) or None,
        compact_batches=int(e.get("COMPACT_BATCHES", "1024")),
        mor_max_chain=int(e.get("MOR_MAX_CHAIN", "0")) or None,
        # live robots.txt fetch+enforcement (one GET/host/TTL); static
        # config rules always apply regardless
        fetch_robots=e.get("FETCH_ROBOTS", "0") == "1",
    )

    # seed only a FRESH catalog: an empty frontier on an existing catalog
    # means the crawl finished (re-seeding would re-fetch) — the schema
    # record distinguishes "never seeded" from "drained empty"
    if "frontier" not in catalog.latest().get("schemas", {}):
        raw = e.get("SEED_URLS") or ",".join(cfg.root_urls)
        seeds = spark.createDataFrame(
            [(u.strip(), 0) for u in raw.split(",") if u.strip()],
            "url string, priority int",
        )
        loop.seed(seeds)

    server = None
    if e.get("HEALTHCHECK_PORT") is not None:
        server = HealthServer(
            lambda: healthcheck(catalog), port=int(e.get("HEALTHCHECK_PORT", "0"))
        )

    # a failing drain must not leak the owned session or leave the health
    # endpoint serving a stale catalog from a daemon thread
    try:
        stats = loop.drain(
            max_batches=int(e.get("MAX_BATCHES", "1000000")), progress=progress
        )
    finally:
        if own_session:
            if server is not None:
                server.close()
            spark.stop()
    return catalog, stats, server


if __name__ == "__main__":
    _, stats, _ = main(
        progress=lambda s: print(
            f"batch {s.batch_id}: claimed={s.claimed} fetched={s.fetched} "
            f"published={s.published} dead={s.dead} frontier={s.frontier_size}"
        )
    )
    print(f"done: {len(stats)} batches, {sum(s.fetched for s in stats)} fetched")
