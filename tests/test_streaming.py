"""Structured Streaming drain: rate-tick + foreachBatch reproduces the batch
drain result (same catalog tables, same crawl set)."""

from __future__ import annotations

import tempfile

from govuk_crawler_worker_spark.plans.pipeline import DrainLoop
from govuk_crawler_worker_spark.plans.sim import simulate
from govuk_crawler_worker_spark.sources.catalog import Catalog
from govuk_crawler_worker_spark.sources.world import build_world, world_to_spark
from govuk_crawler_worker_spark.streaming.drain import StreamingDrain


def test_streaming_drain_matches_sim(spark):
    world = build_world(n_pages=15, seed=11)
    payload, content, seeds = world_to_spark(spark, world)
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="sdrain_"))
    loop = DrainLoop(spark, catalog, world.config, content.cache(), payload.cache())
    loop.seed(seeds)

    sd = StreamingDrain(loop, ticks_per_second=5.0)
    query = sd.start(spark)
    try:
        sd.process_available(timeout_s=180.0)
    finally:
        sd.stop()
        query.awaitTermination(10)

    sim = simulate(world.content, world.seeds, world.config)
    engine = sorted(
        (r["batch_id"], r["url_canon"])
        for r in catalog.read("fetched").select("batch_id", "url_canon").collect()
    )
    expected = sorted((f["batch_id"], f["url_canon"]) for f in sim.fetched)
    assert engine == expected
    assert len(sd.batches_run) >= 3
