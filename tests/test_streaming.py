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


class TestStatefulPolitenessAudit:
    """applyInPandasWithState: per-host last-fetch state must carry ACROSS
    micro-batches — a violation spanning two files/batches is only visible
    through the state store."""

    def test_state_carries_across_microbatches(self, spark, tmp_path):
        import json
        import time

        from govuk_crawler_worker_spark.streaming.stateful import (
            host_rate_violations,
        )

        src = tmp_path / "events"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")

        def write_file(name, rows):
            p = src / name
            tmp = src / (name + ".tmp")
            with open(tmp, "w") as fh:
                for host, ts in rows:
                    fh.write(json.dumps({"host": host, "ts": ts}) + "\n")
            tmp.rename(p)

        # batch 1: hot host fetches at t=0 and t=1.2 (violation: delay 5s);
        # calm host at t=0 only
        write_file("b1.json", [("hot.gov.uk", 0.0), ("hot.gov.uk", 1.2), ("calm.gov.uk", 0.0)])

        events = (
            spark.readStream.schema("host string, ts double")
            .json(str(src))
            .selectExpr("host", "timestamp_seconds(ts) AS ts")
        )
        out = host_rate_violations(events, {"hot.gov.uk": 5.0, "calm.gov.uk": 5.0})
        q = (
            out.writeStream.format("memory")
            .queryName("violations")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got1 = spark.sql("SELECT host, gap_s FROM violations").collect()
            assert [(r["host"], round(r["gap_s"], 1)) for r in got1] == [
                ("hot.gov.uk", 1.2)
            ]

            # batch 2 (new file → new micro-batch): calm host fetches at t=3
            # — only a cross-batch comparison against the t=0 state in the
            # state store can flag it
            write_file("b2.json", [("calm.gov.uk", 3.0), ("hot.gov.uk", 30.0)])
            q.processAllAvailable()
            got2 = spark.sql("SELECT host, gap_s FROM violations ORDER BY ts").collect()
            assert [(r["host"], round(r["gap_s"], 1)) for r in got2] == [
                ("hot.gov.uk", 1.2),
                ("calm.gov.uk", 3.0),
            ]
        finally:
            q.stop()
