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


def test_streaming_drain_compacts_on_cadence(spark):
    """Batch-drain parity for the r5 maintenance cadence: a StreamingDrain
    tick crossing compact_batches must call compact_seen (MOR chains folded
    to single base leaves) and the crawl result must equal the simulator."""
    world = build_world(n_pages=15, seed=23)
    payload, content, seeds = world_to_spark(spark, world)
    catalog = Catalog(spark, tempfile.mkdtemp(prefix="sdraincmp_"))
    loop = DrainLoop(
        spark, catalog, world.config, content.cache(), payload.cache(),
        bloom_min_batch=0,  # MOR chains grow from batch 0
        compact_batches=2,
    )
    calls = []
    orig = loop.compact_seen

    def spy():
        orig()
        parts = catalog.latest()["parts"].get("seen", {})
        assert all(not isinstance(c, list) or len(c) == 1 for c in parts.values())
        calls.append(1)

    loop.compact_seen = spy
    loop.seed(seeds)
    sd = StreamingDrain(loop, ticks_per_second=5.0)
    query = sd.start(spark)
    try:
        sd.process_available(timeout_s=180.0)
    finally:
        sd.stop()
        query.awaitTermination(10)
    assert calls, "streaming compaction cadence never fired"
    sim = simulate(world.content, world.seeds, world.config)
    engine = sorted(
        (r["batch_id"], r["url_canon"])
        for r in catalog.read("fetched").select("batch_id", "url_canon").collect()
    )
    assert engine == sorted((f["batch_id"], f["url_canon"]) for f in sim.fetched)


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


class TestWatermarkedWindows:
    """Event-time windows + watermark: a window finalizes (append-mode emit)
    only when the watermark passes its end, and an event arriving LATER than
    the watermark horizon is dropped instead of corrupting a closed window."""

    def test_late_rows_dropped_and_windows_finalize(self, spark, tmp_path):
        import json

        from govuk_crawler_worker_spark.streaming.windows import (
            windowed_event_counts,
        )

        src = tmp_path / "wm_events"
        src.mkdir()

        def write_file(name, rows):
            tmp = src / (name + ".tmp")
            with open(tmp, "w") as fh:
                for ts, et, v in rows:
                    fh.write(json.dumps({"ts": ts, "event_type": et, "value": v}) + "\n")
            tmp.rename(src / name)

        # batch 1: two events in window [0,10); t=16 advances the watermark
        # to 11 → window [0,10) CLOSES (watermark semantics: a window is
        # closed once watermark ≥ window end, i.e. end + horizon in event
        # time has passed)
        write_file("b1.json", [(2.0, "view", 1.0), (4.0, "view", 2.0), (16.0, "view", 4.0)])

        events = (
            spark.readStream.schema("ts double, event_type string, value double")
            .json(str(src))
            .selectExpr("timestamp_seconds(ts) AS ts", "event_type", "value")
        )
        q = (
            windowed_event_counts(events, "10 seconds", "5 seconds")
            .writeStream.format("memory")
            .queryName("wm_counts")
            .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            # batch 2: t=3 arrives for the CLOSED [0,10) window → dropped;
            # t=30 advances the watermark to 25 → [10,20) closes too
            write_file("b2.json", [(3.0, "view", 100.0), (30.0, "view", 8.0)])
            q.processAllAvailable()
            # batch 3: flush (append-mode emits a closed window in the batch
            # AFTER the watermark passes it)
            write_file("b3.json", [(40.0, "view", 9.0)])
            q.processAllAvailable()
            got = {
                (r["win_start"].second + r["win_start"].minute * 60, r["n"], r["sum_value"])
                for r in spark.sql("SELECT * FROM wm_counts").collect()
            }
            # [0,10): the late t=3 row was dropped → n=2, sum=3.0 (not 103.0)
            assert (0, 2, 3.0) in got, got
            assert (0, 3, 103.0) not in got, got
            assert (10, 1, 4.0) in got, got
        finally:
            q.stop()


class TestStreamingSessionWindows:
    """F.session_window: events within the gap MERGE into one session —
    including across micro-batches via the state store — and a session
    finalizes (append emit) once the watermark passes its end."""

    def test_sessions_merge_across_batches(self, spark, tmp_path):
        import json

        from govuk_crawler_worker_spark.streaming.windows import (
            session_window_counts,
        )

        src = tmp_path / "sess_events"
        src.mkdir()

        def write_file(name, rows):
            tmp = src / (name + ".tmp")
            with open(tmp, "w") as fh:
                for ts, uid in rows:
                    fh.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")
            tmp.rename(src / name)

        # batch 1: u1 events at t=0 and t=5 (within the 10s gap → one session)
        write_file("b1.json", [(0.0, 1), (5.0, 1)])
        events = (
            spark.readStream.schema("ts double, user_id long")
            .json(str(src))
            .selectExpr("timestamp_seconds(ts) AS ts", "user_id")
        )
        q = (
            session_window_counts(events, "10 seconds", "5 seconds")
            .writeStream.format("memory")
            .queryName("sessions")
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            # batch 2: t=12 EXTENDS the same session (within gap of t=5's
            # session end 15) — a cross-batch state-store merge — and t=60
            # advances the watermark past the merged session's close
            write_file("b2.json", [(12.0, 1), (60.0, 1)])
            q.processAllAvailable()
            write_file("b3.json", [(100.0, 2)])  # flush batch
            q.processAllAvailable()
            got = [
                (r["user_id"], r["n_events"], r["session_start"].second + 60 * r["session_start"].minute,
                 r["session_end"].second + 60 * r["session_end"].minute)
                for r in spark.sql("SELECT * FROM sessions ORDER BY session_start").collect()
            ]
            # one merged session: events at 0, 5, 12 → [0, 22), 3 events
            assert (1, 3, 0, 22) in got, got
        finally:
            q.stop()


class TestStreamingRobotsParity:
    """StreamingDrain shares ``loop.run_batch`` with the batch drain, so the
    r6 politeness surface (live robots rules, Crawl-delay budgets, sitemap
    ingestion) is inherited — but nothing pinned that until now: a future
    fork of the streaming tick path must not silently drop politeness."""

    def test_live_robots_delay_and_sitemap_in_streaming_mode(self, spark):
        from govuk_crawler_worker_spark.config import CrawlConfig
        from govuk_crawler_worker_spark.plans.fetch import HttpFetcher
        from test_robots_fetch import _proxy_opener, _serve
        from collections import defaultdict

        host = "www.gov.uk"
        html = "text/html; charset=utf-8"
        robots = (
            "User-agent: *\n"
            "Disallow: /private\n"
            "Crawl-delay: 45\n"
            f"Sitemap: https://{host}/sitemap.xml\n"
        ).encode()
        sitemap = (
            f"<urlset><url><loc>https://{host}/orphan</loc></url></urlset>"
        ).encode()
        pages = {
            f"/{host}/": (
                200,
                html,
                b'<a href="/a">a</a><a href="/private/x">p</a>',
            ),
            f"/{host}/a": (200, html, b"<p>ok</p>"),
            f"/{host}/private/x": (200, html, b"<p>secret</p>"),
            f"/{host}/orphan": (200, html, b"<p>only in sitemap</p>"),
            f"/{host}/robots.txt": (200, "text/plain", robots),
            f"/{host}/sitemap.xml": (200, "application/xml", sitemap),
        }
        counts = defaultdict(int)
        srv, base = _serve(pages, counts)
        try:
            cfg = CrawlConfig(root_urls=(f"https://{host}/",))
            catalog = Catalog(spark, tempfile.mkdtemp(prefix="srobots_"))
            loop = DrainLoop(
                spark,
                catalog,
                cfg,
                fetcher=HttpFetcher(cfg, opener=_proxy_opener(base)),
                fetch_robots=True,
            )
            loop.seed(
                spark.createDataFrame(
                    [(u, 0) for u in cfg.root_urls], "url string, priority int"
                )
            )
            sd = StreamingDrain(loop, ticks_per_second=5.0)
            query = sd.start(spark)
            try:
                sd.process_available(timeout_s=300.0)
            finally:
                sd.stop()
                query.awaitTermination(10)
        finally:
            srv.shutdown()

        fetched = [
            (r["batch_id"], r["url"]) for r in catalog.read("fetched").collect()
        ]
        # sitemap-only orphan reached; disallowed path never fetched NOR GET'd
        assert {u for _b, u in fetched} == {
            f"https://{host}/",
            f"https://{host}/a",
            f"https://{host}/orphan",
        }
        assert counts[f"/{host}/private/x"] == 0
        # robots + sitemap each GET'd exactly once per TTL, in streaming too
        assert counts[f"/{host}/robots.txt"] == 1
        assert counts[f"/{host}/sitemap.xml"] == 1
        # Crawl-delay 45 over the 30 s period throttles every tick after the
        # rules landed to ≤ 1 page GET (the accumulated-fairness budget)
        per_batch: dict[int, int] = {}
        for b, _u in fetched:
            per_batch[b] = per_batch.get(b, 0) + 1
        first = min(per_batch)
        assert all(n <= 1 for b, n in per_batch.items() if b > first)
