"""Mirror file-tree export (workflow.go:173-189 goldens), healthcheck HTTP
endpoint + 1s check race (healthcheck.go:143-253), TTL introspection sign
semantics (ttl_hash_set.go:177-189, ttl_hash_set_test.go:156-175)."""

from __future__ import annotations

import json
import os
import tempfile
import time
import urllib.request

from govuk_crawler_worker_spark.operators.seen import seen_ttl
from govuk_crawler_worker_spark.plans import schemas as S
from govuk_crawler_worker_spark.plans.healthcheck import (
    STATUS_CRITICAL,
    STATUS_OK,
    STATUS_WARNING,
    HealthServer,
    healthcheck,
    run_checks,
)
from govuk_crawler_worker_spark.plans.pipeline import DrainLoop
from govuk_crawler_worker_spark.plans.sim import simulate
from govuk_crawler_worker_spark.sources.catalog import Catalog
from govuk_crawler_worker_spark.sources.world import build_world, world_to_spark


class TestMirrorExport:
    def test_file_tree_matches_reference_layout(self, spark):
        world = build_world(n_pages=18, seed=42)
        tmp = tempfile.mkdtemp(prefix="drain_mirror_")
        mirror = tempfile.mkdtemp(prefix="mirror_")
        payload, content, seeds = world_to_spark(spark, world)
        catalog = Catalog(spark, tmp)
        loop = DrainLoop(
            spark, catalog, world.config, content, payload, mirror_root=mirror
        )
        loop.seed(seeds)
        loop.drain(max_batches=30)

        sim = simulate(world.content, world.seeds, world.config)
        serve = {r.url: r for r in world.content.itertuples(index=False)}
        payload_by_id = {r.image_id: r for r in world.payload.itertuples(index=False)}
        checked_html = checked_img = 0
        for s in sim.fetched:
            path = os.path.join(mirror, s["rel_path"])
            assert os.path.isfile(path), s["rel_path"]
            data = open(path, "rb").read()
            row = serve[s["url"]]
            if s["image_id"] is not None:
                assert data == bytes(payload_by_id[s["image_id"]].bytes)
                checked_img += 1
            elif row.body_html is not None:
                assert data == row.body_html.encode("utf-8")
                checked_html += 1
        assert checked_html > 5 and checked_img > 5
        # the trailing-slash root produced host/index.html (golden)
        assert os.path.isfile(os.path.join(mirror, "www.gov.uk/index.html"))
        # nothing outside fetched rel_paths leaked (no ?param writes)
        expected = {s["rel_path"] for s in sim.fetched}
        on_disk = set()
        for root, _, files in os.walk(mirror):
            for f in files:
                on_disk.add(os.path.relpath(os.path.join(root, f), mirror))
        assert on_disk == expected


class TestHealthEndpoint:
    def test_run_checks_timeout_race_and_max_rollup(self):
        def ok():
            return STATUS_OK

        def warn():
            return STATUS_WARNING

        def slow():
            time.sleep(5)
            return STATUS_OK

        def boom():
            raise RuntimeError("db down")

        t0 = time.monotonic()
        out = run_checks({"a": ok, "b": warn, "slow": slow, "boom": boom}, timeout_s=0.3)
        assert time.monotonic() - t0 < 3.0  # raced, not serialized
        assert out["status"] == "critical"  # max roll-up
        assert out["checks"]["a"]["status"] == "ok"
        assert out["checks"]["b"]["status"] == "warning"
        assert out["checks"]["slow"]["error"] == "timeout"
        assert "db down" in out["checks"]["boom"]["error"]

    def test_http_endpoint_serves_catalog_rollup(self, spark):
        world = build_world(n_pages=8, seed=5)
        tmp = tempfile.mkdtemp(prefix="drain_hc_")
        payload, content, seeds = world_to_spark(spark, world)
        catalog = Catalog(spark, tmp)
        loop = DrainLoop(spark, catalog, world.config, content, payload)
        loop.seed(seeds)
        loop.drain(max_batches=3)
        srv = HealthServer(lambda: healthcheck(catalog))
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/healthcheck", timeout=10
            ) as resp:
                assert resp.status == 200
                body = json.loads(resp.read())
            assert body["status"] in ("ok", "warning", "critical")
            assert "latest_batch" in body["checks"]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/nope", timeout=10
            ) as resp:
                raise AssertionError("404 expected")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        finally:
            srv.close()


class TestSeenTTL:
    def test_sign_semantics(self, spark):
        seen = spark.createDataFrame(
            [(1, "a", 1, 10), (2, "b", 1, 3)],
            S.SEEN_SCHEMA,
        )
        keys = spark.createDataFrame([("a",), ("b",), ("missing",)], "url_canon string")
        # ttl=5, batch=12: a → 10+5-12=3 alive; b → 3+5-12=-4 → -2; missing → -2
        got = {
            r["url_canon"]: r["ttl_batches"]
            for r in seen_ttl(seen, keys, batch_id=12, ttl_batches=5).collect()
        }
        assert got == {"a": 3, "b": -2, "missing": -2}
        # no TTL configured: present → -1, absent → -2
        got = {
            r["url_canon"]: r["ttl_batches"]
            for r in seen_ttl(seen, keys, batch_id=12, ttl_batches=None).collect()
        }
        assert got == {"a": -1, "b": -1, "missing": -2}
