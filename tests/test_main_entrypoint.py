"""The deployable entrypoint (python -m govuk_crawler_worker_spark): env
config → HttpFetcher crawl with mirror export + healthcheck HTTP, resumable
catalog — the reference's main.go wiring end-to-end against a local server."""

from __future__ import annotations

import json
import os
import tempfile
import urllib.request

from govuk_crawler_worker_spark.__main__ import main
from govuk_crawler_worker_spark.sources.world import build_world
from tests.test_pipeline_e2e import TestHttpDrainMatchesSimulator as H


def test_main_env_wiring_end_to_end(spark):
    world = build_world(n_pages=16, seed=13)
    content = H._statelessize(world.content)
    srv, base = H._serve(content)
    ckpt = tempfile.mkdtemp(prefix="main_ckpt_")
    mirror = tempfile.mkdtemp(prefix="main_mirror_")
    env = {
        "ROOT_URLS": ",".join(f"https://{h}/" for h in ("www.gov.uk", "assets.example.gov.uk", "service.example.gov.uk:8443")),
        "BLACKLIST_PATHS": "/search,/government/uploads",
        "CHECKPOINT_DIR": ckpt,
        "MIRROR_ROOT": mirror,
        "HEALTHCHECK_PORT": "0",
        "MAX_BATCHES": "25",
    }
    try:
        catalog, stats, health = main(env=env, spark=spark, opener=H._proxy_opener(base))
        fetched = catalog.read("fetched").count()
        # stats.fetched counts fetch ROUTES; the fetched table excludes
        # has-params URLs (crawled but never written — workflow.go:164-165)
        assert fetched > 5 and sum(s.fetched for s in stats) >= fetched
        # mirror written by the executors
        assert os.path.isfile(os.path.join(mirror, "www.gov.uk/index.html"))
        # healthcheck serves over real HTTP
        with urllib.request.urlopen(
            f"http://127.0.0.1:{health.port}/healthcheck", timeout=10
        ) as resp:
            body = json.loads(resp.read())
        assert body["status"] in ("ok", "warning", "critical")
        health.close()

        # resume: a second invocation on the same CHECKPOINT_DIR is a no-op
        # (frontier drained; nothing re-fetched)
        catalog2, stats2, _ = main(env=env, spark=spark, opener=H._proxy_opener(base))
        assert sum(s.fetched for s in stats2) == 0
        assert catalog2.read("fetched").count() == fetched
    finally:
        srv.shutdown()
