"""HttpFetcher: applyInPandas fetch with injected opener — headers, pacing,
status routing, host gate (no real network in the sandbox)."""

from __future__ import annotations

from pyspark.sql import functions as F

from govuk_crawler_worker_spark.config import CrawlConfig
from govuk_crawler_worker_spark.plans import schemas as S
from govuk_crawler_worker_spark.plans.fetch import HttpFetcher


def _claim(spark, urls):
    rows = [
        (u, u, hash(u), u.split("/")[2].split(":")[0], 0, 0, 0, 0, 0, "seed")
        for u in urls
    ]
    return spark.createDataFrame(rows, S.FRONTIER_SCHEMA)


def make_fake_opener():
    # defined as a closure so cloudpickle ships it BY VALUE to executors
    # (a module-level function in a test module is pickled by reference and
    # is unimportable in the Python workers)
    def fake_opener(url, headers, timeout_s):
        assert headers["User-Agent"].startswith("govuk_crawler_worker_spark/")
        assert headers["Rate-Limit-Token"] == "tok123"
        if url.endswith("/moved"):
            return 301, "text/html", b"", "https://www.gov.uk/target"
        if url.endswith("/busy"):
            return 429, "text/html", b"", url
        if url.endswith("/missing"):
            raise OSError("connection refused")
        return 200, "text/html; charset=utf-8", b'<a href="/next">n</a>', url

    return fake_opener


def test_http_fetcher_routing_and_headers(spark):
    cfg = CrawlConfig(root_urls=("https://www.gov.uk/",))
    fetcher = HttpFetcher(cfg, opener=make_fake_opener(), rate_limit_token="tok123")
    claimed = _claim(
        spark,
        [
            "https://www.gov.uk/ok",
            "https://www.gov.uk/moved",
            "https://www.gov.uk/busy",
            "https://www.gov.uk/missing",
            "https://evil.example.com/x",
        ],
    )
    out = {r["url"]: r.asDict() for r in fetcher.fetch(claimed).collect()}
    assert out["https://www.gov.uk/ok"]["status"] == 200
    assert out["https://www.gov.uk/ok"]["body_html"] == '<a href="/next">n</a>'
    assert out["https://www.gov.uk/moved"]["status"] == 301
    assert out["https://www.gov.uk/moved"]["redirect_to"] == "https://www.gov.uk/target"
    assert out["https://www.gov.uk/busy"]["status"] == 429
    assert out["https://www.gov.uk/missing"]["status"] == 404  # transport error → drop
    assert out["https://evil.example.com/x"]["status"] == 490  # host gate (no-port)


def test_http_fetcher_paces_within_bucket(spark):
    # crawl delay 0.05s on the host; record sleeps instead of sleeping
    cfg = CrawlConfig(
        root_urls=("https://www.gov.uk/",),
        crawl_delay_by_host={"www.gov.uk": 0.05},
        host_salt_buckets=2,
    )
    fetcher = HttpFetcher(cfg, opener=make_fake_opener(), rate_limit_token="tok123", sleep=lambda s: None)
    claimed = _claim(spark, [f"https://www.gov.uk/p{i}" for i in range(8)])
    out = fetcher.fetch(claimed)
    rows = out.collect()
    assert len(rows) == 8
    # offsets interleave across 2 buckets with global cadence ≥ delay
    offs = sorted(r["fetch_offset_s"] for r in rows)
    diffs = [b - a for a, b in zip(offs, offs[1:])]
    assert all(d >= 0.05 - 1e-9 for d in diffs)


class TestDefaultOpener:
    """The production opener against a real local HTTP server: redirects
    must surface as 3xx statuses (NOT be followed), 429/5xx must surface as
    real statuses (NOT collapse into the transport-error path), and only
    genuine transport errors raise."""

    @staticmethod
    def _server():
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        class H(BaseHTTPRequestHandler):
            def do_GET(self):
                route = self.path
                if route == "/moved":
                    self.send_response(301)
                    self.send_header("Location", "/target")
                    self.end_headers()
                elif route == "/busy":
                    self.send_response(429)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(b"slow down")
                elif route == "/boom":
                    self.send_response(503)
                    self.end_headers()
                elif route == "/gone":
                    self.send_response(404)
                    self.end_headers()
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.end_headers()
                    self.wfile.write(b'<a href="/next">n</a>')

            def log_message(self, *a):  # quiet
                pass

        srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}"

    def test_statuses_surface_and_redirects_not_followed(self):
        from govuk_crawler_worker_spark.plans.fetch import default_opener

        srv, base = self._server()
        try:
            status, ctype, body, final = default_opener(base + "/ok", {}, 5.0)
            assert (status, body) == (200, b'<a href="/next">n</a>')
            assert ctype.startswith("text/html")

            status, _, _, final = default_opener(base + "/moved", {}, 5.0)
            assert status == 301
            assert final == base + "/target"  # resolved, NOT fetched

            assert default_opener(base + "/busy", {}, 5.0)[0] == 429
            assert default_opener(base + "/boom", {}, 5.0)[0] == 503
            assert default_opener(base + "/gone", {}, 5.0)[0] == 404
        finally:
            srv.shutdown()

    def test_transport_error_raises(self):
        import pytest

        from govuk_crawler_worker_spark.plans.fetch import default_opener

        # unroutable port on localhost → URLError/OSError path
        with pytest.raises(Exception):
            default_opener("http://127.0.0.1:9/x", {}, 0.5)
