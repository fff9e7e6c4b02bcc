"""Live robots.txt fetch + enforcement (r5, beyond-reference surface).

parse_robots: RFC 9309 common subset (group selection, Disallow prefixes,
Allow ignored = over-blocking-safe).  E2E: a DrainLoop with HttpFetcher
against a real local HTTP server serving robots rules — the engine must GET
/robots.txt ONCE per host per TTL, commit the rules into the catalog, and
never GET a disallowed path; the config-only static path stays untouched.
"""

from __future__ import annotations

import tempfile
from collections import defaultdict

from govuk_crawler_worker_spark.config import CrawlConfig
from govuk_crawler_worker_spark.plans.pipeline import DrainLoop
from govuk_crawler_worker_spark.plans.robots import parse_robots
from govuk_crawler_worker_spark.sources.catalog import Catalog


class TestParseRobots:
    def test_star_group(self):
        txt = "User-agent: *\nDisallow: /private\nDisallow: /tmp\n"
        assert parse_robots(txt) == ["/private", "/tmp"]

    def test_specific_agent_wins_over_star(self):
        txt = (
            "User-agent: *\nDisallow: /all\n\n"
            "User-agent: govuk_crawler_worker_spark\nDisallow: /mine\n"
        )
        assert parse_robots(txt) == ["/mine"]
        assert parse_robots(txt, agent="otherbot") == ["/all"]

    def test_multi_agent_group_and_comments(self):
        txt = (
            "# comment\nUser-agent: a\nUser-agent: govuk_crawler_worker_spark\n"
            "Disallow: /x # trailing\nAllow: /x/ok\n"
        )
        # Allow is recognized but not interpreted (over-blocks, never under)
        assert parse_robots(txt) == ["/x"]

    def test_empty_disallow_is_allow_all(self):
        assert parse_robots("User-agent: *\nDisallow:\n") == []
        assert parse_robots("") == []

    def test_longest_agent_match_wins(self):
        txt = (
            "User-agent: govuk\nDisallow: /short\n\n"
            "User-agent: govuk_crawler\nDisallow: /long\n"
        )
        assert parse_robots(txt) == ["/long"]


def _serve(pages: dict[str, tuple[int, str, bytes]], counts):
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            counts[self.path] += 1
            hit = pages.get(self.path)
            if hit is None:
                self.send_response(404)
                self.end_headers()
                return
            status, ctype, body = hit
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _proxy_opener(base):
    # closure → cloudpickle ships it by value to executor python workers
    def op(url, headers, timeout_s):
        from urllib.parse import urlsplit

        from govuk_crawler_worker_spark.plans.fetch import default_opener

        u = urlsplit(url)
        local = base + "/" + u.netloc + u.path + (("?" + u.query) if u.query else "")
        return default_opener(local, headers, timeout_s)

    return op


class TestRobotsFetchDrain:
    def test_drain_fetches_rules_once_and_never_gets_disallowed(self, spark):
        from govuk_crawler_worker_spark.plans.fetch import HttpFetcher

        host = "www.gov.uk"
        html = 'text/html; charset=utf-8'
        pages = {
            f"/{host}/": (200, html, b'<a href="/a">a</a><a href="/private/x">p</a>'),
            f"/{host}/a": (200, html, b"<p>ok</p>"),
            f"/{host}/private/x": (200, html, b"<p>secret</p>"),
            f"/{host}/robots.txt": (
                200,
                "text/plain",
                b"User-agent: *\nDisallow: /private\n",
            ),
        }
        counts = defaultdict(int)
        srv, base = _serve(pages, counts)
        try:
            cfg = CrawlConfig(root_urls=(f"https://{host}/",))
            catalog = Catalog(spark, tempfile.mkdtemp(prefix="robots_"))
            loop = DrainLoop(
                spark,
                catalog,
                cfg,
                fetcher=HttpFetcher(cfg, opener=_proxy_opener(base)),
                fetch_robots=True,
            )
            assert loop.fetch_robots
            loop.seed(
                spark.createDataFrame(
                    [(f"https://{host}/", 0)], "url string, priority int"
                )
            )
            loop.drain(max_batches=10)
        finally:
            srv.shutdown()

        fetched = {r["url"] for r in catalog.read("fetched").collect()}
        assert f"https://{host}/" in fetched
        assert f"https://{host}/a" in fetched
        assert f"https://{host}/private/x" not in fetched
        # the disallowed path was never requested at all (claim-time drop,
        # checked before the GET inside the fetch group)
        assert counts[f"/{host}/private/x"] == 0
        # exactly ONE robots GET across the whole multi-batch drain (TTL'd)
        assert counts[f"/{host}/robots.txt"] == 1
        # and the rules are catalog state (resume does not refetch)
        rules = {r["host"]: list(r["prefixes"]) for r in catalog.read("robots").collect()}
        assert rules == {host: ["/private"]}

    def test_unreachable_robots_is_allow_all_and_static_rules_still_apply(
        self, spark
    ):
        from govuk_crawler_worker_spark.plans.fetch import HttpFetcher

        host = "www.gov.uk"
        html = "text/html; charset=utf-8"
        pages = {  # NO robots.txt entry → server 404s it
            f"/{host}/": (200, html, b'<a href="/a">a</a><a href="/cfgblock/x">c</a>'),
            f"/{host}/a": (200, html, b"<p>ok</p>"),
            f"/{host}/cfgblock/x": (200, html, b"<p>blocked by config</p>"),
        }
        counts = defaultdict(int)
        srv, base = _serve(pages, counts)
        try:
            cfg = CrawlConfig(
                root_urls=(f"https://{host}/",),
                # static config rules must keep applying on the live path
                robots_disallow={host: ("/cfgblock",)},
            )
            catalog = Catalog(spark, tempfile.mkdtemp(prefix="robots404_"))
            loop = DrainLoop(
                spark,
                catalog,
                cfg,
                fetcher=HttpFetcher(cfg, opener=_proxy_opener(base)),
                fetch_robots=True,
            )
            loop.seed(
                spark.createDataFrame(
                    [(f"https://{host}/", 0)], "url string, priority int"
                )
            )
            loop.drain(max_batches=10)
        finally:
            srv.shutdown()
        fetched = {r["url"] for r in catalog.read("fetched").collect()}
        # 404 robots = allow-all: /a crawled; static config rule still blocks
        assert f"https://{host}/a" in fetched
        assert f"https://{host}/cfgblock/x" not in fetched
        assert counts[f"/{host}/cfgblock/x"] == 0
        # the (empty) rules row is still committed so the TTL applies
        rules = {r["host"]: list(r["prefixes"]) for r in catalog.read("robots").collect()}
        assert rules == {host: []}


class TestParseRobotsEdgeCases:
    def test_crlf_and_mixed_case_keys(self):
        txt = "USER-AGENT: *\r\nDisAllow: /a\r\n\r\nSitemap: https://x/s.xml\r\n"
        assert parse_robots(txt) == ["/a"]

    def test_rules_before_any_agent_are_ignored(self):
        # a headerless rule belongs to no group (RFC 9309: groups start
        # with user-agent lines)
        assert parse_robots("Disallow: /early\nUser-agent: *\nDisallow: /x\n") == ["/x"]

    def test_two_star_groups_combine(self):
        txt = "User-agent: *\nDisallow: /one\n\nUser-agent: *\nDisallow: /two\n"
        # RFC 9309 §2.2.1: multiple groups matching at the same specificity
        # combine their rules — taking only the first would under-block
        assert parse_robots(txt) == ["/one", "/two"]

    def test_specific_groups_combine_but_star_excluded(self):
        txt = (
            "User-agent: govuk_crawler\nDisallow: /a\n"
            "User-agent: *\nDisallow: /star\n"
            "User-agent: govuk_crawler\nDisallow: /b\n"
        )
        assert parse_robots(txt) == ["/a", "/b"]

    def test_sitemap_between_agent_lines_does_not_split_group(self):
        # sitemap is a NON-group line (RFC 9309 §2.2.2): it must not end a
        # user-agent run — splitting here would hand agent a allow-all
        txt = (
            "User-agent: a\nSitemap: https://x/s.xml\nUser-agent: *\n"
            "Disallow: /p\n"
        )
        assert parse_robots(txt, agent="a") == ["/p"]

    def test_agent_case_insensitive(self):
        txt = "User-agent: GOVUK_CRAWLER_WORKER_SPARK\nDisallow: /mine\n"
        assert parse_robots(txt) == ["/mine"]

    def test_garbage_lines_ignored(self):
        txt = "not a directive\nUser-agent: *\n<<<>>>\nDisallow: /ok\n"
        assert parse_robots(txt) == ["/ok"]
