"""robots.txt fetch + parse for HttpFetcher deployments.

The reference worker has NO robots.txt support (its politeness surface is
the Rate-Limit-Token header + crawl pacing, crawler.go:64-75) — this module
is production surface beyond parity, layered on the engine's existing
config-only rules:

* ``CrawlConfig.robots_disallow`` (static per-host prefixes) remains the
  default and is untouched;
* a DrainLoop constructed with ``fetch_robots=True`` and an HttpFetcher
  additionally keeps a catalog table

      robots(host string, scheme string, prefixes array<string>,
             fetched_batch long)

  fetched through the SAME opener contract as page GETs — one GET of
  ``<scheme>://<host>/robots.txt`` per host per TTL, executed inside
  ``mapInPandas`` (executors fetch, never the driver), refreshed when the
  stored row is older than ``robots_ttl_batches``;
* enforcement is columnar: join the claim to the rules by host and apply
  ``exists(prefixes, p -> startswith(path(url), p))`` — no per-row Python
  on the hot path; the route chain's existing ``robots_drop`` handles the
  blocked rows.

Parsing implements the common subset of RFC 9309: ``User-agent`` group
selection (the most specific token that is a case-insensitive substring of
our agent, else ``*``), ``Disallow`` path prefixes (empty = allow-all),
comments stripped.  ``Allow`` lines and path wildcards are NOT interpreted —
ignoring ``Allow`` only ever over-blocks (the safe direction for a polite
crawler), never under-blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = "host string, scheme string, prefixes array<string>, fetched_batch long"


def parse_robots(text: str, agent: str = "govuk_crawler_worker_spark") -> list[str]:
    """Disallow prefixes applying to ``agent`` — the most specific matching
    user-agent group wins, falling back to ``*``.  Deterministic, pure."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    in_agents = True  # a User-agent line after rules starts a NEW group
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_agents = False
            if val:  # empty Disallow = allow-all
                cur_rules.append(val)
        elif key in ("allow", "crawl-delay"):
            in_agents = False  # group rules — recognized, not interpreted
        # "sitemap" (and any unknown key) is a NON-group line (RFC 9309
        # §2.2.2): it must neither end a user-agent run nor start a group
        # body, else "User-agent: a ⏎ Sitemap: … ⏎ User-agent: b ⏎
        # Disallow: /p" would silently give agent a allow-all (under-block)
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))
    # RFC 9309 §2.2.1: if more than one group matches at the winning
    # specificity (e.g. two "User-agent: *" groups), their rules combine —
    # taking only the first would under-block
    best_spec = -1
    specs: list[int] = []
    for agents, _rules in groups:
        spec = -1
        for a in agents:
            if a == "*":
                spec = max(spec, 0)
            elif a and a in agent_l:
                spec = max(spec, len(a))
        specs.append(spec)
        best_spec = max(best_spec, spec)
    if best_spec < 0:
        return []
    out: list[str] = []
    for spec, (_agents, rules) in zip(specs, groups):
        if spec == best_spec:
            out.extend(r for r in rules if r not in out)
    return out


def fetch_robots_delta(
    stale_hosts: DataFrame,
    opener,
    headers_for,
    timeout_s: float,
    batch: int,
    agent: str = "govuk_crawler_worker_spark",
) -> DataFrame:
    """(host, scheme) rows → freshly fetched robots rows, one GET per host,
    inside mapInPandas (Arrow batches; executors fetch).  A failed or
    missing robots.txt (4xx/5xx/transport error) yields NO prefixes —
    allow-all, the standard interpretation for an absent file.  The caller
    MUST eagerly checkpoint the result before reusing it (side-effecting
    GETs must run exactly once, same rule as the page fetch)."""
    import pandas as pd

    def fetch_part(it):
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                prefixes: list[str] = []
                try:
                    status, _ctype, body, _final = opener(
                        f"{row.scheme}://{row.host}/robots.txt",
                        headers_for(row.host),
                        timeout_s,
                    )
                    if status == 200 and body:
                        prefixes = parse_robots(
                            body.decode("utf-8", "replace"), agent
                        )
                except Exception:  # noqa: BLE001 — unreachable file = allow-all
                    prefixes = []
                out.append((row.host, row.scheme, prefixes, batch))
            yield pd.DataFrame(
                out, columns=["host", "scheme", "prefixes", "fetched_batch"]
            )

    return stale_hosts.mapInPandas(fetch_part, ROBOTS_SCHEMA)


def robots_blocked_col(prefixes_col, url_col: str = "url"):
    """Columnar: URL's path starts with any of the host's fetched Disallow
    prefixes (NULL prefixes — host absent from the rules table — blocks
    nothing)."""
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    return F.exists(
        F.coalesce(prefixes_col, F.array().cast("array<string>")),
        lambda p: path.startswith(p),
    )
