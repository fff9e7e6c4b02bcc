"""Single-threaded reference simulator — the correctness oracle.

The reference worker's crawl order is nondeterministic (4 concurrent fetch
goroutines + Go map iteration in its per-page dedup,
crawler_message_item.go:183-195), so "identical crawl ordering" is only
well-defined at batch granularity (SURVEY.md §7).  This module IS the spec of
the canonical order:

    batch claim order  = (priority DESC, url_canon ASC)
    per-host budget    = split across k = host_salt_buckets salt ranks
                         (salt = crc32(url_canon) % k); rank within
                         (host, salt) in the same order must be ≤
                         budget//k + (1 if (salt+batch) % k < budget%k) —
                         the remainder rotates with the batch id so no salt
                         rank starves.  Σ_s budget_s = host_budget exactly.
    global claim limit = first `claim_limit` of the budget-filtered order

and of every state transition, mirroring the reference message-at-a-time
semantics set-at-a-time:

* retry gate (workflow.go:93-98): seen-state > max_crawl_retries → dead
* 429 (workflow.go:104-118): requeue with back-off, NO seen increment
* 5XX (workflow.go:106-107): seen Incr + requeue next batch
* 404 / missing / invalid (workflow.go:119-121, crawler.go:99): dead
* redirect (crawler.go:91-109): success-as-HTML whose only outlink is the
  Location target (the meta-refresh trick)
* 200 non-accepted type (workflow.go:129-140): ack + seen reset to 0 —
  the deletion path that motivates the cuckoo-filter fallback
* 200 accepted non-HTML (workflow.go:203-207): ack, seen UNCHANGED (stays 1)
* 200 HTML: mirror-write (skipped when URL has params, workflow.go:164-165),
  extract, publish; completing a crawl never writes seen (A6 subtlety,
  workflow.go:298-311)
* publish (workflow.go:254-296): page-param rule, seen≥1 skip, else
  seen=Enqueued + frontier insert (priority 0, queue_connection.go:129)
* TTL: every seen write refreshes updated_batch; rows older than
  ttl_batches expire at batch start (generation semantics)

The Spark engine (plans/pipeline.py) must reproduce this simulator's fetched
set+order, seen map, and dead set exactly — that is the pytest gate.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import pandas as pd

from govuk_crawler_worker_spark.config import CrawlConfig
from govuk_crawler_worker_spark.functions.content_types import (
    HTML,
    accepted_content_type,
    parse_media_type,
)
from govuk_crawler_worker_spark.functions.extract import extract_urls
from govuk_crawler_worker_spark.operators.politeness import robots_disallowed_py
from govuk_crawler_worker_spark.functions.urlnorm import (
    canonicalize,
    has_params,
    host_only,
    host_with_port,
    is_blacklisted_url,
    publish_allowed_by_params,
    rel_file_path,
)

REDIRECT_STATUSES = (301, 302, 303, 307)


@dataclass
class SimResult:
    fetched: list[dict] = field(default_factory=list)  # crawl order, batch-tagged
    dead: list[dict] = field(default_factory=list)
    seen: dict[str, int] = field(default_factory=dict)
    batches: int = 0


def _frontier_row(url: str, priority: int, batch: int, lineage: str) -> dict:
    return {
        "url": url,
        "url_canon": canonicalize(url),
        "host": host_only(host_with_port(url)),
        "priority": priority,
        "attempt_count": 0,
        "not_before_batch": batch,
        "lineage": lineage,
    }


def simulate(
    content: pd.DataFrame,
    seeds: pd.DataFrame,
    config: CrawlConfig,
    max_batches: int = 1000,
    ttl_batches: int | None = None,
    backoff_batches: int = 1,
) -> SimResult:
    serve = {r.url: r for r in content.itertuples(index=False)}
    res = SimResult()
    seen_updated: dict[str, int] = {}

    # seeds dedup by canon (one-row-per-canon invariant from bootstrap):
    # representative url = min(url), priority = max(priority)
    by_canon: dict[str, tuple[str, int]] = {}
    for r in seeds.itertuples(index=False):
        c = canonicalize(r.url)
        if c is None:
            continue
        if c in by_canon:
            u, p = by_canon[c]
            by_canon[c] = (min(u, r.url), max(p, int(r.priority)))
        else:
            by_canon[c] = (r.url, int(r.priority))
    frontier: list[dict] = []
    for c, (u, p) in by_canon.items():
        row = _frontier_row(u, p, 0, "seed")
        frontier.append(row)
        res.seen[row["url_canon"]] = 1
        seen_updated[row["url_canon"]] = 0

    roots_with_port = tuple(config.root_hosts_with_port)

    for b in range(max_batches):
        if not frontier:
            break
        res.batches = b + 1

        if ttl_batches is not None:  # generation expiry at batch start
            expired = [c for c, ub in seen_updated.items() if ub < b - ttl_batches]
            for c in expired:
                res.seen.pop(c, None)
                seen_updated.pop(c, None)

        eligible = sorted(
            (r for r in frontier if r["not_before_batch"] <= b),
            key=lambda r: (-r["priority"], r["url_canon"]),
        )
        if not eligible:
            # nothing claimable yet — advance the clock (back-off wait)
            continue

        politeness_on = bool(config.crawl_delay_by_host) or config.default_crawl_delay_s > 0
        k = config.host_salt_buckets
        salt_taken: dict[tuple[str, int], int] = {}
        claimed: list[dict] = []
        for r in eligible:
            if len(claimed) >= config.claim_limit:
                break
            if politeness_on:
                budget = config.host_budget(r["host"])
                salt = zlib.crc32(r["url_canon"].encode("utf-8")) % k
                cap = budget // k + (1 if (salt + b) % k < budget % k else 0)
                key = (r["host"], salt)
                if salt_taken.get(key, 0) >= cap:
                    continue
                salt_taken[key] = salt_taken.get(key, 0) + 1
            claimed.append(r)

        claimed_ids = {id(r) for r in claimed}
        remaining = [r for r in frontier if id(r) not in claimed_ids]
        requeues: list[dict] = []
        candidates: list[tuple[str, str]] = []  # (outlink, src page url)

        for r in claimed:
            url, canon = r["url"], r["url_canon"]
            state = res.seen.get(canon, 0)

            # claim-time blacklist drop (ReadFromQueue, workflow.go:40-44):
            # acked away — no fetch, no dead record, no seen write
            if is_blacklisted_url(url, tuple(config.blacklist_paths)):
                continue

            # robots.txt disallow (north-rule politeness): dropped likewise
            if robots_disallowed_py(config, url, r["host"]):
                continue

            if state > config.max_crawl_retries:  # retry gate BEFORE fetch
                res.dead.append({"url": url, "url_canon": canon, "reason": "retries_exhausted", "batch_id": b})
                continue

            row = serve.get(url)
            if row is None:
                res.dead.append({"url": url, "url_canon": canon, "reason": "not_found", "batch_id": b})
                continue

            if row.busy_429_n > r["attempt_count"]:
                r2 = dict(r)
                r2["attempt_count"] += 1
                r2["not_before_batch"] = b + backoff_batches
                requeues.append(r2)
                continue

            if row.fail_5xx_n > max(state - 1, 0):
                res.seen[canon] = state + 1  # Redis INCR: absent/0 → 1
                seen_updated[canon] = b
                r2 = dict(r)
                r2["attempt_count"] += 1
                r2["not_before_batch"] = b + 1
                requeues.append(r2)
                continue

            if row.status in REDIRECT_STATUSES:
                body = f'<a href="{row.redirect_to}">moved</a>'
                ctype = HTML
            elif row.status == 404 or row.status >= 400:
                res.dead.append({"url": url, "url_canon": canon, "reason": "not_found", "batch_id": b})
                continue
            else:
                body = row.body_html
                ctype = row.content_type

            if not accepted_content_type(ctype):
                res.seen[canon] = 0  # ReadyToEnqueue reset (cuckoo-delete path)
                seen_updated[canon] = b
                continue

            mime = parse_media_type(ctype)
            if not has_params(url):
                res.fetched.append(
                    {
                        "url": url,
                        "url_canon": canon,
                        "host": r["host"],
                        "batch_id": b,
                        "content_type": mime,
                        "rel_path": rel_file_path(url, ctype),
                        "image_id": row.image_id,
                    }
                )

            if mime == HTML:
                urls, err = extract_urls(
                    body or "", url, roots_with_port, tuple(config.blacklist_paths)
                )
                if err:
                    res.dead.append({"url": url, "url_canon": canon, "reason": "extract_error", "batch_id": b})
                    continue
                candidates.extend((u, url) for u in urls)
            # non-HTML accepted: ack, seen unchanged (A6: completion never
            # writes seen)

        # -- publish: set-at-a-time dedup ---------------------------------
        by_canon: dict[str, tuple[str, str]] = {}
        for u, src in candidates:
            if not publish_allowed_by_params(u):
                continue
            c = canonicalize(u)
            if c is None:
                continue
            rep = (u, src)
            if c not in by_canon or rep < by_canon[c]:
                by_canon[c] = rep  # deterministic representative: min (url, src)
        inserts = []
        for c in sorted(by_canon):
            u, src = by_canon[c]
            if res.seen.get(c, 0) >= 1:
                continue  # already enqueued (or reporting 5XXs)
            res.seen[c] = 1
            seen_updated[c] = b
            row = _frontier_row(u, 0, b + 1, src)
            inserts.append(row)

        frontier = remaining + requeues + inserts

    return res
