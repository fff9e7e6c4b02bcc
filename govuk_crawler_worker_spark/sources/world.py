"""Deterministic synthetic web (seed=42): the fetch oracle.

Replaces the reference's httptest servers (workflow_test.go:587-592,
http_crawler/crawler_test.go:18-24) with tables (FIXTURES.md §1-§5):

payload  — image+caption rows, EXACTLY the BASELINE input_hint schema
content  — per-URL serve table: status / content_type / HTML body /
           redirect target / fault counters (404, 429-then-ok,
           5XX-then-ok, permanent-5XX, redirect — mirroring the status
           routing in http_crawler/crawler.go:84-109 and the retry tests
           workflow_test.go:165-233)
seeds    — GOV.UK-style seed list with priorities

The link structure is a BFS tree per host with: one hot host holding ~half
of all pages (skew pressure for the salted politeness buckets), cross-host
links, duplicate + fragment-bearing links (dedup pressure), mailto/external
links (host-filter pressure), blacklisted paths, ``?page=N`` pagination links
(published per workflow.go:265) and multi-param links (skipped).

Everything derives from numpy.default_rng(seed) — no wall clock, no external
data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from govuk_crawler_worker_spark.config import CrawlConfig
from govuk_crawler_worker_spark.functions import content_types as ct
from govuk_crawler_worker_spark.plans.schemas import (
    CONTENT_SCHEMA,
    PAYLOAD_SCHEMA,
    SEEDS_SCHEMA,
)
from govuk_crawler_worker_spark.sources import images as img

HOT_HOST = "www.gov.uk"
HOSTS = (HOT_HOST, "assets.example.gov.uk", "service.example.gov.uk:8443")

_CAPTION_WORDS = (
    "guidance licence visa passport tax benefit council statistics report "
    "form apply renew check travel import export duty vehicle school"
).split()
_UNICODE_CAPTIONS = ("如何在香港申請英國簽證", "Visa überprüfen — ¿cómo?", "Отчёт №7")


@dataclass
class World:
    payload: pd.DataFrame
    content: pd.DataFrame
    seeds: pd.DataFrame
    config: CrawlConfig
    # generator-only ground truth (NOT visible to the crawl): pre-encode raw
    # RGB pixels per image, for the decoded-pixel PSNR invariant
    origin: pd.DataFrame | None = None


def _page_counts(n_pages: int) -> dict[str, int]:
    """Hot host gets ~50% of pages (FIXTURES.md §3 skew pressure)."""
    hot = n_pages // 2
    rest = n_pages - hot
    return {
        HOSTS[0]: hot,
        HOSTS[1]: rest - rest // 3,
        HOSTS[2]: rest // 3,
    }


def _page_url(host: str, k: int) -> str:
    return f"https://{host}/s{k % 4}/p{k}"


def build_world(
    n_pages: int = 60,
    images_per_page: int = 1,
    seed: int = 42,
    branching: int = 3,
    crawl_delay_hot_host: float = 0.0,
    claim_limit: int = 10_000,
    image_side: int = 12,
    extra_links_per_page: int = 0,
    body_pad_words: int = 0,
) -> World:
    """``extra_links_per_page`` adds random same-host links (realistic page
    weight: production HTML carries tens-to-hundreds of anchors);
    ``body_pad_words`` pads bodies with filler text (parse pressure).  Both
    default off so the hermetic tests stay tiny."""
    rng = np.random.default_rng(seed)
    counts = _page_counts(n_pages)
    pad = (
        " ".join(_CAPTION_WORDS[i % len(_CAPTION_WORDS)] for i in range(body_pad_words))
        if body_pad_words
        else ""
    )

    payload_rows: list[dict] = []
    content_rows: list[dict] = []
    seeds_rows: list[dict] = []
    origin_rows: list[dict] = []

    def add_image(host: str, k: int) -> tuple[str, str]:
        i = len(payload_rows)
        fmt = "png" if i % 2 == 0 else "jpeg"
        side = image_side + int(rng.integers(0, 5))
        pixels = img.make_pixels(rng, side, side)
        data = img.encode_png(pixels) if fmt == "png" else img.encode_lossy(pixels)
        caption = (
            _UNICODE_CAPTIONS[i % len(_UNICODE_CAPTIONS)]
            if i % 11 == 3
            else " ".join(
                _CAPTION_WORDS[int(x)] for x in rng.integers(0, len(_CAPTION_WORDS), 5)
            )
        )
        image_id = f"img-{i:08d}"
        origin_rows.append(
            {
                "image_id": image_id,
                "pixels": pixels.tobytes(),
                "w": side,
                "h": side,
                "caption": caption,
            }
        )
        payload_rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": side,
                "h": side,
                "fmt": fmt,
                "caption": caption,
                "phash": img.phash64(img.decode_image(data, fmt)),
            }
        )
        ext = "png" if fmt == "png" else "jpg"
        url = f"https://{host}/media/{k}/i{i}.{ext}"
        content_rows.append(
            {
                "url": url,
                "status": 200,
                "content_type": ct.PNG if fmt == "png" else ct.JPEG,
                "image_id": image_id,
                "body_html": None,
                "redirect_to": None,
                "fail_5xx_n": 0,
                "busy_429_n": 0,
            }
        )
        return url, image_id

    for host, count in counts.items():
        seeds_rows.append({"url": f"https://{host}/", "priority": 10})
        if host == HOT_HOST:
            # a blacklisted SEED: must be acked away at claim time
            # (ReadFromQueue re-check), never fetched — publish-time
            # filtering alone cannot catch URLs already in the queue
            seeds_rows.append({"url": f"https://{host}/search/seeded", "priority": 5})
            # a duplicate seed (canon-equal): seed() must dedup it
            seeds_rows.append({"url": f"https://{host}/", "priority": 3})
        # the root page links to the first `branching` pages of the host
        all_hosts = list(counts)

        def links_for(k: int, count=count, host=host, all_hosts=all_hosts) -> list[str]:
            children = [
                _page_url(host, c)
                for c in range(k * branching + 1, min(k * branching + 1 + branching, count))
            ]
            parts = [f'<a href="{c}">child</a>' for c in children]
            if children:
                # duplicate + fragment-bearing duplicate (dedup pressure)
                parts.append(f'<a href="{children[0]}">dup</a>')
                parts.append(f'<a href="{children[0]}#section">frag-dup</a>')
                # relative form of a child (resolution pressure)
                rel = children[-1].split(host, 1)[1]
                parts.append(f'<a href="{rel}">rel</a>')
            if k % 5 == 1:
                other = all_hosts[(all_hosts.index(host) + 1) % len(all_hosts)]
                parts.append(f'<a href="https://{other}/s0/p0">cross</a>')
            if k % 7 == 2:
                parts.append(f'<a href="/s{k % 4}/p{k}?page=2">paginated</a>')
            if k % 7 == 3:
                parts.append(f'<a href="/s{k % 4}/p{k}?foo=bar&page=1">multiparam</a>')
            if k % 9 == 4:
                parts.append(f'<a href="/search/q{k}">blacklisted</a>')
            parts.append('<a href="mailto:contact@gov.uk">mail</a>')
            parts.append('<a href="https://external.example.org/x">ext</a>')
            if extra_links_per_page:
                targets = rng.integers(0, count, extra_links_per_page)
                parts.extend(
                    f'<a href="{_page_url(host, int(t))}">x{j}</a>'
                    for j, t in enumerate(targets)
                )
            if pad:
                parts.append(f"<p>{pad}</p>")
            return parts

        for k in range(count):
            url = _page_url(host, k)
            parts = links_for(k)
            for _ in range(images_per_page):
                img_url, _img_id = add_image(host, k)
                parts.append(f'<img src="{img_url}">')
            if k % 21 == 6:
                atom_url = f"https://{host}/feed/f{k}.atom"
                parts.append(f'<link href="{atom_url}" rel="alternate">')
                content_rows.append(
                    {
                        "url": atom_url,
                        "status": 200,
                        "content_type": ct.ATOM,  # NOT accepted → seen reset path
                        "image_id": None,
                        "body_html": None,
                        "redirect_to": None,
                        "fail_5xx_n": 0,
                        "busy_429_n": 0,
                    }
                )
            if k % 25 == 8:
                parts.append(f'<a href="/gone/g{k}">missing</a>')  # no content row → 404

            body = f"<html><head></head><body>{''.join(parts)}</body></html>"

            status, redirect_to, fail_n, busy_n = 200, None, 0, 0
            ctype = ct.HTML + "; charset=utf-8"
            if k % 23 == 5 and k + 1 < count:
                status, redirect_to = 301, _page_url(host, k + 1)
            elif k % 19 == 7:
                busy_n = 1  # one 429 then success (requeue, no Incr)
            elif k % 13 == 11:
                fail_n = 2  # two 5XXs then success (Incr per 5XX)
            elif k % 97 == 13:
                fail_n = 99  # permanent 5XX → retry exhaustion → dead
            elif k % 29 == 9:
                ctype = None  # 200 with MISSING Content-Type → reset path
            elif k % 31 == 12:
                ctype = "; charset=utf-8"  # parameter-only → unparsable → reset

            content_rows.append(
                {
                    "url": url,
                    "status": status,
                    "content_type": ctype,
                    "image_id": None,
                    "body_html": None if status != 200 else body,
                    "redirect_to": redirect_to,
                    "fail_5xx_n": fail_n,
                    "busy_429_n": busy_n,
                }
            )

        # host root page ("/" — trailing-slash index.html golden)
        root_links = "".join(
            f'<a href="{_page_url(host, c)}">r</a>' for c in range(min(branching, count))
        )
        content_rows.append(
            {
                "url": f"https://{host}/",
                "status": 200,
                "content_type": ct.HTML + "; charset=utf-8",
                "image_id": None,
                "body_html": f"<html><body>{root_links}</body></html>",
                "redirect_to": None,
                "fail_5xx_n": 0,
                "busy_429_n": 0,
            }
        )
        # pagination targets exist with empty bodies
        for k in range(count):
            if k % 7 == 2:
                content_rows.append(
                    {
                        "url": _page_url(host, k) + "?page=2",
                        "status": 200,
                        "content_type": ct.HTML,
                        "image_id": None,
                        "body_html": "<html><body></body></html>",
                        "redirect_to": None,
                        "fail_5xx_n": 0,
                        "busy_429_n": 0,
                    }
                )

    config = CrawlConfig(
        root_urls=tuple(f"https://{h}/" for h in counts),
        blacklist_paths=("/search", "/government/uploads"),
        max_crawl_retries=4,
        claim_limit=claim_limit,
        crawl_delay_by_host=(
            {HOT_HOST: crawl_delay_hot_host} if crawl_delay_hot_host > 0 else {}
        ),
    )
    return World(
        payload=pd.DataFrame(payload_rows),
        content=pd.DataFrame(content_rows).drop_duplicates(subset=["url"]),
        seeds=pd.DataFrame(seeds_rows),
        config=config,
        origin=pd.DataFrame(origin_rows),
    )


def world_to_spark(spark, world: World):
    """Materialize the pandas world as Spark DataFrames with typed schemas."""

    def mk(pdf, schema):
        if len(pdf) == 0:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(pdf, schema=schema)

    payload = mk(world.payload, PAYLOAD_SCHEMA)
    content = mk(world.content, CONTENT_SCHEMA)
    seeds = mk(world.seeds, SEEDS_SCHEMA)
    return payload, content, seeds


def world_to_parquet(spark, world: World, out_dir: str, partitions: int = 32):
    """Persist the world as parquet — the right shape for anything beyond
    toy scale: a driver-local relation re-serializes its full data from the
    driver on every action (a ~1GB content table cost ~30s of single-threaded
    JVM per batch before this), while a parquet scan is parallel, prunable,
    and pushdown-friendly."""
    import os

    payload, content, seeds = world_to_spark(spark, world)
    for name, df in (("payload", payload), ("content", content), ("seeds", seeds)):
        df.repartition(partitions).write.mode("overwrite").parquet(
            os.path.join(out_dir, name)
        )
    return read_world_parquet(spark, out_dir)


def read_world_parquet(spark, out_dir: str):
    import os

    return (
        spark.read.schema(PAYLOAD_SCHEMA).parquet(os.path.join(out_dir, "payload")),
        spark.read.schema(CONTENT_SCHEMA).parquet(os.path.join(out_dir, "content")),
        spark.read.schema(SEEDS_SCHEMA).parquet(os.path.join(out_dir, "seeds")),
    )
