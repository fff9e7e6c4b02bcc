"""Outlink extraction from HTML bodies.

Reference: ``CrawlerMessageItem.ExtractURLs`` (crawler_message_item.go:85-128)
— goquery selections over the (element, attr) matrix {a/href, img/src,
link/href, script/src} (:93-98, :223-237); per pass: parse (first parse error
aborts the whole page, :139-152), resolve against the {scheme, host} of the
RESPONSE URL (:113-117), keep only hosts equal (WITH port) to an allowed root
host (:167-175), drop blacklisted paths (:177-181), strip #fragment
(:160-165); final dedup by full URL string (:183-195).

The reference's final dedup iterates a Go map — nondeterministic order.  We
define the canonical output order as **sorted unique** (SURVEY.md §7) so the
whole engine is deterministic and comparable.

Spark realization: a vectorized pandas UDF returning
struct<urls: array<string>, error: boolean> followed by ``explode``;
Catalyst fuses the downstream filters into the same stage.  In the synthetic
table-driven world the same semantics are also available as an equi-join
against the link_graph table (plans/fetch.py) — both paths are tested.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from govuk_crawler_worker_spark.functions.urlnorm import (
    decoded_path,
    host_with_port,
    is_blacklisted_path,
    resolve_reference,
    split_url,
    strip_fragment,
)

# (element, attribute) matrix, in reference order (crawler_message_item.go:93-98)
URL_ELEMENT_MATCHES: tuple[tuple[str, str], ...] = (
    ("a", "href"),
    ("img", "src"),
    ("link", "href"),
    ("script", "src"),
)


class _AttrCollector(HTMLParser):
    """Collect attr values for the matrix tags in document order.

    Mirrors goquery's Find(element).Each + Attr: a matching tag MISSING the
    attribute still contributes an empty string (goquery Attr returns ""),
    which after TrimSpace+parse+resolve yields the bare base URL — we keep
    that quirk for parity (crawler_message_item.go:223-237).
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.found: dict[str, list[str]] = {el: [] for el, _ in URL_ELEMENT_MATCHES}

    def handle_starttag(self, tag, attrs):
        if tag in self.found:
            wanted = dict(URL_ELEMENT_MATCHES)[tag]
            value = dict(attrs).get(wanted) or ""
            self.found[tag].append(value.strip())

    handle_startendtag = handle_starttag


def extract_urls(
    body: str,
    response_url: str,
    root_hosts_with_port: tuple[str, ...],
    blacklist_paths: tuple[str, ...],
) -> tuple[list[str], bool]:
    """Pure core.  Returns (sorted unique URLs, error_flag).

    error_flag=True mirrors the reference's reject-on-extract-failure
    (workflow.go:230-235): any unparsable href aborts the page.
    """
    base = split_url(response_url)
    if base is None:
        return [], True
    base_scheme, base_host = base[0], base[1]

    parser = _AttrCollector()
    try:
        parser.feed(body or "")
        parser.close()
    except Exception:
        return [], True

    roots = set(root_hosts_with_port)
    out: list[str] = []
    for element, _attr in URL_ELEMENT_MATCHES:
        for href in parser.found[element]:
            resolved = resolve_reference(base_scheme, base_host, href)
            if resolved is None:
                return [], True  # parse error aborts whole page
            if host_with_port(resolved) not in roots:
                continue  # host filter compares WITH port (:170-172)
            path = decoded_path(resolved)
            if path is not None and is_blacklisted_path(path, blacklist_paths):
                continue
            out.append(strip_fragment(resolved))
    return sorted(set(out)), False


EXTRACT_RESULT_TYPE = StructType(
    [
        StructField("urls", ArrayType(StringType()), True),
        StructField("error", BooleanType(), False),
    ]
)


def make_extract_udf(config):
    """Vectorized extraction UDF bound to the crawl config."""
    roots = tuple(config.root_hosts_with_port)
    blacklist = tuple(config.blacklist_paths)

    @F.pandas_udf(EXTRACT_RESULT_TYPE)
    def extract_links_udf(bodies: pd.Series, urls: pd.Series) -> pd.DataFrame:
        results = [
            extract_urls(b if isinstance(b, str) else (b or b"").decode("utf-8", "replace"),
                         u, roots, blacklist)
            for b, u in zip(bodies, urls)
        ]
        return pd.DataFrame(
            {"urls": [r[0] for r in results], "error": [r[1] for r in results]}
        )

    return extract_links_udf
