"""URL normalization / path mapping — the scalar function surface.

Pure-Python cores (unit-testable without Spark) + Arrow-vectorized pandas UDF
wrappers.  Semantics ported from the reference (behavior, not code):

* ``has_params``            — crawler_message_item.go:37-41
* ``rel_file_path``         — crawler_message_item.go:43-83 (goldens
  crawler_message_item_test.go:109-263)
* ``is_blacklisted_path``   — crawler_message_item.go:239-247
* host matching, two semantics: WITH port (crawler_message_item.go:170-172)
  vs WITHOUT port (crawler.go:154-185)
* publish ``page``-param rule — workflow.go:259-270
* RFC-3986 canonicalization + xxhash64 keying replaces the reference's
  ``prefix:md5(url)`` Redis keys (ttl_hash_set.go:202-204) per the north rule.

Hot-path note: everything here is driven through pandas UDFs (Arrow batches);
no row-at-a-time Python UDF is registered anywhere in the engine.  Spark-side
equivalents that stay fully JVM-side (F.parse_url, F.xxhash64, startswith) are
used in the plans where exact reference parity is not needed.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import quote, unquote, unquote_plus, urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

HTML = "text/html"

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Go regexp `.(html|htm)$` — the dot is intentionally UNescaped in the
# reference (crawler_message_item.go:64): any char followed by html/htm.
_HTMLISH_RE = re.compile(r".(html|htm)$")

# A '%' that is NOT followed by two hex digits — Go url.QueryUnescape's only
# error condition (url.EscapeError).
_BAD_PCT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")


# ---------------------------------------------------------------------------
# parsing helpers (Go net/url semantics where they differ from urllib)
# ---------------------------------------------------------------------------


def split_url(url: str):
    """urlsplit that mirrors Go url.Parse closely enough for our goldens.

    Returns (scheme, netloc_no_userinfo, raw_path, query, fragment) or None
    on a parse failure (Go url.Parse errors on control chars etc.).
    """
    if url is None:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    if any(ord(c) < 0x20 or c == "\x7f" for c in url):
        # Go url.Parse rejects ASCII control characters.
        return None
    netloc = parts.netloc.rsplit("@", 1)[-1]  # Go's URL.Host excludes userinfo
    return parts.scheme, netloc, parts.path, parts.query, parts.fragment


def decoded_path(url: str) -> str | None:
    """Path decoded ONCE, as Go url.Parse stores it in URL.Path."""
    parts = split_url(url)
    if parts is None:
        return None
    try:
        return unquote(parts[2], errors="strict")
    except UnicodeDecodeError:
        return unquote(parts[2])


def host_with_port(url: str) -> str:
    """URL.Host in Go terms: netloc incl. port, excl. userinfo.

    Used by extraction host filtering (crawler_message_item.go:170-172),
    which compares WITH the port.
    """
    parts = split_url(url)
    return "" if parts is None else parts[1]


def host_only(host: str) -> str:
    """Strip ``:port`` — the fetch-gate semantics (crawler.go:173-185)."""
    return host.split(":", 1)[0]


def go_path_clean(p: str) -> str:
    """Go ``path.Clean`` semantics (used by rel_file_path).

    posixpath.normpath matches Go for our cases except it preserves a leading
    ``//`` (POSIX quirk) where Go collapses it.
    """
    cleaned = posixpath.normpath(p) if p else "."
    if cleaned.startswith("//"):
        cleaned = "/" + cleaned.lstrip("/")
    return cleaned


# ---------------------------------------------------------------------------
# reference-parity scalar functions
# ---------------------------------------------------------------------------


def has_params(url: str) -> bool:
    """True iff URL is unparsable OR has a non-empty raw query
    (crawler_message_item.go:37-41: parse error counts as has-params,
    which makes WriteItemToDisk skip the write)."""
    parts = split_url(url)
    return True if parts is None else parts[3] != ""


def parse_media_type(content_type: str) -> str | None:
    """Go mime.ParseMediaType core: strip parameters (``; charset=...``),
    lowercase, error (None) on empty (crawler_response.go:50-57)."""
    if content_type is None:
        return None
    mime = content_type.split(";", 1)[0].strip().lower()
    if not mime or "/" not in mime:
        return None
    return mime


def rel_file_path(url: str, content_type: str) -> str | None:
    """Mirror path for a fetched URL — reference semantics
    (crawler_message_item.go:43-83):

    1. path decoded once by url.Parse, then QueryUnescape again (so
       double-encoded unicode paths come out fully decoded — golden
       crawler_message_item_test.go:181-192);
    2. host sans port (sans userinfo);
    3. HTML only: trailing ``/`` → ``+ index.html``; else if path does not
       match Go regex ``.(html|htm)$`` → ``+ .html``;
    4. Go path.Clean (kills ``../`` traversal), join host, strip leading /.

    Returns None where the reference returns an error (unparsable URL or
    unparsable content type → item rejected, workflow.go:167-171,194-199).
    """
    parts = split_url(url)
    if parts is None:
        return None
    _, netloc, raw_path, _, _ = parts
    once = decoded_path(url)
    if once is None:
        return None
    try:
        path = unquote_plus(once, errors="strict")
    except UnicodeDecodeError:
        path = unquote_plus(once)

    host = host_only(netloc)

    mime = parse_media_type(content_type)
    if mime is None:
        return None
    if mime == HTML:
        # NB: a truly empty path gets ".html" (→ "host/.html"), matching the
        # Go switch order exactly; only a trailing "/" earns index.html.
        if path.endswith("/"):
            path += "index.html"
        elif not _HTMLISH_RE.search(path):
            path += ".html"

    path = go_path_clean(path)
    joined = go_path_clean(host + "/" + path) if path != "." else host
    return joined.lstrip("/")


def is_blacklisted_path(path: str, blacklist: tuple[str, ...]) -> bool:
    """Prefix match, not regex (crawler_message_item.go:239-247)."""
    return any(path.startswith(b) for b in blacklist)


def is_blacklisted_url(url: str, blacklist: tuple[str, ...]) -> bool:
    """IsBlacklisted: malformed URL → False with a warning
    (crawler_message_item.go:130-137)."""
    path = decoded_path(url)
    if path is None:
        return False
    return is_blacklisted_path(path, blacklist)


def is_allowed_host(url: str, root_hosts_no_port: tuple[str, ...]) -> bool:
    """Fetch gate: compare host WITHOUT port (crawler.go:154-169)."""
    parts = split_url(url)
    if parts is None:
        return False
    return host_only(parts[1]) in root_hosts_no_port


def publish_allowed_by_params(url: str) -> bool:
    """The PublishURLs param gate (workflow.go:259-270).

    No query → publish.  Unparsable query → skip.  Query whose only key is
    ``page`` → publish (the URL keeps its param).  Any other remaining key →
    skip.  Uses Go url.ParseQuery semantics: keys without ``=`` still count,
    and an invalid percent-escape (``%`` not followed by two hex digits) in a
    KEY **or VALUE** errors the whole parse — so ``?page=%zz`` is skipped
    (workflow.go:260-264).  Note Go's QueryUnescape does NOT error on
    non-UTF-8 bytes like ``%ff``, so neither do we.
    """
    parts = split_url(url)
    if parts is None:
        return False
    query = parts[3]
    if query == "":
        return True
    remaining = []
    for piece in query.split("&"):
        if not piece:
            continue
        key, _, value = piece.partition("=")
        if _BAD_PCT_RE.search(key) or _BAD_PCT_RE.search(value):
            return False  # ParseQuery error → skip (workflow.go:261-264)
        # decode non-strict: Go keeps raw bytes; a non-UTF-8 key can never
        # equal "page", and 'replace' preserves that inequality.
        key = unquote_plus(key, errors="replace")
        if key != "page":
            remaining.append(key)
    return not remaining


# ---------------------------------------------------------------------------
# RFC-3986 canonicalization (seen-set key) — north-rule addition
# ---------------------------------------------------------------------------


def canonicalize(url: str) -> str | None:
    """Canonical URL string used as the seen-set identity.

    Conservative RFC-3986 normalization: lowercase scheme+host, strip default
    port, strip fragment, empty path → ``/``.  Query is preserved verbatim
    (the reference treats ``?page=N`` URLs as distinct frontier entries,
    workflow.go:265-269, so query must stay significant).  The seen key in
    the reference is ``prefix:md5(url)`` (ttl_hash_set.go:202-204); we key on
    ``xxhash64(canonicalize(url))`` per the north rule, with the exact string
    kept alongside so membership decisions are never hash-only.
    """
    parts = split_url(url)
    if parts is None:
        return None
    scheme, netloc, path, query, _frag = parts
    scheme = scheme.lower()
    host = host_only(netloc).lower()
    port = netloc.split(":", 1)[1] if ":" in netloc else ""
    if port and _DEFAULT_PORTS.get(scheme) != port:
        host = f"{host}:{port}"
    if path == "":
        path = "/"
    out = f"{scheme}://{host}{path}" if scheme else f"//{host}{path}" if host else path
    if query:
        out += f"?{query}"
    return out


def resolve_reference(base_scheme: str, base_host: str, href: str) -> str | None:
    """Go ``baseURL.ResolveReference`` against a {scheme, host} base
    (crawler_message_item.go:113-117).  Absolute hrefs pass through;
    scheme-only hrefs (mailto:) pass through unchanged (and are then dropped
    by the host filter); relative paths resolve against the bare authority.
    """
    try:
        ref = urlsplit(href)
    except ValueError:
        return None
    if ref.scheme and ref.netloc:
        return href
    if ref.scheme and not ref.netloc:
        # mailto:, javascript:, data: — opaque; Go keeps them as-is.
        return href
    if ref.netloc:  # protocol-relative //host/path
        out = f"{base_scheme}:{href}"
        return out
    path = ref.path
    if not path.startswith("/"):
        # base path is empty in the reference (scheme+host only), so any
        # relative path resolves from root.
        path = "/" + path if path else ""
    out = f"{base_scheme}://{base_host}{path}"
    if ref.query:
        out += f"?{ref.query}"
    if ref.fragment:
        out += f"#{ref.fragment}"
    return out


def strip_fragment(url: str) -> str:
    """removeFragmentFromURLs (crawler_message_item.go:160-165)."""
    return url.split("#", 1)[0]


# ---------------------------------------------------------------------------
# Arrow-vectorized pandas UDF wrappers (the only way these run on executors)
# ---------------------------------------------------------------------------


def _series_map(fn):
    def wrapped(s: pd.Series, *extra) -> pd.Series:
        return s.map(lambda v: fn(v, *extra) if v is not None else None)

    return wrapped


def make_udfs(config):
    """Build the pandas UDFs bound to a (broadcast-by-closure) config."""
    blacklist = tuple(config.blacklist_paths)
    roots_no_port = tuple(config.root_hosts_no_port)

    @F.pandas_udf(StringType())
    def canonicalize_udf(urls: pd.Series) -> pd.Series:
        return _series_map(canonicalize)(urls)

    @F.pandas_udf(StringType())
    def rel_file_path_udf(urls: pd.Series, ctypes: pd.Series) -> pd.Series:
        return pd.Series(
            [
                rel_file_path(u, c) if u is not None else None
                for u, c in zip(urls, ctypes)
            ]
        )

    @F.pandas_udf(BooleanType())
    def is_blacklisted_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: is_blacklisted_url(u, blacklist) if u else False)

    @F.pandas_udf(BooleanType())
    def has_params_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: has_params(u) if u is not None else True)

    @F.pandas_udf(BooleanType())
    def publish_param_gate_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: publish_allowed_by_params(u) if u else False)

    @F.pandas_udf(BooleanType())
    def allowed_host_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: is_allowed_host(u, roots_no_port) if u else False)

    @F.pandas_udf(StringType())
    def host_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: host_only(host_with_port(u)) if u else None)

    return {
        "canonicalize": canonicalize_udf,
        "rel_file_path": rel_file_path_udf,
        "is_blacklisted": is_blacklisted_udf,
        "has_params": has_params_udf,
        "publish_param_gate": publish_param_gate_udf,
        "allowed_host": allowed_host_udf,
        "host": host_udf,
    }
