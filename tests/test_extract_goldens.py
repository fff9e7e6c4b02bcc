"""ExtractURLs goldens ported from crawler_message_item_test.go:265-425."""

from __future__ import annotations

from govuk_crawler_worker_spark.functions.extract import extract_urls

ROOTS = (
    "www.gov.uk",
    "assets.digital.cabinet-office.gov.uk",
    "example.com",
)
BASE = "https://www.gov.uk/"


def ex(body, base=BASE, roots=ROOTS, blacklist=()):
    urls, err = extract_urls(body, base, roots, blacklist)
    assert not err
    return urls


def test_extracts_all_matching_root_urls():
    body = """
      <img src="https://assets.digital.cabinet-office.gov.uk/image.png">
      <a href="https://www.gov.uk/foo">Test</a>
      <script src="https://example.com/jq.js"></script>
      <script src="https://google.com/another.js"></script>
    """
    assert len(ex(body)) == 3  # google.com dropped (test.go:266-278)


def test_empty_body_empty_result():
    assert ex("") == []  # test.go:280-286


def test_extracts_a_href():
    assert "https://www.gov.uk/" in ex('<div><a href="https://www.gov.uk/"></a></div>')


def test_extracts_img_src():
    assert "https://www.gov.uk/image.png" in ex(
        '<div><img src="https://www.gov.uk/image.png" /></div>'
    )


def test_extracts_link_href():
    assert "https://www.gov.uk/favicon.ico" in ex(
        '<head><link rel="icon" href="https://www.gov.uk/favicon.ico"></head>'
    )


def test_extracts_script_src():
    assert "https://www.gov.uk/jq.js" in ex(
        '<head><script type="text/javascript" src="https://www.gov.uk/jq.js"></script></head>'
    )


def test_extracts_multiple():
    body = """<head>
      <script type="text/javascript" src="https://www.gov.uk/jq.js"></script>
      <link rel="icon" href="https://www.gov.uk/favicon.ico">
    </head>"""
    urls = ex(body)
    assert "https://www.gov.uk/jq.js" in urls
    assert "https://www.gov.uk/favicon.ico" in urls


def test_drops_non_root_hosts():
    assert (
        ex('<head><script src="https://www.foobar.com/jq.js"></script></head>') == []
    )  # test.go:366-373


def test_relative_resolution_and_mailto_drop():
    # test.go:375-388: relative resolved against response {scheme,host};
    # mailto: has no host → dropped by host filter
    urls = ex('<div><a href="/foo/bar">a</a><a href="mailto:c@d.com">b</a></div>')
    assert urls == ["https://www.gov.uk/foo/bar"]


def test_fragment_removed():
    urls = ex('<div><a href="https://www.gov.uk/#germany"></a></div>')
    assert "https://www.gov.uk/" in urls  # test.go:390-402


def test_blacklisted_paths_removed():
    urls, err = extract_urls(
        '<div><a href="/foo/bar">a</a><a href="/trade-tariff">b</a></div>',
        BASE,
        ROOTS,
        ("/trade-tariff",),
    )
    assert not err
    assert len(urls) == 1  # test.go:404-416


def test_unique_urls_only():
    urls = ex('<a href="https://www.gov.uk/foo">a</a><a href="https://www.gov.uk/foo">b</a>')
    assert urls == ["https://www.gov.uk/foo"]  # test.go:418-424


def test_host_filter_compares_with_port():
    # crawler_message_item.go:170-172 — port-bearing root only matches
    # port-bearing links
    urls, err = extract_urls(
        '<a href="https://h.example:8080/a">x</a><a href="https://h.example/b">y</a>',
        "https://h.example:8080/",
        ("h.example:8080",),
        (),
    )
    assert not err
    assert urls == ["https://h.example:8080/a"]


def test_output_is_sorted_deterministic():
    body = '<a href="/z">z</a><a href="/a">a</a><a href="/m">m</a>'
    assert ex(body) == [
        "https://www.gov.uk/a",
        "https://www.gov.uk/m",
        "https://www.gov.uk/z",
    ]
