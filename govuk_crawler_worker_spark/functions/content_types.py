"""Content-type whitelist + MIME parsing.

Reference: the fixed 17-type accept list (http_crawler/crawler_response.go:8-48)
— ATOM is deliberately NOT accepted (crawler_response_test.go:35-38) — and
``ParseContentType`` which strips ``; charset=...`` parameters
(crawler_response.go:50-57).

Spark realization: `parse_media_type` stays a pure function for the pandas
UDF path; the hot path uses pure column expressions (`mime_col`) so the check
runs JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from govuk_crawler_worker_spark.functions.urlnorm import parse_media_type  # noqa: F401

ATOM = "application/atom+xml"
CSS = "text/css"
CSV = "text/csv"
DOCX = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
GIF = "image/gif"
HTML = "text/html"
ICO = "image/x-icon"
ICS = "text/calendar"
JAVASCRIPT = "application/javascript"
JPEG = "image/jpeg"
JSON = "application/json"
ODP = "application/vnd.oasis.opendocument.presentation"
ODS = "application/vnd.oasis.opendocument.spreadsheet"
ODT = "application/vnd.oasis.opendocument.text"
PDF = "application/pdf"
PNG = "image/png"
XLS = "application/vnd.ms-excel"
XLSX = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"

ACCEPTED_CONTENT_TYPES: tuple[str, ...] = (
    CSS, CSV, DOCX, GIF, HTML, ICO, ICS, JAVASCRIPT,
    JPEG, JSON, ODP, ODS, ODT, PDF, PNG, XLS, XLSX,
)

IMAGE_CONTENT_TYPES: tuple[str, ...] = (GIF, ICO, JPEG, PNG)


def accepted_content_type(content_type: str | None) -> bool:
    """AcceptedContentType (crawler_response.go:35-48): parse failure → False."""
    mime = parse_media_type(content_type)
    return mime in ACCEPTED_CONTENT_TYPES


def mime_col(content_type: Column) -> Column:
    """Columnar ParseContentType: split on ';', trim, lower — JVM-side.

    Empty/parameter-only strings map to NULL (the reference's error case).
    """
    mime = F.lower(F.trim(F.split(content_type, ";").getItem(0)))
    return F.when(mime.contains("/"), mime)


def is_accepted_col(content_type: Column) -> Column:
    return mime_col(content_type).isin(*ACCEPTED_CONTENT_TYPES)


def is_html_col(content_type: Column) -> Column:
    return mime_col(content_type) == HTML
