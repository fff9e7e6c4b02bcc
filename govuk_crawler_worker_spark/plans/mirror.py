"""Mirror file-tree export — the WriteItemToDisk sink materialized.

Reference: ``workflow.go:173-189`` writes each fetched item to
``MIRROR_ROOT/<host>/<path>`` (the rel_path rules — trailing-slash
index.html, ``.html`` suffixing, path.Clean — live in
functions/urlnorm.rel_file_path and are golden-tested there).

Spark realization: an opt-in pass-through ``mapInPandas`` stage inside the
drain — rows flow through unchanged while eligible ones (fetch routes,
param-free, rel_path resolved) are written by the EXECUTORS, in parallel,
under the shared mirror root.  Two hook points:

* the routed pass (HTML bodies, before the body column is dropped);
* the fetched stage (image/binary payload bytes, after the payload join).

Writes are idempotent (tmp + atomic rename to a content-addressed final
path), so Spark task retries and batch re-execution cannot tear or
duplicate files — same guarantee the reference gets from overwriting
regular files.  On a real cluster ``root`` is a shared filesystem mount
(the reference's disk mirror assumption).
"""

from __future__ import annotations

import os
import uuid


def _write_atomic(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def make_body_writer(root: str):
    """Pass-through mapInPandas stage writing HTML/text bodies for rows on a
    fetch route with no params and a resolved rel_path (the reference's
    WriteItemToDisk eligibility, workflow.go:160-171)."""

    def write_rows(pdfs):
        for pdf in pdfs:
            mask = (
                pdf["route"].isin(("fetch_html", "fetch_other"))
                & ~pdf["has_params"].fillna(True)
                & pdf["rel_path"].notna()
                & pdf["body"].notna()
            )
            for rel, body in zip(pdf.loc[mask, "rel_path"], pdf.loc[mask, "body"]):
                data = body.encode("utf-8") if isinstance(body, str) else bytes(body)
                _write_atomic(os.path.join(root, rel), data)
            yield pdf

    return write_rows


def make_payload_writer(root: str):
    """Pass-through mapInPandas stage writing binary payload bytes (images)
    after the payload join — rows without bytes (HTML, already written by
    the body writer) pass through untouched."""

    def write_rows(pdfs):
        for pdf in pdfs:
            mask = pdf["rel_path"].notna() & pdf["bytes"].notna()
            for rel, data in zip(pdf.loc[mask, "rel_path"], pdf.loc[mask, "bytes"]):
                _write_atomic(os.path.join(root, rel), bytes(data))
            yield pdf

    return write_rows
