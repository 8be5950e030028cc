"""HTTP surface (S4): sync extraction endpoints + corpus ingestion.
Mirrors the reference's API behaviors (`pdf-processor/src/api/
server.ts:60-86`, `handlers.ts:23-79`, `validation.ts:57-58`) without
needing a Spark session in the request path."""

import json
import random
import urllib.request
import urllib.error

import pytest

from extract_kit_spark.fixtures import _pdf_invoice, _receipt_page
from extract_kit_spark.serve import serve_background


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    pages_dir = str(tmp_path_factory.mktemp("srv") / "pages")
    srv, _t = serve_background(pages_dir)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, pages_dir
    srv.shutdown()


def _post(url: str, data: bytes):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_health(server):
    base, _ = server
    with urllib.request.urlopen(base + "/health") as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert "invoice" in body["profiles"]


def test_extract_invoice_pdf_endpoint(server):
    base, _ = server
    pdf = _pdf_invoice(random.Random("srv:1"))
    status, body = _post(base + "/api/v1/invoice", pdf)
    assert status == 200 and body["success"]
    inv = body["fields"]["invoice"]
    assert inv["invoice_number"].startswith("INV-")
    assert inv["total_amount"] > 0 and inv["line_items"]


def test_extract_auto_profile_html(server):
    base, _ = server
    html = _receipt_page(random.Random("srv:2"))
    status, body = _post(base + "/api/v1/extract?profile=auto", html)
    assert status == 200
    assert body["metadata"]["schema_used"] == "receipt"
    assert body["fields"]["receipt"]["total_amount"] > 0


def test_validation_errors(server):
    base, _ = server
    # empty body → 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/api/v1/extract", b"")
    assert ei.value.code == 400
    # bad profile → 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/api/v1/extract?profile=bogus", b"<html>x</html>")
    assert ei.value.code == 400
    # oversize Content-Length → 413 without reading the body
    req = urllib.request.Request(
        base + "/api/v1/extract", data=b"x", method="POST",
        headers={"Content-Length": str(200 * 1024 * 1024)})
    with pytest.raises(Exception):
        urllib.request.urlopen(req, timeout=5)


def _multipart_body(fields: dict[str, bytes],
                    file_field: tuple[str, str, bytes] | None = None):
    """Build a multipart/form-data body by hand (no requests lib)."""
    boundary = "ekspark-test-boundary-7f3a"
    parts = []
    for name, val in fields.items():
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f"name=\"{name}\"\r\n\r\n".encode() + val + b"\r\n")
    if file_field is not None:
        name, filename, data = file_field
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f"name=\"{name}\"; filename=\"{filename}\"\r\n"
            f"Content-Type: application/octet-stream\r\n\r\n".encode()
            + data + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


def _post_multipart(url: str, body: bytes, ctype: str):
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type": ctype})
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read()


def test_multipart_upload_with_debug_pretty_print(server):
    """Form-upload parity with handlers.ts:23-56 — the document rides
    the 'file' field, options ride string fields, and debug=true
    pretty-prints the JSON response (handlers.ts:73-76)."""
    base, _ = server
    pdf = _pdf_invoice(random.Random("srv:mp1"))
    body, ctype = _multipart_body(
        {"debug": b"true", "url": b"https://mp.example.com/inv.pdf"},
        file_field=("file", "inv.pdf", pdf))
    status, raw = _post_multipart(base + "/api/v1/invoice", body, ctype)
    assert status == 200
    assert raw.startswith(b"{\n  ")  # indent=2 serialization
    parsed = json.loads(raw)
    assert parsed["success"]
    assert parsed["url"] == "https://mp.example.com/inv.pdf"
    assert parsed["fields"]["invoice"]["invoice_number"].startswith(
        "INV-")
    # same request without debug → compact JSON
    body2, ctype2 = _multipart_body(
        {}, file_field=("file", "inv.pdf", pdf))
    _status, raw2 = _post_multipart(
        base + "/api/v1/invoice", body2, ctype2)
    assert not raw2.startswith(b"{\n")
    # url falls back to the uploaded filename
    assert json.loads(raw2)["url"] == "upload://inv.pdf"


def test_multipart_profile_field_and_missing_file(server):
    base, _ = server
    html = _receipt_page(random.Random("srv:mp2"))
    body, ctype = _multipart_body(
        {"profile": b"receipt"}, file_field=("file", "r.html", html))
    status, raw = _post_multipart(base + "/api/v1/extract", body, ctype)
    assert status == 200
    assert json.loads(raw)["metadata"]["schema_used"] == "receipt"
    # multipart body without a 'file' field → 400
    body_nf, ctype_nf = _multipart_body({"profile": b"receipt"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_multipart(base + "/api/v1/extract", body_nf, ctype_nf)
    assert ei.value.code == 400


def test_ingest_stamps_wallclock_or_explicit_ts(server):
    """Ingested rows must NOT carry an epoch placeholder timestamp:
    watermarked consumers (run_dedup_stream's 2h warc_ts watermark)
    would silently drop them as maximally late."""
    import datetime
    base, pages_dir = server
    html = _receipt_page(random.Random("srv:ts"))
    _post(base + "/api/v1/ingest?url=https://ts.example.com/now", html)
    _post(base + "/api/v1/ingest?url=https://ts.example.com/pinned"
          "&ts=2026-03-01T12:30:00", html)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/api/v1/ingest?url=https://ts.example.com/bad"
              "&ts=not-a-time", html)
    assert ei.value.code == 400
    import duckdb
    rows = dict(duckdb.sql(
        f"SELECT url, warc_ts FROM "
        f"read_parquet('{pages_dir}/*.parquet') "
        f"WHERE url LIKE 'https://ts.example.com/%'").fetchall())
    assert rows["https://ts.example.com/pinned"] == \
        datetime.datetime(2026, 3, 1, 12, 30)
    now_row = rows["https://ts.example.com/now"]
    assert abs((datetime.datetime.utcnow() - now_row)
               .total_seconds()) < 300


def test_ingest_appends_readable_page_rows(server):
    base, pages_dir = server
    html = _receipt_page(random.Random("srv:3"))
    for i in range(3):
        status, body = _post(
            base + f"/api/v1/ingest?url=https://up.example.com/{i}",
            html)
        assert status == 202 and body["queued"]
    import duckdb
    rows = duckdb.sql(
        f"SELECT url, octet_length(html) AS n FROM "
        f"read_parquet('{pages_dir}/*.parquet') "
        f"WHERE url LIKE 'https://up.example.com/%' "
        f"ORDER BY url").fetchall()
    assert [r[0] for r in rows] == [
        f"https://up.example.com/{i}" for i in range(3)]
    assert all(r[1] == len(html) for r in rows)


def test_ingest_then_streaming_catchup(spark, tmp_path_factory):
    """The upload→pipeline integration story: documents POSTed to
    /api/v1/ingest land as pages-table part files; the availableNow
    extraction stream picks up EXACTLY the new files on its next run
    (checkpointed file accounting), producing byte-stable extractions."""
    import os
    from extract_kit_spark.fixtures import gen_page
    from extract_kit_spark.streaming import run_extraction_stream

    pages_dir = str(tmp_path_factory.mktemp("ing") / "pages")
    out = str(tmp_path_factory.mktemp("ing") / "out")
    srv, _t = serve_background(pages_dir)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        for i in (3, 7):  # article fixtures, uploaded over HTTP
            row = gen_page(i)
            _post(base + "/api/v1/ingest?url=" + row["url"],
                  row["html"])
        run_extraction_stream(spark, pages_dir, out)
        got1 = spark.read.parquet(os.path.join(out, "data"))
        assert got1.count() == 2
        # second upload after the first drain
        row = gen_page(11)
        _post(base + "/api/v1/ingest?url=" + row["url"], row["html"])
        run_extraction_stream(spark, pages_dir, out)
        got2 = spark.read.parquet(os.path.join(out, "data"))
        assert got2.count() == 3
        # each url extracted exactly once; the broken upload (fixture
        # i=7) is quarantined, not dropped — 1-in-1-out holds across
        # the HTTP→table→stream path
        assert got2.select("url").distinct().count() == 3
        assert got2.where("status = 'ok'").count() == 2
        assert got2.where("status != 'ok'").count() == 1
    finally:
        srv.shutdown()
