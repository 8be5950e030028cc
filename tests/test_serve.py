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
        f"read_parquet('{pages_dir}/*.parquet') ORDER BY url").fetchall()
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
