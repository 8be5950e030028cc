"""Byte-identical extracted text per url vs committed goldens.

This is the correctness invariant of BASELINE.json ("byte-identical
extracted text per url") enforced directly: same fixture bytes →
byte-for-byte the same markdown, titles, and span offsets as the
committed golden file, in any execution order.
"""

import hashlib
import json
import os

import pytest

from extract_kit_spark.fixtures import gen_page
from extract_kit_spark.kernels.extract import extract_document

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden", "goldens.json")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_goldens_exist(goldens):
    assert len(goldens) >= 100
    kinds = {g["kind"] for g in goldens.values()}
    assert {"article", "table_page", "invoice_page", "receipt_page",
            "math_page", "docx_doc", "pdf_doc", "broken"} <= kinds


def test_byte_identical_text_per_url(goldens):
    for url, g in goldens.items():
        row = gen_page(g["i"])
        assert row["url"] == url
        res = extract_document(url, row["html"])
        got = hashlib.sha256(
            res["extracted_text"].encode("utf-8")).hexdigest()
        assert got == g["text_sha256"], (
            f"text drift for {url} (kind={g['kind']})")
        assert res["title"] == g["title"]
        assert res["status"] == g["status"]
        assert len(res["spans"]) == g["n_spans"]


def test_structured_fields_vs_goldens(goldens):
    import json as _json
    checked = 0
    for url, g in goldens.items():
        if "fields_json" not in g:
            continue
        row = gen_page(g["i"])
        res = extract_document(url, row["html"])
        got = _json.dumps(res["fields"], sort_keys=True)
        assert got == g["fields_json"], f"fields drift for {url}"
        checked += 1
    assert checked >= 30


def test_full_text_subset(goldens):
    checked = 0
    for url, g in goldens.items():
        if "full_text" not in g:
            continue
        row = gen_page(g["i"])
        res = extract_document(url, row["html"])
        assert res["extracted_text"] == g["full_text"]
        assert res["spans"] == g["spans"]
        checked += 1
    assert checked >= 10
