"""The engine's query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable, each with (where SQL-expressible)
an exact DuckDB oracle twin in ORACLES. The driver compares row count,
schema, and order-insensitive value hashes — so every computed column is
aliased identically on both sides, doubles are rounded identically, and
integer widths are cast to match.

Extraction queries run over the deterministic synthetic pages table
(fixtures.py), materialized once to a shared path that BOTH engines
read; dedup/similarity/text/multimodal/relational queries run over the
driver-provided documents/embeddings/events/TPC-H-ish tables.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from .fixtures import write_pages_dir
from .ops import lm as lm_ops
from .ops import (corpus, contamination, dedup, multimodal, pii,
                  similarity, textstats, weburl)

# -- shared pages table (a DIRECTORY of part files so the no-shuffle
# scan parallelizes; the DuckDB oracle reads the same files via glob) --------

N_PAGES = 1200
PAGES_PATH = f"/tmp/ekspark_pages_v8_{N_PAGES}"  # v8: +lzw85/rle filter variants
PAGES_GLOB = f"{PAGES_PATH}/*.parquet"


def ensure_pages(path: str = PAGES_PATH, n: int = N_PAGES) -> str:
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_pages_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


# -- Zipf documents corpus (r4): open ~4000-word vocabulary with
# power-law document frequencies, so text-analysis queries run at
# PRODUCTION thresholds (tfidf max_df 0.5) and language-ID is a real
# prediction. The driver's `documents` table (31-word closed
# vocabulary, read-only) stays the input of the original ts_* queries.
N_ZIPF_DOCS = 4000
ZIPF_DOCS_PATH = f"/tmp/ekspark_zipfdocs_v1_{N_ZIPF_DOCS}"
ZIPF_DOCS_GLOB = f"{ZIPF_DOCS_PATH}/*.parquet"


def ensure_zipf_docs(path: str = ZIPF_DOCS_PATH,
                     n: int = N_ZIPF_DOCS) -> str:
    from .fixtures import write_zipf_docs_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_zipf_docs_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


# -- WARC archive fixture (r4): the pages table re-materialized as a
# directory of member-per-record .warc.gz files (ISO 28500 / the
# Common Crawl layout) by the single-process writer in warc.py — so
# the Spark WARC SOURCE is oracled against the parquet table the
# archive was independently written from, not against itself.
WARC_PATH = f"/tmp/ekspark_warc_v1_{N_PAGES}"


def ensure_warc(path: str = WARC_PATH, n: int = N_PAGES) -> str:
    import datetime as _dt
    from . import warc as _warc
    from .fixtures import gen_pages
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        epoch = _dt.datetime(1970, 1, 1)
        rows = []
        for r in gen_pages(n):
            td = r["warc_ts"] - epoch
            rows.append({
                "url": r["url"],
                # integer micros from timedelta components — no float
                "ts_micros": (td.days * 86_400 + td.seconds) * 1_000_000
                             + td.microseconds,
                "payload": r["html"],
            })
        _warc.write_warc_local(rows, tmp, records_per_file=300)
        os.replace(tmp, path)
    return path


# -- HTML-metadata twin corpus (r4): html pages with canonical /
# og:title / robots-noindex head tags + "?ref=alt" duplicate-variant
# rows (fixtures.gen_meta_pages) -----------------------------------
META_PAGES_PATH = f"/tmp/ekspark_metapages_v1_{N_PAGES}"
META_PAGES_GLOB = f"{META_PAGES_PATH}/*.parquet"


def ensure_meta_pages(path: str = META_PAGES_PATH,
                      n: int = N_PAGES) -> str:
    from .fixtures import write_meta_pages_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_meta_pages_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


# -- robots.txt fixture (r4): one deterministic robots.txt per corpus
# domain (fixtures.gen_robots_row) ----------------------------------
# v3: +RFC 9309 cases — wildcard/'$' rules, named-'EkBot' groups,
# stacked UA headers, decoy groups for other crawlers
# v4: +global Sitemap: directives (60% of domains, some with two)
ROBOTS_PATH = "/tmp/ekspark_robots_v4.parquet"


def ensure_robots(path: str = ROBOTS_PATH) -> str:
    from .fixtures import write_robots_parquet
    if not os.path.exists(path):
        tmp = path + ".tmp"
        write_robots_parquet(tmp)
        os.replace(tmp, path)
    return path


# -- sitemap fixture (r4): one urlset per domain — ≤5 real page urls
# + 2 novel ones; lastmod months cycle through 12 so known-but-stale
# rows exist (fixtures.gen_sitemaps) -------------------------------
SITEMAPS_PATH = "/tmp/ekspark_sitemaps_v1.parquet"


def ensure_sitemaps(path: str = SITEMAPS_PATH) -> str:
    from .fixtures import write_sitemaps_parquet
    if not os.path.exists(path):
        tmp = path + ".tmp"
        write_sitemaps_parquet(tmp, N_PAGES)
        os.replace(tmp, path)
    return path


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read_parallel(spark: SparkSession, path: str) -> DataFrame:
    """Tiny-scan fan-out guard: a single-row-group parquet file scans
    as ONE task, serializing every downstream map stage onto one core.
    When the natural split count is below the session's parallelism,
    round-robin repartition (the payload is by definition small — one
    row group); at real scale the file splits already provide
    parallelism and this is a no-op."""
    df = spark.read.parquet(path)
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(p, 32):
        df = df.repartition(min(p, 32))
    return df


def _ensure_importable(spark: SparkSession) -> None:
    """Module-level UDF functions pickle BY REFERENCE, so executor
    Python workers must be able to import extract_kit_spark. When the
    hosting process didn't put the repo on the workers' path (e.g. a
    driver running from another cwd), ship the package via addPyFile —
    the same mechanism spark-submit --py-files uses."""
    if getattr(spark, "_ekspark_pyfiles", False):
        return
    try:
        import extract_kit_spark  # noqa: F401
        probe = spark.sparkContext.parallelize([0], 1).map(
            lambda _: __import__("extract_kit_spark").__name__)
        probe.collect()
        spark._ekspark_pyfiles = True
        return
    except Exception:
        pass
    import hashlib
    import zipfile
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                sources.append(os.path.join(root, fn))
    digest = hashlib.md5()
    for full in sorted(sources):
        # hash the repo-relative path too: a module renamed/moved
        # without byte changes must produce a new digest, or a stale
        # cached zip with the old layout would be reused
        digest.update(os.path.relpath(full, pkg_dir).encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    # content-addressed zip name: edited source never collides with a
    # stale cached archive from an earlier run
    zip_path = f"/tmp/ekspark_pkg_{digest.hexdigest()[:12]}.zip"
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for full in sources:
                rel = os.path.join("extract_kit_spark",
                                   os.path.relpath(full, pkg_dir))
                z.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    spark._ekspark_pyfiles = True


# magic prefixes as hex (cross-engine comparable via hex(substring(...)))
_HEX_PDF = b"%PDF-".hex().upper()
_HEX_ZIP = b"PK\x03\x04".hex().upper()
_HEX_PNG = b"\x89PNG".hex().upper()
_HEX_HTML = b"<!DO".hex().upper()


# -- extraction queries -------------------------------------------------------

_FLAGSHIP_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("doc_kind", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("text_len", T.LongType()),
    T.StructField("n_spans", T.LongType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("text_sha256", T.StringType()),
])


def _extract_flagship_batches(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    import hashlib
    from .kernels.extract import extract_document
    for pdf in batches:
        rows = []
        for url, payload in zip(pdf["url"].tolist(),
                                pdf["html"].tolist()):
            r = extract_document(url, payload)
            rows.append({
                "url": url,
                "doc_kind": r["doc_kind"],
                "status": r["status"],
                "title": r["title"],
                "text_len": len(r["extracted_text"]),
                "n_spans": len(r["spans"]),
                "ok": r["validation"]["success"],
                # the north-rule invariant (byte-identical extracted
                # text per url), carried as a checkable column
                "text_sha256": hashlib.sha256(
                    r["extracted_text"].encode("utf-8")).hexdigest(),
            })
        yield pd.DataFrame(rows)


def q_ext_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extraction pipeline (detect → parse → boilerplate →
    serialize → validate) over the synthetic pages table — the
    no-shuffle scan plan (scan → mapInPandas), same dataflow as
    pipeline.run_extraction_scan."""
    _ensure_importable(spark)
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH).select("url", "html")
    return pages.mapInPandas(_extract_flagship_batches,
                             schema=_FLAGSHIP_SCHEMA)


# Flagship oracle: the committed kernel-computed golden registry for all
# N_PAGES fixture pages (tests/golden/flagship_1200.json, regenerated by
# tests/gen_goldens.py WITHOUT Spark — a single-process loop over
# gen_page → extract_document). DuckDB reads it directly, so the driver
# gets a hard rows/schema/hash signal on the full pipeline, including
# the byte-identity of extracted text via text_sha256.
_FLAGSHIP_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "flagship_1200.json")

_ORACLE_FLAGSHIP = f"""
SELECT url, doc_kind, status, title,
       text_len::BIGINT AS text_len, n_spans::BIGINT AS n_spans,
       ok, text_sha256
FROM read_json('{_FLAGSHIP_GOLDEN}', format='array')
"""

_ORACLE_STATUS_COUNTS = f"""
SELECT doc_kind, status, count(*)::BIGINT AS n,
       sum(text_len)::BIGINT AS total_text_chars
FROM read_json('{_FLAGSHIP_GOLDEN}', format='array')
GROUP BY doc_kind, status
"""


# Hand-written goldens (tests/golden/handpinned/): expected texts
# composed BY HAND from the fixtures' raw source bytes following the
# documented serialization rules — no code generated them. The oracle
# reads the committed files directly, so the driver's hash compare
# becomes an INDEPENDENT check that the kernel extracts the right
# bytes, not merely that Spark reproduces the kernel.
_HANDPINNED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "handpinned")

_HANDPINNED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("extracted_text", T.StringType()),
])


def _extract_text_batches(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    from .kernels.extract import extract_document
    for pdf in batches:
        yield pd.DataFrame({
            "url": pdf["url"],
            "extracted_text": [
                extract_document(u, p)["extracted_text"]
                for u, p in zip(pdf["url"].tolist(),
                                pdf["html"].tolist())]})


def q_ext_flagship_handpinned(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Full extraction restricted to the hand-pinned urls, returning
    the raw extracted text for byte-comparison against the hand-written
    expected files (one per fixture kind / PDF writer variant)."""
    import json as _json
    _ensure_importable(spark)
    ensure_pages()
    with open(os.path.join(_HANDPINNED_DIR, "urls.json")) as fh:
        urls = [m["url"] for m in _json.load(fh)]
    pages = (spark.read.parquet(PAGES_PATH)
             .where(F.col("url").isin(urls))
             .select("url", "html"))
    return pages.mapInPandas(_extract_text_batches,
                             schema=_HANDPINNED_SCHEMA)


_ORACLE_HANDPINNED = f"""
SELECT m.url, t.content AS extracted_text
FROM read_json('{_HANDPINNED_DIR}/urls.json', format='array') m
JOIN read_text('{_HANDPINNED_DIR}/*.md') t
  ON ends_with(t.filename, '/' || m.file)
"""


def _pages_with_kind(spark: SparkSession) -> DataFrame:
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH)
    h5 = F.hex(F.substring("html", 1, 5))
    kind = (F.when(F.length("html") == 0, "empty")
            .when(h5 == _HEX_PDF, "pdf")
            .when(h5.startswith(_HEX_ZIP), "zip")
            .when(h5.startswith(_HEX_PNG), "png")
            .when(h5.startswith(_HEX_HTML), "html")
            .otherwise("other"))
    return pages.withColumn("kind", kind)


def q_ext_detect_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized magic-byte sniff (D1) as plan-side expressions —
    whole-stage codegen, no Python."""
    return _pages_with_kind(spark).select("url", "kind")


_ORACLE_DETECT = f"""
SELECT url,
       CASE WHEN octet_length(html) = 0 THEN 'empty'
            WHEN starts_with(hex(html), '{_HEX_PDF}') THEN 'pdf'
            WHEN starts_with(hex(html), '{_HEX_ZIP}') THEN 'zip'
            WHEN starts_with(hex(html), '{_HEX_PNG}') THEN 'png'
            WHEN starts_with(hex(html), '{_HEX_HTML}') THEN 'html'
            ELSE 'other' END AS kind
FROM read_parquet('{PAGES_GLOB}')
"""


def q_ext_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title rule O6's regexp half over raw html (plan-side regexp —
    the kernel path is validated separately against goldens)."""
    df = _pages_with_kind(spark).where(F.col("kind") == "html")
    s = F.decode(F.col("html"), "UTF-8")
    return df.select(
        "url",
        F.regexp_extract(s, "<h1>([^<]*)</h1>", 1).alias("h1_title"),
        F.regexp_extract(s, "<title>([^<]*)</title>", 1)
        .alias("head_title"))


_ORACLE_TITLE = f"""
WITH p AS (SELECT url, decode(html) AS s FROM
           read_parquet('{PAGES_GLOB}')
           WHERE starts_with(hex(html), '{_HEX_HTML}'))
SELECT url,
       coalesce(regexp_extract(s, '<h1>([^<]*)</h1>', 1), '')
           AS h1_title,
       coalesce(regexp_extract(s, '<title>([^<]*)</title>', 1), '')
           AS head_title
FROM p
"""


def q_ext_link_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-density raw signals (O16/§2.7) as pure expressions:
    anchor count and html length per page."""
    df = _pages_with_kind(spark).where(F.col("kind") == "html")
    s = F.decode(F.col("html"), "UTF-8")
    n_links = ((F.length(s) - F.length(F.regexp_replace(
        s, "<a href", ""))) / F.lit(7)).cast("long")
    return df.select("url", n_links.alias("n_links"),
                     F.length(s).alias("html_chars"))


_ORACLE_LINK_STATS = f"""
WITH p AS (SELECT url, decode(html) AS s FROM
           read_parquet('{PAGES_GLOB}')
           WHERE starts_with(hex(html), '{_HEX_HTML}'))
SELECT url,
       ((length(s) - length(replace(s, '<a href', ''))) // 7)::BIGINT
           AS n_links,
       length(s)::BIGINT AS html_chars
FROM p
"""


def q_ext_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine/metrics rollup (the reference's I6 fold as a real
    aggregation): rows per (doc_kind, status)."""
    return (q_ext_flagship(spark, sf_dir)
            .groupBy("doc_kind", "status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("text_len")).alias("total_text_chars")))


_INVOICE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("invoice_number", T.StringType()),
    T.StructField("invoice_date", T.StringType()),
    T.StructField("currency", T.StringType()),
    T.StructField("total_amount", T.DoubleType()),
    T.StructField("n_line_items", T.IntegerType()),
    T.StructField("sum_line_totals", T.DoubleType()),
    T.StructField("coherent", T.BooleanType()),
])


def _extract_invoice_batches(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    from .kernels.extract import extract_document
    for pdf in batches:
        rows = []
        for url, payload in zip(pdf["url"].tolist(),
                                pdf["html"].tolist()):
            r = extract_document(url, payload, profile="invoice")
            inv = r["fields"]["invoice"] or {}
            items = inv.get("line_items") or []
            s = round(sum(li["line_total"] or 0.0 for li in items), 2)
            total = inv.get("total_amount")
            rows.append({
                "url": url,
                "invoice_number": inv.get("invoice_number"),
                "invoice_date": inv.get("invoice_date"),
                "currency": inv.get("currency"),
                "total_amount": total,
                "n_line_items": len(items),
                "sum_line_totals": s,
                "coherent": (total is not None
                             and abs(s - total) <= 0.01),
            })
        yield pd.DataFrame(rows)


def q_ext_invoice_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured invoice extraction (the Q6 analogue's typed output):
    the KERNEL parses the DOM and fills ComprehensiveInvoiceSchema
    fields; the oracle re-derives the same fields with independent SQL
    regexes over the raw html — a true dual implementation of the
    extraction semantics, incl. the V4 coherence check."""
    _ensure_importable(spark)
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH)
    s = F.decode(F.col("html"), "UTF-8")
    invoices = (_pages_with_kind(spark)
                .where((F.col("kind") == "html")
                       & s.contains("Invoice Number:"))
                .select("url", "html"))
    return invoices.mapInPandas(_extract_invoice_batches,
                                schema=_INVOICE_SCHEMA)


_ORACLE_INVOICE = f"""
WITH p AS (
  SELECT url, decode(html) AS s
  FROM read_parquet('{PAGES_GLOB}')
  WHERE starts_with(hex(html), '{_HEX_HTML}')
    AND contains(decode(html), 'Invoice Number:')),
f AS (
  SELECT url,
         regexp_extract(s, 'Invoice Number: (\\S+?)<', 1)
             AS invoice_number,
         regexp_extract(s, 'Invoice Date: ([0-9-]+)', 1)
             AS invoice_date,
         regexp_extract(s, 'Currency: ([A-Z]{{3}})', 1) AS currency,
         CAST(regexp_extract(s, 'Total: ([0-9.]+)', 1) AS DOUBLE)
             AS total_amount,
         list_transform(
             regexp_extract_all(s, '<td>([0-9.]+)</td></tr>', 1),
             x -> CAST(x AS DOUBLE)) AS line_totals
  FROM p)
SELECT url, invoice_number, invoice_date, currency, total_amount,
       len(line_totals)::INTEGER AS n_line_items,
       round(list_sum(line_totals), 2) AS sum_line_totals,
       abs(round(list_sum(line_totals), 2) - total_amount) <= 0.01
           AS coherent
FROM f
"""


def q_ext_pdf_invoice_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured invoice extraction on the PDF branch (the
    extractInvoicePdf analogue, `pdf-processor/src/lib/index.ts:138-152`):
    the KERNEL interprets the content stream, reconstructs reading
    order, and fills the invoice fields from text lines; the oracle
    re-derives the same fields with independent SQL regexes over the
    raw content-stream literals — agreement proves the interpreter
    recovered the text."""
    _ensure_importable(spark)
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH)
    s = F.decode(F.col("html"), "ISO-8859-1")
    pdf_invoices = (pages
                    .where(F.hex(F.substring("html", 1, 5)) == _HEX_PDF)
                    .where(s.contains("(Invoice Number:"))
                    .select("url", "html"))
    return pdf_invoices.mapInPandas(_extract_invoice_batches,
                                    schema=_INVOICE_SCHEMA)


_ORACLE_PDF_INVOICE = f"""
WITH p AS (
  SELECT url, html::VARCHAR AS s
  FROM read_parquet('{PAGES_GLOB}')
  WHERE starts_with(hex(html), '{_HEX_PDF}')
    AND contains(html::VARCHAR, '(Invoice Number:')),
f AS (
  SELECT url,
         regexp_extract(s, '\\(Invoice Number: ([^)]+)\\)', 1)
             AS invoice_number,
         regexp_extract(s, '\\(Invoice Date: ([0-9-]+)\\)', 1)
             AS invoice_date,
         regexp_extract(s, '\\(Currency: ([A-Z]{{3}})\\)', 1) AS currency,
         CAST(regexp_extract(s, '\\(Total: ([0-9.]+)', 1) AS DOUBLE)
             AS total_amount,
         list_transform(
             regexp_extract_all(s, ' = ([0-9.]+)\\) Tj', 1),
             x -> CAST(x AS DOUBLE)) AS line_totals
  FROM p)
SELECT url, invoice_number, invoice_date, currency, total_amount,
       len(line_totals)::INTEGER AS n_line_items,
       round(list_sum(line_totals), 2) AS sum_line_totals,
       abs(round(list_sum(line_totals), 2) - total_amount) <= 0.01
           AS coherent
FROM f
"""


# "Invoice Number: " as an uppercase-hex prefix — the discriminator
# for the hex-string-literal invoice variant (fixtures emit `<HEX> Tj`
# show-text ops, so this byte sequence appears verbatim in the raw
# content stream on both the Spark and DuckDB sides)
_HEX_INV_MARK = "<" + "Invoice Number: ".encode("ascii").hex().upper()


def q_ext_pdf_invoice_fields_hex(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Invoice PDFs whose string literals are HEX strings (`<4E6F> Tj`)
    — same kernel, same fields as ext_pdf_invoice_fields; the oracle
    re-derives the fields by unhex-decoding the show-text tokens in
    SQL, so agreement proves the interpreter's hex-string decode
    independently of the kernel."""
    _ensure_importable(spark)
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH)
    s = F.decode(F.col("html"), "ISO-8859-1")
    rows = (pages
            .where(F.hex(F.substring("html", 1, 5)) == _HEX_PDF)
            .where(s.contains(_HEX_INV_MARK))
            .select("url", "html"))
    return rows.mapInPandas(_extract_invoice_batches,
                            schema=_INVOICE_SCHEMA)


_ORACLE_PDF_INVOICE_HEX = f"""
WITH p AS (
  SELECT url, html::VARCHAR AS s
  FROM read_parquet('{PAGES_GLOB}')
  WHERE starts_with(hex(html), '{_HEX_PDF}')
    AND contains(html::VARCHAR, '{_HEX_INV_MARK}')),
d AS (
  SELECT url,
         array_to_string(list_transform(
             regexp_extract_all(s, '<([0-9A-F]+)> Tj', 1),
             h -> decode(unhex(h))), chr(10)) AS t
  FROM p),
f AS (
  SELECT url,
         regexp_extract(t, 'Invoice Number: (\\S+)', 1)
             AS invoice_number,
         regexp_extract(t, 'Invoice Date: ([0-9-]+)', 1)
             AS invoice_date,
         regexp_extract(t, 'Currency: ([A-Z]{{3}})', 1) AS currency,
         CAST(regexp_extract(t, 'Total: ([0-9.]+)', 1) AS DOUBLE)
             AS total_amount,
         list_transform(
             regexp_extract_all(t, ' = ([0-9.]+)', 1),
             x -> CAST(x AS DOUBLE)) AS line_totals
  FROM d)
SELECT url, invoice_number, invoice_date, currency, total_amount,
       len(line_totals)::INTEGER AS n_line_items,
       round(list_sum(line_totals), 2) AS sum_line_totals,
       abs(round(list_sum(line_totals), 2) - total_amount) <= 0.01
           AS coherent
FROM f
"""


_RECEIPT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("merchant_name", T.StringType()),
    T.StructField("receipt_date", T.StringType()),
    T.StructField("payment_method", T.StringType()),
    T.StructField("currency", T.StringType()),
    T.StructField("total_amount", T.DoubleType()),
    T.StructField("n_items", T.IntegerType()),
    T.StructField("sum_item_totals", T.DoubleType()),
    T.StructField("coherent", T.BooleanType()),
])


def _extract_receipt_batches(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    from .kernels.extract import extract_document
    for pdf in batches:
        rows = []
        for url, payload in zip(pdf["url"].tolist(),
                                pdf["html"].tolist()):
            r = extract_document(url, payload, profile="receipt")
            rec = r["fields"]["receipt"] or {}
            items = rec.get("items") or []
            s = round(sum(it["total"] or 0.0 for it in items), 2)
            total = rec.get("total_amount")
            rows.append({
                "url": url,
                "merchant_name": rec.get("merchant_name"),
                "receipt_date": rec.get("date"),
                "payment_method": rec.get("payment_method"),
                "currency": rec.get("currency"),
                "total_amount": total,
                "n_items": len(items),
                "sum_item_totals": s,
                "coherent": (total is not None
                             and abs(s - total) <= 0.01),
            })
        yield pd.DataFrame(rows)


def q_ext_pdf_receipt_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receipt extraction on the PDF branch (extractReceiptPdf analogue;
    the reference's strongest test asserts exactly these fields from a
    PDF — `pdf-processor/tests/receipt.test.ts:41-85`)."""
    _ensure_importable(spark)
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH)
    s = F.decode(F.col("html"), "ISO-8859-1")
    pdf_receipts = (pages
                    .where(F.hex(F.substring("html", 1, 5)) == _HEX_PDF)
                    .where(s.contains("(Payment:")
                           & ~s.contains("(Invoice Number:"))
                    .select("url", "html"))
    return pdf_receipts.mapInPandas(_extract_receipt_batches,
                                    schema=_RECEIPT_SCHEMA)


_ORACLE_PDF_RECEIPT = f"""
WITH p AS (
  SELECT url, html::VARCHAR AS s
  FROM read_parquet('{PAGES_GLOB}')
  WHERE starts_with(hex(html), '{_HEX_PDF}')
    AND contains(html::VARCHAR, '(Payment:')
    AND NOT contains(html::VARCHAR, '(Invoice Number:')),
f AS (
  SELECT url,
         regexp_extract(s, '\\(([^)]*)\\) Tj', 1) AS merchant_name,
         regexp_extract(s, '\\(Date: ([0-9-]+)\\)', 1) AS receipt_date,
         regexp_extract(s, '\\(Payment: ([^)]+)\\)', 1)
             AS payment_method,
         regexp_extract(s, '\\(Currency: ([A-Z]{{3}})\\)', 1) AS currency,
         CAST(regexp_extract(s, '\\(Total: ([0-9.]+)', 1) AS DOUBLE)
             AS total_amount,
         list_transform(
             regexp_extract_all(s, ' = ([0-9.]+)\\) Tj', 1),
             x -> CAST(x AS DOUBLE)) AS item_totals
  FROM p)
SELECT url, merchant_name, receipt_date, payment_method, currency,
       total_amount,
       len(item_totals)::INTEGER AS n_items,
       round(list_sum(item_totals), 2) AS sum_item_totals,
       abs(round(list_sum(item_totals), 2) - total_amount) <= 0.01
           AS coherent
FROM f
"""


# -- text analysis -------------------------------------------------------------

_STOP_EN = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
_STOP_FR = ", ".join(f"'{w}'" for w in textstats.FR_STOPWORDS)


def q_ts_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return textstats.with_text_stats(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
        "quality_score", "fingerprint", "lang_pred")


_ORACLE_TS_STATS = f"""
WITH b AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+'))
         END AS n_tokens,
         len(regexp_split_to_array(text, '[.,!?;:]')) - 1 AS n_punct,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
         END AS toks
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         len(list_filter(toks, w -> w IN ({_STOP_EN}))) AS en,
         len(list_filter(toks, w -> w IN ({_STOP_FR}))) AS fr,
         round(CASE WHEN n_chars > 0
                    THEN n_punct::DOUBLE / n_chars ELSE 0.0 END, 6)
             AS punct_ratio,
         text
  FROM b),
d AS (
  SELECT doc_id, n_tokens, punct_ratio, en, fr,
         round(CASE WHEN n_tokens > 0
                    THEN (en + fr)::DOUBLE / n_tokens ELSE 0.0 END, 6)
             AS stopword_ratio,
         text
  FROM c)
SELECT doc_id,
       n_tokens::INTEGER AS n_tokens,
       punct_ratio,
       stopword_ratio,
       floor(least(1.0, n_tokens / 50.0)
             * (1.0 - least(1.0, punct_ratio * 5))
             * (1.0 - least(1.0, stopword_ratio)) * 1e6 + 0.5) / 1e6
           AS quality_score,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
           AS fingerprint,
       CASE WHEN fr > en THEN 'fr' WHEN en > fr THEN 'en'
            ELSE 'und' END AS lang_pred
FROM d
"""


def q_ts_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (ops/textstats.tfidf_top_terms):
    explode → two partial-aggregated groupBys → df join → per-doc
    window; exact and partition-independent (total order on
    score desc, term asc)."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    # max_df 0.95: the synthetic corpus has a ~30-word closed
    # vocabulary, so the production default (0.5) would cut nearly
    # every term; 0.95 keeps the query's output corpus-sized while
    # still exercising the stopword cut
    return textstats.tfidf_top_terms(docs, k=5, min_df=2,
                                     max_df_ratio=0.95)


_ORACLE_TS_TFIDF = """
WITH nd AS (SELECT count(*) AS n FROM documents),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
s AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         round(t.tf * ln((nd.n + 1.0) / (d.df + 1.0)), 6) AS score
  FROM tf t JOIN df d USING (term), nd
  WHERE d.df >= 2 AND d.df <= 0.95 * nd.n),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM s)
SELECT doc_id, term, tf, df, score, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def q_ts_stats_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_stats over the Zipf corpus (fixtures.gen_zipf_doc): same op,
    richer input — ~4000-word open vocabulary, real en/fr stopwords at
    ~34% density, sentence punctuation — so stopword_ratio,
    punct_ratio, and lang_pred all carry real signal (the lang-ID
    accuracy floor is pinned in test_ops)."""
    ensure_zipf_docs()
    docs = _read_parallel(spark, ZIPF_DOCS_GLOB)
    return textstats.with_text_stats(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
        "quality_score", "fingerprint", "lang_pred")


def q_ts_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style token counting (textstats.token_pieces): GPT-2
    pre-tokenizer piece counts — the fertility estimate a token-budget
    plan divides by — as pure regexp_count expressions riding the
    scan. Runs over the Zipf corpus (real punctuation/number mix).
    The oracle interpolates the LITERAL same pattern strings into
    DuckDB (the pattern is restricted to the RE2 ∩ Java subset:
    no lookarounds, explicit whitespace class)."""
    ensure_zipf_docs()
    docs = _read_parallel(spark, ZIPF_DOCS_GLOB)
    return textstats.token_pieces(docs)


from .ops.textstats import (BPE_SPLIT_RE,  # noqa: E402
                            _BPE_NUM_RE, _BPE_WORD_RE)

# the contraction alternative carries a literal apostrophe — double it
# for the SQL string literal
_BPE_RE = BPE_SPLIT_RE.replace("'", "''")

_ORACLE_TOKENS_BPE = f"""
WITH d AS (SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tokens_ws
           FROM read_parquet('{ZIPF_DOCS_GLOB}')),
c AS (SELECT doc_id, n_tokens_ws::BIGINT AS n_tokens_ws,
        len(regexp_extract_all(text, '{_BPE_RE}'))::BIGINT
            AS n_pieces,
        len(regexp_extract_all(text, '{_BPE_WORD_RE}'))::BIGINT
            AS n_word_pieces,
        len(regexp_extract_all(text, '{_BPE_NUM_RE}'))::BIGINT
            AS n_number_pieces
      FROM d)
SELECT doc_id, n_tokens_ws, n_pieces, n_word_pieces, n_number_pieces,
       CASE WHEN n_tokens_ws > 0
            THEN round(n_pieces::DOUBLE / n_tokens_ws, 6)
            ELSE 0.0 END AS pieces_per_token
FROM c
"""


def q_ts_tfidf_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-terms at the PRODUCTION default max_df (0.5) — the
    Zipf corpus has a real document-frequency spread, so the head
    (syllable-frequent words + injected stopwords, df > 0.5·N) is cut
    while the ~4000-word tail scores normally. The original
    ts_tfidf_topk keeps the driver's documents table and its relaxed
    0.95 cut; this query is the threshold the op ships with."""
    ensure_zipf_docs()
    docs = _read_parallel(spark, ZIPF_DOCS_GLOB)
    return textstats.tfidf_top_terms(docs, k=5, min_df=2,
                                     max_df_ratio=0.5)


# The zipf-corpus oracles are the SAME SQL with the table source (and,
# for tfidf, the max_df threshold) swapped — derived mechanically so
# the twins can never drift semantically from the originals.
_ORACLE_TS_STATS_ZIPF = _ORACLE_TS_STATS.replace(
    "FROM documents", f"FROM read_parquet('{ZIPF_DOCS_GLOB}')")
_ORACLE_TS_TFIDF_ZIPF = _ORACLE_TS_TFIDF.replace(
    "FROM documents", f"FROM read_parquet('{ZIPF_DOCS_GLOB}')").replace(
    "0.95 * nd.n", "0.5 * nd.n")


# -- n-gram LM scoring (CCNet-style corpus filter) ------------------------------

_LM_MIN_COUNT, _LM_TOP_K = 2, 20000


def q_ts_lm_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained bigram LM itself (ops/lm.train_bigram_lm over the
    Zipf corpus): top-20k bigrams with >= 2 occurrences, each with its
    fixed-point conditional cost floor(1e6*ln(c1/c12)) — int64, so the
    DuckDB twin is exact (see ops/lm.py docstring). The cut is a total
    order (count desc, bigram asc) -> deterministic under any
    partitioning; Spark executes the orderBy().limit() as
    TakeOrderedAndProject (distributed top-k, no global sort)."""
    ensure_zipf_docs()
    docs = _read_parallel(spark, ZIPF_DOCS_GLOB)
    return lm_ops.train_bigram_lm(docs, min_count=_LM_MIN_COUNT,
                                  top_k=_LM_TOP_K)


def q_ts_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-document LM scoring (ops/lm.lm_score): every
    doc's bigram cost sum / OOV count / mean cost in micro-nats
    against the corpus-trained LM — the classic perplexity-filter
    gate of pretraining pipelines (Wenzek et al. 2020), exact-oracled
    via fixed-point costs. Scale shape: broadcast LM join on the
    narrow explode, partial-aggregated groupBy(doc_id); the corpus
    scan is never shuffled with payload."""
    ensure_zipf_docs()
    docs = _read_parallel(spark, ZIPF_DOCS_GLOB)
    lm = lm_ops.train_bigram_lm(docs, min_count=_LM_MIN_COUNT,
                                top_k=_LM_TOP_K)
    return lm_ops.lm_score(docs, lm)


_LM_SQL_COMMON = f"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
         END AS toks
  FROM read_parquet('{ZIPF_DOCS_GLOB}')),
uni AS (SELECT t AS w1, count(*)::BIGINT AS c1
        FROM (SELECT unnest(toks) AS t FROM docs) GROUP BY t),
bt AS (SELECT doc_id, unnest(list_transform(
           generate_series(1, greatest(len(toks)-1, 0)),
           i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM docs),
bc AS (SELECT bigram, count(*)::BIGINT AS c12 FROM bt GROUP BY bigram
       HAVING count(*) >= {{mc}}),
lm AS (SELECT bigram, c12, c1,
              floor(1e6 * ln(c1::DOUBLE / c12))::BIGINT AS cost_micro
       FROM (SELECT bigram, c12, split_part(bigram, ' ', 1) AS w1
             FROM bc) b
       JOIN uni USING (w1)),
lmk AS (SELECT * FROM lm ORDER BY c12 DESC, bigram ASC LIMIT {{tk}})
"""

_ORACLE_TS_LM_BIGRAMS = (
    _LM_SQL_COMMON.format(mc=_LM_MIN_COUNT, tk=_LM_TOP_K)
    + "SELECT bigram, c12, c1, cost_micro FROM lmk")

_ORACLE_TS_LM_SCORE = (
    _LM_SQL_COMMON.format(mc=_LM_MIN_COUNT, tk=_LM_TOP_K) + f""",
per AS (
  SELECT bt.doc_id,
         count(*)::BIGINT AS n_bigrams,
         sum(CASE WHEN l.bigram IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS oov_bigrams,
         sum(COALESCE(l.cost_micro, {lm_ops.OOV_COST_MICRO}))::BIGINT
             AS cost_sum_micro
  FROM bt LEFT JOIN lmk l USING (bigram) GROUP BY bt.doc_id)
SELECT d.doc_id,
       COALESCE(p.n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(p.oov_bigrams, 0)::BIGINT AS oov_bigrams,
       COALESCE(p.cost_sum_micro, 0)::BIGINT AS cost_sum_micro,
       CASE WHEN p.n_bigrams > 0
            THEN p.cost_sum_micro::DOUBLE / p.n_bigrams
       END AS avg_cost_micro
FROM (SELECT doc_id FROM docs) d LEFT JOIN per p USING (doc_id)
""")


# -- corpus curation ------------------------------------------------------------

MIN_QUALITY = 0.5
JACCARD_T = 0.82
JACCARD_MAX_DF = 100  # skew guard: drop shingles in >100 docs (mirrored
#                       in the oracle, so results stay comparable)


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hashed-id train/val/test assignment (never rand():
    reproducible across runs, engines and cluster sizes)."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return corpus.deterministic_split(docs).select(
        "doc_id", "bucket", "split")


_SPLIT_SQL = """
    (('0x' || substring(md5('split-v1:' || doc_id::VARCHAR), 1, 8))
         ::BIGINT % 10000)"""

_ORACLE_SPLIT = f"""
WITH b AS (
  SELECT doc_id, {_SPLIT_SQL} AS bucket FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
FROM b
"""


def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pass (quality/lang gate → exact dedup
    keep-min-id → deterministic split) — one scan, one shuffle."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return corpus.curate(docs, min_quality=MIN_QUALITY, langs=("en",))


_ORACLE_CURATE = f"""
WITH s AS ({_ORACLE_TS_STATS}),
k AS (SELECT * FROM s
      WHERE quality_score >= {MIN_QUALITY} AND lang_pred IN ('en')),
d AS (SELECT *, row_number() OVER (PARTITION BY fingerprint
                                   ORDER BY doc_id ASC) AS rn FROM k),
b AS (SELECT doc_id, n_tokens, quality_score, lang_pred,
             {_SPLIT_SQL} AS bucket
      FROM d WHERE rn = 1)
SELECT doc_id, n_tokens, quality_score, lang_pred, bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
FROM b
"""


def q_corpus_curate_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL pretraining pipeline: quality/lang gate → exact dedup →
    NEAR-dup removal (jaccard pair graph → connected components → keep
    min-id representative) → deterministic split. Oracle re-derives
    every stage in SQL incl. a recursive-CTE closure for the
    clusters."""
    _ensure_importable(spark)
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return corpus.curate_near(docs, min_quality=MIN_QUALITY,
                              langs=("en",),
                              jaccard_threshold=JACCARD_T,
                              max_df=JACCARD_MAX_DF)


_ORACLE_CURATE_NEAR = f"""
WITH RECURSIVE s AS ({_ORACLE_TS_STATS}),
k AS (SELECT s.*, d.text FROM s JOIN documents d USING (doc_id)
      WHERE quality_score >= {MIN_QUALITY} AND lang_pred IN ('en')),
dd AS (SELECT *, row_number() OVER (PARTITION BY fingerprint
                                    ORDER BY doc_id ASC) AS rn FROM k),
base AS (SELECT * FROM dd WHERE rn = 1),
nt AS (SELECT doc_id,
              regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       FROM base),
ng AS (SELECT doc_id,
              list_distinct(list_transform(
                  range(1, greatest(len(toks) - 1, 1)),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                  AS grams
       FROM nt),
ne0 AS (SELECT doc_id, unnest(grams) AS shingle FROM ng),
nhot AS (SELECT shingle FROM ne0 GROUP BY shingle
         HAVING count(*) > {JACCARD_MAX_DF}),
ne AS (SELECT doc_id, shingle FROM ne0
       WHERE shingle NOT IN (SELECT shingle FROM nhot)),
nsz AS (SELECT doc_id, len(grams) AS sh_size FROM ng),
nshared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ne a JOIN ne b ON a.shingle = b.shingle
                     AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
npairs AS (
  SELECT id_a, id_b FROM nshared
  JOIN nsz sa ON sa.doc_id = id_a
  JOIN nsz sb ON sb.doc_id = id_b
  WHERE round(shared::DOUBLE
              / (sa.sh_size + sb.sh_size - shared), 6)
        >= {JACCARD_T}),
cce AS (SELECT id_a AS src, id_b AS dst FROM npairs
        UNION SELECT id_b AS src, id_a AS dst FROM npairs),
ccr(src, dst) AS (
  SELECT src, dst FROM cce
  UNION
  SELECT r.src, n.dst FROM ccr r JOIN cce n ON r.dst = n.src),
losers AS (SELECT src AS doc_id FROM ccr GROUP BY src
           HAVING least(min(dst), src) != src),
surv AS (SELECT * FROM base
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
bk AS (SELECT doc_id, n_tokens, quality_score, lang_pred,
              {_SPLIT_SQL} AS bucket
       FROM surv)
SELECT doc_id, n_tokens, quality_score, lang_pred, bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
FROM bk
"""


EMB_NEAR_T = 0.95


def q_corpus_curate_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curate_near on the EMBEDDING route: gate → exact dedup →
    in-engine hash embeddings (similarity.hash_embed) → blocked
    cosine pairs ≥ 0.95 → connected components → split. The oracle
    re-derives the embedding arithmetic AND the recursive-CTE closure,
    so the whole text→embed→near-dup→curate loop is pinned end-to-end
    (on the fixture corpus the 0.95 cosine pairs equal the
    jaccard-0.8 ground truth exactly, so both routes converge to the
    same survivors — asserted in test_ops)."""
    _ensure_importable(spark)
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return corpus.curate_near(docs, min_quality=MIN_QUALITY,
                              langs=("en",), route="embedding",
                              embedding_threshold=EMB_NEAR_T)


_ORACLE_CURATE_EMB = f"""
WITH RECURSIVE s AS ({{stats}}),
k AS (SELECT s.*, d.text FROM s JOIN documents d USING (doc_id)
      WHERE quality_score >= {{minq}} AND lang_pred IN ('en')),
dd AS (SELECT *, row_number() OVER (PARTITION BY fingerprint
                                    ORDER BY doc_id ASC) AS rn FROM k),
base AS (SELECT * FROM dd WHERE rn = 1),
ed AS (SELECT doc_id,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
       FROM base),
eg AS (SELECT doc_id, substring(nt, i, {similarity.EMB_NGRAM}) AS g
       FROM ed, unnest(generate_series(
           1, greatest(length(nt) - {similarity.EMB_NGRAM} + 1, 0)))
           AS t(i)),
eh AS (SELECT doc_id,
         (('0x' || substring(md5('emb-v1:' || g), 1, 8))::BIGINT
             % {similarity.EMB_DIM}) AS bucket,
         (1 - 2 * (('0x' || substring(md5('emb-v1:' || g), 9, 1))
             ::BIGINT % 2)) AS sign
       FROM eg),
esp AS (SELECT doc_id, bucket, sum(sign)::BIGINT AS v
        FROM eh GROUP BY doc_id, bucket),
edims AS (SELECT unnest(range({similarity.EMB_DIM})) AS b),
edv AS (SELECT ed.doc_id, edims.b, coalesce(esp.v, 0)::BIGINT AS v
        FROM ed CROSS JOIN edims
        LEFT JOIN esp ON esp.doc_id = ed.doc_id
                     AND esp.bucket = edims.b),
esq AS (SELECT doc_id, sum(v * v)::BIGINT AS sumsq
        FROM edv GROUP BY doc_id),
evec AS (SELECT edv.doc_id,
           list(CASE WHEN esq.sumsq = 0 THEN 0.0
                ELSE floor({similarity.EMB_SCALE} * edv.v
                           / sqrt(esq.sumsq::DOUBLE) + 0.5)
                     / {similarity.EMB_SCALE} END ORDER BY edv.b)
               AS embedding
         FROM edv JOIN esq USING (doc_id) GROUP BY edv.doc_id),
en AS (SELECT doc_id,
         list_transform(embedding, x -> x
             / sqrt(list_dot_product(embedding, embedding))) AS nv
       FROM evec),
epairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM en a JOIN en b ON a.doc_id < b.doc_id
           WHERE round(list_dot_product(a.nv, b.nv), 6)
                 >= {EMB_NEAR_T}),
cce AS (SELECT id_a AS src, id_b AS dst FROM epairs
        UNION SELECT id_b AS src, id_a AS dst FROM epairs),
ccr(src, dst) AS (
  SELECT src, dst FROM cce
  UNION
  SELECT r.src, n.dst FROM ccr r JOIN cce n ON r.dst = n.src),
losers AS (SELECT src AS doc_id FROM ccr GROUP BY src
           HAVING least(min(dst), src) != src),
surv AS (SELECT * FROM base
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
bk AS (SELECT doc_id, n_tokens, quality_score, lang_pred,
              {{split_sql}} AS bucket
       FROM surv)
SELECT doc_id, n_tokens, quality_score, lang_pred, bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
FROM bk
"""

# the gate/split fragments are shared verbatim with _ORACLE_CURATE_NEAR
_ORACLE_CURATE_EMB = _ORACLE_CURATE_EMB.format(
    stats=_ORACLE_TS_STATS, minq=MIN_QUALITY, split_sql=_SPLIT_SQL)


# -- dedup ----------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return dedup.exact_duplicates(docs)


_ORACLE_DEDUP_EXACT = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
           AS fingerprint,
       min(doc_id)::BIGINT AS canonical_id,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1
"""

def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_importable(spark)
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return dedup.jaccard_pairs(docs, threshold=JACCARD_T, n=3,
                               max_df=JACCARD_MAX_DF)


_ORACLE_JACCARD = f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(toks) - 1, 1)),
             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
             AS grams
  FROM t),
e0 AS (SELECT doc_id, unnest(grams) AS shingle FROM g),
hot AS (SELECT shingle FROM e0 GROUP BY shingle
        HAVING count(*) > {JACCARD_MAX_DF}),
e AS (SELECT doc_id, shingle FROM e0
      WHERE shingle NOT IN (SELECT shingle FROM hot)),
-- POST-cut sizes: jaccard is measured over the filtered shingle
-- space on both axes (mirrors ops/dedup.jaccard_pairs — the mixed
-- pre-cut-size definition breaks real edges once corpus-wide
-- stop-n-grams cross the df cut)
sz AS (SELECT doc_id, count(*) AS sh_size FROM e GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT id_a, id_b,
         round(shared::DOUBLE
               / (sa.sh_size + sb.sh_size - shared), 6) AS jaccard
  FROM shared
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, jaccard
FROM j WHERE jaccard >= {JACCARD_T}
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER assignment: connected components over the
    exact-Jaccard pair graph via iterative min-label propagation
    (ops/dedup.duplicate_clusters — the GraphX connectedComponents
    recipe with per-round localCheckpoint). The oracle computes the
    same components with a recursive-CTE transitive closure — feasible
    exactly because the oracle runs at toy scale while the Spark side
    is the shape that survives 100 TB."""
    _ensure_importable(spark)
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    pairs = dedup.jaccard_pairs(docs, threshold=JACCARD_T, n=3,
                                max_df=JACCARD_MAX_DF)
    return dedup.duplicate_clusters(pairs)


# outer CTE names must not collide with the embedded jaccard query's
# own CTEs (t/g/e0/e/…): DuckDB hoists WITH RECURSIVE scoping
_ORACLE_CLUSTERS = (
    "WITH RECURSIVE cc_pairs AS (" + _ORACLE_JACCARD + "),\n"
    """cc_edges AS (SELECT id_a AS src, id_b AS dst FROM cc_pairs
       UNION SELECT id_b AS src, id_a AS dst FROM cc_pairs),
cc_reach(src, dst) AS (
  SELECT src, dst FROM cc_edges
  UNION
  SELECT r.src, n.dst FROM cc_reach r
  JOIN cc_edges n ON r.dst = n.src)
SELECT src::BIGINT AS doc_id,
       least(min(dst), src)::BIGINT AS cluster_id
FROM cc_reach GROUP BY src
""")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_importable(spark)
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return dedup.minhash_lsh_pairs(docs, threshold=JACCARD_T)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_importable(spark)
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return dedup.simhash_pairs(docs, max_hamming=3)


COSINE_T = 0.45


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read_parallel(spark, _t(sf_dir, "embeddings"))
    return dedup.embedding_near_dup_pairs(emb, threshold=COSINE_T)


# NOTE: normalize-then-dot, in the SAME operation order as the Spark
# side, so the 6-dp rounding sees bit-identical doubles
_ORACLE_EMB_PAIRS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                 AS nv
      FROM e)
SELECT a.vec_id::BIGINT AS id_a, b.vec_id::BIGINT AS id_b,
       round(list_dot_product(a.nv, b.nv), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.nv, b.nv), 6) >= {COSINE_T}
"""

N_ANN_QUERIES = 20
ANN_K = 5


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read_parallel(spark, _t(sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_ANN_QUERIES)
    return similarity.cosine_topk(emb, queries, k=ANN_K)


_ORACLE_ANN = f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {N_ANN_QUERIES}),
c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (SELECT qid, nid,
             round(list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))), 6) AS cosine
      FROM q, c WHERE nid != qid),
r AS (SELECT qid, nid, cosine,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, nid ASC) AS rank
      FROM s)
SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, cosine,
       rank::INTEGER AS rank
FROM r WHERE rank <= {ANN_K}
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_importable(spark)
    emb = _read_parallel(spark, _t(sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_ANN_QUERIES)
    return similarity.ann_lsh_topk(emb, queries, k=ANN_K)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (the FAISS-IVFFlat-style scale path): coarse
    spherical-kmeans cells + nprobe probing + exact re-rank.
    Approximate by design — recall vs ann_topk asserted in tests."""
    _ensure_importable(spark)
    emb = _read_parallel(spark, _t(sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_ANN_QUERIES)
    # 32 cells / 12 probes: recall 0.82 vs exact on the synthetic
    # (near-isotropic) embeddings while scanning ~38% of the corpus;
    # real embedding corpora cluster far more, where nprobe/n_cells
    # drops well below this for the same recall
    return similarity.ann_ivf_topk(emb, queries, k=ANN_K,
                                   n_centroids=32, nprobe=12)


def q_emb_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine text→embedding (similarity.hash_embed): signed
    hashing-trick char-3-gram embedder with fixed-point L2
    normalization — closes the curate→embed→near-dup loop without a
    model. The oracle recomputes every bucket/sign/quantization step
    from the same md5 arithmetic, so the vectors are pinned
    bit-identically."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return similarity.hash_embed(docs)


_ORACLE_EMB_HASH = f"""
WITH d AS (SELECT doc_id,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
           FROM documents),
g AS (SELECT doc_id, substring(nt, i, {similarity.EMB_NGRAM}) AS g
      FROM d, unnest(generate_series(
          1, greatest(length(nt) - {similarity.EMB_NGRAM} + 1, 0)))
          AS t(i)),
h AS (SELECT doc_id,
        (('0x' || substring(md5('emb-v1:' || g), 1, 8))::BIGINT
            % {similarity.EMB_DIM}) AS bucket,
        (1 - 2 * (('0x' || substring(md5('emb-v1:' || g), 9, 1))
            ::BIGINT % 2)) AS sign
      FROM g),
sp AS (SELECT doc_id, bucket, sum(sign)::BIGINT AS v,
              count(*)::BIGINT AS ng
       FROM h GROUP BY doc_id, bucket),
dims AS (SELECT unnest(range({similarity.EMB_DIM})) AS b),
dv AS (SELECT d.doc_id, dims.b, coalesce(sp.v, 0)::BIGINT AS v
       FROM d CROSS JOIN dims
       LEFT JOIN sp ON sp.doc_id = d.doc_id AND sp.bucket = dims.b),
sq AS (SELECT doc_id, sum(v * v)::BIGINT AS sumsq
       FROM dv GROUP BY doc_id),
ngr AS (SELECT doc_id, sum(ng)::BIGINT AS n_grams
        FROM sp GROUP BY doc_id),
vec AS (SELECT dv.doc_id,
          list(CASE WHEN sq.sumsq = 0 THEN 0.0
               ELSE floor({similarity.EMB_SCALE} * dv.v
                          / sqrt(sq.sumsq::DOUBLE) + 0.5)
                    / {similarity.EMB_SCALE} END ORDER BY dv.b)
              AS embedding
        FROM dv JOIN sq USING (doc_id) GROUP BY dv.doc_id)
SELECT v.doc_id, v.embedding,
       coalesce(ngr.n_grams, 0)::BIGINT AS n_grams
FROM vec v LEFT JOIN ngr USING (doc_id)
"""


def q_ann_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search END-TO-END FROM TEXT: hash-embed the
    documents in-engine (similarity.hash_embed) and run the exact
    brute-force cosine top-k over the produced vectors — no
    pre-computed embeddings table anywhere. The oracle recomputes the
    embedding arithmetic AND the all-pairs ranking in SQL, so the
    whole text→vector→neighbors path is hash-pinned."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    emb = similarity.hash_embed(docs).where(F.col("n_grams") > 0)
    queries = emb.where(F.col("doc_id") < N_ANN_QUERIES)
    return similarity.cosine_topk(emb, queries, k=ANN_K,
                                  id_col="doc_id",
                                  vec_col="embedding")


def _emb_hash_ctes(src_cte: str) -> str:
    """The hash_embed arithmetic as DuckDB CTEs over a (doc_id, text)
    CTE named ``src_cte`` — shared by the ann-from-text oracle (and
    mirroring the inline block in _ORACLE_EMB_HASH / the curate-emb
    oracle). Final CTE: evec(doc_id, embedding)."""
    return f"""
eg AS (SELECT doc_id, substring(nt, i, {similarity.EMB_NGRAM}) AS g
       FROM {src_cte}, unnest(generate_series(
           1, greatest(length(nt) - {similarity.EMB_NGRAM} + 1, 0)))
           AS t(i)),
eh AS (SELECT doc_id,
         (('0x' || substring(md5('emb-v1:' || g), 1, 8))::BIGINT
             % {similarity.EMB_DIM}) AS bucket,
         (1 - 2 * (('0x' || substring(md5('emb-v1:' || g), 9, 1))
             ::BIGINT % 2)) AS sign
       FROM eg),
esp AS (SELECT doc_id, bucket, sum(sign)::BIGINT AS v
        FROM eh GROUP BY doc_id, bucket),
edims AS (SELECT unnest(range({similarity.EMB_DIM})) AS b),
edv AS (SELECT s.doc_id, edims.b, coalesce(esp.v, 0)::BIGINT AS v
        FROM {src_cte} s CROSS JOIN edims
        LEFT JOIN esp ON esp.doc_id = s.doc_id
                     AND esp.bucket = edims.b),
esq AS (SELECT doc_id, sum(v * v)::BIGINT AS sumsq
        FROM edv GROUP BY doc_id),
evec AS (SELECT edv.doc_id,
           list(CASE WHEN esq.sumsq = 0 THEN 0.0
                ELSE floor({similarity.EMB_SCALE} * edv.v
                           / sqrt(esq.sumsq::DOUBLE) + 0.5)
                     / {similarity.EMB_SCALE} END ORDER BY edv.b)
               AS embedding,
           max(esq.sumsq) AS sumsq
         FROM edv JOIN esq USING (doc_id) GROUP BY edv.doc_id)"""


_ORACLE_ANN_TEXT = f"""
WITH ed AS (SELECT doc_id,
              lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
            FROM documents),
{_emb_hash_ctes('ed')},
ev AS (SELECT doc_id, embedding FROM evec WHERE sumsq > 0),
q AS (SELECT doc_id AS qid, embedding AS qv FROM ev
      WHERE doc_id < {N_ANN_QUERIES}),
c AS (SELECT doc_id AS nid, embedding AS cv FROM ev),
s AS (SELECT qid, nid,
        round(list_dot_product(qv, cv)
              / (sqrt(list_dot_product(qv, qv))
                 * sqrt(list_dot_product(cv, cv))), 6) AS cosine
      FROM q, c WHERE nid != qid),
r AS (SELECT qid, nid, cosine,
        row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, nid ASC) AS rank
      FROM s)
SELECT qid::BIGINT AS query_id, nid::BIGINT AS neighbor_id, cosine,
       rank::INTEGER AS rank
FROM r WHERE rank <= {ANN_K}
"""


# -- multimodal -----------------------------------------------------------------

def q_mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (_read_parallel(spark, _t(sf_dir, "documents"))
            .select("doc_id", F.encode("text", "UTF-8").alias("payload")))
    return multimodal.media_metadata_sql(docs, "doc_id", "payload")


_ORACLE_MM_META = """
WITH p AS (SELECT doc_id, text, encode(text) AS b FROM documents)
SELECT doc_id::BIGINT AS media_id,
       octet_length(b)::BIGINT AS n_bytes,
       substring(hex(b), 1, 8) AS magic_hex,
       md5(text) AS content_hash,  -- md5(BLOB) unsupported; same bytes
       (octet_length(b) % 1920)::INTEGER AS fake_width,
       ((octet_length(b) // 1920) % 1080)::INTEGER AS fake_height
FROM p
"""

def _synth_png(doc_id: int, text: str) -> bytes:
    """Deterministic per-doc media payload for the decode query:
    pixel bytes derive from a sha256 of the doc's content. Most docs
    get a PNG (dims / color type / scanline filter / zlib level cycle
    with doc_id so every inverse-filter path and channel count is
    exercised); every 23rd doc gets a REAL baseline JPEG instead
    (r5 — gray/color, 4:4:4 vs 4:2:0, and restart intervals all cycle
    so every decoder path runs), every 31st a REAL GIF (r5 — palette
    size / interlace / version cycle; every 93rd truncated mid-LZW),
    every 37th a WebP-magic payload (no stdlib decoder → typed
    unsupported), every 69th a truncated JPEG and every 17th a
    truncated PNG, pinning the typed corrupt statuses. Everything is
    a pure function of (doc_id, text)."""
    import hashlib
    from .kernels import gif, jpeg, png
    seed = hashlib.sha256(f"{doc_id}:{text[:64]}".encode()).digest()
    if doc_id % 23 == 0:
        ch = 1 if doc_id % 2 else 3
        w, h = 6 + doc_id % 21, 5 + doc_id % 13
        n = w * h * ch
        pixels = (seed * (n // len(seed) + 1))[:n]
        payload = jpeg.encode_jpeg(
            w, h, pixels, channels=ch, quality=80 + doc_id % 17,
            subsample=(ch == 3 and doc_id % 4 == 0),
            restart_interval=doc_id % 3)
        if doc_id % 69 == 0 and doc_id > 0:
            return payload[:len(payload) // 2]  # mid-scan truncation
        return payload
    if doc_id % 31 == 0 and doc_id > 0:
        npal = (4, 16, 64, 256)[doc_id % 4]
        pal = [(seed[i % 32], seed[(i * 3 + 1) % 32],
                seed[(i * 7 + 2) % 32]) for i in range(npal)]
        w, h = 5 + doc_id % 19, 4 + doc_id % 11
        idx = bytes(seed[(i * 11 + 3) % 32] % npal
                    for i in range(w * h))
        payload = gif.encode_gif(
            w, h, idx, pal, interlace=bool(doc_id % 2),
            version=b"87a" if doc_id % 3 == 0 else b"89a")
        if doc_id % 93 == 0:
            return payload[:len(payload) * 2 // 3]  # mid-LZW cut
        return payload
    if doc_id % 37 == 0 and doc_id > 0:
        # WebP magic: recognized by no stdlib codec → 'unsupported'
        return b"RIFF" + seed[:4] + b"WEBPVP8 " + seed
    color_type = (0, 2, 6)[doc_id % 3]
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    w, h = 4 + doc_id % 13, 3 + doc_id % 7
    n = w * h * ch
    pixels = (seed * (n // len(seed) + 1))[:n]
    payload = png.encode_png(w, h, pixels, color_type,
                             filter_type=doc_id % 5,
                             level=4 + doc_id % 3)
    if doc_id % 17 == 0:
        return payload[:-7]  # truncated chunk
    return payload


def _synth_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic (media_id, payload) media table via
    _synth_png (Arrow batch stage, no shuffle)."""
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "payload": [_synth_png(int(i), t) for i, t in
                            zip(pdf["doc_id"], pdf["text"])]})
    return (_read_parallel(spark, _t(sf_dir, "documents"))
            .select("doc_id", "text")
            .mapInPandas(synth, schema="media_id long, payload binary"))


def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize a deterministic
    PNG/JPEG per document (Arrow batch stage), then decode with the
    stdlib codecs — true dims + pixel sha256, typed corrupt/
    unsupported rows. Both stages are mapInPandas over the same scan:
    no shuffle."""
    docs = _synth_media_df(spark, sf_dir)
    out = multimodal.decode_image_pixels(docs, "media_id", "payload")
    # sentinel-coalesce the failure-row nulls: the hash compare sorts
    # values, and None breaks total ordering; the op itself keeps
    # honest nulls
    return out.select(
        "media_id", "n_bytes",
        F.coalesce("fmt", F.lit("")).alias("fmt"),
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        F.coalesce("bit_depth", F.lit(-1)).alias("bit_depth"),
        F.coalesce("channels", F.lit(-1)).alias("channels"),
        F.coalesce("pixel_sha256", F.lit("")).alias("pixel_sha256"),
        "decode_status")


def q_mm_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize (max side 8, never upscaled)
    → feature extract (thumbnail pixel sha256 + integer per-channel
    means) over the synthetic media table — the image-normalization
    stage of a multimodal ingest, deterministic end-to-end (committed
    golden registry, like mm_decode; resize index math pinned by hand
    cases in test_ops)."""
    docs = _synth_media_df(spark, sf_dir)
    out = multimodal.thumbnail_images(docs, "media_id", "payload",
                                      max_side=8)
    return out.select(
        "media_id",
        F.coalesce("fmt", F.lit("")).alias("fmt"),
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        F.coalesce("thumb_w", F.lit(-1)).alias("thumb_w"),
        F.coalesce("thumb_h", F.lit(-1)).alias("thumb_h"),
        F.coalesce("channels", F.lit(-1)).alias("channels"),
        F.coalesce("thumb_sha256", F.lit("")).alias("thumb_sha256"),
        F.coalesce("channel_means",
                   F.array().cast("array<long>")).alias("channel_means"),
        "decode_status")


def _synth_wav(doc_id: int, text: str) -> bytes:
    """Deterministic per-doc AUDIO payload (mm_audio): sample bytes
    derive from a sha256 of the doc's content; rate / channel /
    bit-depth / float / EXTENSIBLE paths all cycle with doc_id.
    Every 23rd doc is truncated mid-data (typed corrupt), every 31st
    carries an ADPCM format tag (typed unsupported codec), every
    37th is an Ogg payload (unknown magic). Pure function of
    (doc_id, text), like _synth_png."""
    import hashlib
    import struct
    from .kernels import wav
    seed = hashlib.sha256(f"wav:{doc_id}:{text[:64]}".encode()).digest()
    if doc_id % 37 == 0 and doc_id > 0:
        return b"OggS" + seed
    float_fmt = doc_id % 5 == 0
    bits = 32 if float_fmt else (8 if doc_id % 2 else 16)
    channels = 1 + (doc_id % 3 == 0)
    rate = (8000, 16000, 22050, 44100)[doc_id % 4]
    n = 50 + doc_id % 200
    need = n * channels * (bits // 8)
    frames = (seed * (need // len(seed) + 1))[:need]
    if float_fmt:
        # bound float payloads to real small magnitudes so the frame
        # bytes are valid IEEE-754 (determinism doesn't require it,
        # but honest samples keep the fixture meaningful)
        vals = [(b - 128) / 128.0 for b in frames[:need // 4]]
        frames = struct.pack(f"<{len(vals)}f", *vals)
    payload = wav.encode_wav(rate, channels, bits, frames,
                             float_fmt=float_fmt,
                             extensible=doc_id % 7 == 0)
    if doc_id % 23 == 0 and doc_id > 0:
        return payload[:-(1 + doc_id % 5)]  # data chunk cut short
    if doc_id % 31 == 0 and doc_id > 0:
        i = payload.index(b"fmt ") + 8
        return (payload[:i] + struct.pack("<H", 2)  # ADPCM tag
                + payload[i + 2:])
    return payload


def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: synthesize a deterministic WAV
    per document (Arrow batch stage), then parse with the stdlib
    RIFF/WAVE codec — true sample geometry + PCM sha256, typed
    corrupt/unsupported rows. Both stages are mapInPandas over the
    same scan: no shuffle (same shape as mm_decode)."""
    out = multimodal.decode_audio(
        _synth_audio_df(spark, sf_dir), "media_id", "payload")
    return out.select(
        "media_id", "n_bytes",
        F.coalesce("fmt", F.lit("")).alias("fmt"),
        F.coalesce("sample_rate", F.lit(-1)).alias("sample_rate"),
        F.coalesce("channels", F.lit(-1)).alias("channels"),
        F.coalesce("bit_depth", F.lit(-1)).alias("bit_depth"),
        F.coalesce("n_samples", F.lit(-1)).alias("n_samples"),
        F.coalesce("duration_ms", F.lit(-1)).alias("duration_ms"),
        F.coalesce("pcm_sha256", F.lit("")).alias("pcm_sha256"),
        "decode_status")


def _synth_audio_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic (media_id, payload) WAV table via
    _synth_wav (Arrow batch stage, no shuffle) — shared by mm_audio
    and mm_audio_features."""
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "payload": [_synth_wav(int(i), t) for i, t in
                            zip(pdf["doc_id"], pdf["text"])]})
    return (_read_parallel(spark, _t(sf_dir, "documents"))
            .select("doc_id", "text")
            .mapInPandas(synth, schema="media_id long, payload binary"))


def q_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → feature-extract for audio (peak / mean-abs /
    zero-crossings / fixed-bucket peak envelope over channel 0) —
    the sound-modality analogue of mm_thumbnail, integer-exact so the
    committed-golden oracle pins it. Same no-shuffle two-stage
    mapInPandas shape as mm_audio."""
    out = multimodal.audio_features(
        _synth_audio_df(spark, sf_dir), "media_id", "payload")
    return out.select(
        "media_id",
        F.coalesce("fmt", F.lit("")).alias("fmt"),
        F.coalesce("sample_rate", F.lit(-1)).alias("sample_rate"),
        F.coalesce("channels", F.lit(-1)).alias("channels"),
        F.coalesce("n_samples", F.lit(-1)).alias("n_samples"),
        F.coalesce("peak", F.lit(-1)).alias("peak"),
        F.coalesce("mean_abs", F.lit(-1)).alias("mean_abs"),
        F.coalesce("zero_crossings", F.lit(-1)).alias("zero_crossings"),
        # stringified like mm_frame_plan: the driver canonicalizer
        # sorts pandas frames, where Python lists are unhashable
        F.concat_ws(",", F.coalesce(
            F.col("envelope"),
            F.array().cast("array<long>")).cast("array<string>"))
        .alias("envelope"),
        "decode_status")


def _synth_mp4(doc_id: int, text: str) -> bytes:
    """Deterministic per-doc VIDEO-container payload (mm_video):
    brands / timescale / duration / track sets cycle with doc_id
    (video-only, video+audio, audio-only); every 23rd doc is
    truncated mid-moov (typed corrupt), every 37th is a Matroska
    payload (unknown magic → unsupported). Pure function of
    (doc_id, text), like _synth_png / _synth_wav."""
    import hashlib
    from .kernels import mp4
    seed = hashlib.sha256(f"mp4:{doc_id}:{text[:64]}".encode()).digest()
    if doc_id % 37 == 0 and doc_id > 0:
        return b"\x1aE\xdf\xa3" + seed  # EBML/Matroska magic
    tracks = [
        [("vide", 640 + 16 * (doc_id % 40), 360 + 9 * (doc_id % 40))],
        [("vide", 1920, 1080), ("soun", 0, 0)],
        [("soun", 0, 0)],
    ][doc_id % 3]
    payload = mp4.encode_mp4(
        duration_ms=1000 + (doc_id * 137) % 600000,
        timescale=(600, 1000, 90000)[doc_id % 3],
        tracks=tracks,
        mdat=seed * (1 + doc_id % 7),
        brand=("isom", "mp42", "dash")[doc_id % 3])
    if doc_id % 23 == 0 and doc_id > 0:
        return payload[:len(payload) // 2]  # mid-moov truncation
    return payload


def q_mm_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container probe end-to-end: synthesize a
    deterministic MP4 per document (Arrow batch stage), then box-walk
    with the stdlib ISO-BMFF parser — brands, duration, track
    geometry/handlers, typed corrupt/unsupported rows. Frame decode
    stays gated; this is the filter/route stage that must run before
    any decode at 100 TB. Both stages are mapInPandas over the same
    scan: no shuffle (same shape as mm_decode/mm_audio)."""
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "payload": [_synth_mp4(int(i), t) for i, t in
                            zip(pdf["doc_id"], pdf["text"])]})
    docs = (_read_parallel(spark, _t(sf_dir, "documents"))
            .select("doc_id", "text")
            .mapInPandas(synth, schema="media_id long, payload binary"))
    out = multimodal.probe_video(docs, "media_id", "payload")
    return out.select(
        "media_id", "n_bytes",
        F.coalesce("fmt", F.lit("")).alias("fmt"),
        F.coalesce("major_brand", F.lit("")).alias("major_brand"),
        F.coalesce("duration_ms", F.lit(-1)).alias("duration_ms"),
        F.coalesce("timescale", F.lit(-1)).alias("timescale"),
        F.coalesce("n_tracks", F.lit(-1)).alias("n_tracks"),
        F.coalesce("video_width", F.lit(-1)).alias("video_width"),
        F.coalesce("video_height", F.lit(-1)).alias("video_height"),
        F.coalesce("handlers", F.lit("")).alias("handlers"),
        F.coalesce("mdat_bytes", F.lit(-1)).alias("mdat_bytes"),
        "decode_status")


FRAME_STRIDE = 64


def q_mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (_read_parallel(spark, _t(sf_dir, "documents"))
            .select("doc_id", F.encode("text", "UTF-8").alias("payload")))
    plan = multimodal.frame_sample_plan(docs, "doc_id", "payload",
                                        frame_stride=FRAME_STRIDE)
    # the list column is stringified for the oracle compare: the
    # driver's canonicalizer sorts pandas frames, where Python lists
    # are unhashable. concat_ws over a cast stays whole-stage-codegen
    # (no HOF lambda — those are CodegenFallback).
    return plan.select(
        "media_id", "n_bytes",
        F.concat_ws(",", F.col("frame_offsets").cast("array<string>"))
        .alias("frame_offsets"),
        "n_frames")


_ORACLE_MM_FRAMES = f"""
WITH p AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS n
           FROM documents)
SELECT doc_id::BIGINT AS media_id, n AS n_bytes,
       CASE WHEN n > 0 THEN array_to_string(range(0, n, {FRAME_STRIDE}), ',')
            ELSE '' END AS frame_offsets,
       CASE WHEN n > 0 THEN len(range(0, n, {FRAME_STRIDE}))
            ELSE 0 END::INTEGER AS n_frames
FROM p
"""


def q_web_kind_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind page/byte rollup WITH grand total via SQL ROLLUP —
    exercises the spark.sql surface and grouping-sets planning
    (partial aggregation per grouping set, one shuffle)."""
    _pages_with_kind(spark).createOrReplaceTempView("pages_kinds")
    return spark.sql("""
        SELECT coalesce(kind, 'ALL') AS kind,
               grouping(kind)::INT AS is_total,
               count(*) AS n_pages,
               sum(length(html)) AS total_bytes
        FROM pages_kinds
        GROUP BY ROLLUP(kind)
    """)


_ORACLE_KIND_ROLLUP = f"""
WITH p AS (
  SELECT CASE WHEN octet_length(html) = 0 THEN 'empty'
              WHEN starts_with(hex(html), '{_HEX_PDF}') THEN 'pdf'
              WHEN starts_with(hex(html), '{_HEX_ZIP}') THEN 'zip'
              WHEN starts_with(hex(html), '{_HEX_PNG}') THEN 'png'
              WHEN starts_with(hex(html), '{_HEX_HTML}') THEN 'html'
              ELSE 'other' END AS kind,
         octet_length(html) AS n_bytes
  FROM read_parquet('{PAGES_GLOB}'))
SELECT coalesce(kind, 'ALL') AS kind,
       grouping(kind)::INTEGER AS is_total,
       count(*)::BIGINT AS n_pages,
       sum(n_bytes)::BIGINT AS total_bytes
FROM p GROUP BY ROLLUP(kind)
"""


# -- web-corpus stats (salted skew-safe aggregation) ------------------------------

def q_web_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain rollup over the Zipf-skewed pages table using the
    two-phase SALTED aggregation (ops/webstats.py); the oracle is the
    naive group-by — identical results, different shuffle shape."""
    from .ops.webstats import domain_stats_salted
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH).select("url", "html")
    return domain_stats_salted(pages)


_ORACLE_DOMAIN_STATS = f"""
SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS domain,
       count(*)::BIGINT AS n_pages,
       sum(octet_length(html))::BIGINT AS total_bytes
FROM read_parquet('{PAGES_GLOB}')
GROUP BY 1
"""


def q_web_domain_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-side skew demonstration: pages (Zipf-skewed domain key,
    two hot domains ≈40% of rows) ⋈ a per-domain dim via the SALTED
    join (ops/webstats.salted_skew_join — fact-side deterministic salt,
    dim exploded ×n_salts, merge-hinted so no broadcast hides the
    shuffle), then a per-tier rollup. Row-identical to the unsalted
    join — the oracle computes the same answer with a plain SQL join."""
    from .ops import webstats
    ensure_pages()
    pages = (spark.read.parquet(PAGES_PATH)
             .select("url",
                     F.length("html").cast("long").alias("n_bytes")))
    facts = pages.withColumn("domain",
                             webstats.domain_of(F.col("url")))
    dim = (facts.select("domain").distinct()
           .withColumn("tier", (F.length("domain") % 3).cast("int")))
    joined = webstats.salted_skew_join(
        facts, dim, "domain",
        F.pmod(F.xxhash64("url"), F.lit(webstats.N_SALTS)))
    return (joined.groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("domain").alias("n_domains"),
                 F.sum("n_bytes").alias("total_bytes")))


def q_web_domain_join_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AQE-native twin of web_domain_join_salted: the SAME Zipf
    join with NO salt column — runtime skew-split via
    spark.sql.adaptive.skewJoin (ops/webstats.aqe_skew_join). The
    query materializes under the low test-scale thresholds and
    restores the session confs before returning, so later queries plan
    under the session defaults; tests/test_plans.py asserts the final
    adaptive plan actually carries the skew=true split."""
    from .ops import webstats
    ensure_pages()
    pages = (spark.read.parquet(PAGES_PATH)
             .select("url",
                     F.length("html").cast("long").alias("n_bytes")))
    facts = pages.withColumn("domain",
                             webstats.domain_of(F.col("url")))
    # localCheckpoint: materialize the dim so the join plans a clean
    # Exchange→Sort→SMJ on the dim side — with a lineage-linked
    # distinct() on the join key, Catalyst reuses the distinct's
    # partitioning and the final HashAggregate lands between shuffle
    # and join, which defeats OptimizeSkewedJoin's pattern match
    # (see ops/webstats.aqe_skew_join docstring). In production the
    # dim is a table scan and this happens naturally.
    dim = (facts.select("domain").distinct()
           .withColumn("tier", (F.length("domain") % 3).cast("int"))
           .localCheckpoint())
    old = {k: spark.conf.get(k, None)
           for k in webstats.AQE_SKEW_CONFS}
    for k, v in webstats.AQE_SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        joined = webstats.aqe_skew_join(facts, dim, "domain")
        out = (joined.groupBy("tier")
               .agg(F.count(F.lit(1)).alias("n_pages"),
                    F.countDistinct("domain").alias("n_domains"),
                    F.sum("n_bytes").alias("total_bytes"))
               .localCheckpoint())  # eager: executes under the confs
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


_ORACLE_DOMAIN_JOIN = f"""
WITH p AS (
  SELECT url, octet_length(html)::BIGINT AS n_bytes,
         regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS domain
  FROM read_parquet('{PAGES_GLOB}')),
d AS (SELECT DISTINCT domain, (length(domain) % 3)::INTEGER AS tier
      FROM p)
SELECT d.tier, count(*)::BIGINT AS n_pages,
       count(DISTINCT p.domain)::BIGINT AS n_domains,
       sum(p.n_bytes)::BIGINT AS total_bytes
FROM p JOIN d USING (domain)
GROUP BY d.tier
"""


# -- events / relational ----------------------------------------------------------

SESSION_GAP_S = 1800


def q_evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session breaks per user — the window-
    function pattern a training pipeline uses for event grouping."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(
        F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    return (ev.withColumn("new_s", new_s)
            .groupBy("user_id")
            .agg(F.sum("new_s").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value")))


_ORACLE_SESSIONIZE = f"""
WITH x AS (
  SELECT user_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts)
                      > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id::BIGINT AS user_id,
       sum(new_s)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS total_value
FROM x GROUP BY user_id
"""


def q_evt_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event windows per type (the batch analogue of a
    streaming windowed aggregation) + JSON prop extraction from the
    `props` column — window() and get_json_object stay whole-stage
    codegen; one shuffle on (window, type)."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev
            .withColumn("k", k)
            .groupBy(F.window("ts", "1 hour").getField("start")
                     .alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"),
                 F.round(F.avg("k"), 6).alias("avg_k"))
            .select(F.date_format("w", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "event_type", "n_events", "total_value", "avg_k"))


_ORACLE_EVT_WINDOWS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS total_value,
       round(avg(json_extract(props, '$.k')::INTEGER), 6) AS avg_k
FROM events
GROUP BY 1, 2
"""


def q_evt_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase event matched to the same user's most
    recent click at-or-before it. Expressed the scale-out way — union
    both sides, one window per user ordered by event time, carry the
    last click forward with last(ignorenulls) — ONE shuffle on
    user_id, no per-key loops, no range explosion; the DuckDB oracle
    uses its native ASOF JOIN, so the two formulations check each
    other. Clicks sort before purchases at equal timestamps, matching
    ASOF's inclusive (>=) semantics."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    clicks = ev.where(F.col("event_type") == "click")
    purch = ev.where(F.col("event_type") == "purchase")
    u = (clicks.select("user_id", "ts", "event_id",
                       F.lit(0).alias("is_p"))
         .unionByName(purch.select("user_id", "ts", "event_id",
                                   F.lit(1).alias("is_p"))))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "is_p", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    click_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    out = (u.withColumn("asof_click_ts",
                        F.last(click_ts, ignorenulls=True).over(w))
           .where(F.col("is_p") == 1)
           .select(F.col("event_id").alias("purchase_id"),
                   "user_id",
                   F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                   .alias("purchase_ts"),
                   F.coalesce(
                       F.date_format("asof_click_ts",
                                     "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                       F.lit("NONE")).alias("asof_click_ts")))
    return out


_ORACLE_ASOF = """
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       coalesce(strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f'), 'NONE')
           AS asof_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_evt_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type — a HOLISTIC
    aggregate (sort-based, cannot partial-aggregate map-side). Exact is
    the correctness baseline the oracle can check; at 100 TB the same
    query swaps F.percentile for F.approx_percentile (t-digest-style
    mergeable sketch, map-side combinable) — the evt_user_reach_approx
    query demonstrates that sketch path for distinct counts."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.percentile("value", F.lit(0.5)), 6)
                 .alias("p50"),
                 F.round(F.percentile("value", F.lit(0.95)), 6)
                 .alias("p95"),
                 F.round(F.percentile("value", F.lit(0.99)), 6)
                 .alias("p99")))


_ORACLE_EVT_QUANTILES = """
SELECT event_type, count(*)::BIGINT AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def q_evt_value_quantiles_approx(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The 100 TB twin of evt_value_quantiles: approx_percentile
    (Greenwald-Khanna mergeable sketch, accuracy 10000 → ε≈1e-4) IS
    map-side combinable, so the holistic sort per group disappears —
    this is the form that survives scale. The rank-error bound vs the
    exact query is asserted in tests; the VALUE is additionally pinned
    by a committed golden registry. Determinism contract for the
    registry: for a fixed parquet file set, the sketch result is
    stable across executor counts and repeat runs — verified
    empirically at local[2] vs local[32] × repeated runs on both sf
    dirs (the per-split GK summaries always see each file-split's rows
    in file order, and at ε≈1e-4 the summary stays effectively exact
    at these cardinalities, so merge order can't shift a quantile).
    Any change to accuracy, the events fixtures, or Spark's
    QuantileSummaries ⇒ rerun tests/gen_approx_goldens.py."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    acc = F.lit(10000)
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.approx_percentile(
                     "value", F.lit(0.5), acc), 6).alias("p50"),
                 F.round(F.approx_percentile(
                     "value", F.lit(0.95), acc), 6).alias("p95"),
                 F.round(F.approx_percentile(
                     "value", F.lit(0.99), acc), 6).alias("p99")))


def q_evt_user_reach_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HyperLogLog++ sketch
    (approx_count_distinct, 2% target rsd) next to the exact count —
    the mergeable-sketch pattern that replaces exact distinct at
    100 TB (the sketch partial-aggregates map-side; exact distinct
    needs a full shuffle of the distinct pairs). Approximate by design
    → no SQL oracle; relative error asserted in tests."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                 F.countDistinct("user_id").alias("exact_users")))


def q_rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style aggregation (hash agg with map-side partials)."""
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2)
                 .alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order")))


_ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)
           AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_rel_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style join + agg + top-N; the small dimension side
    (customer filter) is broadcast explicitly."""
    cust = spark.read.parquet(_t(sf_dir, "customer"))
    orders = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    building = cust.where(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(building),
                  orders.o_custkey == F.col("c_custkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10))


_ORACLE_TOP_REVENUE = """
SELECT o_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_rel_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-key via window row_number (the resume/dedup-by-url
    pattern from SURVEY.md §2.11)."""
    orders = spark.read.parquet(_t(sf_dir, "orders"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice"))


_ORACLE_LATEST_ORDER = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
WHERE rn = 1
"""


def q_rel_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style multi-way join: revenue per nation inside one
    region and year, with the local-supplier condition (customer and
    supplier share a nation). The whole dimension chain
    (region→nation, customer, supplier) is broadcast — only the
    lineitem⋈orders fact join shuffles."""
    region = spark.read.parquet(_t(sf_dir, "region"))
    nation = spark.read.parquet(_t(sf_dir, "nation"))
    cust = spark.read.parquet(_t(sf_dir, "customer"))
    supp = spark.read.parquet(_t(sf_dir, "supplier"))
    orders = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    dims = (nation
            .join(F.broadcast(region.where(F.col("r_name") == "EUROPE")),
                  nation.n_regionkey == F.col("r_regionkey")))
    return (li
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .where(F.col("c_nationkey") == F.col("s_nationkey"))
            .join(F.broadcast(dims),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .where((F.col("o_orderdate") >= "1996-01-01")
                   & (F.col("o_orderdate") < "1997-01-01"))
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name")))


_ORACLE_REGION_REVENUE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q_rel_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style conditional-aggregate ratio: share of revenue
    from PROMO parts in one month; part side broadcast."""
    part = spark.read.parquet(_t(sf_dir, "part"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li
            .where((F.col("l_shipdate") >= "1996-03-01")
                   & (F.col("l_shipdate") < "1996-04-01"))
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg(F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                        .otherwise(F.lit(0.0)))
                / F.sum(rev), 4).alias("promo_revenue_pct")))


_ORACLE_PROMO_SHARE = """
SELECT round(100.0
             * sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4)
           AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


def q_rel_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-OPERATION coverage (§2.11): customers who ordered in 1995
    but not in 1996 — EXCEPT (distinct) via DataFrame.subtract. At
    scale this plans as a single hash shuffle on the key with
    map-side distinct partials on both branches (no join explosion);
    the oracle is the literal SQL EXCEPT."""
    o = spark.read.parquet(_t(sf_dir, "orders"))
    y95 = (o.where(F.year("o_orderdate") == 1995)
           .select("o_custkey"))
    y96 = (o.where(F.year("o_orderdate") == 1996)
           .select("o_custkey"))
    return y95.subtract(y96)


_ORACLE_LAPSED = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


# -- url hygiene + repetition + packing (r4) ---------------------------------
#
# These run over two dedicated deterministic fixtures (url-variant
# crawl log; repetition corpus) because the driver tables carry no
# url-noise or repeated-sentence signal; both fixtures follow the
# pages-table contract (directory of parquet parts, DuckDB reads the
# identical bytes via glob).

N_URLLOG = 6000
URLLOG_PATH = f"/tmp/ekspark_urllog_v1_{N_URLLOG}"
URLLOG_GLOB = f"{URLLOG_PATH}/*.parquet"

N_REP_DOCS = 3000
REP_DOCS_PATH = f"/tmp/ekspark_repdocs_v1_{N_REP_DOCS}"
REP_DOCS_GLOB = f"{REP_DOCS_PATH}/*.parquet"


def ensure_url_log(path: str = URLLOG_PATH, n: int = N_URLLOG) -> str:
    from .fixtures import write_url_log_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_url_log_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


def ensure_rep_docs(path: str = REP_DOCS_PATH,
                    n: int = N_REP_DOCS) -> str:
    from .fixtures import write_rep_docs_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_rep_docs_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


def q_web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Url-level dedup over the variant crawl log: canonicalize
    (pure-expression regex chain, WholeStageCodegen) then group — one
    hash shuffle on a skinny (canonical, url, ts) projection. The
    oracle runs the LITERAL same regex chain in DuckDB (every pattern
    is RE2-safe by construction), so canonicalization semantics are
    pinned cross-engine, not just the grouping."""
    ensure_url_log()
    log = _read_parallel(spark, URLLOG_GLOB)
    return weburl.url_dedup(log)


# the same five-step normalizer as weburl.canonical_url, staged
# through CTEs; 'g' on the tracking-param strip mirrors Spark's
# replace-all default
_ORACLE_URL_CANON_CTE = f"""
lg AS (SELECT url, warc_ts FROM read_parquet('{URLLOG_GLOB}')),
st AS (SELECT url, warc_ts,
  lower(regexp_extract(url,
        '^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*)', 1)) AS h0,
  regexp_replace(url,
        '^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*)', '') AS r0
 FROM lg),
st2 AS (SELECT url, warc_ts,
  regexp_replace(h0, ':(80|443)$', '') AS h,
  regexp_replace(regexp_replace(regexp_replace(r0, '#.*$', ''),
        '(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&?', '', 'g'),
        '[?&]+$', '') AS r1
 FROM st),
canon AS (SELECT url, warc_ts,
  h || (CASE WHEN r1 = '/' THEN r1
        ELSE regexp_replace(r1, '/+$', '') END) AS canonical_url
 FROM st2)"""

_ORACLE_URL_DEDUP = f"""
WITH {_ORACLE_URL_CANON_CTE}
SELECT canonical_url, count(*)::BIGINT AS n_variants,
       min(url) AS first_url, min(warc_ts) AS first_ts
FROM canon GROUP BY 1
"""

DOMAIN_CAP_K = 3


def q_web_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-frontier politeness pass: canonicalize → url-dedup →
    keep the k earliest canonical pages per domain. The Spark side
    runs the SALTED two-phase rank (a hot domain — the fixture's two
    hot domains own 40% of urls, like real crawls — is spread over 16
    reducers, then the global rank sees ≤ 16k rows/domain); the
    oracle is the naive single window, proving the salted plan is
    output-identical."""
    ensure_url_log()
    log = _read_parallel(spark, URLLOG_GLOB)
    canon = weburl.url_dedup(log).select(
        F.col("canonical_url").alias("url"),
        F.col("first_ts").alias("warc_ts"))
    return weburl.domain_cap(canon, k=DOMAIN_CAP_K)


_ORACLE_DOMAIN_CAP = f"""
WITH {_ORACLE_URL_CANON_CTE},
grp AS (SELECT canonical_url AS url, min(warc_ts) AS warc_ts
        FROM canon GROUP BY 1),
r AS (SELECT url,
        regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS domain,
        warc_ts,
        row_number() OVER (
          PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)/', 1)
          ORDER BY warc_ts ASC, url ASC)::BIGINT AS rank_in_domain
      FROM grp)
SELECT url, domain, warc_ts, rank_in_domain
FROM r WHERE rank_in_domain <= {DOMAIN_CAP_K}
"""


def q_ts_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates over the repetition corpus (1/3
    template-spam docs whose repeated sentences / dominant bigram are
    the only tell). Sentence stats are pure row expressions; the
    bigram share is explode → two partial-agg groupBys — the hot path
    shuffles per-doc partial counts, never token streams."""
    ensure_rep_docs()
    docs = _read_parallel(spark, REP_DOCS_GLOB)
    return textstats.repetition_stats(docs)


_ORACLE_TS_REPETITION = f"""
WITH d AS (SELECT doc_id, text FROM read_parquet('{REP_DOCS_GLOB}')),
s AS (SELECT doc_id,
        regexp_split_to_array(text, '\\. ') AS sents,
        regexp_split_to_array(
          regexp_replace(lower(text), '\\.', '', 'g'), '\\s+') AS toks
      FROM d),
base AS (SELECT doc_id,
        len(sents)::BIGINT AS n_sents,
        round(1.0 - len(list_distinct(list_transform(
              sents, x -> regexp_replace(x, '\\.$', ''))))
            / len(sents), 6) AS dup_sent_frac,
        toks
      FROM s),
g AS (SELECT doc_id,
        unnest(CASE WHEN len(toks) <= 1 THEN []::VARCHAR[]
               ELSE list_transform(range(1, len(toks)),
                    i -> concat_ws(' ', toks[i], toks[i+1])) END) AS gm
      FROM base),
c AS (SELECT doc_id, gm, count(*) AS n FROM g GROUP BY 1, 2),
t AS (SELECT doc_id, round(max(n) / sum(n), 6) AS top_bigram_share
      FROM c GROUP BY 1)
SELECT b.doc_id, b.n_sents, b.dup_sent_frac,
       coalesce(t.top_bigram_share, 0.0) AS top_bigram_share
FROM base b LEFT JOIN t USING (doc_id)
"""

def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mixture manifest (corpus.assembly_manifest): per
    (source, lang_pred, split) doc/token/char totals + quality-pass
    counts + token share — the composition report every dataset
    release ships. One skinny groupBy over the scan; the share window
    runs over the constant-size aggregated frame only."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return corpus.assembly_manifest(docs, min_quality=MIN_QUALITY)


_ORACLE_MANIFEST = f"""
WITH s AS ({_ORACLE_TS_STATS}),
j AS (SELECT s.doc_id, s.n_tokens, s.quality_score, s.lang_pred,
             length(d.text)::BIGINT AS n_chars, d.source,
             {_SPLIT_SQL} AS bucket
      FROM s JOIN documents d USING (doc_id)),
g AS (SELECT source, lang_pred,
             CASE WHEN bucket < 8000 THEN 'train'
                  WHEN bucket < 9000 THEN 'val' ELSE 'test'
             END AS split,
             count(*)::BIGINT AS n_docs,
             sum(n_tokens)::BIGINT AS n_tokens,
             sum(n_chars)::BIGINT AS n_chars,
             sum(CASE WHEN quality_score >= {MIN_QUALITY} THEN 1
                      ELSE 0 END)::BIGINT AS n_quality_ok
      FROM j GROUP BY source, lang_pred, 3)
SELECT *, n_tokens::DOUBLE / sum(n_tokens) OVER () AS token_share
FROM g
"""


# LM-gated curation: quality gate AND a CCNet-style perplexity cut.
# 10 nats/bigram (= 10e6 micro-nats) sits between the Zipf corpus's
# median (~9.8e6) and 90th percentile (~10.9e6) mean cost, so the LM
# gate does real, non-degenerate work in the composed pipeline.
# Bigram-less docs score avg NULL and are excluded by the <= —
# identical three-valued logic in both engines.
LM_MAX_AVG_COST_MICRO = 10_000_000


def q_corpus_curate_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet story end-to-end: train the bigram LM on the corpus,
    score every doc, and curate with BOTH the heuristic quality gate
    and the LM mean-cost cut, then split deterministically — the
    perplexity-filter pipeline of Wenzek et al. 2020 as one Spark
    dataflow. Scale shape: union of the pieces' shapes — trainer
    aggregations + broadcast-LM scoring join + one per-doc stats/gate
    projection; the corpus text crosses no Exchange."""
    ensure_zipf_docs()
    docs = _read_parallel(spark, ZIPF_DOCS_GLOB)
    model = lm_ops.train_bigram_lm(docs, min_count=_LM_MIN_COUNT,
                                   top_k=_LM_TOP_K)
    scored = lm_ops.lm_score(docs, model)
    stats = textstats.with_text_stats(docs)
    gated = (stats.join(scored.select("doc_id", "n_bigrams",
                                      "oov_bigrams",
                                      "avg_cost_micro"), "doc_id")
             .where((F.col("quality_score") >= MIN_QUALITY)
                    & (F.col("avg_cost_micro")
                       <= LM_MAX_AVG_COST_MICRO)))
    return corpus.deterministic_split(gated).select(
        "doc_id", "n_tokens", "quality_score", "lang_pred",
        "avg_cost_micro", "bucket", "split")


_ORACLE_CURATE_LM = (
    _LM_SQL_COMMON.format(mc=_LM_MIN_COUNT, tk=_LM_TOP_K) + f""",
per AS (
  SELECT bt.doc_id,
         count(*)::BIGINT AS n_bigrams,
         sum(COALESCE(l.cost_micro, {lm_ops.OOV_COST_MICRO}))::BIGINT
             AS cost_sum_micro
  FROM bt LEFT JOIN lmk l USING (bigram) GROUP BY bt.doc_id),
s AS (SELECT * FROM ({_ORACLE_TS_STATS_ZIPF})),
g AS (
  SELECT s.doc_id, s.n_tokens, s.quality_score, s.lang_pred,
         p.cost_sum_micro::DOUBLE / p.n_bigrams AS avg_cost_micro,
         {_SPLIT_SQL.replace("doc_id", "s.doc_id")} AS bucket
  FROM s JOIN per p USING (doc_id)
  WHERE s.quality_score >= {MIN_QUALITY}
    AND p.n_bigrams > 0
    AND p.cost_sum_micro::DOUBLE / p.n_bigrams
        <= {LM_MAX_AVG_COST_MICRO})
SELECT doc_id, n_tokens, quality_score, lang_pred, avg_cost_micro,
       bucket,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
FROM g
""")


PACK_BUDGET = 512
PACK_STREAMS = 8


def q_corpus_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence-packing plan over the documents table:
    (stream, pack_id, pack_offset) per doc for concat-then-chunk
    pretraining batches. Pure function of (salt, ids, token counts) —
    the oracle recomputes the identical md5-bucket stream assignment
    and running-sum offsets in SQL."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return corpus.pack_plan(docs, budget=PACK_BUDGET,
                            n_streams=PACK_STREAMS)


_ORACLE_PACK_PLAN = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(text, '\\s+'))::BIGINT AS n_tokens,
         ((('0x' || substring(md5('pack-v1:' || doc_id::VARCHAR),
             1, 8))::BIGINT) % {PACK_STREAMS}) AS stream
  FROM documents),
o AS (
  SELECT doc_id, n_tokens, stream,
         (sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id ASC)
          - n_tokens)::BIGINT AS pack_offset
  FROM t)
SELECT doc_id, n_tokens, stream, pack_offset,
       floor(pack_offset / {PACK_BUDGET})::BIGINT AS pack_id
FROM o
"""


# -- PII / line-dedup / decontamination (r4) ---------------------------------

N_PII_DOCS = 2000
PII_DOCS_PATH = f"/tmp/ekspark_piidocs_v1_{N_PII_DOCS}"
PII_DOCS_GLOB = f"{PII_DOCS_PATH}/*.parquet"

N_LINE_DOCS = 3000
LINE_DOCS_PATH = f"/tmp/ekspark_linedocs_v1_{N_LINE_DOCS}"
LINE_DOCS_GLOB = f"{LINE_DOCS_PATH}/*.parquet"

N_BENCH_ITEMS = 400
BENCH_ITEMS_PATH = f"/tmp/ekspark_benchitems_v2_{N_BENCH_ITEMS}"
BENCH_ITEMS_GLOB = f"{BENCH_ITEMS_PATH}/*.parquet"


def ensure_pii_docs(path: str = PII_DOCS_PATH,
                    n: int = N_PII_DOCS) -> str:
    from .fixtures import write_pii_docs_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_pii_docs_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


def ensure_line_docs(path: str = LINE_DOCS_PATH,
                     n: int = N_LINE_DOCS) -> str:
    from .fixtures import write_line_docs_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_line_docs_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


def ensure_bench_items(path: str = BENCH_ITEMS_PATH,
                       n: int = N_BENCH_ITEMS) -> str:
    from .fixtures import write_bench_items_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_bench_items_dir(tmp, n, n_docs=N_ZIPF_DOCS, n_files=4)
        os.replace(tmp, path)
    return path


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the injected-PII corpus: redacted text + staged
    per-class counts, pure regexp expressions (ops/pii.py). The
    oracle interpolates the SAME pattern constants into DuckDB, so
    the redaction bytes — not just counts — are pinned cross-engine;
    recall vs the fixture's known injection counts is pinned in
    test_ops."""
    ensure_pii_docs()
    docs = _read_parallel(spark, PII_DOCS_GLOB)
    return pii.scrub(docs)


from .ops.pii import EMAIL_RE, IPV4_RE, PHONE_RE  # noqa: E402

_ORACLE_PII = f"""
WITH d AS (SELECT doc_id, text FROM read_parquet('{PII_DOCS_GLOB}')),
s AS (SELECT doc_id, text AS t0,
        regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM d),
s2 AS (SELECT *, regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
       FROM s),
s3 AS (SELECT *,
        regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS t3
       FROM s2)
SELECT doc_id, t3 AS clean_text,
       len(regexp_extract_all(t0, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(t1, '{IPV4_RE}'))::BIGINT AS n_ips,
       len(regexp_extract_all(t2, '{PHONE_RE}'))::BIGINT AS n_phones,
       (len(regexp_extract_all(t0, '{EMAIL_RE}'))
        + len(regexp_extract_all(t1, '{IPV4_RE}'))
        + len(regexp_extract_all(t2, '{PHONE_RE}'))) > 0 AS has_pii
FROM s3
"""

LINE_MAX_DF = 2


DUP_SPAN_N, DUP_SPAN_MIN_DF = 5, 2


def q_ts_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring coverage
    (textstats.dup_span_coverage): per doc, the fraction of token
    positions covered by a 5-gram occurring in >= 2 documents — the
    Lee-et-al/RefinedWeb dup-span signal at fixed granularity,
    completing the duplicate-text ladder below line level. Runs over
    the line corpus, whose cross-doc boilerplate pool is the planted
    ground truth."""
    ensure_line_docs()
    docs = _read_parallel(spark, LINE_DOCS_GLOB.rsplit("/", 1)[0])
    return textstats.dup_span_coverage(docs, n=DUP_SPAN_N,
                                       min_df=DUP_SPAN_MIN_DF)


_ORACLE_TS_DUP_SPANS = f"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
         END AS toks
  FROM read_parquet('{LINE_DOCS_GLOB}')),
pg AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i:i+{DUP_SPAN_N}-1], ' ') AS g
  FROM docs, unnest(generate_series(
      1, greatest(len(toks) - {DUP_SPAN_N} + 1, 0))) AS t(i)),
dg AS (SELECT g FROM pg GROUP BY g
       HAVING count(DISTINCT doc_id) >= {DUP_SPAN_MIN_DF}),
dp AS (SELECT doc_id, pos FROM pg JOIN dg USING (g)),
dp2 AS (
  SELECT doc_id,
         least({DUP_SPAN_N}, COALESCE(lead(pos) OVER (
             PARTITION BY doc_id ORDER BY pos) - pos,
             {DUP_SPAN_N})) AS c
  FROM dp),
cov AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_grams,
         sum(c)::BIGINT AS dup_tokens
  FROM dp2 GROUP BY doc_id)
SELECT d.doc_id, len(d.toks)::BIGINT AS n_tokens,
       COALESCE(c.n_dup_grams, 0)::BIGINT AS n_dup_grams,
       COALESCE(c.dup_tokens, 0)::BIGINT AS dup_tokens,
       CASE WHEN len(d.toks) > 0
            THEN COALESCE(c.dup_tokens, 0)::DOUBLE / len(d.toks)
            ELSE 0.0 END AS dup_coverage
FROM docs d LEFT JOIN cov c USING (doc_id)
"""


def q_ts_dup_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span REMOVAL
    (textstats.dup_span_strip): RefinedWeb-style exact-substring
    dedup — every token interval covered by a 5-gram occurring in
    ≥ 2 docs is deleted, overlapping intervals merged via
    gaps-and-islands, rewritten text rebuilt case-preserving. The
    oracle rebuilds the text independently (NOT EXISTS interval
    containment + ordered string_agg), so the rewrite is pinned
    byte-identically, not just counted."""
    ensure_line_docs()
    docs = _read_parallel(spark, LINE_DOCS_GLOB.rsplit("/", 1)[0])
    return textstats.dup_span_strip(docs, n=DUP_SPAN_N,
                                    min_df=DUP_SPAN_MIN_DF)


_ORACLE_TS_DUP_STRIP = f"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+')
         END AS toks
  FROM read_parquet('{LINE_DOCS_GLOB}')),
pg AS (
  SELECT doc_id, i AS pos,
         lower(array_to_string(toks[i:i+{DUP_SPAN_N}-1], ' ')) AS g
  FROM docs, unnest(generate_series(
      1, greatest(len(toks) - {DUP_SPAN_N} + 1, 0))) AS t(i)),
dg AS (SELECT g FROM pg GROUP BY g
       HAVING count(DISTINCT doc_id) >= {DUP_SPAN_MIN_DF}),
dp AS (SELECT doc_id, pos FROM pg JOIN dg USING (g)),
br AS (SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
              ORDER BY pos) >= {DUP_SPAN_N} THEN 1 ELSE 0 END AS brk
       FROM dp),
isl AS (SELECT doc_id, pos,
          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        FROM br),
iv AS (SELECT doc_id, gid, min(pos) AS s,
              max(pos) + {DUP_SPAN_N} - 1 AS e
       FROM isl GROUP BY doc_id, gid),
agg AS (SELECT doc_id, count(*)::BIGINT AS spans_removed,
          sum(e - s + 1)::BIGINT AS tokens_removed
        FROM iv GROUP BY doc_id),
tok AS (SELECT doc_id, unnest(toks) AS tk,
               unnest(range(1, len(toks) + 1)) AS i
        FROM docs),
kept AS (SELECT t.doc_id, t.tk, t.i FROM tok t
         WHERE NOT EXISTS (SELECT 1 FROM iv
             WHERE iv.doc_id = t.doc_id
               AND t.i BETWEEN iv.s AND iv.e)),
txt AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS text
        FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(x.text, '') AS text,
       len(d.toks)::BIGINT AS n_tokens,
       COALESCE(a.tokens_removed, 0)::BIGINT AS tokens_removed,
       COALESCE(a.spans_removed, 0)::BIGINT AS spans_removed
FROM docs d LEFT JOIN txt x USING (doc_id)
            LEFT JOIN agg a USING (doc_id)
"""


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup over the newline corpus (a 6-line
    boilerplate pool recurs across ~half the docs; natural lines carry
    unique suffixes): lines in > LINE_MAX_DF distinct docs are
    removed everywhere, survivors reassembled in order. Oracle
    recomputes hot lines in SQL and filters each doc's line array."""
    ensure_line_docs()
    docs = _read_parallel(spark, LINE_DOCS_GLOB)
    return dedup.line_dedup(docs, max_doc_freq=LINE_MAX_DF)


_ORACLE_LINE_DEDUP = f"""
WITH d AS (SELECT doc_id,
             regexp_split_to_array(text, chr(10)) AS ls
           FROM read_parquet('{LINE_DOCS_GLOB}')),
l AS (SELECT doc_id, unnest(ls) AS line FROM d),
hot AS (SELECT line FROM l GROUP BY line
        HAVING count(DISTINCT doc_id) > {LINE_MAX_DF}),
hotl AS (SELECT coalesce(list(line), []::VARCHAR[]) AS hl FROM hot)
SELECT doc_id,
       array_to_string(list_filter(ls, x -> NOT list_contains(hl, x)),
                       chr(10)) AS clean_text,
       len(ls)::BIGINT AS n_lines,
       len(list_filter(ls, x -> NOT list_contains(hl, x)))::BIGINT
           AS n_kept
FROM d, hotl
"""

CONTAM_N = 8


def q_contamination_8gram(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every (training doc, eval item) pair
    sharing an 8-gram, with the item's overlap fraction
    (ops/contamination.py — distinct-gram explode on both sides, eval
    side broadcast, training payload never reshuffled). Runs over the
    Zipf corpus (both the corpus and the planted 10-24-token eval
    spans are pure functions of the seed, so the signal exists at any
    sf; the driver documents table differs between sf dirs and can't
    anchor cross-sf goldens). Recovery of exactly the planted pairs is
    pinned in test_ops."""
    ensure_zipf_docs()
    ensure_bench_items()
    docs = _read_parallel(spark, ZIPF_DOCS_GLOB)
    bench = _read_parallel(spark, BENCH_ITEMS_GLOB)
    return contamination.ngram_overlap(docs, bench, n=CONTAM_N)


_ORACLE_CONTAM = f"""
WITH dt AS (SELECT doc_id,
              regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM read_parquet('{ZIPF_DOCS_GLOB}')),
bt AS (SELECT bench_id,
         regexp_split_to_array(lower(trim(question)), '\\s+') AS t
       FROM read_parquet('{BENCH_ITEMS_GLOB}')),
dg AS (SELECT DISTINCT doc_id, gm FROM (
        SELECT doc_id, unnest(CASE WHEN len(t) < {CONTAM_N}
          THEN []::VARCHAR[]
          ELSE list_transform(range(1, len(t) - {CONTAM_N - 2}),
               i -> array_to_string(t[i:i + {CONTAM_N - 1}], ' '))
          END) AS gm FROM dt)),
bg AS (SELECT DISTINCT bench_id, gm FROM (
        SELECT bench_id, unnest(CASE WHEN len(t) < {CONTAM_N}
          THEN []::VARCHAR[]
          ELSE list_transform(range(1, len(t) - {CONTAM_N - 2}),
               i -> array_to_string(t[i:i + {CONTAM_N - 1}], ' '))
          END) AS gm FROM bt)),
sz AS (SELECT bench_id, count(*) AS bench_grams FROM bg GROUP BY 1),
h AS (SELECT d.doc_id, b.bench_id, count(*) AS n_shared
      FROM dg d JOIN bg b ON d.gm = b.gm GROUP BY 1, 2)
SELECT h.doc_id, h.bench_id, n_shared::BIGINT AS n_shared,
       bench_grams::BIGINT AS bench_grams,
       round(n_shared / bench_grams, 6) AS overlap_frac
FROM h JOIN sz USING (bench_id)
"""


PAGES_V2_PATH = f"/tmp/ekspark_pages_v2snap_{N_PAGES}"
PAGES_V2_GLOB = f"{PAGES_V2_PATH}/*.parquet"


def ensure_pages_v2(path: str = PAGES_V2_PATH,
                    n: int = N_PAGES) -> str:
    from .fixtures import write_pages_v2_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_pages_v2_dir(tmp, n, n_files=8)
        os.replace(tmp, path)
    return path


def q_web_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl snapshot diff over the pages table and its
    one-cycle-later twin (deterministic per-url fates: 5% gone, ~9%
    changed, 5% added): the pass that shrinks a 10^12-url recrawl to
    re-extracting only the changed slice. Payloads are digested
    map-side; the full-outer join moves (url, digest, ts) only."""
    ensure_pages()
    ensure_pages_v2()
    old = _read_parallel(spark, PAGES_GLOB)
    new = _read_parallel(spark, PAGES_V2_GLOB)
    return weburl.crawl_diff(old, new)


_ORACLE_CRAWL_DIFF = f"""
WITH o AS (SELECT url, md5(hex(html)) AS h, warc_ts
           FROM read_parquet('{PAGES_GLOB}')),
nw AS (SELECT url, md5(hex(html)) AS h, warc_ts
       FROM read_parquet('{PAGES_V2_GLOB}'))
SELECT coalesce(o.url, nw.url) AS url,
       CASE WHEN o.url IS NULL THEN 'added'
            WHEN nw.url IS NULL THEN 'gone'
            WHEN o.h != nw.h THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.warc_ts AS ts_old, nw.warc_ts AS ts_new
FROM o FULL OUTER JOIN nw ON o.url = nw.url
"""


MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
MIX_BUDGET = 10_000


def q_corpus_mixture_sample(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling over the documents table:
    per-source keep rates min(1, weight·budget / source_tokens), the
    keep decision a hashed-id bucket compare (never rand()). The
    chosen weights/budget exercise both regimes: src0/src1 clamp to
    rate 1.0 (under-weighted corpus smaller than its share), src2/src3
    subsample; unweighted sources drop entirely."""
    docs = _read_parallel(spark, _t(sf_dir, "documents"))
    return corpus.mixture_sample(docs, MIX_WEIGHTS,
                                 total_tokens=MIX_BUDGET)


_MIX_VALUES = ", ".join(f"('{k}', {v})"
                        for k, v in sorted(MIX_WEIGHTS.items()))

_ORACLE_MIXTURE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(text, '\\s+'))::BIGINT AS n_tokens,
         (('0x' || substring(md5('mix-v1:' || doc_id::VARCHAR), 1, 8))
             ::BIGINT % 10000) AS bucket
  FROM documents),
s AS (SELECT source, sum(n_tokens) AS src_tokens
      FROM t GROUP BY 1),
w(source, weight) AS (VALUES {_MIX_VALUES}),
r AS (SELECT s.source,
        least(1.0, w.weight::DOUBLE * {MIX_BUDGET} / s.src_tokens)
            AS keep_rate
      FROM s JOIN w USING (source))
SELECT t.doc_id, t.source, t.n_tokens, t.bucket,
       round(r.keep_rate, 6) AS keep_rate
FROM t JOIN r USING (source)
WHERE t.bucket < r.keep_rate * 10000
"""


# v2: +AESV2 variant in the RC4-40/RC4-128/AES cycle
PAGES_ENC_PATH = f"/tmp/ekspark_pages_enc_v2_{N_PAGES}"
PAGES_ENC_GLOB = f"{PAGES_ENC_PATH}/*.parquet"


def ensure_pages_enc(path: str = PAGES_ENC_PATH,
                     n: int = N_PAGES) -> str:
    from .fixtures import write_pages_enc_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_pages_enc_dir(tmp, n, n_files=4)
        os.replace(tmp, path)
    return path


def q_ext_pdf_encrypted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extraction over the ENCRYPTED-PDF twins (standard
    security handler, cycling RC4-40 R2 / RC4-128 R3 / AES-128 AESV2,
    empty user password — kernels/pdf_crypt.py + kernels/aes.py). The oracle is the flagship
    golden registry's rows for the same urls, which were computed from
    the PLAIN twins — so a green row proves decryption restores
    byte-identical text (sha256), spans, title and status, against an
    expected answer that never saw the ciphertext."""
    _ensure_importable(spark)
    ensure_pages_enc()
    pages = _read_parallel(spark, PAGES_ENC_GLOB)
    return pages.select("url", "html").mapInPandas(
        _extract_flagship_batches, schema=_FLAGSHIP_SCHEMA)


_ORACLE_PDF_ENCRYPTED = f"""
SELECT g.url, g.doc_kind, g.status, g.title,
       g.text_len::BIGINT AS text_len, g.n_spans::BIGINT AS n_spans,
       g.ok, g.text_sha256
FROM read_json('{_FLAGSHIP_GOLDEN}', format='array') g
JOIN read_parquet('{PAGES_ENC_GLOB}') e USING (url)
"""


BLOCK_RULES = ("example.net", "mega-news.example.org")


def q_web_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/suffix blocklist labeling over the pages table: the
    suffix rule 'example.net' blocks all 48 site-NN subdomains, the
    host rule blocks one hot domain exactly, and hot-portal traffic
    passes — suffix-chain explode → broadcast equality join, never a
    regex scan per rule."""
    ensure_pages()
    pages = _read_parallel(spark, PAGES_GLOB).select("url")
    blocked = spark.createDataFrame([(r,) for r in BLOCK_RULES],
                                    "suffix string")
    return weburl.domain_blocklist(pages, blocked)


_BLOCK_VALUES = ", ".join(f"('{r}')" for r in BLOCK_RULES)

_ORACLE_BLOCKLIST = f"""
WITH p AS (SELECT url,
             regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS domain
           FROM read_parquet('{PAGES_GLOB}')),
e AS (SELECT url,
        unnest(list_transform(
          range(1, len(regexp_split_to_array(domain, '\\.')) + 1),
          i -> array_to_string(
                 regexp_split_to_array(domain, '\\.')[i:], '.')))
          AS suffix
      FROM p),
b(suffix) AS (VALUES {_BLOCK_VALUES}),
h AS (SELECT url, max_by(suffix, len(suffix)) AS matched_rule
      FROM e JOIN b USING (suffix) GROUP BY 1)
SELECT p.url, p.domain, h.matched_rule,
       h.matched_rule IS NOT NULL AS blocked
FROM p LEFT JOIN h USING (url)
"""


N_UNI_DOCS = 1500
UNI_DOCS_PATH = f"/tmp/ekspark_unidocs_v1_{N_UNI_DOCS}"
UNI_DOCS_GLOB = f"{UNI_DOCS_PATH}/*.parquet"


def ensure_unicode_docs(path: str = UNI_DOCS_PATH,
                        n: int = N_UNI_DOCS) -> str:
    from .fixtures import write_unicode_docs_dir
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_unicode_docs_dir(tmp, n, n_files=4)
        os.replace(tmp, path)
    return path


def q_ts_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization over the unicode-mess corpus (NFD
    accents, C0 controls, tab/doubled whitespace; 1/4 of docs already
    clean). The one deliberate vectorized-Python op — no JVM unicode
    normalization exists — oracled against DuckDB's native
    nfc_normalize plus the literal same ASCII-class regexes."""
    _ensure_importable(spark)
    ensure_unicode_docs()
    docs = _read_parallel(spark, UNI_DOCS_GLOB)
    return textstats.normalize_text(docs)


_ORACLE_TS_NORMALIZE = f"""
WITH d AS (SELECT doc_id, text
           FROM read_parquet('{UNI_DOCS_GLOB}')),
n AS (SELECT doc_id, text,
        trim(regexp_replace(regexp_replace(nfc_normalize(text),
          '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
          '[ \\t\\r\\n\\f\\v]+', ' ', 'g')) AS norm_text
      FROM d)
SELECT doc_id, norm_text,
       length(text)::BIGINT AS n_chars_before,
       length(norm_text)::BIGINT AS n_chars_after,
       norm_text != text AS changed
FROM n
"""


# -- span-structure digest (r4) -------------------------------------------------

_SPANS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_spans", T.LongType()),
    T.StructField("spans_sha256", T.StringType()),
    T.StructField("span_cover", T.LongType()),
])


def _spans_digest_batches(batches: Iterator[pd.DataFrame]) \
        -> Iterator[pd.DataFrame]:
    from .kernels.extract import extract_document, span_digest
    for pdf in batches:
        rows = []
        for url, payload in zip(pdf["url"].tolist(),
                                pdf["html"].tolist()):
            spans = extract_document(url, payload)["spans"]
            rows.append({
                "url": url,
                "n_spans": len(spans),
                "spans_sha256": span_digest(spans),
                "span_cover": sum(s["end"] - s["start"]
                                  for s in spans),
            })
        yield pd.DataFrame(rows, columns=[f.name
                                          for f in _SPANS_SCHEMA.fields])


def q_ext_spans_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span half of the byte-identity invariant: every page's FULL
    (start, end, kind) span sequence as a canonical sha256 + coverage
    sum, matched against the committed non-Spark golden registry —
    n_spans alone can't catch a shifted offset; this can."""
    _ensure_importable(spark)
    ensure_pages()
    pages = spark.read.parquet(PAGES_PATH).select("url", "html")
    return pages.mapInPandas(_spans_digest_batches,
                             schema=_SPANS_SCHEMA)


_ORACLE_SPANS_DIGEST = f"""
SELECT url, n_spans::BIGINT AS n_spans, spans_sha256,
       span_cover::BIGINT AS span_cover
FROM read_json('{_FLAGSHIP_GOLDEN}', format='array')
"""


# -- WARC source / random access (r4) -----------------------------------------

def q_warc_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source: binaryFile scan of the fixture archive →
    member-per-record parse (warc.read_warc). url / timestamp / HTTP
    status / byte count / payload digest must all survive the format
    round trip vs the parquet table the archive was INDEPENDENTLY
    written from (single-process writer, ensure_warc)."""
    _ensure_importable(spark)
    ensure_pages()
    from . import warc as _warc
    df = _warc.read_warc(spark, ensure_warc())
    return df.select(
        "url", "warc_ts", "status",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"))


_ORACLE_WARC_READ = f"""
SELECT url, warc_ts, 200::INTEGER AS status,
       octet_length(html)::BIGINT AS n_bytes,
       md5(hex(html)) AS payload_md5
FROM read_parquet('{PAGES_GLOB}')
"""


def q_warc_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-indexed random access: build the member-offset index
    (warc.warc_cdx), keep a deterministic 1% url slice, then fetch
    ONLY those records by seeking to their gzip members
    (warc.warc_fetch) — the re-pull-a-sample path that reads 0.01% of
    the bytes of a 100 TB crawl instead of scanning it."""
    _ensure_importable(spark)
    ensure_pages()
    from . import warc as _warc
    path = ensure_warc()
    cdx = _warc.warc_cdx(spark, path).where(F.col("url").endswith("00"))
    df = _warc.warc_fetch(spark, path, cdx)
    return df.select(
        "url", "warc_ts",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"))


_ORACLE_WARC_FETCH = f"""
SELECT url, warc_ts, octet_length(html)::BIGINT AS n_bytes,
       md5(hex(html)) AS payload_md5
FROM read_parquet('{PAGES_GLOB}')
WHERE url LIKE '%00'
"""


# -- link graph / PageRank (r4) -------------------------------------------------

def q_web_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level outlink edge list from the html pages' absolute
    hrefs (ops/webgraph.outlink_edges) — plan-side regexp + explode,
    one skinny aggregation."""
    from .ops import webgraph
    df = _pages_with_kind(spark).where(F.col("kind") == "html")
    return webgraph.outlink_edges(df.select("url", "html"))


_ORACLE_OUTLINKS = f"""
WITH p AS (SELECT url, decode(html) AS s
           FROM read_parquet('{PAGES_GLOB}')
           WHERE starts_with(hex(html), '{_HEX_HTML}')),
e AS (SELECT regexp_extract(url, 'https://([a-z0-9.-]+)/', 1) AS src,
             unnest(regexp_extract_all(
                 s, '<a href="https://([a-z0-9.-]+)/', 1)) AS dst
      FROM p)
SELECT src, dst, count(*)::BIGINT AS n FROM e GROUP BY src, dst
"""


def q_web_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank over the domain graph
    (ops/webgraph.pagerank): bit-identical to the unrolled-CTE DuckDB
    twin — an ITERATIVE distributed algorithm under an exact oracle,
    not a float-tolerance one."""
    from .ops import webgraph
    df = _pages_with_kind(spark).where(F.col("kind") == "html")
    edges = webgraph.outlink_edges(df.select("url", "html"))
    return webgraph.pagerank(edges)


def q_web_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text aggregation (webgraph.anchor_text_stats):
    inlink count, distinct-anchor count, and the modal anchor per
    target url — the classic web-corpus target-description signal.
    Plan-side regex over the html scan; only skinny (target, anchor)
    strings shuffle."""
    from .ops import webgraph
    df = _pages_with_kind(spark).where(F.col("kind") == "html")
    return webgraph.anchor_text_stats(df.select("url", "html"))


_ANCHOR_RE_SQL = '<a href="([^"]*)">([^<]*)</a>'
_ORACLE_ANCHORS = f"""
WITH p AS (SELECT url, decode(html) AS s
           FROM read_parquet('{PAGES_GLOB}')
           WHERE starts_with(hex(html), '{_HEX_HTML}')),
tags AS (
  SELECT regexp_extract(url, 'https://([a-z0-9.-]+)/', 1) AS src_domain,
         unnest(regexp_extract_all(s, '{_ANCHOR_RE_SQL}', 0)) AS tag
  FROM p),
pairs AS (
  SELECT CASE WHEN starts_with(href, 'https://') THEN href
              WHEN starts_with(href, '/')
                   THEN 'https://' || src_domain || href
         END AS target, anchor
  FROM (SELECT src_domain,
               regexp_extract(tag, '{_ANCHOR_RE_SQL}', 1) AS href,
               regexp_extract(tag, '{_ANCHOR_RE_SQL}', 2) AS anchor
        FROM tags)
  WHERE NOT regexp_matches(href, '^(javascript|mailto):')),
pa AS (SELECT target, anchor, count(*)::BIGINT AS n
       FROM pairs WHERE target IS NOT NULL GROUP BY target, anchor),
top AS (SELECT target, anchor AS top_anchor, n AS top_anchor_n
        FROM (SELECT *, row_number() OVER (PARTITION BY target
                    ORDER BY n DESC, anchor ASC) AS rk FROM pa)
        WHERE rk = 1),
tot AS (SELECT target, sum(n)::BIGINT AS n_inlinks,
               count(*)::BIGINT AS n_anchors FROM pa GROUP BY target)
SELECT t.target, t.n_inlinks, t.n_anchors, p.top_anchor, p.top_anchor_n
FROM tot t JOIN top p USING (target)
"""


# -- HTML head metadata / canonical-family gate (r4) ----------------------------

def q_web_html_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction (weburl.html_meta): canonical href,
    og:title, robots-noindex — plan-side regexps over the meta twin
    corpus."""
    ensure_meta_pages()
    df = _read_parallel(spark, META_PAGES_PATH)
    return weburl.html_meta(df)


_ORACLE_HTML_META = f"""
WITH p AS (SELECT url, decode(html) AS s
           FROM read_parquet('{META_PAGES_GLOB}'))
SELECT url,
       nullif(regexp_extract(
           s, '<link rel="canonical" href="([^"]+)"', 1), '')
           AS canonical,
       nullif(regexp_extract(
           s, '<meta property="og:title" content="([^"]+)"', 1), '')
           AS og_title,
       contains(s, '<meta name="robots" content="noindex"')
           AS noindex
FROM p
"""


def q_web_canonical_collapse(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Canonical-family gate (weburl.canonical_collapse): noindex rows
    dropped, one kept url per canonical target, variant counts — the
    head-metadata dedup pass that removes whole duplicate families
    before any body shingling."""
    ensure_meta_pages()
    df = _read_parallel(spark, META_PAGES_PATH)
    return weburl.canonical_collapse(df)


_ORACLE_CANONICAL_COLLAPSE = f"""
WITH m AS (
  SELECT url,
         coalesce(nullif(regexp_extract(
             decode(html), '<link rel="canonical" href="([^"]+)"', 1),
             ''), url) AS canonical,
         contains(decode(html),
                  '<meta name="robots" content="noindex"') AS noindex
  FROM read_parquet('{META_PAGES_GLOB}'))
SELECT canonical, count(*)::BIGINT AS n_variants,
       min(url) AS kept_url
FROM m WHERE NOT noindex
GROUP BY canonical
"""


# -- robots.txt parse + gate (r4) ------------------------------------------------

def q_web_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parser (weburl.robots_rules): RFC 9309 group
    formation (stacked UA headers, directive-terminated blocks) and
    group selection (named 'ekbot' groups override '*') via
    posexplode + window forward-fill — all plan-side."""
    ensure_robots()
    return weburl.robots_rules(spark.read.parquet(ROBOTS_PATH))


# RFC 9309 parse, the DuckDB twin of weburl._robots_parsed /
# _selected_groups / robots_rules: group ids from the count of
# directive lines strictly before each line (stacked UA headers share
# one id), UA ids forward-filled onto rules, groups naming 'ekbot'
# selected with fallback to '*' (never merged).
_ROBOTS_PARSE_CTES = f"""
l AS (SELECT domain,
             unnest(split(robots_txt, chr(10))) AS line,
             unnest(range(len(split(robots_txt, chr(10))))) AS pos
      FROM read_parquet('{ROBOTS_PATH}')),
pr AS (SELECT domain, pos,
         CASE WHEN regexp_matches(line, '(?i)^user-agent:')
              THEN lower(regexp_extract(line,
                   '(?i)^user-agent:\\s*(\\S+)', 1)) END AS ua,
         lower(regexp_extract(line,
               '(?i)^(allow|disallow):\\s*(\\S*)', 1)) AS rule,
         regexp_extract(line,
               '(?i)^(allow|disallow):\\s*(\\S*)', 2) AS path,
         regexp_extract(line,
               '(?i)^crawl-delay:\\s*(\\d+)', 1) AS delay,
         CASE WHEN regexp_matches(line,
              '(?i)^(allow|disallow|crawl-delay|sitemap):')
              THEN 1 ELSE 0 END AS is_rule
       FROM l),
nb AS (SELECT *, coalesce(sum(is_rule) OVER (
           PARTITION BY domain ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nrb
       FROM pr),
ff AS (SELECT *, last_value(CASE WHEN ua IS NOT NULL THEN nrb END
           IGNORE NULLS) OVER (
           PARTITION BY domain ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hdr
       FROM nb),
hdrs AS (SELECT DISTINCT domain, hdr, ua FROM ff
         WHERE ua IS NOT NULL),
spec AS (SELECT DISTINCT domain, hdr FROM hdrs WHERE ua = 'ekbot'),
sel AS (SELECT * FROM spec
        UNION
        SELECT DISTINCT domain, hdr FROM hdrs
        WHERE ua = '*'
          AND domain NOT IN (SELECT domain FROM spec)),
rules AS (SELECT f.domain, f.rule, f.path
          FROM ff f JOIN sel ON f.domain = sel.domain
                            AND f.hdr = sel.hdr
          WHERE f.rule != '' AND f.path != '')
"""

_ORACLE_ROBOTS_RULES = f"""
WITH {_ROBOTS_PARSE_CTES}
SELECT domain, rule, path FROM rules
"""


def _sql_rule_rx(col: str) -> str:
    """DuckDB expression compiling a robots rule path to the SAME
    regex weburl.rule_pattern_regex builds plan-side: trailing '$'
    anchors, metacharacters escaped via the identical replace chain,
    '*' → '.*', start-anchored."""
    anchored = f"ends_with({col}, '$')"
    e = (f"CASE WHEN {anchored} THEN "
         f"substring({col}, 1, length({col}) - 1) ELSE {col} END")
    for ch in weburl._RX_META:
        e = f"replace({e}, '{ch}', '\\{ch}')"
    e = f"replace({e}, '*', '.*')"
    return f"'^' || {e} || CASE WHEN {anchored} THEN '$' ELSE '' END"


# rule → (regex, raw-pattern length) structs, grouped per domain — the
# dim the gate broadcasts; shared by the gate and crawl-plan oracles
_ROBOTS_RX_CTES = f"""
rx AS (SELECT domain, rule, {_sql_rule_rx('path')} AS re,
              length(path)::INTEGER AS plen
       FROM rules),
agg AS (SELECT domain,
          list(struct_pack(re := re, plen := plen))
              FILTER (WHERE rule = 'allow') AS allows,
          list(struct_pack(re := re, plen := plen))
              FILTER (WHERE rule = 'disallow') AS disallows
        FROM rx GROUP BY domain)
"""


def q_web_robots_sitemaps(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt (weburl.robots_sitemaps):
    global `Sitemap:` directives — group-UNscoped per RFC 9309 §2.3,
    so the parse is one regexp over the exploded lines, distinct per
    domain. Feeds sitemap_urls/sitemap_frontier without out-of-band
    sitemap location config."""
    ensure_robots()
    return weburl.robots_sitemaps(spark.read.parquet(ROBOTS_PATH))


_ORACLE_ROBOTS_SITEMAPS = f"""
SELECT DISTINCT domain,
       regexp_extract(line, '(?i)^sitemap:\\s*(\\S+)', 1)
           AS sitemap_url
FROM (SELECT domain, unnest(split(robots_txt, chr(10))) AS line
      FROM read_parquet('{ROBOTS_PATH}'))
WHERE regexp_matches(line, '(?i)^sitemap:')
"""


def q_web_politeness_schedule(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-domain fetch schedule honoring Crawl-delay
    (weburl.politeness_schedule): row_number over the domain queue ×
    the domain's delay (default 1 s) — politeness is a per-domain
    serial order by definition, so the window partition IS the unit of
    work."""
    ensure_pages()
    ensure_robots()
    pages = _read_parallel(spark, PAGES_PATH).select("url", "warc_ts")
    return weburl.politeness_schedule(
        pages, spark.read.parquet(ROBOTS_PATH))


_ORACLE_POLITENESS = f"""
WITH {_ROBOTS_PARSE_CTES},
dl AS (SELECT f.domain AS domain,
              min_by(f.delay, f.pos)::BIGINT AS delay_s
       FROM ff f JOIN sel ON f.domain = sel.domain
                         AND f.hdr = sel.hdr
       WHERE f.delay != ''
       GROUP BY f.domain),
pg AS (SELECT url, warc_ts,
         regexp_extract(url, 'https://([a-z0-9.-]+)', 1) AS domain
       FROM read_parquet('{PAGES_GLOB}')),
sq AS (SELECT url, pg.domain AS domain,
         (row_number() OVER (PARTITION BY pg.domain
                             ORDER BY warc_ts, url) - 1)::BIGINT AS seq,
         coalesce(dl.delay_s, 1)::BIGINT AS delay_s
       FROM pg LEFT JOIN dl ON pg.domain = dl.domain)
SELECT url, domain, seq, delay_s,
       (seq * delay_s)::BIGINT AS fetch_offset_s
FROM sq
"""


def q_web_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots gate (weburl.robots_gate): wildcard/'$' rule
    patterns compiled once per rule, per-domain (regex, length) arrays
    broadcast onto the pages scan, evaluated map-side with
    higher-order functions — zero exchange on the page table."""
    ensure_pages()
    ensure_robots()
    pages = _read_parallel(spark, PAGES_PATH).select("url")
    return weburl.robots_gate(pages,
                              spark.read.parquet(ROBOTS_PATH))


_ORACLE_ROBOTS_GATE = f"""
WITH {_ROBOTS_PARSE_CTES},
{_ROBOTS_RX_CTES},
pg AS (SELECT url,
         regexp_extract(url, 'https://([a-z0-9.-]+)', 1) AS domain,
         coalesce(nullif(regexp_extract(
             url, 'https://[^/]+(/.*)$', 1), ''), '/') AS path
       FROM read_parquet('{PAGES_GLOB}')),
ev AS (SELECT url, pg.domain AS domain,
         coalesce(list_max(list_transform(list_filter(
             allows, r -> regexp_matches(path, r.re)),
             r -> r.plen)), 0)::INTEGER AS allow_len,
         coalesce(list_max(list_transform(list_filter(
             disallows, r -> regexp_matches(path, r.re)),
             r -> r.plen)), 0)::INTEGER AS disallow_len
       FROM pg LEFT JOIN agg ON pg.domain = agg.domain)
SELECT url, domain, allow_len >= disallow_len AS allowed,
       allow_len, disallow_len
FROM ev
"""


# -- sitemap discovery / refresh frontier (r4) ----------------------------------

def q_web_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap urlset parser (weburl.sitemap_urls): positional
    loc/lastmod zip, plan-side."""
    ensure_sitemaps()
    return weburl.sitemap_urls(spark.read.parquet(SITEMAPS_PATH))


_ORACLE_SITEMAP_URLS = f"""
SELECT domain,
       unnest(regexp_extract_all(
           sitemap_xml, '<loc>([^<]+)</loc>', 1)) AS loc,
       unnest(regexp_extract_all(
           sitemap_xml, '<lastmod>([^<]+)</lastmod>', 1)) AS lastmod
FROM read_parquet('{SITEMAPS_PATH}')
"""


def q_web_sitemap_frontier(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Fetch frontier from sitemaps (weburl.sitemap_frontier): never-
    crawled urls ('new') + known urls whose lastmod postdates their
    crawl date ('stale'); skinny equality join, payload never read."""
    ensure_pages()
    ensure_sitemaps()
    pages = _read_parallel(spark, PAGES_PATH).select("url", "warc_ts")
    return weburl.sitemap_frontier(
        spark.read.parquet(SITEMAPS_PATH), pages)


_ORACLE_SITEMAP_FRONTIER = f"""
WITH s AS (
  SELECT domain,
         unnest(regexp_extract_all(
             sitemap_xml, '<loc>([^<]+)</loc>', 1)) AS loc,
         unnest(regexp_extract_all(
             sitemap_xml, '<lastmod>([^<]+)</lastmod>', 1)) AS lastmod
  FROM read_parquet('{SITEMAPS_PATH}')),
k AS (SELECT url AS known_url, warc_ts::DATE AS crawl_date
      FROM read_parquet('{PAGES_GLOB}'))
SELECT domain, loc AS url, lastmod,
       CASE WHEN known_url IS NULL THEN 'new' ELSE 'stale' END
           AS reason
FROM s LEFT JOIN k ON s.loc = k.known_url
WHERE known_url IS NULL OR lastmod::DATE > crawl_date
"""


# -- composed crawl-cycle plan (r4) ----------------------------------------------

def q_web_crawl_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl stack composed end-to-end (weburl.crawl_plan):
    sitemap frontier → robots gate → politeness schedule, oracled as
    ONE chained SQL statement — proof the operators compose without
    semantic drift."""
    ensure_pages()
    ensure_robots()
    ensure_sitemaps()
    pages = _read_parallel(spark, PAGES_PATH).select("url", "warc_ts")
    return weburl.crawl_plan(
        spark.read.parquet(SITEMAPS_PATH), pages,
        spark.read.parquet(ROBOTS_PATH))


_ORACLE_CRAWL_PLAN = f"""
WITH {_ROBOTS_PARSE_CTES},
{_ROBOTS_RX_CTES},
dl AS (SELECT f.domain AS domain,
              min_by(f.delay, f.pos)::BIGINT AS delay_s
       FROM ff f JOIN sel ON f.domain = sel.domain
                         AND f.hdr = sel.hdr
       WHERE f.delay != ''
       GROUP BY f.domain),
s AS (SELECT domain,
        unnest(regexp_extract_all(
            sitemap_xml, '<loc>([^<]+)</loc>', 1)) AS loc,
        unnest(regexp_extract_all(
            sitemap_xml, '<lastmod>([^<]+)</lastmod>', 1)) AS lastmod
      FROM read_parquet('{SITEMAPS_PATH}')),
k AS (SELECT url AS known_url, warc_ts::DATE AS crawl_date
      FROM read_parquet('{PAGES_GLOB}')),
fr AS (SELECT s.domain AS domain, loc AS url, lastmod,
         CASE WHEN known_url IS NULL THEN 'new' ELSE 'stale' END
             AS reason
       FROM s LEFT JOIN k ON s.loc = k.known_url
       WHERE known_url IS NULL OR lastmod::DATE > crawl_date),
ev AS (SELECT fr.*,
         coalesce(nullif(regexp_extract(
             url, 'https://[^/]+(/.*)$', 1), ''), '/') AS path
       FROM fr),
alw AS (SELECT ev.* FROM ev LEFT JOIN agg ON ev.domain = agg.domain
        WHERE coalesce(list_max(list_transform(list_filter(
                  allows, r -> regexp_matches(path, r.re)),
                  r -> r.plen)), 0)
              >= coalesce(list_max(list_transform(list_filter(
                  disallows, r -> regexp_matches(path, r.re)),
                  r -> r.plen)), 0)),
sq AS (SELECT url, alw.domain AS domain, reason,
         (row_number() OVER (PARTITION BY alw.domain
              ORDER BY lastmod::TIMESTAMP, url) - 1)::BIGINT AS seq,
         coalesce(dl.delay_s, 1)::BIGINT AS delay_s
       FROM alw LEFT JOIN dl ON alw.domain = dl.domain)
SELECT url, domain, reason, seq, delay_s,
       (seq * delay_s)::BIGINT AS fetch_offset_s
FROM sq
"""


# -- registry --------------------------------------------------------------------

QUERIES = {
    "ext_flagship": q_ext_flagship,
    "ext_flagship_handpinned": q_ext_flagship_handpinned,
    "ext_detect_kind": q_ext_detect_kind,
    "ext_title": q_ext_title,
    "ext_link_stats": q_ext_link_stats,
    "ext_status_counts": q_ext_status_counts,
    "ext_invoice_fields": q_ext_invoice_fields,
    "ext_pdf_invoice_fields": q_ext_pdf_invoice_fields,
    "ext_pdf_invoice_fields_hex": q_ext_pdf_invoice_fields_hex,
    "ext_pdf_receipt_fields": q_ext_pdf_receipt_fields,
    "ext_pdf_encrypted": q_ext_pdf_encrypted,
    "ext_spans_digest": q_ext_spans_digest,
    "warc_read": q_warc_read,
    "warc_fetch": q_warc_fetch,
    "web_outlinks": q_web_outlinks,
    "web_pagerank": q_web_pagerank,
    "web_anchor_stats": q_web_anchor_stats,
    "web_html_meta": q_web_html_meta,
    "web_canonical_collapse": q_web_canonical_collapse,
    "web_robots_rules": q_web_robots_rules,
    "web_robots_gate": q_web_robots_gate,
    "web_politeness_schedule": q_web_politeness_schedule,
    "web_sitemap_urls": q_web_sitemap_urls,
    "web_sitemap_frontier": q_web_sitemap_frontier,
    "web_crawl_plan": q_web_crawl_plan,
    "ts_stats": q_ts_stats,
    "ts_stats_zipf": q_ts_stats_zipf,
    "ts_normalize": q_ts_normalize,
    "ts_tfidf_topk": q_ts_tfidf,
    "ts_tfidf_zipf": q_ts_tfidf_zipf,
    "ts_lm_bigrams": q_ts_lm_bigrams,
    "ts_lm_score": q_ts_lm_score,
    "ts_dup_spans": q_ts_dup_spans,
    "corpus_split": q_corpus_split,
    "corpus_curate": q_corpus_curate,
    "corpus_curate_near": q_corpus_curate_near,
    "corpus_curate_lm": q_corpus_curate_lm,
    "corpus_manifest": q_corpus_manifest,
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "mm_media_meta": q_mm_media_meta,
    "mm_frame_plan": q_mm_frame_plan,
    "mm_decode": q_mm_decode,
    "mm_audio": q_mm_audio,
    "mm_video": q_mm_video,
    "mm_audio_features": q_mm_audio_features,
    "web_domain_stats": q_web_domain_stats,
    "web_domain_join_salted": q_web_domain_join_salted,
    "web_domain_join_aqe": q_web_domain_join_aqe,
    "web_kind_rollup": q_web_kind_rollup,
    "web_url_dedup": q_web_url_dedup,
    "web_domain_cap": q_web_domain_cap,
    "ts_repetition": q_ts_repetition,
    "corpus_pack_plan": q_corpus_pack_plan,
    "pii_scrub": q_pii_scrub,
    "dedup_lines": q_dedup_lines,
    "contamination_8gram": q_contamination_8gram,
    "web_crawl_diff": q_web_crawl_diff,
    "web_blocklist": q_web_blocklist,
    "corpus_mixture_sample": q_corpus_mixture_sample,
    "evt_sessionize": q_evt_sessionize,
    "evt_hourly_windows": q_evt_hourly_windows,
    "evt_asof_click": q_evt_asof_click,
    "evt_value_quantiles": q_evt_value_quantiles,
    "evt_value_quantiles_approx": q_evt_value_quantiles_approx,
    "evt_user_reach_approx": q_evt_user_reach_approx,
    "rel_pricing_summary": q_rel_pricing_summary,
    "rel_top_revenue": q_rel_top_revenue,
    "rel_latest_order": q_rel_latest_order,
    "rel_region_revenue": q_rel_region_revenue,
    "rel_promo_share": q_rel_promo_share,
    "rel_lapsed_customers": q_rel_lapsed_customers,
    # r5 additions — appended so the r4 registry order is undisturbed
    "ts_dup_strip": q_ts_dup_strip,
    "emb_hash_vectors": q_emb_hash_vectors,
    "corpus_curate_emb": q_corpus_curate_emb,
    "ts_tokens_bpe": q_ts_tokens_bpe,
    "web_robots_sitemaps": q_web_robots_sitemaps,
    "mm_thumbnail": q_mm_thumbnail,
    "ann_text_topk": q_ann_text_topk,
}

# Committed golden registries for the deterministic-approximate
# queries (tests/gen_approx_goldens.py). These ops are approximate vs
# the EXACT answer (recall/error-bound tested in tests/test_ops.py)
# but fully deterministic functions of their input — fixed-seed hash
# families, deterministic IVF training sample, 6-dp rounding with nid
# tie-breaks, commutative HLL++ register merges — so a committed
# registry is a hard rows/schema/hash driver signal, exactly like the
# flagship's. Rows are tagged corpus_n = the EVENTS-table count of
# their sf dir — the one table whose cardinality differs between the
# sf dirs the oracle must serve (tests sf0.001, driver sf0.01;
# documents/embeddings are 500 rows in both) — so one oracle string
# selects the right slice via a scalar subquery on the live views.
_GOLDEN_DIR = os.path.dirname(_FLAGSHIP_GOLDEN)


def _approx_golden_oracle(name: str, select: str) -> str:
    path = os.path.join(_GOLDEN_DIR, f"{name}_golden.json")
    return (f"SELECT {select} "
            f"FROM read_json('{path}', format='array') "
            f"WHERE corpus_n = (SELECT count(*) FROM events)")


_ORACLE_MINHASH_GOLDEN = _approx_golden_oracle(
    "dedup_minhash_lsh",
    "id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, jaccard")
_ORACLE_SIMHASH_GOLDEN = _approx_golden_oracle(
    "dedup_simhash",
    "id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, "
    "hamming::INTEGER AS hamming")
_ORACLE_ANN_LSH_GOLDEN = _approx_golden_oracle(
    "ann_lsh_topk",
    "query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id, "
    "cosine, rank::INTEGER AS rank")
_ORACLE_ANN_IVF_GOLDEN = _approx_golden_oracle(
    "ann_ivf_topk",
    "query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id, "
    "cosine, rank::INTEGER AS rank")
_ORACLE_REACH_GOLDEN = _approx_golden_oracle(
    "evt_user_reach_approx",
    "event_type, approx_users::BIGINT AS approx_users, "
    "exact_users::BIGINT AS exact_users")
# mm_decode is EXACT-deterministic (not approximate) but its semantics
# — zlib inflate + PNG scanline unfilter — are not SQL-expressible, so
# it uses the same committed-registry mechanism for a hard driver
# signal; decoder correctness is independently pinned by the
# twin-parity unit tests (same pixels under every filter type/zlib
# level decode to one hash; hand-computed filter-0 case).
_ORACLE_MM_DECODE = _approx_golden_oracle(
    "mm_decode",
    "media_id::BIGINT AS media_id, n_bytes::BIGINT AS n_bytes, fmt, "
    "width::INTEGER AS width, height::INTEGER AS height, "
    "bit_depth::INTEGER AS bit_depth, channels::INTEGER AS channels, "
    "pixel_sha256, decode_status")


_ORACLE_MM_AUDIO = _approx_golden_oracle(
    "mm_audio",
    "media_id::BIGINT AS media_id, n_bytes::BIGINT AS n_bytes, fmt, "
    "sample_rate::INTEGER AS sample_rate, "
    "channels::INTEGER AS channels, bit_depth::INTEGER AS bit_depth, "
    "n_samples::BIGINT AS n_samples, "
    "duration_ms::BIGINT AS duration_ms, pcm_sha256, decode_status")


_ORACLE_MM_VIDEO = _approx_golden_oracle(
    "mm_video",
    "media_id::BIGINT AS media_id, n_bytes::BIGINT AS n_bytes, fmt, "
    "major_brand, duration_ms::BIGINT AS duration_ms, "
    "timescale::INTEGER AS timescale, n_tracks::INTEGER AS n_tracks, "
    "video_width::INTEGER AS video_width, "
    "video_height::INTEGER AS video_height, handlers, "
    "mdat_bytes::BIGINT AS mdat_bytes, decode_status")


_ORACLE_MM_AUDIO_FEATURES = _approx_golden_oracle(
    "mm_audio_features",
    "media_id::BIGINT AS media_id, fmt, "
    "sample_rate::INTEGER AS sample_rate, "
    "channels::INTEGER AS channels, n_samples::BIGINT AS n_samples, "
    "peak::INTEGER AS peak, mean_abs::INTEGER AS mean_abs, "
    "zero_crossings::BIGINT AS zero_crossings, envelope, "
    "decode_status")


_ORACLE_MM_THUMBNAIL = _approx_golden_oracle(
    "mm_thumbnail",
    "media_id::BIGINT AS media_id, fmt, "
    "width::INTEGER AS width, height::INTEGER AS height, "
    "thumb_w::INTEGER AS thumb_w, thumb_h::INTEGER AS thumb_h, "
    "channels::INTEGER AS channels, thumb_sha256, "
    "channel_means::BIGINT[] AS channel_means, decode_status")


_ORACLE_EVT_QUANTILES_APPROX = _approx_golden_oracle(
    "evt_value_quantiles_approx",
    "event_type, n::BIGINT AS n, p50, p95, p99")
# every registry query now carries an oracle except nothing — the GK
# quantile twin (last grey row) is pinned by a committed registry
# under the determinism contract documented on the query.
ORACLES = {
    "ext_flagship": _ORACLE_FLAGSHIP,
    "ext_flagship_handpinned": _ORACLE_HANDPINNED,
    "ext_status_counts": _ORACLE_STATUS_COUNTS,
    "ext_detect_kind": _ORACLE_DETECT,
    "ext_title": _ORACLE_TITLE,
    "ext_link_stats": _ORACLE_LINK_STATS,
    "ext_invoice_fields": _ORACLE_INVOICE,
    "ext_pdf_invoice_fields": _ORACLE_PDF_INVOICE,
    "ext_pdf_invoice_fields_hex": _ORACLE_PDF_INVOICE_HEX,
    "ext_pdf_receipt_fields": _ORACLE_PDF_RECEIPT,
    "ext_pdf_encrypted": _ORACLE_PDF_ENCRYPTED,
    "ext_spans_digest": _ORACLE_SPANS_DIGEST,
    "warc_read": _ORACLE_WARC_READ,
    "warc_fetch": _ORACLE_WARC_FETCH,
    "web_outlinks": _ORACLE_OUTLINKS,
    "web_html_meta": _ORACLE_HTML_META,
    "web_canonical_collapse": _ORACLE_CANONICAL_COLLAPSE,
    "web_robots_rules": _ORACLE_ROBOTS_RULES,
    "web_robots_gate": _ORACLE_ROBOTS_GATE,
    "web_politeness_schedule": _ORACLE_POLITENESS,
    "web_sitemap_urls": _ORACLE_SITEMAP_URLS,
    "web_sitemap_frontier": _ORACLE_SITEMAP_FRONTIER,
    "web_crawl_plan": _ORACLE_CRAWL_PLAN,
    "ts_stats": _ORACLE_TS_STATS,
    "ts_stats_zipf": _ORACLE_TS_STATS_ZIPF,
    "ts_normalize": _ORACLE_TS_NORMALIZE,
    "ts_tfidf_topk": _ORACLE_TS_TFIDF,
    "ts_tfidf_zipf": _ORACLE_TS_TFIDF_ZIPF,
    "ts_lm_bigrams": _ORACLE_TS_LM_BIGRAMS,
    "ts_lm_score": _ORACLE_TS_LM_SCORE,
    "ts_dup_spans": _ORACLE_TS_DUP_SPANS,
    "corpus_split": _ORACLE_SPLIT,
    "corpus_curate": _ORACLE_CURATE,
    "corpus_curate_near": _ORACLE_CURATE_NEAR,
    "dedup_exact": _ORACLE_DEDUP_EXACT,
    "dedup_jaccard": _ORACLE_JACCARD,
    "dedup_clusters": _ORACLE_CLUSTERS,
    "dedup_embedding": _ORACLE_EMB_PAIRS,
    "dedup_minhash_lsh": _ORACLE_MINHASH_GOLDEN,
    "dedup_simhash": _ORACLE_SIMHASH_GOLDEN,
    "ann_topk": _ORACLE_ANN,
    "ann_lsh_topk": _ORACLE_ANN_LSH_GOLDEN,
    "ann_ivf_topk": _ORACLE_ANN_IVF_GOLDEN,
    "evt_user_reach_approx": _ORACLE_REACH_GOLDEN,
    "mm_media_meta": _ORACLE_MM_META,
    "mm_frame_plan": _ORACLE_MM_FRAMES,
    "mm_decode": _ORACLE_MM_DECODE,
    "mm_audio": _ORACLE_MM_AUDIO,
    "mm_video": _ORACLE_MM_VIDEO,
    "mm_audio_features": _ORACLE_MM_AUDIO_FEATURES,
    "web_domain_stats": _ORACLE_DOMAIN_STATS,
    "web_domain_join_salted": _ORACLE_DOMAIN_JOIN,
    "web_domain_join_aqe": _ORACLE_DOMAIN_JOIN,
    "web_kind_rollup": _ORACLE_KIND_ROLLUP,
    "web_url_dedup": _ORACLE_URL_DEDUP,
    "web_domain_cap": _ORACLE_DOMAIN_CAP,
    "ts_repetition": _ORACLE_TS_REPETITION,
    "corpus_pack_plan": _ORACLE_PACK_PLAN,
    "corpus_curate_lm": _ORACLE_CURATE_LM,
    "corpus_manifest": _ORACLE_MANIFEST,
    "pii_scrub": _ORACLE_PII,
    "dedup_lines": _ORACLE_LINE_DEDUP,
    "contamination_8gram": _ORACLE_CONTAM,
    "web_crawl_diff": _ORACLE_CRAWL_DIFF,
    "web_blocklist": _ORACLE_BLOCKLIST,
    "corpus_mixture_sample": _ORACLE_MIXTURE,
    "evt_sessionize": _ORACLE_SESSIONIZE,
    "evt_hourly_windows": _ORACLE_EVT_WINDOWS,
    "evt_asof_click": _ORACLE_ASOF,
    "evt_value_quantiles": _ORACLE_EVT_QUANTILES,
    "evt_value_quantiles_approx": _ORACLE_EVT_QUANTILES_APPROX,
    "rel_pricing_summary": _ORACLE_PRICING,
    "rel_top_revenue": _ORACLE_TOP_REVENUE,
    "rel_latest_order": _ORACLE_LATEST_ORDER,
    "rel_region_revenue": _ORACLE_REGION_REVENUE,
    "rel_promo_share": _ORACLE_PROMO_SHARE,
    "rel_lapsed_customers": _ORACLE_LAPSED,
    # r5 additions — appended so the r4 registry order is undisturbed
    "ts_dup_strip": _ORACLE_TS_DUP_STRIP,
    "emb_hash_vectors": _ORACLE_EMB_HASH,
    "corpus_curate_emb": _ORACLE_CURATE_EMB,
    "ts_tokens_bpe": _ORACLE_TOKENS_BPE,
    "web_robots_sitemaps": _ORACLE_ROBOTS_SITEMAPS,
    "mm_thumbnail": _ORACLE_MM_THUMBNAIL,
    "ann_text_topk": _ORACLE_ANN_TEXT,
}

# generated oracle: the pagerank recurrence unrolled as a CTE chain
# (standard SQL forbids aggregation in a recursive term)
from .ops import webgraph as _webgraph  # noqa: E402
ORACLES["web_pagerank"] = _webgraph.oracle_sql(PAGES_GLOB)
ORACLES["web_anchor_stats"] = _ORACLE_ANCHORS
