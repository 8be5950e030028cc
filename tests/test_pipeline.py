"""End-to-end Spark pipeline tests: read → extract → write → verify,
byte-identical text vs goldens THROUGH the distributed path, exact
resume after a mid-job kill, lineage/manifest integrity, and
parallelism-independence of results."""

import hashlib
import json
import os

import pytest

from pyspark.sql import functions as F

from extract_kit_spark.fixtures import write_pages_parquet, gen_pages
from extract_kit_spark.pipeline import (read_extractions, run_extraction,
                                        run_extraction_scan)

N_ROWS = 400

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden", "goldens.json")


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    write_pages_parquet(str(p), N_ROWS)
    return str(p)


@pytest.fixture(scope="module")
def extracted(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "extractions")
    summary = run_extraction(spark, pages_path, out, job_id="e2e",
                             n_buckets=8, commit_group_size=4)
    return out, summary


def test_summary_complete(extracted):
    _, summary = extracted
    assert summary["complete"]
    assert summary["n_rows"] == N_ROWS  # E5 cardinality invariant
    assert summary["n_ok"] > 0.9 * N_ROWS


def test_output_schema_and_rows(spark, extracted):
    out, _ = extracted
    df = read_extractions(spark, out)
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS
    names = set(df.columns)
    assert {"url", "warc_ts", "doc_kind", "title", "extracted_text",
            "spans", "fields", "validation", "metadata", "status",
            "p_bucket", "bytes_in"} <= names


def test_byte_identical_vs_goldens_through_spark(spark, extracted):
    out, _ = extracted
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    df = read_extractions(spark, out)
    got = {r["url"]: (r["extracted_text"], r["title"], r["status"])
           for r in df.select("url", "extracted_text", "title", "status")
           .collect()}
    checked = 0
    for url, g in goldens.items():
        if url not in got:
            continue
        text, title, status = got[url]
        sha = hashlib.sha256(text.encode("utf-8")).hexdigest()
        assert sha == g["text_sha256"], f"drift via Spark for {url}"
        assert title == g["title"] and status == g["status"]
        checked += 1
    assert checked >= 100


def test_quarantine_rows_not_dropped(spark, extracted):
    out, _ = extracted
    df = read_extractions(spark, out)
    bad = df.where(F.col("status") != "ok")
    assert bad.count() > 0  # broken fixtures exist
    # every quarantine row carries a taxonomy code and failed validation
    for r in bad.select("status", "validation").collect():
        assert r["status"] != "ok"
        assert r["validation"]["success"] is False


def test_lineage_counts_match(spark, extracted):
    out, summary = extracted
    lineage = spark.read.parquet(os.path.join(out, "lineage", "*"))
    agg = lineage.agg(F.sum("n_rows").alias("n"),
                      F.sum("n_ok").alias("ok")).collect()[0]
    assert agg["n"] == N_ROWS
    assert agg["ok"] == summary["n_ok"]
    assert lineage.select("p_bucket").distinct().count() == \
        summary["n_buckets"]


def test_exact_resume_after_kill(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume") / "extractions")
    with pytest.raises(RuntimeError, match="test hook"):
        run_extraction(spark, pages_path, out, job_id="resume-job",
                       n_buckets=8, commit_group_size=2,
                       fail_after_groups=2)
    # partial state: some buckets committed, not all
    from extract_kit_spark.manifest import Manifest
    m = Manifest(out, "resume-job")
    done_before = m.committed_buckets()
    assert 0 < len(done_before) < 8
    # resume: same job_id → only remaining buckets run
    summary = run_extraction(spark, pages_path, out, job_id="resume-job",
                             n_buckets=8, commit_group_size=2)
    assert summary["complete"]
    df = read_extractions(spark, out)
    assert df.count() == N_ROWS               # no loss
    assert df.select("url").distinct().count() == N_ROWS  # no dups


def test_resume_after_crash_before_commit(spark, pages_path,
                                          tmp_path_factory):
    """Crash in the window between a group's data write and its manifest
    commit: the rerun must overwrite the orphan bucket data, not
    duplicate it."""
    out = str(tmp_path_factory.mktemp("crashwin") / "x")
    with pytest.raises(RuntimeError, match="before commit"):
        run_extraction(spark, pages_path, out, job_id="crash-win",
                       n_buckets=8, commit_group_size=2,
                       fail_before_commit_group=1)
    summary = run_extraction(spark, pages_path, out, job_id="crash-win",
                             n_buckets=8, commit_group_size=2)
    assert summary["complete"]
    df = read_extractions(spark, out)
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS


def test_results_independent_of_parallelism(spark, pages_path,
                                            tmp_path_factory):
    """Same input at different bucket counts → same (url, text) set.
    This is the single-machine proxy for N vs 4N cluster equivalence."""
    out_a = str(tmp_path_factory.mktemp("pa") / "x")
    out_b = str(tmp_path_factory.mktemp("pb") / "x")
    run_extraction(spark, pages_path, out_a, job_id="a", n_buckets=2,
                   commit_group_size=2)
    run_extraction(spark, pages_path, out_b, job_id="b", n_buckets=13,
                   commit_group_size=13)
    ha = (read_extractions(spark, out_a)
          .select(F.md5(F.concat_ws("\x00", "url", "extracted_text"))
                  .alias("h")))
    hb = (read_extractions(spark, out_b)
          .select(F.md5(F.concat_ws("\x00", "url", "extracted_text"))
                  .alias("h")))
    assert ha.subtract(hb).count() == 0
    assert hb.subtract(ha).count() == 0


@pytest.fixture(scope="module")
def pages_multi(tmp_path_factory, spark):
    """Pages written as a MULTI-FILE parquet dir (scan layout groups by
    input file)."""
    d = str(tmp_path_factory.mktemp("pagesm") / "pages")
    rows = gen_pages(N_ROWS)
    for r in rows:
        r.pop("_kind")
    df = spark.createDataFrame(rows)
    df.repartition(6).write.parquet(d)
    return d


def test_scan_layout_end_to_end(spark, pages_multi, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scanout") / "x")
    summary = run_extraction_scan(spark, pages_multi, out,
                                  job_id="scan-e2e", n_groups=3)
    assert summary["complete"]
    assert summary["n_rows"] == N_ROWS
    df = read_extractions(spark, out)
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS
    # lineage carries per-input-file provenance
    assert "src_file" in df.columns


def test_scan_layout_resume_both_crash_windows(spark, pages_multi,
                                               tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scanres") / "x")
    with pytest.raises(RuntimeError, match="after 1 groups"):
        run_extraction_scan(spark, pages_multi, out, job_id="scan-r",
                            n_groups=3, fail_after_groups=1)
    with pytest.raises(RuntimeError, match="before commit"):
        run_extraction_scan(spark, pages_multi, out, job_id="scan-r",
                            n_groups=3, fail_before_commit_group=1)
    summary = run_extraction_scan(spark, pages_multi, out,
                                  job_id="scan-r", n_groups=3)
    assert summary["complete"]
    df = read_extractions(spark, out)
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS


def test_scan_layout_matches_bucketed_results(spark, pages_multi,
                                              extracted):
    """Both layouts produce the identical (url, extracted_text) set."""
    out_b, _ = extracted
    import tempfile
    out_s = tempfile.mkdtemp(prefix="scan_eq_") + "/x"
    run_extraction_scan(spark, pages_multi, out_s, job_id="scan-eq",
                        n_groups=2)
    hs = (read_extractions(spark, out_s)
          .select(F.md5(F.concat_ws("\x00", "url", "extracted_text"))
                  .alias("h")))
    hb = (read_extractions(spark, out_b)
          .select(F.md5(F.concat_ws("\x00", "url", "extracted_text"))
                  .alias("h")))
    assert hs.subtract(hb).count() == 0
    assert hb.subtract(hs).count() == 0


def test_url_level_anti_join_resume(spark, pages_path, extracted):
    """filter_not_done removes exactly the already-extracted urls."""
    from extract_kit_spark.pipeline import filter_not_done
    out, _ = extracted
    pages = spark.read.parquet(pages_path)
    done = read_extractions(spark, out).limit(150).select("url").cache()
    n_done = done.count()
    remaining = filter_not_done(pages, done)
    assert remaining.count() == N_ROWS - n_done
    assert remaining.join(done, "url", "inner").count() == 0


def test_oversize_cap_quarantines_without_parse(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("big") / "pages.parquet"
    write_pages_parquet(str(p), 60, oversize_every=7)  # kind 'broken'
    out = str(tmp_path_factory.mktemp("bigout") / "x")
    run_extraction(spark, str(p), out, job_id="cap", n_buckets=2,
                   max_doc_bytes=1024 * 1024)
    df = read_extractions(spark, out)
    too_large = df.where(F.col("status") == "FILE_TOO_LARGE")
    assert too_large.count() >= 1
    assert df.count() == 60


def test_compact_output_merges_small_files_preserving_bytes(
        spark, pages_path, tmp_path_factory):
    """Compaction (Iceberg rewriteDataFiles analogue): artificially
    fragment one partition of a finished extraction table, compact,
    and require (a) file counts back at the per-partition target,
    (b) the full table byte-identical on (url → text md5, status)
    through an INDEPENDENT reader (DuckDB), (c) second pass a no-op."""
    import glob
    import shutil
    import duckdb
    from extract_kit_spark.compact import compact_output

    out = str(tmp_path_factory.mktemp("compact") / "x")
    run_extraction(spark, pages_path, out, job_id="cmp",
                   n_buckets=4, commit_group_size=4)
    data = os.path.join(out, "data")
    con = duckdb.connect()
    q = (f"select url, md5(coalesce(extracted_text,'')) h, status "
         f"from read_parquet('{data}/*/*.parquet') order by url")
    before = con.sql(q).fetchall()

    # fragment every partition: rewrite each dir as 6 tiny files
    pdirs = sorted(glob.glob(os.path.join(data, "*=*")))
    assert len(pdirs) >= 2
    for pdir in pdirs:
        frag = spark.read.parquet(pdir).repartition(6)
        tmp = pdir + ".tmp"
        frag.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(pdir)
        os.replace(tmp, pdir)
    n_files_frag = len(glob.glob(os.path.join(data, "*=*", "*.parquet")))
    assert n_files_frag >= 6 * len(pdirs)

    summary = compact_output(spark, out, target_bytes=256 * 1024 * 1024)
    assert summary["compacted_partitions"] == len(pdirs)
    assert summary["files_after"] == len(pdirs)  # 1 file per partition
    n_files_now = len(glob.glob(os.path.join(data, "*=*", "*.parquet")))
    assert n_files_now == len(pdirs)

    after = con.sql(q).fetchall()
    assert after == before

    # idempotent: nothing left to do
    again = compact_output(spark, out, target_bytes=256 * 1024 * 1024)
    assert again["compacted_partitions"] == 0
    # pass recorded in the append-only log
    with open(os.path.join(out, "_compactions.json")) as f:
        log = json.load(f)
    assert len(log) == 1 and log[0]["files_after"] == len(pdirs)


def test_reprocess_quarantined_replays_only_failures(
        spark, pages_path, tmp_path_factory):
    """Quarantine replay: run with a tiny byte cap (most docs
    quarantined FILE_TOO_LARGE), then reprocess with the default cap —
    only the failed slice is re-extracted, merged in place, and the
    final table is byte-identical (url → md5(text), status) to a fresh
    full run at the default cap."""
    import duckdb
    from extract_kit_spark.pipeline import (reprocess_quarantined,
                                            run_extraction_scan)

    out = str(tmp_path_factory.mktemp("replay") / "x")
    ref = str(tmp_path_factory.mktemp("replayref") / "x")
    run_extraction_scan(spark, pages_path, out, job_id="rp",
                        n_groups=4, max_doc_bytes=2000)
    crippled = read_extractions(spark, out)
    n_bad = crippled.where(F.col("status") != "ok").count()
    assert n_bad > N_ROWS * 0.3  # the tiny cap quarantined plenty

    summary = reprocess_quarantined(spark, pages_path, out)
    assert summary["reprocessed"] == n_bad
    assert summary["now_ok"] > 0

    # ground truth: a fresh full run at the default cap
    run_extraction_scan(spark, pages_path, ref, job_id="rpref",
                        n_groups=4)
    con = duckdb.connect()
    q = ("select url, md5(coalesce(extracted_text,'')) h, status "
         "from read_parquet('%s/data/*/*.parquet') order by url")
    assert con.sql(q % out).fetchall() == con.sql(q % ref).fetchall()

    # idempotent second replay: same genuinely-broken rows, no churn
    again = reprocess_quarantined(spark, pages_path, out)
    assert again["now_ok"] == 0
    assert con.sql(q % out).fetchall() == con.sql(q % ref).fetchall()


def test_reprocess_quarantined_bucketed_layout(
        spark, pages_path, tmp_path_factory):
    """Quarantine replay on the BUCKETED layout: rows keep their
    p_bucket, only affected partitions are rewritten, and recovered
    rows match the clean-run distribution."""
    from extract_kit_spark.pipeline import reprocess_quarantined

    out = str(tmp_path_factory.mktemp("replayb") / "x")
    run_extraction(spark, pages_path, out, job_id="rpb", n_buckets=4,
                   commit_group_size=4, max_doc_bytes=2000)
    df0 = read_extractions(spark, out)
    n_bad = df0.where(F.col("status") != "ok").count()
    assert n_bad > N_ROWS * 0.3
    summary = reprocess_quarantined(spark, pages_path, out)
    assert summary["reprocessed"] == n_bad and summary["now_ok"] > 0
    df = read_extractions(spark, out)
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS
    # recovered rows kept their original url-hash bucket
    expected_bucket = F.pmod(F.xxhash64("url"),
                             F.lit(4)).cast("int")
    assert df.where(F.col("p_bucket") != expected_bucket).count() == 0


def test_reprocess_missing_input_url_carried_forward(
        spark, pages_path, tmp_path_factory):
    """A quarantined url ABSENT from the input table (pages
    expired/deleted between runs) must not silently vanish from the
    output: its original quarantined row is carried forward unchanged
    and reported in summary['missing'] (ADVICE r3)."""
    from extract_kit_spark.pipeline import (reprocess_quarantined,
                                            run_extraction_scan)

    out = str(tmp_path_factory.mktemp("replaymiss") / "x")
    run_extraction_scan(spark, pages_path, out, job_id="rm",
                        n_groups=4, max_doc_bytes=2000)
    df0 = read_extractions(spark, out)
    bad_urls = [r[0] for r in df0.where(F.col("status") != "ok")
                .select("url").collect()]
    assert len(bad_urls) > 10
    dropped = set(bad_urls[:5])

    # a shrunken input: five quarantined urls no longer exist
    shrunk = str(tmp_path_factory.mktemp("replaymiss") / "pages2")
    (spark.read.parquet(pages_path)
     .where(~F.col("url").isin(*dropped))
     .write.parquet(shrunk))

    summary = reprocess_quarantined(spark, shrunk, out)
    assert summary["missing"] == len(dropped)
    assert summary["reprocessed"] == len(bad_urls)
    df = read_extractions(spark, out)
    # cardinality preserved: nothing vanished, nothing duplicated
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS
    # the carried rows are still quarantined, byte-for-byte the same
    carried = df.where(F.col("url").isin(*dropped))
    assert carried.count() == len(dropped)
    assert carried.where(F.col("status") == "ok").count() == 0


def test_reprocess_duplicate_input_urls_not_inflated(
        spark, pages_path, tmp_path_factory):
    """A url appearing in MULTIPLE input rows (re-crawl snapshots) must
    yield exactly one replay row — max warc_ts wins, deterministically
    — instead of duplicating output rows (ADVICE r3)."""
    from extract_kit_spark.pipeline import (reprocess_quarantined,
                                            run_extraction_scan)

    out = str(tmp_path_factory.mktemp("replaydup") / "x")
    run_extraction_scan(spark, pages_path, out, job_id="rd",
                        n_groups=4, max_doc_bytes=2000)
    n_bad = (read_extractions(spark, out)
             .where(F.col("status") != "ok").count())
    assert n_bad > 10

    # an input with EVERY page present twice at an earlier timestamp
    dup = str(tmp_path_factory.mktemp("replaydup") / "pages2")
    base = spark.read.parquet(pages_path)
    (base.unionByName(
        base.withColumn("warc_ts",
                        F.col("warc_ts") - F.expr("interval 1 hour")))
     .write.parquet(dup))

    summary = reprocess_quarantined(spark, dup, out)
    assert summary["reprocessed"] == n_bad
    assert summary["missing"] == 0
    df = read_extractions(spark, out)
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS


def test_curate_extracted_over_extraction_output(spark, tmp_path):
    """The --curate maintenance pass: extract a small pages dir, then
    curate the output table — survivors land in <output>/curated with
    url + split columns, every ok url is accounted for (survivor or
    dedup/gate casualty), and the pass is deterministic across
    reruns."""
    from extract_kit_spark.fixtures import write_pages_dir
    from extract_kit_spark.pipeline import (curate_extracted,
                                            run_extraction_scan)
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_dir(pages, 120, n_files=4)
    run_extraction_scan(spark, pages, out, job_id="cur-e2e",
                        n_groups=2)
    s1 = curate_extracted(spark, out)
    assert s1["n_ok_docs"] > 0
    assert 0 < s1["n_survivors"] <= s1["n_ok_docs"]
    cur = spark.read.parquet(str(tmp_path / "out" / "curated"))
    assert set(cur.columns) >= {"doc_id", "url", "split", "bucket",
                                "n_tokens", "quality_score"}
    assert cur.count() == s1["n_survivors"]
    assert cur.select("url").distinct().count() == s1["n_survivors"]
    assert set(s1["splits"]) <= {"train", "val", "test"}
    s2 = curate_extracted(spark, out)
    assert s2 == s1
