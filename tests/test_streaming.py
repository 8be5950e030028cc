"""Structured Streaming extraction: incremental processing of newly
arrived page files with exactly-once accounting via the checkpoint."""

import os
import shutil

from pyspark.sql import functions as F

from extract_kit_spark.fixtures import write_pages_dir, gen_page
from extract_kit_spark.streaming import run_extraction_stream


def test_streaming_incremental_exactly_once(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("strsrc") / "pages")
    out = str(tmp_path_factory.mktemp("strout") / "x")
    # batch 1: files for rows 0..99
    write_pages_dir(src, 100, n_files=2)

    run_extraction_stream(spark, src, out)
    df1 = spark.read.parquet(os.path.join(out, "data"))
    assert df1.count() == 100
    assert df1.select("url").distinct().count() == 100

    # new dump arrives: rows 100..199 as additional part files
    extra_dir = str(tmp_path_factory.mktemp("strsrc2"))
    import pyarrow.parquet as pq
    from extract_kit_spark.fixtures import _rows_to_arrow
    rows = [gen_page(i) for i in range(100, 200)]
    for r in rows:
        r.pop("_kind")
    pq.write_table(_rows_to_arrow(rows),
                   os.path.join(extra_dir, "part-new.parquet"))
    shutil.copy(os.path.join(extra_dir, "part-new.parquet"),
                os.path.join(src, "part-0100.parquet"))

    # rerun: processes ONLY the new file (checkpoint skips old ones)
    run_extraction_stream(spark, src, out)
    df2 = spark.read.parquet(os.path.join(out, "data"))
    assert df2.count() == 200            # no dups of batch 1
    assert df2.select("url").distinct().count() == 200

    # a third run with nothing new appends nothing
    run_extraction_stream(spark, src, out)
    df3 = spark.read.parquet(os.path.join(out, "data"))
    assert df3.count() == 200

    ok = df3.where(F.col("status") == "ok").count()
    assert ok > 180


def _write_events(spark, path, start_hour, end_hour, fname):
    """Deterministic events: 4 per hour (2 types) at fixed minutes."""
    import datetime as dt
    rows = []
    base = dt.datetime(2024, 1, 1)
    for h in range(start_hour, end_hour):
        for i, (etype, minute) in enumerate(
                [("click", 5), ("view", 20), ("click", 35), ("view", 50)]):
            rows.append((h * 10 + i,
                         base + dt.timedelta(hours=h, minutes=minute),
                         h, etype, float(h) + i / 10.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    # the file-stream source lists FLAT files: write to a temp dir and
    # move the single part file into place
    import glob
    import shutil
    tmp = path + ".tmp-" + fname
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(tmp + "/part-*.parquet")[0]
    shutil.move(part, path + "/" + fname + ".parquet")
    shutil.rmtree(tmp)


def test_streaming_watermarked_windows_converge_to_batch(
        spark, tmp_path_factory):
    import os
    from pyspark.sql import functions as F
    from extract_kit_spark.streaming import run_event_window_stream

    src = str(tmp_path_factory.mktemp("evsrc") / "events")
    out = str(tmp_path_factory.mktemp("evout") / "w")
    os.makedirs(src, exist_ok=True)
    _write_events(spark, src, 0, 5, "b1a")
    _write_events(spark, src, 5, 10, "b1b")

    # one-file microbatches: the watermark advances between batches,
    # so windows from the first file finalize within this run
    run_event_window_stream(spark, src, out, max_files_per_trigger=1)
    got1 = spark.read.parquet(os.path.join(out, "data"))
    n1 = got1.count()
    # watermark after file 1 = 05:50 - 2h: hours 0..2 finalized;
    # 10 hours x 2 types = 20 total windows, recent ones held in state
    assert 0 < n1 < 20

    # newer events advance the watermark; held windows flush
    _write_events(spark, src, 10, 20, "b2")
    run_event_window_stream(spark, src, out, max_files_per_trigger=1)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    assert got2.count() > n1
    # exactly-once: each (window, type) emitted at most once
    assert got2.groupBy("window_start", "event_type").count() \
        .where(F.col("count") > 1).count() == 0

    # every finalized window matches the batch ground truth
    ev = spark.read.parquet(src)
    truth = (ev.groupBy(
        F.date_format(F.window("ts", "1 hour").getField("start"),
                      "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value")))
    joined = got2.alias("g").join(
        truth.alias("t"), ["window_start", "event_type"], "inner")
    assert joined.count() == got2.count()
    mismatches = joined.where(
        (F.col("g.n_events") != F.col("t.n_events"))
        | (F.col("g.total_value") != F.col("t.total_value"))).count()
    assert mismatches == 0


def test_streaming_stateful_sessionize(spark, tmp_path_factory):
    """applyInPandasWithState sessionizer, WATERMARK-FINAL semantics:
    nothing is emitted until the watermark passes session_end + gap, so
    a late-but-in-watermark event arriving in a LATER microbatch can
    retroactively merge two provisional spans — the cross-batch
    reordering case a fold-as-newest sessionizer gets wrong."""
    import datetime as dt
    import os
    from pyspark.sql import functions as F
    from extract_kit_spark.streaming import run_session_stream

    src = str(tmp_path_factory.mktemp("sesssrc") / "events")
    out = str(tmp_path_factory.mktemp("sessout") / "s")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2024, 1, 1)

    def write(rows, fname):
        import glob
        import shutil
        df = spark.createDataFrame(
            [(i, base + dt.timedelta(minutes=m), uid, "e", v, "{}")
             for i, (uid, m, v) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
        tmp = src + ".tmp-" + fname
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    src + "/" + fname + ".parquet")
        shutil.rmtree(tmp)

    # user 1: minutes 0 and 40 — a PROVISIONAL >30min gap that a late
    # event will close; user 2: one session. Watermark is still 0
    # during this batch, so nothing may be emitted yet.
    write([(1, 0, 1.0), (1, 40, 3.0), (2, 5, 5.0)], "b1")
    run_session_stream(spark, src, out)

    # batch 2 delivers a LATE event at minute 20 (admitted: watermark
    # after b1 is max(40min) - 2h → 0) that merges user 1's spans, plus
    # a far-future event that advances the watermark past every open
    # session's timeout so the no-data batch flushes them.
    write([(1, 20, 2.0), (3, 600, 9.0)], "b2")
    run_session_stream(spark, src, out)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    sessions = {(r["user_id"],
                 r["session_start"].hour * 60 + r["session_start"].minute,
                 r["session_end"].hour * 60 + r["session_end"].minute,
                 r["n_events"], r["total_value"])
                for r in got2.collect()}
    # ONE merged session 0→40 with all three events — not two spans
    assert (1, 0, 40, 3, 6.0) in sessions
    assert (2, 5, 5, 1, 5.0) in sessions
    # user 1 emitted exactly once (the provisional split never leaked)
    assert got2.where(F.col("user_id") == 1).count() == 1
    # user 3's session is still open (watermark hasn't passed it)
    assert got2.where(F.col("user_id") == 3).count() == 0
    # exactly-once
    assert got2.groupBy("user_id", "session_start").count() \
        .where(F.col("count") > 1).count() == 0


def test_streaming_stream_stream_interval_join(spark, tmp_path_factory):
    """Stream-stream interval join converges to the batch predicate:
    every (click, view) pair with view_ts <= click_ts <= view_ts+10min
    for the same user, each emitted exactly once across incremental
    runs."""
    import datetime as dt
    import glob
    import os
    import shutil
    from pyspark.sql import functions as F
    from extract_kit_spark.streaming import run_click_attribution_stream

    src = str(tmp_path_factory.mktemp("ssj") / "events")
    out = str(tmp_path_factory.mktemp("ssj") / "o")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2024, 1, 1)

    def write(rows, fname):
        df = spark.createDataFrame(
            [(eid, base + dt.timedelta(minutes=m), uid, et, v, "{}")
             for eid, (uid, m, et, v) in enumerate(rows, start=hash(fname) % 1000 * 100)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
        tmp = src + ".tmp-" + fname
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    src + "/" + fname + ".parquet")
        shutil.rmtree(tmp)

    # user 1: view@0 matched by clicks @5 and @9, NOT @15; view@20
    # matched by click@25. user 2: click@3 with no view. noise types.
    write([(1, 0, "view", 0.0), (1, 5, "click", 1.0),
           (1, 9, "click", 2.0), (1, 15, "click", 3.0),
           (2, 3, "click", 9.0), (1, 2, "purchase", 5.0)], "b1")
    run_click_attribution_stream(spark, src, out)
    got1 = spark.read.parquet(os.path.join(out, "data"))
    pairs1 = {(r["user_id"], r["click_ts"].minute, r["view_ts"].minute)
              for r in got1.collect()}
    assert pairs1 == {(1, 5, 0), (1, 9, 0)}

    # incremental: a later view+click arrive in a new file
    write([(1, 20, "view", 0.0), (1, 25, "click", 4.0)], "b2")
    run_click_attribution_stream(spark, src, out)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    pairs2 = {(r["user_id"], r["click_ts"].minute, r["view_ts"].minute)
              for r in got2.collect()}
    assert pairs2 == {(1, 5, 0), (1, 9, 0), (1, 25, 20)}
    # exactly-once per (click, view)
    assert got2.groupBy("click_id", "view_id").count() \
        .where(F.col("count") > 1).count() == 0

    # batch ground truth: identical pair set
    ev = spark.read.parquet(src)
    v = ev.where("event_type = 'view'").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"))
    c = ev.where("event_type = 'click'").select(
        "user_id", F.col("ts").alias("click_ts"))
    truth = c.join(v, F.expr(
        "v_user = user_id AND view_ts <= click_ts "
        "AND click_ts <= view_ts + interval 10 minutes"))
    tpairs = {(r["user_id"], r["click_ts"].minute, r["view_ts"].minute)
              for r in truth.collect()}
    assert pairs2 == tpairs


def test_streaming_dedup_first_seen_wins(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark dedup: duplicate payloads arriving
    in LATER microbatches (within the watermark horizon) are dropped;
    distinct payloads pass; reruns process only new files."""
    import datetime as dt
    import glob
    import os
    import shutil
    from extract_kit_spark.streaming import run_dedup_stream

    src = str(tmp_path_factory.mktemp("ddsrc") / "pages")
    out = str(tmp_path_factory.mktemp("ddout") / "d")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2024, 1, 1)

    def write(rows, fname):
        df = spark.createDataFrame(
            [(u, base + dt.timedelta(minutes=m),
              bytearray(h.encode()), "", "en") for u, m, h in rows],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string")
        tmp = src + ".tmp-" + fname
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    src + "/" + fname + ".parquet")
        shutil.rmtree(tmp)

    write([("u1", 0, "<p>alpha</p>"), ("u2", 1, "<p>beta</p>"),
           ("u3", 2, "<p>alpha</p>")], "b1")   # u3 dups u1 in-batch
    run_dedup_stream(spark, src, out)
    got1 = spark.read.parquet(os.path.join(out, "data"))
    assert got1.count() == 2
    assert got1.select("fingerprint").distinct().count() == 2

    # a later file re-sends alpha (within watermark) + one new doc
    write([("u4", 10, "<p>alpha</p>"), ("u5", 11, "<p>gamma</p>")],
          "b2")
    run_dedup_stream(spark, src, out)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    urls = {r["url"] for r in got2.collect()}
    assert "u5" in urls and "u4" not in urls
    assert got2.count() == 3


# -- crash recovery: SIGKILL between microbatches, restart, exactly-once --

_CHILD_TEMPLATE = """\
import sys
sys.path.insert(0, {repo!r})
from extract_kit_spark.session import get_spark
from extract_kit_spark import streaming
spark = get_spark(master="local[2]", app_name="crash-child",
                  shuffle_partitions=2)
streaming.{fn}(spark, {src!r}, {out!r}, max_files_per_trigger=1{extra})
print("CHILD_COMPLETED", flush=True)
"""


def _run_child_until_killed(tmp_path_factory, fn, src, out,
                            extra="", min_commits=3,
                            n_batches_total=10**9):
    """Start the stream in a CHILD process (own JVM), poll the
    checkpoint commit log, and SIGKILL the whole process group the
    moment >= min_commits microbatches have committed — an unclean
    stop with a batch typically in flight. Returns commits-at-kill.
    Asserts the child was genuinely incomplete when killed."""
    import os
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = str(tmp_path_factory.mktemp("crash") / "child.py")
    with open(script, "w") as fh:
        fh.write(_CHILD_TEMPLATE.format(repo=repo, fn=fn, src=src,
                                        out=out, extra=extra))
    commits_dir = os.path.join(out, "_checkpoint", "commits")
    child = subprocess.Popen([sys.executable, script],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL,
                             start_new_session=True)
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            if child.poll() is not None:
                raise AssertionError(
                    "child finished before the kill landed — raise the "
                    "file count to widen the kill window")
            try:
                n = len([f for f in os.listdir(commits_dir)
                         if not f.startswith(".")])
            except FileNotFoundError:
                n = 0
            if n >= min_commits:
                # SIGKILL the process GROUP: py4j's JVM is a separate
                # child and would otherwise finish the stream
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                break
            time.sleep(0.02)
        else:
            raise AssertionError("no progress within 180s")
        child.wait(timeout=30)
    finally:
        if child.poll() is None:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
    n_at_kill = len([f for f in os.listdir(commits_dir)
                     if not f.startswith(".")])
    assert n_at_kill < n_batches_total, "stream completed before kill"
    return n_at_kill


def test_streaming_extraction_crash_recovery(spark, tmp_path_factory):
    """Kill -9 the extraction stream mid-run (checkpoint has committed
    some microbatches, one is typically in flight), restart from the
    same checkpoint, and prove EXACTLY-ONCE: the final table equals a
    clean never-killed stream run row-for-row — no lost urls, no
    duplicated urls, orphaned uncommitted sink files invisible."""
    import os
    from extract_kit_spark.streaming import run_extraction_stream

    src = str(tmp_path_factory.mktemp("crashsrc") / "pages")
    out = str(tmp_path_factory.mktemp("crashout") / "x")
    ref = str(tmp_path_factory.mktemp("crashref") / "x")
    write_pages_dir(src, 300, n_files=30)  # 30 one-file microbatches

    n_at_kill = _run_child_until_killed(
        tmp_path_factory, "run_extraction_stream", src, out,
        min_commits=3, n_batches_total=30)
    assert 0 < n_at_kill < 30

    # restart from the same checkpoint in THIS session: processes only
    # the unfinished remainder
    run_extraction_stream(spark, src, out, max_files_per_trigger=1)
    got = spark.read.parquet(os.path.join(out, "data"))
    assert got.count() == 300
    assert got.select("url").distinct().count() == 300

    # row-for-row equality with a clean, never-killed run
    run_extraction_stream(spark, src, ref)
    want = spark.read.parquet(os.path.join(ref, "data"))
    key = lambda df: {(r["url"], r["status"],
                       r["extracted_text"]) for r in
                      df.select("url", "status",
                                "extracted_text").collect()}
    assert key(got) == key(want)


def test_streaming_sessionize_crash_recovery(spark, tmp_path_factory):
    """Kill -9 the STATEFUL sessionizer mid-run — per-user session
    state spans the kill point — restart from the checkpoint, and
    prove the final emitted sessions equal a clean run's: sessions
    straddling the crash are merged correctly from recovered state,
    already-emitted sessions are not re-emitted (sink exactly-once),
    and nothing is lost."""
    import datetime as dt
    import glob
    import os
    import shutil
    from pyspark.sql import functions as F
    from extract_kit_spark.streaming import run_session_stream

    src = str(tmp_path_factory.mktemp("scrashsrc") / "events")
    out = str(tmp_path_factory.mktemp("scrashout") / "s")
    ref = str(tmp_path_factory.mktemp("scrashref") / "s")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2024, 1, 1)

    def write(rows, fname):
        df = spark.createDataFrame(
            [(i, base + dt.timedelta(minutes=m), uid, "e", v, "{}")
             for i, (uid, m, v) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
        tmp = src + ".tmp-" + fname
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    src + "/" + fname + ".parquet")
        shutil.rmtree(tmp)

    # users 1-4: one event every 10 min for 15 files -> each user has a
    # single long session spanning every microbatch (state straddles
    # the kill); user 5: one event in the first file only, whose
    # session finalizes EARLY (1-minute watermark delay) so some rows
    # are already emitted when the kill lands
    for k in range(15):
        rows = [(uid, k * 10, float(uid)) for uid in (1, 2, 3, 4)]
        if k == 0:
            rows.append((5, 0, 50.0))
        write(rows, f"b{k:02d}")
    # far-future event advances the watermark past every open session
    write([(999, 100000, 0.0)], "zflush")

    n_at_kill = _run_child_until_killed(
        tmp_path_factory, "run_session_stream", src, out,
        extra=", watermark_delay='1 minute'",
        min_commits=5, n_batches_total=16)
    assert 0 < n_at_kill < 16

    run_session_stream(spark, src, out, watermark_delay="1 minute",
                       max_files_per_trigger=1)
    got = spark.read.parquet(os.path.join(out, "data"))

    run_session_stream(spark, src, ref, watermark_delay="1 minute",
                       max_files_per_trigger=1)
    want = spark.read.parquet(os.path.join(ref, "data"))

    key = lambda df: {(r["user_id"], r["session_start"],
                       r["session_end"], r["n_events"],
                       r["total_value"]) for r in df.collect()}
    assert key(got) == key(want)
    # the spanning sessions were stitched across the crash: one
    # session per user covering minutes 0..140 with all 15 events
    rows = {r["user_id"]: r for r in got.collect()}
    for uid in (1, 2, 3, 4):
        r = rows[uid]
        assert r["n_events"] == 15
        assert r["session_start"] == base
        assert r["session_end"] == base + dt.timedelta(minutes=140)
    assert rows[5]["n_events"] == 1 and rows[5]["total_value"] == 50.0
    # exactly-once on the emitted stream
    assert got.groupBy("user_id", "session_start").count() \
        .where(F.col("count") > 1).count() == 0


def test_url_dedup_stream_first_canonical_wins(spark,
                                               tmp_path_factory):
    """Streaming url dedup: variant urls of one canonical (tracking
    params, fragments, scheme/host case) collapse to the FIRST
    arrival — in-batch and across later microbatches within the
    watermark; distinct canonicals pass; the canonical key equals the
    batch op's byte-for-byte."""
    import datetime as dt
    import glob
    import os
    import shutil
    from extract_kit_spark.streaming import run_url_dedup_stream
    from extract_kit_spark.ops.weburl import canonical_url
    from pyspark.sql import functions as F

    src = str(tmp_path_factory.mktemp("udsrc") / "pages")
    out = str(tmp_path_factory.mktemp("udout") / "d")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2024, 1, 1)

    def write(rows, fname):
        df = spark.createDataFrame(
            [(u, base + dt.timedelta(minutes=m),
              bytearray(b"x"), "", "en") for u, m in rows],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string")
        tmp = src + ".tmp-" + fname
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    src + "/" + fname + ".parquet")
        shutil.rmtree(tmp)

    write([("https://a.com/p?id=1", 0),
           ("HTTPS://A.COM:443/p?id=1#frag", 1),      # variant of ^
           ("https://b.com/q", 2)], "b1")
    run_url_dedup_stream(spark, src, out)
    got1 = spark.read.parquet(os.path.join(out, "data"))
    assert got1.count() == 2
    kept = {r["url"] for r in got1.collect()}
    assert kept == {"https://a.com/p?id=1", "https://b.com/q"}

    write([("https://a.com/p?utm_source=x&id=1", 10),  # still a dup
           ("https://c.com/r/", 11)], "b2")
    run_url_dedup_stream(spark, src, out)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    assert got2.count() == 3
    assert "https://c.com/r/" in {r["url"] for r in got2.collect()}
    # stream canonical == batch canonical on the same inputs
    allrows = spark.read.parquet(src)
    twin = allrows.select(
        "url", canonical_url(F.col("url")).alias("c"))
    stream_keys = {r["canonical_url"] for r in got2.collect()}
    batch_keys = {r["c"] for r in twin.collect()}
    assert stream_keys == batch_keys


def test_streaming_url_dedup_crash_recovery(spark, tmp_path_factory):
    """Kill -9 the url-dedup stream mid-run — the first-canonical-wins
    state spans the kill point — restart from the checkpoint, and
    prove exactly-once: one output row per canonical url, no
    duplicates admitted after recovery, and row-for-row equality with
    a clean never-killed run (same kept variant per canonical, since
    both runs process the same files in the same order)."""
    import datetime as dt
    import glob
    import os
    import shutil
    from extract_kit_spark.streaming import run_url_dedup_stream

    src = str(tmp_path_factory.mktemp("ucrashsrc") / "pages")
    out = str(tmp_path_factory.mktemp("ucrashout") / "u")
    ref = str(tmp_path_factory.mktemp("ucrashref") / "u")
    os.makedirs(src, exist_ok=True)
    base = dt.datetime(2024, 1, 1)

    # 30 one-file microbatches; every file re-offers tracking-param
    # variants of the same 40 canonical urls (plus one novel url), so
    # dedup state built before the crash must keep suppressing
    # variants arriving after recovery
    pool = [f"https://dom{j % 5}.example/page-{j:03d}" for j in
            range(40)]
    for i in range(30):
        rows = [(f"{pool[j % 40]}?utm_source=f{i:02d}",
                 base + dt.timedelta(minutes=i), b"<html>x</html>",
                 "t", "en") for j in range(i, i + 8)]
        rows.append((f"https://novel.example/only-{i:02d}",
                     base + dt.timedelta(minutes=i),
                     b"<html>y</html>", "t", "en"))
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
            "text string, lang string")
        tmp = src + f".tmp-{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    src + f"/f{i:02d}.parquet")
        shutil.rmtree(tmp)
        # identical mtimes pin the file-source processing order to
        # path order for both the recovered and the clean run
        os.utime(src + f"/f{i:02d}.parquet", (1_700_000_000,
                                              1_700_000_000))

    n_at_kill = _run_child_until_killed(
        tmp_path_factory, "run_url_dedup_stream", src, out,
        min_commits=3, n_batches_total=30)
    assert 0 < n_at_kill < 30

    run_url_dedup_stream(spark, src, out, max_files_per_trigger=1)
    got = spark.read.parquet(os.path.join(out, "data"))
    # exactly one row per canonical url offered by the source
    # (files i=0..29 cover pool indices 0..36 plus 30 novel urls = 67)
    from extract_kit_spark.ops.weburl import canonical_url
    from pyspark.sql import functions as F
    expected = (spark.read.parquet(src)
                .select(canonical_url(F.col("url")).alias("c"))
                .distinct().count())
    assert expected == 67
    assert got.count() == expected
    assert got.select("canonical_url").distinct().count() == expected

    # the clean reference must consume files in the SAME one-file
    # microbatch order: "first canonical wins" is defined by stream
    # order, and a single availableNow mega-batch would pick its
    # winner by partition order instead
    run_url_dedup_stream(spark, src, ref, max_files_per_trigger=1)
    want = spark.read.parquet(os.path.join(ref, "data"))
    key = lambda df: {(r["url"], r["canonical_url"]) for r in
                      df.select("url", "canonical_url").collect()}
    assert key(got) == key(want)
