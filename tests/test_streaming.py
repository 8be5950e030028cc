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
