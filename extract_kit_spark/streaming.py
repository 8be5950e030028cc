"""Structured Streaming variant of the extraction job.

The reference has NO streaming semantics (SURVEY.md §1.3 — its only
"stream" is eager file draining), so the batch pipeline with manifest
resume is the primary engine. This module exists because a
Common-Crawl-style corpus is usually APPENDED to: new WARC dumps land
as new parquet files. Spark's file-source streaming turns the same
fused extraction stage into an incremental job where the checkpoint
(processed-files log + offsets) replaces the hand-rolled manifest:

    readStream(pages dir) → mapInPandas(extract) → writeStream(parquet)

- ``trigger(availableNow=True)`` drains everything currently present
  and stops — a "catch-up batch" with streaming's exactly-once file
  accounting; rerunning after new files arrive processes ONLY them.
- the checkpoint dir gives exactly-once output across restarts (file
  sink commits via the manifest-log mechanism Spark ships).
- no watermarks/state needed: extraction is stateless per row, so the
  plan stays a pure map — identical scale behavior to the batch scan
  layout (no shuffle, no barrier).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def run_extraction_stream(spark: SparkSession, input_dir: str,
                          output_dir: str, profile: str = "auto",
                          max_files_per_trigger: int | None = None,
                          await_termination: bool = True):
    """Incremental extraction over a growing pages directory.

    Each invocation processes exactly the files not yet recorded in the
    checkpoint, writes parquet to <output_dir>/data, and stops
    (availableNow). Returns the StreamingQuery (already terminated when
    ``await_termination``)."""
    from .pipeline import _make_extract_batch, STAGE_SCHEMA_SCAN
    from pyspark.sql import functions as F
    from .kernels.extract import MAX_DOC_BYTES

    reader = (spark.readStream.schema(PAGES_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    pages = (reader.load(input_dir)
             .select("url", "warc_ts", "html")
             .withColumn("src_file", F.lit("stream")))

    extract_batch = _make_extract_batch(profile, MAX_DOC_BYTES,
                                        "src_file")
    extracted = pages.mapInPandas(extract_batch,
                                  schema=STAGE_SCHEMA_SCAN)

    query = (extracted.writeStream
             .format("parquet")
             .option("path", os.path.join(output_dir, "data"))
             .option("checkpointLocation",
                     os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .outputMode("append")
             .start())
    if await_termination:
        query.awaitTermination()
    return query
