"""The extraction job: read → gate → balance → mapInPandas → write.

The Spark lifecycle of SURVEY.md §3.4, replacing the reference's two
orchestrators (`core/vision/processor.ts:68-146` and
`converters/docx-converter.ts:130-245`) with one declarative plan:

    read(pages)                      # parquet/Iceberg scan; Catalyst
      .select(url, warc_ts, html)   #   prunes columns at the scan
      .where(not-yet-committed)     # resume: bucket-level manifest skip
      .repartition(P, xxhash64(url))# size-aware balance; url-hash
                                    #   placement breaks hot-domain skew
      .mapInPandas(extract_batch)   # ALL kernels fused in one vectorized
                                    #   stage (one JVM→Python boundary,
                                    #   where the reference had worker
                                    #   postMessage)
      .write(partitionBy bucket)    # + lineage rows + manifest commit

Scale design notes
------------------
- Partition count is derived from input BYTES, not row count: one cheap
  aggregate over length(html) (column-pruned scan) sizes tasks to
  ``target_partition_bytes``, so a 100 TB table gets ~400k tasks rather
  than whatever the file split produced. Skewed/huge docs are bounded by
  the per-doc byte cap (the analogue of the reference's pixel-budget
  input reduction, `image-optimization.ts:117-147`).
- Incremental commit: buckets are processed in groups, one Spark action
  per group, manifest committed after each — kill the job anywhere and a
  rerun does only the uncommitted groups (exact resume, no dup/no loss).
  Group size trades checkpoint granularity against scheduling overhead;
  at cluster scale use bigger groups, same code.
- Within-partition output is sorted by url so rerun bytes are
  comparable (SURVEY.md §4.3 determinism requirement).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .kernels.extract import extract_document, MAX_DOC_BYTES
from .manifest import Manifest
from .schemas import EXTRACTION_SCHEMA

# extraction-stage output: the contract schema + bucket + input size
STAGE_SCHEMA = T.StructType(
    EXTRACTION_SCHEMA.fields + [
        T.StructField("p_bucket", T.IntegerType(), nullable=False),
        T.StructField("bytes_in", T.LongType(), nullable=False),
    ])

DEFAULT_TARGET_PARTITION_BYTES = 64 * 1024 * 1024


def _make_extract_batch(profile: str, max_doc_bytes: int,
                        n_buckets: int) -> Callable:
    """Build the mapInPandas function. The closure holds only small
    config scalars, so it pickles with the task — no broadcast needed."""

    def extract_batch(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            out_rows = []
            urls = pdf["url"].tolist()
            payloads = pdf["html"].tolist()
            stamps = pdf["warc_ts"].tolist()
            buckets = pdf["p_bucket"].tolist()
            for url, ts, payload, bucket in zip(urls, stamps, payloads,
                                                buckets):
                size = len(payload) if payload is not None else 0
                if size > max_doc_bytes:
                    # straggler cap: quarantine without parsing (I2
                    # analogue — one 100MB doc must not stall the task)
                    from .kernels import errors as E
                    res = extract_document(url, b"")
                    res["status"] = E.FILE_TOO_LARGE
                    res["validation"] = {
                        "success": False,
                        "errors": [f"payload {size}B > {max_doc_bytes}B"]}
                else:
                    res = extract_document(url, payload, profile)
                res["warc_ts"] = ts
                res["partition_id"] = pid
                res["p_bucket"] = int(bucket)
                res["bytes_in"] = size
                out_rows.append(res)
            yield pd.DataFrame(out_rows)

    return extract_batch


def plan_partition_count(df: DataFrame,
                         target_bytes: int) -> tuple[int, int]:
    """One column-pruned aggregate over the payload length sizes the
    shuffle: returns (n_partitions, total_bytes)."""
    row = df.select(
        F.coalesce(F.sum(F.length("html")), F.lit(0)).alias("b"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    total = int(row["b"])
    n = max(1, -(-total // target_bytes))  # ceil
    return n, total


def read_pages(spark: SparkSession, input_path: str) -> DataFrame:
    """Column-pruned scan of the pages table: the extractor needs only
    (url, warc_ts, html); Catalyst pushes the projection to parquet so
    `text`/`lang` are never read (SURVEY.md §4.2)."""
    return spark.read.parquet(input_path).select("url", "warc_ts", "html")


def run_extraction(spark: SparkSession,
                   input_path: str,
                   output_dir: str,
                   profile: str = "auto",
                   job_id: str | None = None,
                   n_buckets: int | None = None,
                   commit_group_size: int = 8,
                   target_partition_bytes: int =
                   DEFAULT_TARGET_PARTITION_BYTES,
                   max_doc_bytes: int = MAX_DOC_BYTES,
                   resume: bool = True,
                   fail_after_groups: int | None = None,
                   fail_before_commit_group: int | None = None) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict.

    Test hooks: ``fail_after_groups`` raises after k committed groups;
    ``fail_before_commit_group`` raises after group k's DATA write but
    before its manifest commit (the crash window where idempotent
    re-writes matter).
    """
    job_id = job_id or f"extract-{uuid.uuid4().hex[:8]}"
    manifest = Manifest(output_dir, job_id)

    pages = read_pages(spark, input_path)
    if n_buckets is None:
        n_parts, total_bytes = plan_partition_count(
            pages, target_partition_bytes)
        n_buckets = n_parts
    else:
        total_bytes = -1

    # deterministic bucket: xxhash64(url) — plan-side expression, stays
    # in whole-stage codegen; pmod keeps it non-negative
    bucketed = pages.withColumn(
        "p_bucket",
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))

    done = manifest.committed_buckets() if resume else set()
    todo = sorted(set(range(n_buckets)) - done)
    groups = [todo[i:i + commit_group_size]
              for i in range(0, len(todo), commit_group_size)]

    extract_batch = _make_extract_batch(profile, max_doc_bytes, n_buckets)
    data_dir = os.path.join(output_dir, "data")
    lineage_dir = os.path.join(output_dir, "lineage")
    n_done_groups = 0

    for gi, group in enumerate(groups):
        # bucket predicate prunes the shuffle input; on a bucket-
        # partitioned Iceberg table this becomes partition pruning
        part = bucketed.where(F.col("p_bucket").isin([int(b)
                                                      for b in group]))
        # one task per bucket in the group: repartition on the bucket id
        shuffled = part.repartition(len(group), "p_bucket")
        extracted = shuffled.mapInPandas(extract_batch,
                                         schema=STAGE_SCHEMA)
        # deterministic output file contents: sort within partition.
        # dynamic partition OVERWRITE (not append) makes the group write
        # idempotent: a crash between write and manifest-commit leaves
        # orphan bucket data that the resume run simply replaces.
        (extracted.sortWithinPartitions("url")
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("p_bucket").parquet(data_dir))
        if fail_before_commit_group is not None \
                and gi == fail_before_commit_group:
            raise RuntimeError(
                f"test hook: killed before commit of group {gi}")

        # lineage from the written columns (cheap column-pruned re-scan,
        # avoids caching MB-size text)
        lineage = (
            spark.read.parquet(data_dir)
            .where(F.col("p_bucket").isin([int(b) for b in group]))
            .groupBy("p_bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.when(F.col("status") == "ok", 1)
                       .otherwise(0)).alias("n_ok"),
                 F.sum(F.when(F.col("status") != "ok", 1)
                       .otherwise(0)).alias("n_failed"),
                 F.sum("bytes_in").alias("bytes_in"),
                 F.md5(F.concat_ws(
                     "|", F.sort_array(F.collect_list(
                         F.concat_ws(":", F.col("url"),
                                     F.crc32("extracted_text")))))
                 ).alias("checksum"))
            .withColumn("job_id", F.lit(job_id)))
        lineage_rows = lineage.collect()
        (lineage.write.mode("append")
         .parquet(os.path.join(lineage_dir, f"group-{gi}")))

        manifest.commit(
            {int(r["p_bucket"]): {
                "n_rows": int(r["n_rows"]), "n_ok": int(r["n_ok"]),
                "n_failed": int(r["n_failed"]),
                "bytes_in": int(r["bytes_in"]),
                "checksum": r["checksum"]}
             for r in lineage_rows},
            n_buckets)
        n_done_groups += 1
        if fail_after_groups is not None \
                and n_done_groups >= fail_after_groups:
            raise RuntimeError(
                f"test hook: killed after {n_done_groups} groups")

    state = manifest.load()
    n_rows = sum(v["n_rows"] for v in state["committed"].values())
    n_ok = sum(v["n_ok"] for v in state["committed"].values())
    return {
        "job_id": job_id,
        "n_buckets": n_buckets,
        "n_groups_run": n_done_groups,
        "n_rows": n_rows,
        "n_ok": n_ok,
        "total_bytes_planned": total_bytes,
        "complete": manifest.is_complete(),
        "output": data_dir,
    }


def read_extractions(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "data"))
