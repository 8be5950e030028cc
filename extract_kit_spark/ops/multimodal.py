"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The real decode libraries (PIL/ffmpeg/librosa) are not in this
container, so the DECODE step is a deterministic stub behind
``decode_available()`` — but everything Spark-side is real and tested:
the schema contract, the mapInPandas batch shape (bytes in → struct
out), frame-sample offset planning, and the pure-SQL metadata path that
never touches Python at all.

At 100 TB the rule encoded here: metadata/filter/plan stages stay in
JVM expressions (prune first!), only the rows that survive filtering
enter the expensive Python decode stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def decode_available() -> bool:
    """True when a real image decoder is importable (not in this
    sandbox; on a production cluster ship PIL via --py-files/conda)."""
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("magic_hex", T.StringType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
])


def media_metadata_sql(df: DataFrame, id_col: str,
                       bin_col: str) -> DataFrame:
    """Metadata WITHOUT Python: length/magic/hash as built-in
    expressions over the binary column. This is the stage that filters
    100 TB down before any decode happens."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.length(b).cast("long").alias("n_bytes"),
        F.substring(F.hex(b), 1, 8).alias("magic_hex"),
        F.md5(b).alias("content_hash"),
        # deterministic stand-ins for decoded dims (stub contract);
        # pure arithmetic on n_bytes so any engine reproduces them
        F.pmod(F.length(b), F.lit(1920)).cast("int").alias("fake_width"),
        F.pmod(F.floor(F.length(b) / F.lit(1920)), F.lit(1080))
        .cast("int").alias("fake_height"),
    )


def decode_images(df: DataFrame, id_col: str = "media_id",
                  bin_col: str = "payload") -> DataFrame:
    """The decode stage: mapInPandas over binary payloads. With no
    decoder installed this produces the SAME deterministic fake dims as
    media_metadata_sql (so plumbing is testable); with PIL present the
    marked branch would decode for real."""
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = decode_available()
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col].tolist(),
                                    pdf[bin_col].tolist()):
                payload = payload or b""
                if real:  # pragma: no cover - not in this sandbox
                    raise NotImplementedError(
                        "real decode path: PIL.Image.open(BytesIO(...))")
                rows.append({
                    "media_id": int(mid),
                    "n_bytes": len(payload),
                    "magic_hex": payload[:4].hex().upper(),
                    "content_hash": hashlib.md5(payload).hexdigest(),
                    "fake_width": len(payload) % 1920,
                    "fake_height": (len(payload) // 1920) % 1080,
                })
            yield pd.DataFrame(rows)

    return (df.select(F.col(id_col).cast("long").alias(id_col), bin_col)
            .mapInPandas(decode, schema=MEDIA_META_SCHEMA))


def frame_sample_plan(df: DataFrame, id_col: str, bin_col: str,
                      frame_stride: int = 1024) -> DataFrame:
    """Video-frame sampling plan: byte offsets every ``frame_stride``
    bytes — pure built-ins (sequence), no Python. The decode of each
    offset would be the stubbed stage above."""
    n = F.length(F.col(bin_col)).cast("long")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        n.alias("n_bytes"),
        F.when(n > 0, F.sequence(
            F.lit(0).cast("long"),
            n - 1,
            F.lit(frame_stride).cast("long")))
        .otherwise(F.array().cast("array<long>"))
        .alias("frame_offsets"),
    ).withColumn("n_frames", F.size("frame_offsets"))
