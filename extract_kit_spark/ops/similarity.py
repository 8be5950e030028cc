"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is broadcast (it's small by construction); the corpus
  scan stays distributed and embarrassingly parallel; per-query ranking
  is one window over (query_id) partitions.
- ``hyperplane_signatures`` + ``ann_lsh_topk``: the scale path —
  random-hyperplane LSH (Charikar, STOC 2002): sign-pattern signatures
  bucket similar vectors together; candidates come from matching any of
  ``bands`` signature segments (multi-band = multi-probe recall boost);
  exact cosine re-ranks candidates only. Equality joins + window — no
  all-pairs stage, so it survives a 100× corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from .dedup import cosine


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine for each query vector (self excluded).
    Returns (query_id, neighbor_id, cosine, rank)."""
    c = corpus.select(F.col(id_col).alias("nid"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    scored = (c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
              .select("qid", "nid",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("nid").alias("neighbor_id"),
                    "cosine", "rank"))


def hyperplane_signatures(df: DataFrame, n_planes: int = 16,
                          bands: int = 8, seed: int = 42, dim: int = 64,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Sign-pattern LSH signatures: (id, band_keys array<string>).
    Deterministic fixed-seed Gaussian planes; numpy does the whole
    batch's (rows × dim) · (dim × planes) product in one matmul."""
    assert n_planes % bands == 0
    bits_per_band = n_planes // bands
    planes = np.random.RandomState(seed).randn(dim, n_planes)

    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("band_keys", T.ArrayType(T.StringType())),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.ndim != 2 or mat.shape[0] == 0:
                yield pd.DataFrame({"id": [], "band_keys": []})
                continue
            bits = (mat @ planes[:mat.shape[1], :]) > 0
            keys = []
            for row in bits:
                keys.append([
                    f"{bi}:" + "".join(
                        "1" if v else "0"
                        for v in row[bi * bits_per_band:
                                     (bi + 1) * bits_per_band])
                    for bi in range(bands)])
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"),
                                "band_keys": keys})

    return (df.select(F.col(id_col).cast("long").alias(id_col), vec_col)
            .mapInPandas(compute, schema=out_schema))


def ann_lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 n_planes: int = 16, bands: int = 8, seed: int = 42,
                 dim: int = 64, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: LSH-bucketed candidates, exact re-rank.
    Same output shape as cosine_topk; recall measured in tests."""
    csig = (hyperplane_signatures(corpus, n_planes, bands, seed, dim,
                                  id_col, vec_col)
            .select("id", F.explode("band_keys").alias("bk")))
    qsig = (hyperplane_signatures(queries, n_planes, bands, seed, dim,
                                  id_col, vec_col)
            .select(F.col("id").alias("qid"),
                    F.explode("band_keys").alias("bk")))
    cand = (csig.join(F.broadcast(qsig), "bk")
            .where(F.col("id") != F.col("qid"))
            .select("qid", F.col("id").alias("nid"))
            .distinct())
    c = corpus.select(F.col(id_col).alias("nid"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    scored = (cand.join(c, "nid").join(F.broadcast(q), "qid")
              .select("qid", "nid",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("nid").alias("neighbor_id"),
                    "cosine", "rank"))
