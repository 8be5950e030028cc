"""Benchmark decontamination — n-gram overlap between a training
corpus and an eval set (the GPT-3 appendix-C / PaLM practice: an eval
item is contaminated if it shares enough word-n-grams with a training
document; those docs are dropped or the items flagged).

Scale shape: both sides explode to DISTINCT (id, gram) pairs — the
distinct is a map-side-combining aggregation, so the shuffle carries
per-partition-deduped grams, not token streams — then meet in a plain
equality join on the gram. The eval set is tiny next to 100 TB of
training text (thousands of items), so its gram side broadcasts; the
training side streams through map-side without ever re-shuffling the
payload. The op returns PAIRS (doc, bench item, overlap) rather than
verdicts so callers pick their threshold and removal direction
(drop docs for train hygiene; flag items for eval reporting).

``hash_grams=True`` is the production path: both sides join on
xxhash64(gram) instead of the raw string, shrinking the shuffle/
broadcast by the mean gram length (collisions at 64 bits are
negligible against thousands of eval grams; the string and hash paths
are asserted identical in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _gram_col(text: Column, n: int) -> Column:
    """Distinct word-n-grams of lower(trim(text)), as an array column
    (empty when the text has fewer than n tokens)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i + 1, n)))))


def ngram_overlap(docs: DataFrame, bench: DataFrame, n: int = 8,
                  doc_id: str = "doc_id", doc_text: str = "text",
                  bench_id: str = "bench_id",
                  bench_text: str = "question",
                  hash_grams: bool = False) -> DataFrame:
    """All (doc, bench item) pairs sharing at least one word-n-gram,
    with ``n_shared`` (distinct shared grams), ``bench_grams`` (the
    item's distinct gram count) and ``overlap_frac`` =
    n_shared / bench_grams rounded to 6dp — 1.0 means the item is a
    verbatim substring of the doc."""
    dg = (docs.select(F.col(doc_id),
                      F.explode(_gram_col(F.col(doc_text), n))
                      .alias("gram")))
    bg = (bench.select(F.col(bench_id),
                       F.explode(_gram_col(F.col(bench_text), n))
                       .alias("gram")))
    if hash_grams:
        dg = dg.select(doc_id, F.xxhash64("gram").alias("gram"))
        bg = bg.select(bench_id, F.xxhash64("gram").alias("gram"))
    bsz = (bg.groupBy(bench_id)
           .agg(F.count(F.lit(1)).alias("bench_grams")))
    hits = (dg.join(F.broadcast(bg), "gram")
            .groupBy(doc_id, bench_id)
            .agg(F.count(F.lit(1)).alias("n_shared")))
    return (hits.join(F.broadcast(bsz), bench_id)
            .select(doc_id, bench_id, "n_shared", "bench_grams",
                    F.round(F.col("n_shared") / F.col("bench_grams"),
                            6).alias("overlap_frac")))
