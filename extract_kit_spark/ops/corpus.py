"""Corpus-curation primitives for training-data pipelines.

- ``deterministic_split``: train/val/test assignment by hashed-id
  bucket. The bucket is the first 8 hex chars of md5(salt || id) read
  as an integer, mod 10_000 — a pure function of the row key, so the
  assignment is reproducible across runs, engines, partitionings and
  cluster sizes (never ``rand()``: resampling on retry would leak val
  rows into train). Changing ``salt`` re-draws the whole split.
  Expression-only (whole-stage codegen) and embarrassingly parallel.
- ``curate``: the composed curation pass a pretraining corpus goes
  through — quality/language gate (ops/textstats.py signals), exact
  near-dup removal keeping the smallest id per normalized-text
  fingerprint (one hash-shuffle on uniform md5 keys), then the
  deterministic split. One scan, one shuffle, no UDF.

Both have exact DuckDB oracle twins in queries.py (md5 and hex→int
arithmetic agree across engines — verified bit-exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .textstats import fingerprint, with_text_stats

SPLIT_MOD = 10_000

# (name, cumulative upper bucket bound): train [0,8000) val [8000,9000)
# test [9000,10000)
DEFAULT_SPLITS = (("train", 8000), ("val", 9000), ("test", SPLIT_MOD))


def split_bucket(key: Column, salt: str = "split-v1:") -> Column:
    """Deterministic bucket in [0, SPLIT_MOD) from a row key."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(SPLIT_MOD))


def deterministic_split(df: DataFrame, key_col: str = "doc_id",
                        salt: str = "split-v1:",
                        splits=DEFAULT_SPLITS) -> DataFrame:
    """Adds ``bucket`` and ``split`` columns keyed on ``key_col``."""
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    for name, upper in splits:
        cond = bucket < upper
        expr = F.when(cond, name) if expr is None \
            else expr.when(cond, name)
    return (df.withColumn("bucket", bucket)
            .withColumn("split", expr))


def strip_stage(df: DataFrame, id_col: str, text_col: str,
                dup_span_n: int, dup_span_min_df: int) -> DataFrame:
    """Optional pre-gate stage shared by curate/curate_near:
    cross-document duplicated spans are DELETED from the text
    (textstats.dup_span_strip — RefinedWeb-style exact-substring
    dedup) before any quality signal is computed, so length/token
    gates judge the post-strip document, and whole-doc fingerprints
    see boilerplate-free text."""
    from .textstats import dup_span_strip
    return (dup_span_strip(df, n=dup_span_n, min_df=dup_span_min_df,
                           id_col=id_col, text_col=text_col)
            .select(F.col(id_col), F.col("text").alias(text_col)))


def curate_near(df: DataFrame, min_quality: float = 0.5,
                langs: tuple[str, ...] = ("en",),
                id_col: str = "doc_id", text_col: str = "text",
                salt: str = "split-v1:",
                jaccard_threshold: float = 0.8, shingle_n: int = 3,
                max_df: int | None = None,
                cc_stats_out: dict | None = None,
                cc_small_graph_edges: int = 1_000_000,
                strip_dup_spans: bool = False,
                dup_span_n: int = 8,
                dup_span_min_df: int = 2,
                route: str = "jaccard",
                embedding_threshold: float = 0.95) -> DataFrame:
    """``curate`` + NEAR-duplicate removal: after the quality/lang gate
    and exact dedup, build the near-dup pair graph over the survivors,
    collapse it to connected components (dedup.duplicate_clusters),
    and keep only each cluster's min-id representative — the full
    pretraining-corpus pipeline (gate → exact dedup → near dedup →
    split) as one dataflow.

    ``route`` picks the pair stage:
    - ``"jaccard"`` (default): n-gram-Jaccard inverted-index join —
      sub-quadratic with the ``max_df`` hot-shingle guard.
    - ``"embedding"``: in-engine hash embeddings
      (similarity.hash_embed) + blocked cosine pairs at
      ``embedding_threshold`` — the text→embed→near-dup loop with no
      model weights and no shingle join; on the fixture corpus 0.95
      recovers exactly the jaccard-0.8 ground-truth pairs. At 100 TB
      candidates come from the LSH buckets (similarity.py) and the
      exact kernel runs within buckets only.

    Clustering adds O(diameter) equality-join rounds over just the
    PAIRS (tiny relative to the corpus) on either route."""
    from .dedup import (duplicate_clusters, embedding_near_dup_pairs,
                        jaccard_pairs)
    if strip_dup_spans:
        df = strip_stage(df, id_col, text_col, dup_span_n,
                         dup_span_min_df)
    stats = with_text_stats(df, text_col)
    kept = stats.where((F.col("quality_score") >= min_quality)
                       & F.col("lang_pred").isin(*langs))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    deduped = (kept.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") == 1))
    # the deduped survivors feed BOTH the pair-graph branch and the
    # final anti-join; without this, each branch re-runs the full
    # gate+window over the corpus (two storage scans at 100 TB).
    # Deferred local checkpoint: materialized once at first use,
    # executor-local memory-with-disk-spill blocks, lineage truncated.
    deduped = deduped.localCheckpoint(eager=False)
    if route == "embedding":
        from .similarity import hash_embed
        emb = hash_embed(deduped.select(F.col(id_col),
                                        F.col(text_col)),
                         id_col=id_col, text_col=text_col)
        pairs = embedding_near_dup_pairs(
            emb, threshold=embedding_threshold, id_col=id_col)
    elif route == "jaccard":
        pairs = jaccard_pairs(deduped, threshold=jaccard_threshold,
                              n=shingle_n, id_col=id_col,
                              text_col=text_col, max_df=max_df)
    else:
        raise ValueError(f"unknown near-dup route: {route!r}")
    losers = (duplicate_clusters(pairs, stats_out=cc_stats_out,
                                 small_graph_edges=cc_small_graph_edges)
              .where(F.col("cluster_id") != F.col("doc_id"))
              .select(F.col("doc_id").alias(id_col)))
    survivors = deduped.join(losers, on=id_col, how="left_anti")
    return (deterministic_split(survivors, id_col, salt)
            .select(F.col(id_col), "n_tokens", "quality_score",
                    "lang_pred", "bucket", "split"))


def pack_plan(df: DataFrame, budget: int = 512, n_streams: int = 8,
              id_col: str = "doc_id", text_col: str = "text",
              salt: str = "pack-v1:") -> DataFrame:
    """Sequence-packing PLAN for pretraining batch assembly: assign
    every document a (stream, pack_id, pack_offset) such that packs
    are contiguous ``budget``-token windows over the concatenation of
    the stream's documents in ``id_col`` order — the standard
    concat-then-chunk packing (documents may straddle pack
    boundaries; the offset tells the loader where each doc starts in
    its stream). The plan is a pure function of (salt, doc ids, token
    counts): reruns, retries and engine changes produce the identical
    packing — the same determinism contract as deterministic_split.

    Scale shape: stream = hashed-id bucket (uniform — never data
    order), so the only shuffle is a repartition into ``n_streams``
    sort groups; the running sum is a within-partition window. Set
    ``n_streams`` ~ O(cluster cores) at scale: each stream is one
    reducer's linear scan, and packs never cross streams so streams
    are embarrassingly parallel downstream."""
    n_tok = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    stream = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            1, 8), 16, 10).cast("long"),
        F.lit(n_streams)).cast("long")
    w = (Window.partitionBy("stream").orderBy(F.col(id_col).asc()))
    return (df.select(F.col(id_col), n_tok.alias("n_tokens"),
                      stream.alias("stream"))
            .withColumn("pack_offset",
                        F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .withColumn("pack_id",
                        F.floor(F.col("pack_offset") / budget)
                        .cast("long")))


def curate(df: DataFrame, min_quality: float = 0.5,
           langs: tuple[str, ...] = ("en",), id_col: str = "doc_id",
           text_col: str = "text",
           salt: str = "split-v1:",
           strip_dup_spans: bool = False,
           dup_span_n: int = 8,
           dup_span_min_df: int = 2) -> DataFrame:
    """[optional dup-span strip →] quality/lang gate → exact dedup
    (min id per fingerprint) → deterministic split. Returns one row
    per surviving document:
    (id, n_tokens, quality_score, lang_pred, bucket, split)."""
    if strip_dup_spans:
        df = strip_stage(df, id_col, text_col, dup_span_n,
                         dup_span_min_df)
    stats = with_text_stats(df, text_col)
    kept = stats.where((F.col("quality_score") >= min_quality)
                       & F.col("lang_pred").isin(*langs))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    deduped = (kept.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") == 1))
    return (deterministic_split(deduped, id_col, salt)
            .select(F.col(id_col), "n_tokens", "quality_score",
                    "lang_pred", "bucket", "split"))


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   total_tokens: int, source_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   salt: str = "mix-v1:") -> DataFrame:
    """Deterministic pretraining-mixture sampling: given target
    mixture ``weights`` per source and a ``total_tokens`` budget,
    keep each source's documents at rate
    ``min(1, weight_s * total_tokens / tokens_s)`` — the static
    mixture-reweighting pass (DoReMi-style fixed weights) that turns
    "we have 60 TB of src A and 2 TB of src B" into the corpus the
    training recipe actually asked for. Sources absent from
    ``weights`` are excluded.

    Determinism contract (same as deterministic_split): the keep/drop
    decision is ``hashed-id bucket < rate·SPLIT_MOD`` — a pure
    function of (salt, id, corpus token totals), so reruns, retries,
    engines and cluster sizes agree row-for-row, and raising a
    source's weight only ADDS documents (nested samples), never
    reshuffles the ones already chosen.

    Scale shape: one map-side-combined aggregation for the per-source
    token totals (O(#sources) rows), broadcast back as keep rates;
    the gate itself is a pure filter riding the scan — no shuffle
    ever touches the corpus rows."""
    n_tok = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    toks = df.select(
        F.col(id_col), F.col(source_col), n_tok.alias("n_tokens"),
        split_bucket(F.col(id_col), salt).alias("bucket"))
    totals = (toks.groupBy(source_col)
              .agg(F.sum("n_tokens").alias("src_tokens")))
    wdf = df.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{source_col} string, weight double")
    rates = (totals.join(wdf, source_col)
             .select(source_col,
                     F.least(F.lit(1.0),
                             F.col("weight") * total_tokens
                             / F.col("src_tokens"))
                     .alias("keep_rate")))
    return (toks.join(F.broadcast(rates), source_col)
            .where(F.col("bucket")
                   < F.col("keep_rate") * SPLIT_MOD)
            .select(id_col, source_col, "n_tokens", "bucket",
                    F.round("keep_rate", 6).alias("keep_rate")))


def assembly_manifest(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      source_col: str = "source",
                      min_quality: float = 0.5,
                      salt: str = "split-v1:",
                      splits=DEFAULT_SPLITS) -> DataFrame:
    """Pretraining-mixture manifest: per (source, predicted language,
    split) — document count, token/char totals, quality-pass count,
    and each cell's share of the corpus token budget. Every dataset
    release ships this table (the RedPajama/Dolma-style composition
    report); it is also the input a mixture_sample weighting pass
    reads.

    Scale shape: stats and split labels ride the scan (pure
    expressions), then ONE partial-aggregated groupBy over the skinny
    label triple. token_share needs the corpus token total — a SINGLE
    scalar — which is collected once from a second aggregate and
    attached as a literal (the bounded-collect pattern of
    webgraph.pagerank's node count): with per-DOMAIN sources a 10^12-
    page manifest still has ~10^8 rows, so an un-partitioned window
    (one reducer holding the whole frame) would be the straggler this
    module exists to avoid. Exact-oracle-safe: every aggregate is an
    int64 sum; the share is one int/int double division per output
    row, identical whether the total arrives as a literal (here) or a
    window (the SQL twin)."""
    stats = with_text_stats(df, text_col)
    lab = deterministic_split(stats, id_col, salt, splits)
    g = (lab.groupBy(source_col, "lang_pred", "split")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("n_tokens").cast("long").alias("n_tokens"),
              F.sum("n_chars_calc").cast("long").alias("n_chars"),
              F.sum(F.when(F.col("quality_score") >= min_quality, 1)
                    .otherwise(0)).cast("long").alias("n_quality_ok")))
    g = g.localCheckpoint(eager=False)  # one scan for total + output
    total = g.agg(F.sum("n_tokens")).first()[0]  # bounded: one scalar
    return g.withColumn(
        "token_share",
        F.when(F.lit(total).isNotNull() & (F.lit(total) > 0),
               F.col("n_tokens").cast("double") / F.lit(total))
        .otherwise(F.lit(0.0)))
