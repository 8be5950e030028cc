"""CCNet-style n-gram language-model scoring for corpus filtering.

The classic pretraining-pipeline quality gate (CCNet, Wenzek et al.
2020; also used by LLaMA/RedPajama data recipes) scores every document
with a small n-gram LM and drops the high-perplexity tail. This module
is that op re-expressed Spark-first: TRAIN aggregates bigram/unigram
counts with ordinary partial-aggregated groupBys, SCORE broadcasts the
vocabulary-cut LM onto the corpus scan and folds per-document costs
map-side, so the 100 TB table is never shuffled with its payload —
the only exchanges carry (token-pair, count) and (doc_id, partial sum)
rows.

EXACT-ORACLE DESIGN — fixed-point costs. A float perplexity is a
per-doc SUM of logs, and float sums are partition-order-dependent, so
it could never hash-match a DuckDB twin. Instead each bigram's cost is
quantized ONCE at train time:

    cost_micro(w1 w2) = floor(1e6 * ln(c(w1) / c(w1 w2)))   [int64]

ln/division on identical int64 inputs produce bit-identical IEEE
doubles in both engines (same libm), floor of an identical double is
engine-independent, and the per-doc score is then an int64 sum —
commutative, overflow-safe (cost ≤ ~3e7 per bigram, docs ≪ 2^35
bigrams) and independent of partitioning. avg_cost_micro (the
perplexity analogue: mean negative-log-likelihood in micro-nats) is a
single int64/int64 division performed once per output row.

Out-of-vocabulary bigrams (cut by min_count/top_k, or unseen at train
time) cost OOV_COST_MICRO — a fixed smoothing penalty, ~e^-16
probability, mirrored as the same integer literal in the oracle.

Scale shape: train = explode → groupBy with map-side combine (bigram
rows never leave their scan partition un-combined); the top_k cut is
`orderBy(...).limit(k)` which Spark executes as TakeOrderedAndProject
— a distributed per-partition top-k + driver merge, NOT a single-task
global sort. score = narrow explode → broadcast-hash join (the cut LM
is ≤ top_k rows by construction) → partial-aggregated groupBy(doc_id):
one skinny row per doc per partition crosses the wire.

Reference scope note: the reference (extract-kit) has no corpus-level
LM filter — this is one of the training-data-pipeline ops the graft
adds beyond reference parity, next to dedup/ANN/decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**6
# cost charged to a bigram outside the trained vocabulary: 16e6
# micro-nats = -ln(p) for p ≈ 1.1e-7. A plain integer literal so the
# DuckDB oracle can repeat it verbatim.
OOV_COST_MICRO = 16 * SCALE


def _toks(col) -> F.Column:
    """Lowercased whitespace tokens; '' → empty array (split('') would
    yield [''])."""
    t = F.trim(col)
    return F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(F.lower(t), r"\s+"))


def _bigram_arr(toks_col: str) -> F.Column:
    """Adjacent-token pairs as 'w1 w2' strings. zip_with/slice are
    higher-order functions (CodegenFallback) — acceptable here because
    the LM stages are aggregation-bound, not expression-bound; the
    space joiner keeps (w1, w2) lexicographic order equal to plain
    string order (0x20 sorts below every token character)."""
    return F.expr(
        f"zip_with(slice({toks_col}, 1, greatest(size({toks_col})-1, 0)),"
        f"         slice({toks_col}, 2, greatest(size({toks_col})-1, 0)),"
        f"         (a, b) -> concat(a, ' ', b))")


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    min_count: int = 2, top_k: int = 20000) -> DataFrame:
    """Count-based bigram LM with a vocabulary cut.

    Returns (bigram, c12, c1, cost_micro): the ``top_k`` most frequent
    bigrams with corpus count ≥ ``min_count`` (ties broken by bigram
    string ascending — a total order, so the cut is deterministic under
    any partitioning), each with its conditional-probability cost in
    micro-nats (module docstring)."""
    base = docs.select(_toks(F.col(text_col)).alias("toks"))
    uni = (base.select(F.explode("toks").alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    big = (base.select(F.explode(_bigram_arr("toks")).alias("bigram"))
           .groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
           .filter(F.col("c12") >= min_count)
           .withColumn("w1", F.substring_index("bigram", " ", 1)))
    lm = (big.join(uni, "w1")
          .select("bigram", "c12", "c1",
                  F.floor(F.lit(float(SCALE)) * F.log(
                      F.col("c1").cast("double") / F.col("c12")))
                  .cast("long").alias("cost_micro")))
    # TakeOrderedAndProject: distributed top-k, never a global sort
    return lm.orderBy(F.col("c12").desc(), F.col("bigram").asc()) \
        .limit(top_k)


def lm_score(docs: DataFrame, lm: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             oov_cost_micro: int = OOV_COST_MICRO) -> DataFrame:
    """Per-document LM cost: (id, n_bigrams, oov_bigrams,
    cost_sum_micro, avg_cost_micro). Every input doc appears exactly
    once (explode_outer keeps bigram-less docs); avg_cost_micro is
    NULL when a doc has no bigrams."""
    ex = docs.select(
        F.col(id_col),
        F.explode_outer(_bigram_arr_from(text_col)).alias("bigram"))
    scored = ex.join(
        F.broadcast(lm.select("bigram", "cost_micro")), "bigram", "left")
    known = F.col("bigram").isNotNull()
    agg = (scored.groupBy(id_col).agg(
        F.count("bigram").alias("n_bigrams"),
        F.sum(F.when(known & F.col("cost_micro").isNull(), 1)
              .otherwise(0)).cast("long").alias("oov_bigrams"),
        F.sum(F.when(known, F.coalesce(F.col("cost_micro"),
                                       F.lit(oov_cost_micro)))
              .otherwise(0)).cast("long").alias("cost_sum_micro")))
    return agg.withColumn(
        "avg_cost_micro",
        F.when(F.col("n_bigrams") > 0,
               F.col("cost_sum_micro").cast("double")
               / F.col("n_bigrams").cast("double")))


def _bigram_arr_from(text_col: str) -> F.Column:
    """_bigram_arr over the tokenized text column (inline SQL twin of
    _toks + _bigram_arr, usable directly in a select)."""
    toks = (f"CASE WHEN trim({text_col}) = '' THEN array()"
            f" ELSE split(lower(trim({text_col})), '\\\\s+') END")
    return F.expr(
        f"zip_with(slice({toks}, 1, greatest(size({toks})-1, 0)),"
        f"         slice({toks}, 2, greatest(size({toks})-1, 0)),"
        f"         (a, b) -> concat(a, ' ', b))")
