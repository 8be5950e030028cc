"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All four stay entirely in JVM-side built-in expressions (whole-stage
codegen; no Python in the hot path), so they scale linearly with the
scan and each has an exact DuckDB oracle twin in `__spark_entry__`.

Performance note: no higher-order functions anywhere. HOF lambdas
(`filter`/`aggregate`) are CodegenFallback — interpreted per element
AND excluded from common-subexpression elimination, so a ratio column
that references a HOF count re-evaluates it once per referencing
expression (measured ~10x slowdown on with_text_stats). Stopword
counts are instead split-counts over a single-space-normalized padded
string, which codegen compiles and CSE shares across all derived
columns.

Determinism notes: fingerprints use md5 over whitespace-normalized
lowered text (identical semantics in Spark and DuckDB); ratios are
rounded to 6 decimals so cross-engine double formatting can't drift.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

# fixed stopword lists (deterministic, tiny; broadcast as literals)
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "that", "for", "on", "with", "as")
FR_STOPWORDS = ("le", "la", "les", "un", "une", "des", "et", "ou", "de",
                "du", "est", "que", "pour", "dans", "avec")

_PUNCT_RE = "[.,!?;:]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (split('')
    would yield [''])."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def normalized(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of normalized text. (The rolling-hash
    variant lives in dedup.simhash; this is the exact-dedup key.)"""
    return F.md5(normalized(col))


def _stopword_count(padded: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens exactly equal to one of ``words`` in a padded
    single-space-normalized lowered string (``" w1 w2 … "``).
    Token-equality semantics identical to filtering the split-token
    array, but expressed as a codegen-able regexp_count: the pattern
    consumes the token's leading space and looks ahead at the trailing
    one, so adjacent stopwords ("of the") both match. regexp_count
    (unlike split) caches its compiled Pattern across rows."""
    pat = r"\s(?:" + "|".join(words) + r")(?=\s)"
    return F.regexp_count(padded, F.lit(pat))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_calc, n_tokens, punct_ratio, stopword_ratio,
    quality_score, fingerprint, lang_pred. Pure built-ins, all
    whole-stage-codegen-able (see module docstring)."""
    c = F.col(text_col)
    # collapse-then-trim, matching normalized(): trim strips only ASCII
    # spaces, so trim-then-collapse would keep a leading/trailing space
    # for text edged with \t/\n and break the fingerprint contract
    norm = F.trim(F.regexp_replace(c, r"\s+", " "))
    lnorm = F.lower(norm)
    padded = F.concat(F.lit(" "), lnorm, F.lit(" "))
    n_tok = F.when(norm == "", F.lit(0)) \
        .otherwise(F.regexp_count(norm, F.lit(" ")) + 1)
    n_chars = F.length(c)
    n_punct = F.regexp_count(c, F.lit(_PUNCT_RE))
    en = _stopword_count(padded, EN_STOPWORDS)
    fr = _stopword_count(padded, FR_STOPWORDS)
    punct_ratio = F.round(
        F.when(n_chars > 0, n_punct.cast("double") / n_chars)
        .otherwise(F.lit(0.0)), 6)
    stop_ratio = F.round(
        F.when(n_tok > 0, (en + fr).cast("double") / n_tok)
        .otherwise(F.lit(0.0)), 6)
    # quality: length signal x penalty for punctuation soup; bounded [0,1].
    # Quantized via floor(x*1e6 + 0.5)/1e6 rather than round(x, 6):
    # the product of two 6-dp ratios can land EXACTLY on a 5e-7
    # boundary (e.g. 0.869405 * 0.7 = 0.6085835), where Spark's
    # BigDecimal HALF_UP of the binary double and DuckDB's decimal
    # rounding disagree by 1 ulp. floor of the same IEEE double is
    # engine-independent; the oracle mirrors the same expression.
    raw_quality = (
        F.least(F.lit(1.0), n_tok.cast("double") / F.lit(50.0))
        * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 5))
        * (F.lit(1.0) - F.least(F.lit(1.0), stop_ratio)))
    quality = F.floor(raw_quality * 1e6 + F.lit(0.5)) / 1e6
    lang_pred = (F.when(fr > en, F.lit("fr"))
                 .when(en > fr, F.lit("en"))
                 .otherwise(F.lit("und")))
    return (df
            .withColumn("n_chars_calc", n_chars)
            .withColumn("n_tokens", n_tok)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("stopword_ratio", stop_ratio)
            .withColumn("quality_score", quality)
            # md5(lnorm) == fingerprint(c) by construction (same
            # collapse-then-trim order); the lnorm spelling lets CSE
            # share the normalization work
            .withColumn("fingerprint", F.md5(lnorm))
            .withColumn("lang_pred", lang_pred))


# GPT-2-style pre-tokenizer, restricted to the RE2 ∩ Java-regex
# subset so the DuckDB oracle runs the LITERAL same pattern: no
# lookarounds (the original's `\s+(?!\S)` is dropped), whitespace as
# an explicit ASCII class (Java's `\s` includes \x0B, RE2's does not
# — the explicit class makes both engines see the same bytes, the
# normalize_text lesson), unicode letter/number classes shared by
# both engines.
_WS_CLASS = " \\t\\r\\n\\f\\x0B"
# content pieces only — no whitespace alternative, so regexp_count
# over the alternation IS the piece count (runs of whitespace between
# pieces are skipped by the scan; the ` ?` prefix keeps the
# space-attached-to-word semantic of the original)
BPE_SPLIT_RE = "|".join((
    "'(?:s|t|re|ve|m|ll|d)",            # english contractions
    " ?\\p{L}+",                        # letters (optional space)
    " ?\\p{N}+",                        # numbers
    f" ?[^{_WS_CLASS}\\p{{L}}\\p{{N}}]+",  # punctuation runs
))
_BPE_WORD_RE = " ?\\p{L}+"
_BPE_NUM_RE = " ?\\p{N}+"


def token_pieces(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """BPE-style token counting — the budget signal a pretraining
    pipeline needs BEFORE tokenizing 100 TB for real: subword piece
    counts estimated with the GPT-2 pre-tokenizer split (the regex
    that runs ahead of the BPE merges; its match count upper-bounds
    and tightly tracks the true BPE piece count on natural text).
    Returns per doc: whitespace token count, pre-tokenizer piece
    count, word/number piece counts, and pieces-per-ws-token (the
    fertility estimate mixture planning divides budgets by).

    All four counts are `regexp_count` expressions riding the scan —
    whole-stage codegen, no explode, no shuffle; the DuckDB oracle
    interpolates the identical pattern strings."""
    c = F.col(text_col)
    n_ws = token_count(c).cast("long")
    n_pieces = F.regexp_count(c, F.lit(BPE_SPLIT_RE)).cast("long")
    n_words = F.regexp_count(c, F.lit(_BPE_WORD_RE)).cast("long")
    n_nums = F.regexp_count(c, F.lit(_BPE_NUM_RE)).cast("long")
    return df.select(
        F.col(id_col),
        n_ws.alias("n_tokens_ws"),
        n_pieces.alias("n_pieces"),
        n_words.alias("n_word_pieces"),
        n_nums.alias("n_number_pieces"),
        F.round(F.when(n_ws > 0, n_pieces.cast("double") / n_ws)
                .otherwise(F.lit(0.0)), 6).alias("pieces_per_token"))


def tfidf_top_terms(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 5,
                    min_df: int = 2,
                    max_df_ratio: float = 0.5,
                    n_docs: int | None = None) -> DataFrame:
    """Per-document top-k TF-IDF terms — the keyword/topic signal a
    curation pipeline attaches to every document.

    Whitespace tokens (lowered), term frequency per doc, smoothed
    ``idf = ln((N+1)/(df+1))``, score = tf·idf rounded to 6 dp, top-k
    by (score desc, term asc) — a total order, so results are exact and
    partition-independent. Terms below ``min_df`` (hapax noise) or in
    more than ``max_df_ratio``·N documents (corpus-wide stopwords)
    are dropped.

    Scale shape: explode → two hash aggregations → broadcast-size df
    join → per-doc window. The hot-term skew in the (doc, term) agg is
    absorbed by map-side partial aggregation (term counts combine
    before the shuffle); the df table after the max_df cut is
    vocabulary-sized, orders of magnitude under the corpus. All
    expressions are JVM built-ins — no Python in the plan.
    ``n_docs`` lets the caller pass a known corpus size; otherwise one
    column-pruned count() runs up front.
    """
    from pyspark.sql import Window
    if n_docs is None:
        n_docs = docs.count()
    toks = (docs
            .where(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col),
                    F.explode(
                        F.split(F.lower(F.trim(F.col(text_col))),
                                r"\s+")).alias("term"))
            .where(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(dfreq, "term")
              .where((F.col("df") >= min_df)
                     & (F.col("df") <= max_df_ratio * n_docs))
              .withColumn(
                  "score",
                  F.round(F.col("tf")
                          * F.log((n_docs + 1.0)
                                  / (F.col("df") + F.lit(1.0))), 6)))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, "term", "tf", "df", "score", "rank"))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals — the quality gates that catch
    boilerplate-y, auto-generated and template pages that pass
    length/punct/stopword checks:

    - ``dup_sent_frac``: fraction of a document's sentences that are
      duplicates of an earlier sentence (sentence = '. '-separated
      span, trailing period normalized away).
    - ``top_bigram_share``: the most frequent token-2-gram's share of
      all 2-gram occurrences — near 1.0 for "buy now buy now buy now"
      spam, ~1/(n-1) for natural prose.

    Scale shape: sentence stats are pure expressions on the row (no
    shuffle); the bigram share is explode → two partial-agg groupBys
    keyed by (doc, gram) then doc — both combine map-side, so the hot
    path shuffles per-doc partial counts, not token streams. The HOF
    gram builder evaluates interpreted (CodegenFallback) but feeds an
    explode whose downstream aggregation dominates; the per-element
    cost is the same trade dedup.shingles() documents."""
    sents = F.split(F.col(text_col), r"\. ")
    norm = F.transform(sents,
                       lambda s: F.regexp_replace(s, r"\.$", ""))
    toks = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), r"\.", ""), r"\s+")
    base = df.select(
        F.col(id_col),
        F.size(sents).cast("long").alias("n_sents"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(norm))
                / F.size(sents), 6).alias("dup_sent_frac"),
        toks.alias("__toks"))
    k = F.size("__toks") - 1
    grams = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("__toks", (i + 1).cast("int")),
                F.element_at("__toks", (i + 2).cast("int")))))
    counts = (base.select(F.col(id_col), F.explode(grams).alias("g"))
              .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("n")))
    top = (counts.groupBy(id_col)
           .agg(F.round(F.max("n") / F.sum("n"), 6)
                .alias("top_bigram_share")))
    return (base.drop("__toks")
            .join(top, id_col, "left")
            .fillna({"top_bigram_share": 0.0}))


def normalize_text(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Unicode canonicalization — the pass that runs BEFORE any
    hash-based dedup, because NFD/NFC variants of the same word hash
    differently and silently defeat fingerprinting: NFC-normalize,
    strip C0/DEL control characters, collapse ASCII whitespace runs
    to single spaces, trim. Returns (id, norm_text, n_chars_before,
    n_chars_after, changed).

    This is the repo's one deliberate vectorized-Python text op: Spark
    has NO JVM unicode-normalization expression, so the rule "built-in
    functions first, Pandas UDF only when the JVM genuinely can't"
    lands on an Arrow-batched pandas stage here (unicodedata.normalize
    over whole columns, zero per-row Python calls into Spark). The
    regex steps use explicit ASCII classes — NOT \\s — because Python
    re's \\s is unicode-aware while RE2's (the DuckDB oracle, which
    runs nfc_normalize + the literal same patterns) is ASCII-only;
    the explicit class makes both engines compute the same bytes."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(col: pd.Series) -> pd.Series:
        import re as _re
        import unicodedata
        ctrl = _re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
        ws = _re.compile("[ \t\r\n\f\v]+")
        def one(x):
            if x is None:
                return None
            x = unicodedata.normalize("NFC", x)
            x = ctrl.sub("", x)
            # strip(' ') not strip(): Python's bare strip eats
            # unicode spaces, DuckDB's trim is ASCII-space-only
            return ws.sub(" ", x).strip(" ")
        return col.map(one)

    out = df.select(
        F.col(id_col), F.col(text_col).alias("__orig"),
        _nfc(F.col(text_col)).alias("norm_text"))
    return out.select(
        id_col, "norm_text",
        F.length("__orig").cast("long").alias("n_chars_before"),
        F.length("norm_text").cast("long").alias("n_chars_after"),
        (F.col("norm_text") != F.col("__orig")).alias("changed"))


def dup_span_strip(df: DataFrame, n: int = 8, min_df: int = 2,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Cross-document duplicated-span REMOVAL — the exact-substring
    dedup step of RefinedWeb-style curation (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    §ExactSubstr, at fixed n-gram granularity): every token interval
    covered by an n-gram occurring in ≥ ``min_df`` documents is
    DELETED from the text, turning dup_span_coverage's measurement
    into the rewrite. Symmetric variant, documented: ALL occurrences
    are stripped (no "keep first copy" — that needs a global document
    order; the symmetric rule is order-free, partition-independent,
    and strictly more conservative for training-data hygiene).

    Returns (id, text', n_tokens, tokens_removed, spans_removed)
    where text' is the kept tokens joined by single spaces — the
    rewrite is whitespace-normalizing and case-PRESERVING (gram keys
    are lowered, matching dup_span_coverage; output tokens are not).

    Scale shape: gram discovery is dup_span_coverage's plan verbatim
    (posexplode → df-cut → only duplicated positions reach the
    per-doc window). Overlapping/adjacent covered intervals merge via
    gaps-and-islands (a break wherever pos - prev_pos ≥ n, island id
    = running sum of breaks — one skinny window over duplicated
    starts only), so each doc gets a SMALL array of disjoint
    (start, end) intervals. That array joins back onto the docs scan
    by id — the payload crosses exactly ONE shuffle, never a
    token-level explode — and the rewrite is a per-token
    exists()-over-intervals filter (O(tokens × islands), islands
    being the merged minority). The DuckDB twin mirrors every stage
    including the island window and the interval filter."""
    from pyspark.sql import Window
    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))
    base = df.select(F.col(id_col), toks.alias("__toks")) \
        .select(F.col(id_col), "__toks",
                F.expr(
                    # lowered keys, original-case tokens; same
                    # short-doc guard as dup_span_coverage
                    f"CASE WHEN size(__toks) < {n} "
                    f"THEN array() "
                    f"ELSE transform(sequence(1, size(__toks) "
                    f"- {n} + 1), "
                    f"i -> lower(array_join(slice(__toks, i, {n}), "
                    f"' '))) END")
                .alias("__grams"))
    pos_grams = base.select(
        F.col(id_col), F.posexplode("__grams").alias("__p0", "g")) \
        .select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "g")
    dup_g = (pos_grams.groupBy("g")
             .agg(F.count_distinct(F.col(id_col)).alias("df"))
             .filter(F.col("df") >= min_df)
             .select("g"))
    dup_pos = pos_grams.join(dup_g, "g").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    islands = (dup_pos
               .withColumn("__brk", F.when(
                   F.col("pos") - F.lag("pos").over(w) >= n, 1)
                   .otherwise(0))
               .withColumn("__isl", F.sum("__brk").over(
                   w.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow))))
    ivs = (islands.groupBy(id_col, "__isl")
           .agg(F.min("pos").alias("s"),
                (F.max("pos") + n - 1).alias("e"))
           .groupBy(id_col)
           .agg(F.sort_array(F.collect_list(F.struct("s", "e")))
                .alias("__ivs"),
                F.count(F.lit(1)).cast("long").alias("spans_removed"),
                F.sum(F.col("e") - F.col("s") + 1).cast("long")
                .alias("tokens_removed")))
    joined = base.drop("__grams").join(ivs, id_col, "left")
    kept = F.expr(
        "CASE WHEN __ivs IS NULL THEN __toks "
        "ELSE filter(__toks, (t, i) -> "
        "NOT exists(__ivs, v -> v.s <= i + 1 AND i + 1 <= v.e)) END")
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text"),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.coalesce("tokens_removed", F.lit(0)).cast("long")
        .alias("tokens_removed"),
        F.coalesce("spans_removed", F.lit(0)).cast("long")
        .alias("spans_removed"))


def dup_span_coverage(df: DataFrame, n: int = 8, min_df: int = 2,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Cross-DOCUMENT repeated-substring coverage — the dup-span
    signal of exact-substring dedup (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better", applied at fixed
    n-gram granularity as in RefinedWeb/Dolma): for every document,
    the fraction of its token positions covered by at least one
    n-gram that also occurs in ≥ ``min_df`` documents. Complements
    the existing duplicate-text ladder — whole-doc exact
    (dedup_exact), whole-doc near (MinHash/SimHash/Jaccard), and
    line-level exact (dedup_lines) — with sub-line cross-doc overlap,
    the granularity boilerplate sentences and template spans live at.

    Exact union-length without per-token explosion: duplicated gram
    START positions are sorted per doc (one skinny window) and each
    contributes ``min(n, next_pos - pos)`` covered tokens — the
    standard sorted-interval union, mirrored verbatim in the SQL twin.

    Scale shape: grams are built plan-side and exploded; the
    document-frequency cut is a 2-phase count-distinct groupBy on the
    gram key; only positions of DUPLICATED grams (the minority by
    construction) reach the per-doc window. Grams travel as strings
    here for the exact oracle; at 100 TB the key would be
    xxhash64(gram) exactly like dedup.shingles' production path."""
    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(F.lower(t), r"\s+"))
    base = df.select(F.col(id_col), toks.alias("__toks")) \
        .select(F.col(id_col),
                F.size("__toks").cast("long").alias("n_tokens"),
                F.expr(
                    # guard: Spark's sequence(1, 0) counts DOWN to
                    # [1, 0] (it is not empty like SQL generate_series)
                    # and slice(..., 0, n) then throws — docs shorter
                    # than n tokens must short-circuit to no grams
                    f"CASE WHEN size(__toks) < {n} "
                    f"THEN array() "
                    f"ELSE transform(sequence(1, size(__toks) "
                    f"- {n} + 1), "
                    f"i -> array_join(slice(__toks, i, {n}), ' ')) "
                    f"END")
                .alias("__grams"))
    pos_grams = base.select(
        F.col(id_col), F.posexplode("__grams").alias("__p0", "g")) \
        .select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "g")
    dup_g = (pos_grams.groupBy("g")
             .agg(F.count_distinct(F.col(id_col)).alias("df"))
             .filter(F.col("df") >= min_df)
             .select("g"))
    dup_pos = pos_grams.join(dup_g, "g").select(id_col, "pos")
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    covered = (dup_pos
               .withColumn(
                   "__c", F.least(
                       F.lit(n),
                       F.coalesce(F.lead("pos").over(w) - F.col("pos"),
                                  F.lit(n))))
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_dup_grams"),
                    F.sum("__c").cast("long").alias("dup_tokens")))
    return (base.select(id_col, "n_tokens")
            .join(covered, id_col, "left")
            .select(F.col(id_col), F.col("n_tokens"),
                    F.coalesce("n_dup_grams", F.lit(0)).cast("long")
                    .alias("n_dup_grams"),
                    F.coalesce("dup_tokens", F.lit(0)).cast("long")
                    .alias("dup_tokens"),
                    F.when(F.col("n_tokens") > 0,
                           F.coalesce("dup_tokens", F.lit(0))
                           .cast("double") / F.col("n_tokens"))
                    .otherwise(F.lit(0.0)).alias("dup_coverage")))
