"""Web-corpus aggregations with explicit skew control.

The fixture corpus (like real Common Crawl) is Zipf-skewed: two hot
domains own ~40% of rows. A naive groupBy(domain) sends 40% of the table
through two reducer tasks; ``domain_stats_salted`` demonstrates the
two-phase salted aggregation the north rule calls for: partials are
computed per (domain, salt) — spreading each hot domain over
``n_salts`` reducers — then a second tiny aggregation merges partials.
Results are IDENTICAL to the naive plan (the oracle proves it); only the
shuffle shape changes.

(For algebraic aggregates Spark's map-side partial aggregation already
mitigates this; the explicit salt is the pattern needed when the
aggregate is holistic — collect_list/percentile — or when AQE can't
split a skewed reducer, and is kept explicit here as the scale
blueprint.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_SALTS = 16


def domain_of(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)/", 1)


def domain_stats_salted(df: DataFrame, url_col: str = "url",
                        payload_col: str = "html",
                        n_salts: int = N_SALTS) -> DataFrame:
    """Per-domain page counts + byte totals via salted two-phase agg."""
    salted = df.select(
        domain_of(F.col(url_col)).alias("domain"),
        F.pmod(F.xxhash64(url_col), F.lit(n_salts)).alias("salt"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"))
    partial = (salted.groupBy("domain", "salt")
               .agg(F.count(F.lit(1)).alias("pn"),
                    F.sum("n_bytes").alias("pb")))
    return (partial.groupBy("domain")
            .agg(F.sum("pn").alias("n_pages"),
                 F.sum("pb").alias("total_bytes")))


def salted_skew_join(facts: DataFrame, dim: DataFrame, key: str,
                     fact_salt_col: Column,
                     n_salts: int = N_SALTS) -> DataFrame:
    """JOIN-side skew handling: the fact side carries a deterministic
    per-row salt in [0, n_salts); the dim side is exploded into
    ``n_salts`` replicas; the equi-join runs on (key, salt), spreading
    each hot key's rows over ``n_salts`` reducer tasks instead of one
    straggler. Row-for-row identical to the unsalted join (each fact
    row matches exactly one dim replica — its own salt), with dim-side
    volume ×n_salts, which is the standard price when the dim is big
    enough to shuffle but small enough to replicate per salt. (When the
    dim IS broadcastable, broadcast and skew is moot; when neither
    holds, AQE's skewedJoin split is the runtime fallback — this op is
    the explicit blueprint the north rule asks for.)"""
    fact_s = facts.withColumn("__salt", fact_salt_col)
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    # merge hint: forbid broadcast so the salted shuffle shape is the
    # one actually planned (the demonstration would be vacuous under a
    # BroadcastHashJoin)
    return (fact_s.join(dim_s.hint("merge"), [key, "__salt"])
            .drop("__salt"))
