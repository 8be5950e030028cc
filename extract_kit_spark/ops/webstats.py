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


# AQE-native skew handling: thresholds sized so the runtime split
# fires on MB-scale test data (production keeps the defaults — 256 MB
# threshold, factor 5 — which fire on real skew at real sizes).
AQE_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
        "1024",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512",
    # keep the coalescer from merging everything into one read before
    # the skew check can see the hot partition
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256",
}


def aqe_skew_join(facts: DataFrame, dim: DataFrame,
                  key: str) -> DataFrame:
    """The AQE-native twin of ``salted_skew_join``: a PLAIN sort-merge
    equi-join on the skewed key (merge hint forbids broadcast), with
    skew handling left to the runtime — under
    ``spark.sql.adaptive.skewJoin`` AQE measures the shuffle's map
    output, splits any reducer partition larger than factor×median
    into advisory-sized sub-reads, and replicates the matching dim
    partition per split. Same effect as explicit salting, decided from
    RUNTIME sizes instead of a precomputed salt column.

    When to use which (also documented in PLANS.md): AQE's split only
    exists at sort-merge shuffle boundaries and only after map
    statistics exist — it covers the skewed-join case with zero code.
    Explicit salting still earns its keep where AQE can't reach: a
    holistic aggregation's single hot group, skew entering a
    repartition that feeds a Python stage, or engines/paths with AQE
    disabled. Run under ``AQE_SKEW_CONFS`` for the split to fire at
    test scale; callers must restore prior conf values afterwards.

    PATTERN CONSTRAINT (discovered empirically, matters in
    production): ``OptimizeSkewedJoin`` pattern-matches
    SMJ → Sort → ShuffleQueryStage on BOTH sides. Any operator
    interposed between the shuffle and the join on either side — most
    commonly a final ``HashAggregate`` when the dim is built with
    ``.distinct()`` ON THE SAME KEY (Catalyst reuses the distinct's
    hash partitioning for the join, so the agg lands between shuffle
    and sort) — silently defeats the rule: the plan stays
    un-split with no warning. Callers must hand the dim side in as a
    materialized input (a table scan, or ``localCheckpoint()`` in
    tests) so the join plans a clean Exchange under its Sort. This is
    a second case where explicit salting beats AQE: salting works
    regardless of what sits between the shuffle and the join."""
    return facts.join(dim.hint("merge"), key)
