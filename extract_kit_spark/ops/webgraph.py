"""Web link-graph operators: outlink extraction and PageRank.

A crawl-curation engine needs graph signals — which domains are
authoritative, which are link farms — so the pages table doubles as a
domain-level link graph: every absolute `<a href="https://...">` in a
page's HTML is an edge from the page's own domain to the target
domain. (The reference extracts per-document links during HTML→MD
serialization, `office-to-markdown` Turndown anchor rule; this is the
corpus-level rollup of the same signal.)

PageRank is computed in FIXED-POINT int64 arithmetic (rank mass scaled
by 10^12, all divisions integer) so the result is BIT-IDENTICAL across
engines and partitionings — every per-edge contribution
`(rank*weight) div out_weight` and the damping fold
`base + (85*sum) div 100` are exact integer functions with
order-independent sums, which is what lets DuckDB verify the Spark
loop exactly (the driver's hash compare) instead of settling for a
float tolerance.

Scale shape: the edge list is domain-level — shuffles carry (src, dst,
n) triples, never payloads; each iteration is one shuffle join on the
rank frame keyed by domain (the standard Pregel-style loop), with
lineage cut per round via localCheckpoint exactly like
ops/dedup.duplicate_clusters. Dangling-node mass (domains with no
outlinks) evaporates by design — documented, matched by the oracle,
and harmless for the ranking use case (relative order of linked
domains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# one absolute outlink per article fixture; domains are [a-z0-9.-]
HREF_RE = '<a href="https://([a-z0-9.-]+)/'

SCALE = 10**12
N_ITER = 8
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio
N_SALTS = 16  # contrib-sum salt width (see pagerank docstring)


def outlink_edges(pages: DataFrame) -> DataFrame:
    """(src_domain, dst_domain, n) from html pages. Pure plan-side
    expressions (decode → regexp_extract_all → explode → groupBy):
    whole-stage codegen until the single skinny aggregation."""
    s = F.decode(F.col("html"), "UTF-8")
    src = F.regexp_extract(F.col("url"), r"https://([a-z0-9.-]+)/", 1)
    return (pages
            .select(src.alias("src"),
                    F.explode(F.regexp_extract_all(
                        s, F.lit(HREF_RE), F.lit(1))).alias("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n")))


def pagerank(edges: DataFrame, n_iter: int = N_ITER,
             scale: int = SCALE) -> DataFrame:
    """Fixed-point PageRank over a weighted domain edge list.

    rank_0(v)   = scale div N
    rank_k+1(v) = (15*(scale div N)) div 100
                  + (85 * Σ_{u→v} (rank_k(u)*n_uv div out_w(u))) div 100

    Every operation is int64; overflow headroom: ranks ≤ scale=1e12,
    85*Σ ≤ 8.5e13 ≪ 2^63. N (node count) is a one-scalar bounded
    collect. Returns (node, rank).

    Skew: the per-round contribution sum is a SALTED two-phase
    aggregation (partial per (node, salt-of-src), final per node —
    the ops/webstats.domain_stats_salted pattern), so a mega-in-degree
    domain (a link farm's target, a CDN every site links) cannot pin
    one reducer across all n_iter rounds. Salting an int64 SUM is
    result-invariant — addition is associative/commutative and exact —
    so the DuckDB oracle is unchanged digit for digit."""
    spark = edges.sparkSession
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n_nodes = nodes.count()  # bounded: one scalar
    if n_nodes == 0:
        return spark.createDataFrame([], "node string, rank long")
    r0 = scale // n_nodes
    base = (15 * r0) // 100

    deg = edges.groupBy("src").agg(F.sum("n").alias("w"))
    # weighted edges with out-degree attached once, reused every round
    ew = edges.join(deg, "src").localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(r0).cast("long"))
    for _ in range(n_iter):
        contrib = (ew.join(ranks, ew["src"] == ranks["node"])
                   .select(F.col("dst").alias("node"),
                           F.pmod(F.xxhash64(ew["src"]),
                                  F.lit(N_SALTS)).alias("salt"),
                           F.expr("(rank * n) div w").alias("c"))
                   .groupBy("node", "salt")
                   .agg(F.sum("c").alias("ps"))
                   .groupBy("node")
                   .agg(F.sum("ps").alias("s")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(base) + F.expr(
                             f"({DAMP_NUM} * coalesce(s, CAST(0 AS "
                             f"BIGINT))) div {DAMP_DEN}"))
                         .cast("long").alias("rank"))
                 # cut lineage so the plan stays O(1) per round
                 .localCheckpoint())
    return ranks


def oracle_sql(pages_glob: str, n_iter: int = N_ITER,
               scale: int = SCALE) -> str:
    """The EXACT DuckDB twin: the same fixed-point recurrence unrolled
    as a CTE chain (standard SQL disallows aggregation in a recursive
    term, so a fixed iteration count is unrolled programmatically).
    Every arithmetic step mirrors pagerank() digit for digit."""
    ctes = [f"""
pages AS (SELECT url, decode(html) AS s
          FROM read_parquet('{pages_glob}')
          WHERE starts_with(hex(html), hex('<!DO'))),
edges AS (
  SELECT regexp_extract(url, 'https://([a-z0-9.-]+)/', 1) AS src,
         unnest(regexp_extract_all(s, '{HREF_RE}', 1)) AS dst,
  FROM pages
),
wedges AS (SELECT src, dst, count(*)::BIGINT AS n
           FROM edges GROUP BY src, dst),
nodes AS (SELECT DISTINCT src AS node FROM wedges
          UNION SELECT DISTINCT dst FROM wedges),
nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes),
deg AS (SELECT src, sum(n)::BIGINT AS w FROM wedges GROUP BY src),
r0 AS (SELECT node, ({scale} // (SELECT n_nodes FROM nn))::BIGINT
                    AS rank FROM nodes)"""]
    for k in range(1, n_iter + 1):
        ctes.append(f"""
r{k} AS (
  SELECT n.node,
         ((15 * ({scale} // (SELECT n_nodes FROM nn))) // 100
          + (85 * COALESCE(c.s, 0)) // 100)::BIGINT AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum((r.rank * e.n) // d.w)::BIGINT AS s
    FROM wedges e
    JOIN r{k-1} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst) c ON n.node = c.node)""")
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT node, rank FROM r{n_iter}")


# -- anchor-text aggregation ---------------------------------------------------

# any <a> tag with a double-quoted href and flat text content — the
# same shape the fixture chrome/nav/articles emit and the reference's
# Turndown anchor rule serializes (`office-to-markdown` link rule)
ANCHOR_TAG_RE = '<a href="([^"]*)">([^<]*)</a>'


def anchor_text_stats(pages: DataFrame) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-corpus
    ranking/labeling signal (anchor text describes the TARGET page
    better than the page itself; used by every production search/crawl
    stack since PageRank-era Google).

    Edges are (target, anchor) pairs from every `<a>` tag on every
    page: relative hrefs resolve against the linking page's own
    domain, absolute https hrefs pass through, javascript:/mailto:
    pseudo-links are dropped. Output per target url: inlink count,
    distinct anchor-text count, and the modal anchor text (ties broken
    by anchor string ascending — a total order, so the answer is
    partition-independent).

    Scale shape: tag extraction is pure plan-side regex on the page
    scan (one pass, no UDF); everything after the explode is skinny
    (target, anchor) strings — two partial-aggregated groupBys and one
    per-target window over modal candidates. The page payload is never
    shuffled. Like outlink_edges above, non-HTML payloads (PDF/DOCX
    binaries) are handled by the regex simply never matching their
    decoded bytes; the DuckDB twin filters to the '<!DO' magic instead
    because its decode() ERRORS on invalid UTF-8 — same row set either
    way on any corpus whose binary formats don't embed literal
    `<a href=...>` runs (pinned by the oracle at sf0.01)."""
    s = F.decode(F.col("html"), "UTF-8")
    src = F.regexp_extract(F.col("url"), r"https://([a-z0-9.-]+)/", 1)
    tags = (pages
            .select(src.alias("src_domain"),
                    F.explode(F.regexp_extract_all(
                        s, F.lit(ANCHOR_TAG_RE), F.lit(0))).alias("tag"))
            .select("src_domain",
                    F.regexp_extract("tag", ANCHOR_TAG_RE, 1)
                    .alias("href"),
                    F.regexp_extract("tag", ANCHOR_TAG_RE, 2)
                    .alias("anchor")))
    resolved = (tags
                .filter(~F.col("href").rlike("^(javascript|mailto):"))
                .select(
                    F.when(F.col("href").startswith("https://"),
                           F.col("href"))
                    .when(F.col("href").startswith("/"),
                          F.concat(F.lit("https://"),
                                   F.col("src_domain"), F.col("href")))
                    .alias("target"),
                    "anchor")
                .filter(F.col("target").isNotNull()))
    per_anchor = (resolved.groupBy("target", "anchor")
                  .agg(F.count(F.lit(1)).alias("n")))
    from pyspark.sql import Window
    w = (Window.partitionBy("target")
         .orderBy(F.col("n").desc(), F.col("anchor").asc()))
    top = (per_anchor
           .withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1)
           .select("target", F.col("anchor").alias("top_anchor"),
                   F.col("n").alias("top_anchor_n")))
    totals = (per_anchor.groupBy("target")
              .agg(F.sum("n").alias("n_inlinks"),
                   F.count(F.lit(1)).alias("n_anchors")))
    return totals.join(top, "target")
