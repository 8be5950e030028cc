"""URL-level corpus hygiene: canonicalization, url dedup, per-domain
caps — the passes a Common-Crawl-style pipeline runs BEFORE content
extraction, because they prune on the cheap key column and never touch
the payload.

- ``canonical_url``: pure-expression normalizer (lowercase scheme+host,
  strip default ports / fragments / tracking params / trailing slash).
  Whole-stage-codegen friendly — a chain of regexp_replace on a short
  string column; every regex is RE2-safe (no lookaround, no
  backreference) so the DuckDB oracle runs the LITERAL same patterns.
- ``url_dedup``: group by the canonical key, keep deterministic
  min(url)/min(ts) per group. One hash shuffle on a skinny
  (canonical, url, ts) projection — the payload column is never
  selected, so at 100 TB the shuffle moves only urls.
- ``domain_cap``: keep the k earliest pages per domain. Real crawls
  are Zipf-skewed (two hot domains own ~40% of the fixture corpus —
  and of real crawls), so a single row_number window over domain puts
  a hot domain's entire row set through one reducer. This runs the
  SALTED two-phase shape instead: phase 1 ranks within
  (domain, salt16) — each hot domain spread over n_salts reducers —
  and keeps k per cell, so phase 2's global rank sees at most
  n_salts*k rows per domain. Identical output to the naive window
  (phase 1 keeps a superset of the global top-k; the oracle IS the
  naive window), shuffle shape survives the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .webstats import domain_of

# tracking params stripped by canonicalization (the de-facto core set;
# extend per deployment)
_TRACKING_RE = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&?"
_HEAD_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of a url: lowercase scheme+host, default ports
    (:80/:443) stripped, fragment stripped, tracking query params
    (utm_*/fbclid/gclid) stripped with separator cleanup, trailing
    slash stripped (root path kept). Path and real query params keep
    their case and order — they are semantically significant."""
    head = F.lower(F.regexp_extract(url, _HEAD_RE, 1))
    head = F.regexp_replace(head, r":(80|443)$", "")
    rest = F.regexp_replace(url, _HEAD_RE, "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, _TRACKING_RE, "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # /+$ (not /$): strip the whole trailing run in one pass, so the
    # normalizer is idempotent on '//p//'-style inputs
    rest = F.when(rest == "/", rest).otherwise(
        F.regexp_replace(rest, r"/+$", ""))
    return F.concat(head, rest)


def url_dedup(df: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts") -> DataFrame:
    """One row per canonical url: variant count + deterministic
    representative (min url, min ts). Skinny projection first — the
    shuffle carries (canonical, url, ts) only, never a payload."""
    c = df.select(canonical_url(F.col(url_col)).alias("canonical_url"),
                  F.col(url_col).alias("__u"), F.col(ts_col))
    return (c.groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_variants"),
                 F.min("__u").alias("first_url"),
                 F.min(ts_col).alias("first_ts")))


def domain_cap(df: DataFrame, k: int = 5, url_col: str = "url",
               ts_col: str = "warc_ts",
               n_salts: int = 16) -> DataFrame:
    """Keep the ``k`` earliest pages per domain (order: ts, then url
    as the deterministic tiebreak), salted two-phase so a hot domain
    never serializes onto one reducer. Returns
    (url, domain, ts, rank_in_domain)."""
    d = df.select(F.col(url_col), F.col(ts_col),
                  domain_of(F.col(url_col)).alias("domain"),
                  F.pmod(F.xxhash64(url_col),
                         F.lit(n_salts)).alias("__salt"))
    w1 = (Window.partitionBy("domain", "__salt")
          .orderBy(F.col(ts_col).asc(), F.col(url_col).asc()))
    pruned = (d.withColumn("__rn", F.row_number().over(w1))
              .where(F.col("__rn") <= k).drop("__rn", "__salt"))
    w2 = (Window.partitionBy("domain")
          .orderBy(F.col(ts_col).asc(), F.col(url_col).asc()))
    return (pruned
            .withColumn("rank_in_domain",
                        F.row_number().over(w2).cast("long"))
            .where(F.col("rank_in_domain") <= k)
            .select(url_col, "domain", ts_col, "rank_in_domain"))


def crawl_diff(old: DataFrame, new: DataFrame, url_col: str = "url",
               payload_col: str = "html",
               ts_col: str = "warc_ts") -> DataFrame:
    """Incremental-crawl snapshot diff: one row per url across two
    crawl snapshots, labeled ``added`` / ``gone`` / ``changed`` /
    ``unchanged`` (content compared by digest), with both snapshots'
    timestamps. This is the pass that turns "recrawl everything" into
    "re-extract the changed 3%" — at 10^12 urls the single biggest
    cost lever an incremental pipeline has.

    Scale shape: the payload is digested MAP-SIDE (md5 over the hex
    of the bytes, before any shuffle), so the full-outer join moves
    only (url, digest, ts) — never page bytes; when both snapshots
    are stored bucketed by url the join plans with zero Exchange
    (pipeline.py's bucketed layout). The hex detour keeps the digest
    reproducible in engines whose md5 is VARCHAR-only (the DuckDB
    oracle runs the literal same composition)."""
    o = old.select(
        F.col(url_col),
        F.md5(F.hex(F.col(payload_col))).alias("__h_old"),
        F.col(ts_col).alias("ts_old"))
    n = new.select(
        F.col(url_col),
        F.md5(F.hex(F.col(payload_col))).alias("__h_new"),
        F.col(ts_col).alias("ts_new"))
    status = (F.when(F.col("__h_old").isNull(), F.lit("added"))
              .when(F.col("__h_new").isNull(), F.lit("gone"))
              .when(F.col("__h_old") != F.col("__h_new"),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return (o.join(n, url_col, "full_outer")
            .select(url_col, status.alias("status"), "ts_old",
                    "ts_new"))


def domain_blocklist(df: DataFrame, blocked: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Domain/suffix blocklist labeling — the corpus-time robots/
    spam-list pass: a rule ``example.net`` blocks every subdomain
    under it, ``mega-news.example.org`` blocks exactly that host.
    Returns every input row with (domain, matched_rule, blocked);
    callers filter ``~blocked`` to apply, or keep the labels for
    audit. Run it on canonicalized urls (weburl.canonical_url) so
    scheme/host case can't dodge a rule.

    Scale shape: each url's domain explodes into its suffix CHAIN
    (a.b.c → [a.b.c, b.c, c] — bounded by label count, ~4), which
    meets the rule table in a broadcast equality join: no regex scan
    per rule (the naive rlike-per-rule plan is O(rules × rows) and
    unindexable), no shuffle of the corpus. The most-specific (longest)
    matching rule wins; suffix lengths within one chain are strictly
    increasing, so the max_by tiebreak is deterministic."""
    dom = domain_of(F.col(url_col))
    labels = F.split(dom, r"\.")
    k = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(".", F.slice(labels, i + 1, k - i)))
    e = df.select(F.col(url_col), F.explode(suffixes).alias("suffix"))
    hits = (e.join(F.broadcast(blocked.select("suffix")), "suffix")
            .groupBy(url_col)
            .agg(F.max_by("suffix", F.length("suffix"))
                 .alias("matched_rule")))
    return (df.select(F.col(url_col), dom.alias("domain"))
            .join(hits, url_col, "left")
            .withColumn("blocked", F.col("matched_rule").isNotNull()))


# -- head metadata: canonical link / og:title / robots gate (r4) --------------
# Real crawls carry dedup signals IN the page head: <link rel=canonical>
# names the preferred url of a duplicate family, and a robots-noindex
# meta opts the page out of indexing entirely. Honoring both before
# content dedup removes whole duplicate families for the cost of a head
# regexp — orders of magnitude cheaper than shingling the bodies.

_CANONICAL_RE = '<link rel="canonical" href="([^"]+)"'
_OG_TITLE_RE = '<meta property="og:title" content="([^"]+)"'
_NOINDEX_LIT = '<meta name="robots" content="noindex"'


def html_meta(df: DataFrame, url_col: str = "url",
              html_col: str = "html") -> DataFrame:
    """Per-page head metadata as pure plan-side expressions (decode →
    regexp_extract / contains): canonical href (null when absent),
    og:title, robots-noindex flag. Whole-stage codegen; no Python."""
    s = F.decode(F.col(html_col), "UTF-8")
    return df.select(
        F.col(url_col).alias("url"),
        F.nullif(F.regexp_extract(s, _CANONICAL_RE, 1),
                 F.lit("")).alias("canonical"),
        F.nullif(F.regexp_extract(s, _OG_TITLE_RE, 1),
                 F.lit("")).alias("og_title"),
        s.contains(_NOINDEX_LIT).alias("noindex"))


def canonical_collapse(df: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """The canonical-family gate: drop noindex pages, then keep ONE
    url per canonical target (pages without a canonical are their own
    family). Deterministic keep rule: min(url) — the bare url sorts
    before its '?...'-suffixed variants. One hash shuffle on the
    skinny (canonical, url) projection; payloads never move."""
    meta = html_meta(df, url_col, html_col)
    key = F.coalesce("canonical", "url")
    return (meta.where(~F.col("noindex"))
            .groupBy(key.alias("canonical"))
            .agg(F.count(F.lit(1)).alias("n_variants"),
                 F.min("url").alias("kept_url")))


# -- robots.txt: RFC 9309 parse + wildcard longest-match gate ------------------
# Crawl compliance is a pre-extraction pass: parse each domain's
# robots.txt once, then gate the page table against the rules.
# (r5) Full RFC 9309 semantics, replacing the r4 prefix-only/'*'-only
# simplification:
#  * GROUPS: one or more STACKED User-agent lines head a group; the
#    first UA line after any rule line starts a new group; every rule
#    binds to all of its group's UA tokens. Rules before any UA line
#    are ignored (no group).
#  * SELECTION: groups naming the crawler's product token (exact,
#    case-insensitive — default ROBOTS_UA_TOKEN) are selected and
#    merged; ONLY when a domain has no such group do its '*' groups
#    apply (fallback, never merged with specific groups — §2.2.1).
#  * MATCHING: '*' in a rule path matches any octet run, a trailing
#    '$' anchors the end, otherwise the rule is a prefix (§2.2.2).
#    The matching rule with the LONGEST raw pattern wins; Allow wins
#    length ties; no matching rule (or no robots.txt) = allowed
#    (§2.2.2 "most specific match").

ROBOTS_UA_TOKEN = "ekbot"  # this engine's product token

_ROBOTS_UA_RE = r"(?i)^user-agent:\s*(\S+)"
_ROBOTS_RULE_RE = r"(?i)^(allow|disallow):\s*(\S*)"
_ROBOTS_DELAY_RE = r"(?i)^crawl-delay:\s*(\d+)"
# any directive line terminates a stacked-UA header block
_ROBOTS_DIRECTIVE_RE = r"(?i)^(allow|disallow|crawl-delay|sitemap):"

# regex metacharacters escaped when a rule path becomes a pattern;
# '*' is deliberately absent (it becomes '.*' afterwards). Order
# matters only for '\\', which must be escaped first.
_RX_META = ["\\", ".", "^", "$", "+", "?", "(", ")", "[", "]",
            "{", "}", "|"]


def rule_pattern_regex(path: Column) -> Column:
    """RFC 9309 rule path → anchored regex, as a pure column
    expression: a trailing '$' anchors, '*' matches any run, every
    other regex metacharacter is escaped, and the whole pattern is
    start-anchored (rules always match from the path's first byte).
    The DuckDB oracle mirrors this literal replace chain
    (queries._sql_rule_rx), so both engines compile identical
    patterns."""
    anchored = path.endswith("$")
    body = F.when(anchored,
                  path.substr(F.lit(1), F.length(path) - 1)) \
        .otherwise(path)
    for ch in _RX_META:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), body,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def _robots_parsed(robots: DataFrame, domain_col: str,
                   txt_col: str) -> DataFrame:
    """Lines → (domain, pos, ua, rule, path, delay, hdr): posexplode,
    per-line directive extracts, and the RFC group id `hdr` — the
    count of directive lines strictly BEFORE the line, so stacked UA
    lines share one id and the first UA line after a rule starts a
    fresh group — forward-filled from UA lines onto their rules.
    Robots files are tiny; the windows run over a per-domain handful
    of rows."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(txt_col), "\n"))
        .alias("pos", "line"))
    parsed = lines.select(
        "domain", "pos",
        F.when(F.col("line").rlike(_ROBOTS_UA_RE),
               F.lower(F.regexp_extract("line", _ROBOTS_UA_RE, 1)))
        .alias("ua"),
        F.lower(F.regexp_extract("line", _ROBOTS_RULE_RE, 1))
        .alias("rule"),
        F.regexp_extract("line", _ROBOTS_RULE_RE, 2).alias("path"),
        F.nullif(F.regexp_extract("line", _ROBOTS_DELAY_RE, 1),
                 F.lit("")).alias("delay"),
        F.col("line").rlike(_ROBOTS_DIRECTIVE_RE).cast("int")
        .alias("is_rule"))
    w_before = (Window.partitionBy("domain").orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, -1))
    w_fill = (Window.partitionBy("domain").orderBy("pos")
              .rowsBetween(Window.unboundedPreceding,
                           Window.currentRow))
    return (parsed
            .withColumn("nrb", F.coalesce(
                F.sum("is_rule").over(w_before), F.lit(0)))
            .withColumn("hdr", F.last(
                F.when(F.col("ua").isNotNull(), F.col("nrb")),
                ignorenulls=True).over(w_fill)))


def _selected_groups(parsed: DataFrame, ua_token: str) -> DataFrame:
    """(domain, hdr) of the groups RFC 9309 §2.2.1 selects for
    `ua_token`: all groups naming the token, else the domain's '*'
    groups."""
    hdrs = (parsed.where(F.col("ua").isNotNull())
            .select("domain", "hdr", F.col("ua").alias("tok")))
    specific = (hdrs.where(F.col("tok") == ua_token.lower())
                .select("domain", "hdr").distinct())
    star = (hdrs.where(F.col("tok") == "*")
            .select("domain", "hdr").distinct())
    fallback = star.join(specific.select("domain").distinct(),
                         "domain", "left_anti")
    return specific.unionByName(fallback)


def robots_rules(robots: DataFrame, domain_col: str = "domain",
                 txt_col: str = "robots_txt",
                 ua_token: str = ROBOTS_UA_TOKEN) -> DataFrame:
    """robots.txt text → (domain, rule ∈ {allow,disallow}, path) rows
    of the groups selected for `ua_token` (exact token match,
    fallback to '*'). Empty-path rules ('Disallow:') are no-ops per
    the spec. Pure plan-side over tiny per-domain frames."""
    parsed = _robots_parsed(robots, domain_col, txt_col)
    sel = _selected_groups(parsed, ua_token)
    return (parsed
            .where((F.col("rule") != "") & (F.col("path") != ""))
            .join(sel, ["domain", "hdr"])
            .select("domain", "rule", "path"))


def robots_gate(pages: DataFrame, robots: DataFrame,
                url_col: str = "url",
                ua_token: str = ROBOTS_UA_TOKEN) -> DataFrame:
    """Evaluate every page url against its domain's selected rules
    with full RFC 9309 matching ('*' wildcards, '$' anchor,
    longest-raw-pattern wins, Allow wins ties).

    Scale shape: rules collapse to ONE row per domain carrying
    arrays of (regex, pattern-length) structs — a broadcast-sized dim
    (patterns are compiled from rule paths at parse time, once per
    RULE, not per page) — so the pages side is a single
    BroadcastHashJoin + map-side higher-order functions
    (filter/transform/array_max): ZERO exchange on the big table, and
    only (url, domain, path) is ever projected."""
    enriched = robots_rules(robots, ua_token=ua_token).select(
        "domain", "rule",
        rule_pattern_regex(F.col("path")).alias("re"),
        F.length("path").cast("int").alias("plen"))
    per_domain = enriched.groupBy("domain").agg(
        F.collect_list(F.when(F.col("rule") == "allow",
                              F.struct("re", "plen"))).alias("allows"),
        F.collect_list(F.when(F.col("rule") == "disallow",
                              F.struct("re", "plen")))
        .alias("disallows"))
    p = pages.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(url_col, r"https://([a-z0-9.-]+)", 1)
        .alias("domain"),
        F.coalesce(F.nullif(F.regexp_extract(
            url_col, r"https://[^/]+(/.*)$", 1), F.lit("")), F.lit("/"))
        .alias("path"))
    j = p.join(F.broadcast(per_domain), "domain", "left")

    def longest(arr: str) -> F.Column:
        return F.expr(
            f"coalesce(array_max(transform(filter({arr}, "
            f"r -> path rlike r.re), r -> r.plen)), 0)")

    return (j.withColumn("allow_len", longest("allows").cast("int"))
            .withColumn("disallow_len", longest("disallows").cast("int"))
            .select("url", "domain",
                    (F.col("allow_len") >= F.col("disallow_len"))
                    .alias("allowed"),
                    "allow_len", "disallow_len"))


_ROBOTS_SITEMAP_RE = r"(?i)^sitemap:\s*(\S+)"


def robots_sitemaps(robots: DataFrame, domain_col: str = "domain",
                    txt_col: str = "robots_txt") -> DataFrame:
    """(domain, sitemap_url) from `Sitemap:` lines — per RFC 9309 §2.3
    / sitemaps.org these are NOT group-scoped (they apply to every
    crawler regardless of User-agent groups), so no group selection
    runs: one regexp over the exploded lines, distinct per domain.
    This is the discovery hook that feeds sitemap_urls/sitemap_frontier
    without out-of-band sitemap location config."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(txt_col), "\n")).alias("line"))
    return (lines
            .select("domain",
                    F.nullif(F.regexp_extract(
                        "line", _ROBOTS_SITEMAP_RE, 1), F.lit(""))
                    .alias("sitemap_url"))
            .where(F.col("sitemap_url").isNotNull())
            .distinct())


def robots_crawl_delays(robots: DataFrame, domain_col: str = "domain",
                        txt_col: str = "robots_txt",
                        ua_token: str = ROBOTS_UA_TOKEN) -> DataFrame:
    """(domain, delay_s) from the selected groups' Crawl-delay lines
    (first in file order wins if repeated) — same RFC group selection
    as robots_rules."""
    parsed = _robots_parsed(robots, domain_col, txt_col)
    sel = _selected_groups(parsed, ua_token)
    return (parsed
            .where(F.col("delay").isNotNull())
            .join(sel, ["domain", "hdr"])
            .groupBy("domain")
            .agg(F.min_by("delay", "pos").cast("long").alias("delay_s")))


def politeness_schedule(pages: DataFrame, robots: DataFrame,
                        default_delay_s: int = 1,
                        url_col: str = "url",
                        ts_col: str = "warc_ts") -> DataFrame:
    """Per-domain fetch schedule honoring Crawl-delay: urls are
    sequenced within their domain by (first-seen ts, url) and slot i
    fetches at offset i*delay seconds. Politeness is BY DEFINITION a
    per-domain serial order, so the row_number window partitioned on
    domain is the honest shape — a hot domain's fetch queue is one
    partition because it must be fetched one-at-a-time anyway; the
    shuffle carries only (url, ts, domain). Returns
    (url, domain, seq, delay_s, fetch_offset_s)."""
    delays = robots_crawl_delays(robots)
    p = pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.regexp_extract(url_col, r"https://([a-z0-9.-]+)", 1)
        .alias("domain"))
    j = p.join(F.broadcast(delays), "domain", "left") \
         .withColumn("delay_s",
                     F.coalesce("delay_s",
                                F.lit(default_delay_s).cast("long")))
    w = Window.partitionBy("domain").orderBy("ts", "url")
    return (j.withColumn("seq",
                         (F.row_number().over(w) - 1).cast("long"))
            .select("url", "domain", "seq", "delay_s",
                    (F.col("seq") * F.col("delay_s"))
                    .alias("fetch_offset_s")))


# -- sitemap.xml: url discovery + refresh frontier (r4) ------------------------

_SITEMAP_LOC_RE = "<loc>([^<]+)</loc>"
_SITEMAP_LASTMOD_RE = "<lastmod>([^<]+)</lastmod>"


def sitemap_urls(sitemaps: DataFrame, domain_col: str = "domain",
                 xml_col: str = "sitemap_xml") -> DataFrame:
    """(domain, loc, lastmod) per <url> entry of a urlset — two
    regexp_extract_all arrays zipped positionally (the fixture always
    pairs loc with lastmod; a lastmod-less real-world entry would
    misalign and needs a struct-level regex first — documented
    limit). Pure plan-side."""
    xml = F.col(xml_col)
    pairs = F.expr(
        f"zip_with(regexp_extract_all({xml_col}, "
        f"'{_SITEMAP_LOC_RE}', 1), "
        f"regexp_extract_all({xml_col}, '{_SITEMAP_LASTMOD_RE}', 1), "
        f"(l, m) -> struct(l AS loc, m AS lastmod))")
    return (sitemaps
            .select(F.col(domain_col).alias("domain"),
                    F.explode(pairs).alias("e"))
            .select("domain", "e.loc", "e.lastmod"))


def sitemap_frontier(sitemaps: DataFrame, pages: DataFrame,
                     url_col: str = "url",
                     ts_col: str = "warc_ts") -> DataFrame:
    """What to fetch next, from the sitemaps: urls the crawl has never
    seen ('new') and known urls whose sitemap lastmod postdates their
    crawl date ('stale'). One equality join on the skinny
    (loc ↔ url, ts) projection — the page payload is never read
    (column pruning keeps it out of the scan)."""
    urls = sitemap_urls(sitemaps)
    known = pages.select(F.col(url_col).alias("known_url"),
                         F.to_date(ts_col).alias("crawl_date"))
    j = urls.join(known, urls["loc"] == known["known_url"], "left")
    return (j.where(F.col("known_url").isNull()
                    | (F.to_date("lastmod") > F.col("crawl_date")))
            .select("domain", F.col("loc").alias("url"), "lastmod",
                    F.when(F.col("known_url").isNull(), "new")
                    .otherwise("stale").alias("reason")))


def crawl_plan(sitemaps: DataFrame, pages: DataFrame,
               robots: DataFrame,
               default_delay_s: int = 1) -> DataFrame:
    """The next crawl cycle, composed end-to-end: sitemap frontier
    (never-seen + stale urls) → robots longest-match gate → per-domain
    politeness schedule. Returns (url, domain, reason, seq, delay_s,
    fetch_offset_s) — what to fetch, in what order, how fast.

    Every stage keeps its own scale shape: the frontier join and the
    schedule window move only skinny url rows, the rule/delay dims
    broadcast, and page payloads are never read (pruned at the
    scan)."""
    frontier = sitemap_frontier(sitemaps, pages)
    gated = robots_gate(frontier, robots)
    allowed = frontier.join(
        gated.where(F.col("allowed")).select("url"), "url")
    sched = politeness_schedule(
        allowed.withColumn("warc_ts", F.to_timestamp("lastmod")),
        robots, default_delay_s)
    return (sched.join(allowed.select("url", "reason"), "url")
            .select("url", "domain", "reason", "seq", "delay_s",
                    "fetch_offset_s"))
