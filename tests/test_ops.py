"""Property tests for the approximate (non-oracle-able) operators:
MinHash-LSH recall vs exact Jaccard, hyperplane-LSH ANN recall vs exact
top-k, SimHash behavior on near-identical docs."""

import pytest

from pyspark.sql import functions as F

from extract_kit_spark.ops import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_minhash_lsh_recall_and_precision(spark, docs):
    t = 0.82
    exact = {(r["id_a"], r["id_b"])
             for r in dedup.jaccard_pairs(docs, threshold=t).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in dedup.minhash_lsh_pairs(docs, threshold=t).collect()}
    # precision is 1.0 by construction (candidates are exact-verified)
    assert lsh <= exact
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.8, f"minhash recall {recall:.2f}"


def test_minhash_identical_docs_always_pair(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words here nothing shared at all")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"])
            for r in pairs] == [(1, 2, 1.0)]


def test_jaccard_max_df_uses_post_cut_sizes(spark):
    """The r4 stress-run regression, minimized: with ``max_df`` on,
    jaccard must be measured over the POST-cut shingle space on both
    axes. Under the old mixed definition (post-cut intersection /
    pre-cut sizes) the two identical docs below — which share a
    corpus-hot trigram — scored 3/(4+4-3) = 0.6 and the pair vanished;
    two
    byte-identical documents must always score J = 1.0."""
    common = "alpha beta gamma"          # hot: appears in every doc
    twin = f"{common} delta epsilon zeta"  # 4 trigrams, 1 of them hot
    rows = [(0, twin), (1, twin)]
    rows += [(i, f"{common} unique{i}a unique{i}b unique{i}c")
             for i in range(2, 12)]      # drive 'alpha beta gamma' df=12
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.jaccard_pairs(df, threshold=0.8, n=3,
                                        max_df=11).collect()}
    assert got == {(0, 1): 1.0}, got


def test_simhash_near_identical(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight")
    rows = [(1, base), (2, base), (3, base + " extra"),
            (4, "completely unrelated vocabulary cluster zone")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_pairs(df, max_hamming=6).collect()}
    assert pairs.get((1, 2)) == 0          # identical → distance 0
    assert (1, 3) in pairs or (2, 3) in pairs  # one extra token: close
    assert (1, 4) not in pairs


def test_ann_lsh_recall(spark, emb):
    ex = {(r["query_id"], r["neighbor_id"])
          for r in similarity.cosine_topk(
              emb, emb.where(F.col("vec_id") < 20), k=5).collect()}
    ap = {(r["query_id"], r["neighbor_id"])
          for r in similarity.ann_lsh_topk(
              emb, emb.where(F.col("vec_id") < 20), k=5).collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.75, f"ann lsh recall {recall:.2f}"


def test_ann_ivf_recall_and_determinism(spark, emb):
    q = emb.where(F.col("vec_id") < 20)
    ex = {(r["query_id"], r["neighbor_id"])
          for r in similarity.cosine_topk(emb, q, k=5).collect()}
    got1 = similarity.ann_ivf_topk(emb, q, k=5, n_centroids=32,
                                   nprobe=12).collect()
    ap = {(r["query_id"], r["neighbor_id"]) for r in got1}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.7, f"ann ivf recall {recall:.2f}"
    # fixed seed + deterministic sample → identical rerun
    got2 = similarity.ann_ivf_topk(emb, q, k=5, n_centroids=32,
                                   nprobe=12).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(got1, key=key) == sorted(got2, key=key)


def test_shingle_sets_match_plan_side_shingles(spark, docs):
    """The pandas shingle stage must produce exactly the shingle SETS
    of the plan-side shingles() expression (the executable spec the
    oracle SQL mirrors)."""
    from pyspark.sql import functions as F
    sample = docs.limit(50)
    plan = {r["doc_id"]: set(r["sh"]) for r in sample.select(
        "doc_id", dedup.shingles(F.col("text"), 3).alias("sh")).collect()}
    pandas_sets = {r["id"]: set(r["sh"]) for r in dedup._shingle_sets(
        sample, 3, "doc_id", "text").collect()}
    assert plan == pandas_sets


def test_corpus_split_deterministic_and_disjoint(spark, docs):
    from extract_kit_spark.ops import corpus
    a = corpus.deterministic_split(docs).select(
        "doc_id", "bucket", "split").collect()
    b = corpus.deterministic_split(docs.repartition(7)).select(
        "doc_id", "bucket", "split").collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    # partitioning-independent, rerun-stable assignment
    assert sorted(a, key=key) == sorted(b, key=key)
    frac = {}
    for r in a:
        frac[r["split"]] = frac.get(r["split"], 0) + 1
    n = len(a)
    assert 0.75 <= frac["train"] / n <= 0.85
    assert 0.05 <= frac["val"] / n <= 0.15
    assert 0.05 <= frac["test"] / n <= 0.15


def test_corpus_curate_filters_and_dedups(spark):
    from extract_kit_spark.ops import corpus
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "THE  quick brown fox jumps over the lazy dog " * 8),
        (3, "!!! ,,, ... ;;; :::"),  # punctuation soup → low quality
        (4, "le chat est sur la table et la porte est ouverte " * 8),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = corpus.curate(df, min_quality=0.5, langs=("en",)).collect()
    ids = sorted(r["doc_id"] for r in got)
    # 2 dedups onto 1 (same normalized text), 3 fails quality,
    # 4 is french
    assert ids == [1]
    assert got[0]["split"] in ("train", "val", "test")


def test_evt_user_reach_approx_error_bound(spark):
    from extract_kit_spark.queries import q_evt_user_reach_approx
    rows = q_evt_user_reach_approx(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_users"] - r["exact_users"]) \
            / max(1, r["exact_users"])
        assert err <= 0.05, (r["event_type"], err)


def test_dedup_exact_keeps_one_per_group(spark):
    rows = [(1, "same text"), (2, "same  TEXT "), (3, "other")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(r["doc_id"]
                  for r in dedup.dedup_exact(df).collect())
    assert kept == [1, 3]  # normalized equality collapses 1 and 2


def test_embedding_pairs_symmetric_free(spark, emb):
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.45)
    bad = pairs.where(F.col("id_a") >= F.col("id_b")).count()
    assert bad == 0


def test_multimodal_stub_matches_sql_path(spark, docs):
    """The Python decode stub and the pure-SQL metadata stage must
    produce identical rows — the contract that lets the expensive
    decode stage be gated behind SQL-side filtering."""
    from extract_kit_spark.ops import multimodal
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    via_sql = multimodal.media_metadata_sql(payloads, "doc_id",
                                            "payload")
    via_py = multimodal.decode_images(payloads, "doc_id", "payload")
    assert via_sql.subtract(via_py).count() == 0
    assert via_py.subtract(via_sql).count() == 0


def test_frame_plan_offsets(spark, docs):
    from extract_kit_spark.ops import multimodal
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    plan = multimodal.frame_sample_plan(payloads, "doc_id", "payload",
                                        frame_stride=64)
    row = plan.where(F.col("n_bytes") > 128).first()
    offs = row["frame_offsets"]
    assert offs[0] == 0 and all(b - a == 64
                                for a, b in zip(offs, offs[1:]))
    assert row["n_frames"] == len(offs)


def test_fingerprint_whitespace_edged(spark):
    """ADVICE r1 regression: trim strips only ASCII spaces, so the CSE'd
    fingerprint in with_text_stats must collapse-then-trim (like
    normalized()/the DuckDB oracle), or docs edged with \\t/\\n hash
    differently from their space-trimmed twins."""
    import duckdb
    from extract_kit_spark.ops.textstats import (with_text_stats,
                                                 fingerprint)
    rows = [(1, "hello  world\n"), (2, "hello world"),
            (3, "\thello world "), (4, "hello world\r\n")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["fingerprint"]
           for r in with_text_stats(df).select("doc_id", "fingerprint")
           .collect()}
    # all four normalize to "hello world" → one fingerprint
    assert len(set(got.values())) == 1
    # matches the standalone fingerprint() column
    ref = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert got == ref
    # and matches the DuckDB oracle spelling bit-for-bit
    oracle = duckdb.sql(
        "SELECT md5(lower(trim(regexp_replace('hello  world' || chr(10),"
        " '\\s+', ' ', 'g'))))").fetchone()[0]
    assert got[1] == oracle


def test_evt_value_quantiles_approx_error_bound(spark):
    """The mergeable-sketch quantile twin honors GK's guarantee: the
    returned value's EMPIRICAL RANK is within ε·n (+1 for ties/edges)
    of the requested percentile. (A relative-VALUE bound would be
    wrong: approx_percentile returns actual data values, so on small
    groups the gap between adjacent order statistics dominates.)"""
    import bisect
    from extract_kit_spark.queries import q_evt_value_quantiles_approx
    approx = {r["event_type"]: r
              for r in q_evt_value_quantiles_approx(spark,
                                                    SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(approx) == set(by_type) and approx
    eps = 1.0 / 10000  # the query's accuracy parameter
    for etype, vals in by_type.items():
        vals.sort()
        n = len(vals)
        a = approx[etype]
        assert a["n"] == n
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            lo = bisect.bisect_left(vals, a[col])
            hi = bisect.bisect_right(vals, a[col])
            target = q * n
            slack = eps * n + 1.0
            assert lo - slack <= target <= hi + slack, \
                (etype, col, lo, hi, target, n)


def test_duplicate_clusters_chain_and_islands(spark):
    """Connected components: a 4-chain collapses to one cluster via
    transitivity; islands keep their own ids; a disjoint pair stays
    separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain → cluster 1
         (10, 11),                    # pair → cluster 10
         (20, 21), (21, 22)],         # chain → cluster 20
        ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_duplicate_clusters_long_chain_converges(spark):
    """A 200-node path graph (the adversarial case for pure
    neighbor-min propagation, which needs O(diameter)=200 rounds)
    must fully converge within the default max_iters thanks to
    pointer jumping (O(log diameter))."""
    import math
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"])
    stats: dict = {}
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.duplicate_clusters(
               pairs, small_graph_edges=0, stats_out=stats).collect()}
    assert len(got) == n + 1
    assert set(got.values()) == {0}
    # the pointer-jumping complexity claim, pinned as a number: the
    # label depth roughly halves per round, so a diameter-n path must
    # converge in ≤ log2(n)+2 rounds (the same bound stress_scale.py
    # asserts on a 10k-node chain at the 2M-edge graph size)
    assert stats["path"] == "distributed"
    assert stats["rounds"] <= math.log2(n) + 2, stats


def test_duplicate_clusters_local_and_distributed_agree(spark):
    """The bounded driver-side union-find finish and the distributed
    pointer-jumping loop are the SAME function: a messy random graph
    (chains, triangles, islands, duplicate + reversed edges) must get
    identical labels from both paths."""
    import random as _r
    rng = _r.Random("cc:paths")
    edges = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    edges += [(b, a) for a, b in edges[:50]] + edges[:30]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    local = {(r["doc_id"], r["cluster_id"])
             for r in dedup.duplicate_clusters(pairs).collect()}
    dist = {(r["doc_id"], r["cluster_id"])
            for r in dedup.duplicate_clusters(
                pairs, small_graph_edges=0).collect()}
    assert local == dist and local


def test_approx_goldens_parallelism_independent(spark, docs, emb):
    """The committed approx-query goldens (tests/gen_approx_goldens.py)
    claim these ops are deterministic FUNCTIONS of their input —
    independent of partitioning. Pin that: rerun two of them with a
    deliberately different layout (prime repartition) and require the
    registry rows bit-for-bit (jaccard/cosine compare as exact doubles
    because round(x, 6) → json repr → parse roundtrips exactly)."""
    import json
    import os
    gdir = os.path.join(os.path.dirname(__file__), "golden")

    def slice_for_sf001(name):
        rows = json.load(open(os.path.join(gdir, f"{name}_golden.json")))
        return [r for r in rows if r["corpus_n"] == 1000]  # events@sf0.001

    want = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in slice_for_sf001("dedup_minhash_lsh")}
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in dedup.minhash_lsh_pairs(
               docs.repartition(7), threshold=0.82).collect()}
    assert got == want

    want = {(r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
            for r in slice_for_sf001("ann_ivf_topk")}
    queries = emb.where(F.col("vec_id") < 20)
    got = {(r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
           for r in similarity.ann_ivf_topk(
               emb.repartition(13), queries, k=5,
               n_centroids=32, nprobe=12).collect()}
    assert got == want


def test_duplicate_clusters_empty_pair_graph(spark):
    """A corpus with NO near-dup candidate pairs — a normal production
    case — must yield an empty typed result, not
    CANNOT_INFER_EMPTY_SCHEMA (ADVICE r3). Both CC paths."""
    from extract_kit_spark.ops.dedup import duplicate_clusters
    empty = spark.createDataFrame([], "id_a long, id_b long")
    for small in (1_000_000, 0):  # driver finish / distributed loop
        out = duplicate_clusters(empty, small_graph_edges=small)
        assert out.count() == 0
        assert [f.simpleString() for f in out.schema.fields] == \
            ["doc_id:bigint", "cluster_id:bigint"]


def test_decode_image_pixels_real_and_typed_failures(spark):
    """The un-stubbed decode stage: real PNGs come back with true dims
    + pixel sha256; JPEG magic -> 'unsupported'; structural damage ->
    'corrupt: ...' — one typed row per input, never a task failure."""
    import hashlib
    from extract_kit_spark.kernels import png
    from extract_kit_spark.ops import multimodal
    pixels = bytes((i * 7 + 3) % 256 for i in range(6 * 4 * 3))
    good = png.encode_png(6, 4, pixels, 2, filter_type=3)
    rows = [(1, good), (2, b"\xff\xd8\xff\xe0jpegish"),
            (3, good[:-9]), (4, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           multimodal.decode_image_pixels(df).collect()}
    assert len(out) == 4
    ok = out[1]
    assert (ok["width"], ok["height"], ok["channels"]) == (6, 4, 3)
    assert ok["pixel_sha256"] == hashlib.sha256(pixels).hexdigest()
    assert ok["decode_status"] == "ok"
    assert out[2]["decode_status"] == "unsupported"
    assert out[3]["decode_status"].startswith("corrupt")
    assert out[4]["decode_status"] == "unsupported"


def test_mm_decode_query_deterministic(spark):
    """mm_decode over the documents table: fully deterministic (golden
    registry depends on it), covers ok/corrupt/unsupported statuses,
    and decodes one row per document."""
    from extract_kit_spark.queries import QUERIES
    a = {r["media_id"]: r for r in
         QUERIES["mm_decode"](spark, "/root/testdata/sf0.001").collect()}
    b = {r["media_id"]: r for r in
         QUERIES["mm_decode"](spark, "/root/testdata/sf0.001").collect()}
    assert a == b and len(a) == 500
    statuses = {r["decode_status"].split(":")[0] for r in a.values()}
    assert statuses == {"ok", "corrupt", "unsupported"}
    n_ok = sum(r["decode_status"] == "ok" for r in a.values())
    assert n_ok > 400


def test_zipf_corpus_statistics_and_langid(spark):
    """The r4 Zipf corpus carries the signal its queries claim:
    (a) deterministic rows; (b) an open vocabulary (thousands of
    distinct terms) with a power-law head — some terms exceed the
    production max_df 0.5 cut, most fall under it, so
    tfidf(max_df=0.5) is a real filter, not a no-op or a wipe-out;
    (c) language-ID over it is a genuine prediction: injected
    stopwords match the doc's lang column, so lang_pred must agree
    with lang on ≥95% of docs (the driver's 31-word table can't test
    this — its texts have no language signal)."""
    from extract_kit_spark.fixtures import gen_zipf_doc
    from extract_kit_spark.ops.textstats import with_text_stats
    from extract_kit_spark.queries import (ZIPF_DOCS_GLOB, N_ZIPF_DOCS,
                                           ensure_zipf_docs)
    assert gen_zipf_doc(123) == gen_zipf_doc(123)
    ensure_zipf_docs()
    docs = spark.read.parquet(ZIPF_DOCS_GLOB)
    assert docs.count() == N_ZIPF_DOCS
    df_counts = (docs
                 .select(F.col("doc_id"),
                         F.explode(F.array_distinct(
                             F.split(F.lower(F.trim("text")),
                                     r"\s+"))).alias("term"))
                 .groupBy("term").count())
    n_terms = df_counts.count()
    n_head = df_counts.where(F.col("count") > 0.5 * N_ZIPF_DOCS).count()
    assert n_terms > 2000, n_terms
    assert 5 <= n_head <= 60, n_head
    stats = with_text_stats(docs).select("lang", "lang_pred")
    agree = stats.where(F.col("lang") == F.col("lang_pred")).count()
    assert agree / N_ZIPF_DOCS >= 0.95, agree / N_ZIPF_DOCS
