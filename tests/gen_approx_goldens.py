#!/usr/bin/env python
"""Regenerate committed goldens for the DETERMINISTIC-approximate
queries (minhash-LSH, simhash, LSH/IVF ANN, HLL reach).

"Approximate" here means approximate *with respect to the exact
answer* (recall/error-bound tested in tests/test_ops.py) — but every
one of these operators is a deterministic function of its input:
fixed-seed hash families (crc32 + multiply-shift, fixed-seed Gaussian
hyperplanes), deterministic IVF training samples (every step-th id),
6-dp rounding with explicit nid tie-breaks, and HLL++ register merges
that are commutative/associative (partitioning-independent). So their
results can be pinned as committed golden registries the same way
tests/golden/flagship_1200.json pins the flagship, turning the
driver's grey "no_oracle" rows into hard rows/schema/hash signals
(the semantics — recall vs exact — stay covered by the ops tests).

Each golden row is tagged with ``corpus_n`` = the row count of the
EVENTS table of its sf dir, because the same oracle SQL string must
serve any sf dir (tests run sf0.001, the driver gate runs sf0.01) and
events is the one table whose cardinality differs between them
(documents/embeddings are both 500 rows at sf0.001 AND sf0.01): the
oracle filters ``WHERE corpus_n = (SELECT count(*) FROM events)``.

Run after ANY change to the ops' hashing/seeds/constants:
    python tests/gen_approx_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERY_NAMES = ("dedup_minhash_lsh", "dedup_simhash", "ann_lsh_topk",
               "ann_ivf_topk", "evt_user_reach_approx",
               # GK quantile twin: stable across executor counts for a
               # fixed file set (determinism contract documented on
               # the query; probed local[2] vs local[32] both sf dirs)
               "evt_value_quantiles_approx",
               # mm_decode is exact-deterministic but non-SQL-
               # expressible (zlib inflate + PNG unfilter), so it uses
               # the same registry mechanism; codec correctness is
               # pinned independently in tests/test_kernels.py
               # mm_thumbnail: same mechanism (decode→resize→features
               # is deterministic but not SQL; resize math pinned in
               # test_ops)
               "mm_decode", "mm_thumbnail",
               # mm_audio (r5): same registry mechanism — WAV
               # parse is deterministic but not SQL; codec pinned
               # against the stdlib wave module in test_kernels
               "mm_audio", "mm_video", "mm_audio_features")

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def main() -> None:
    from extract_kit_spark.session import get_spark
    from extract_kit_spark.queries import QUERIES

    spark = get_spark(master="local[32]", app_name="gen-approx-goldens")
    out_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name in QUERY_NAMES:
        rows_all: list[dict] = []
        schema = None
        for sf in SF_DIRS:
            n = spark.read.parquet(
                os.path.join(sf, "events.parquet")).count()
            df = QUERIES[name](spark, sf)
            schema = df.schema.simpleString()
            cols = df.columns
            for r in df.collect():
                d = {c: r[c] for c in cols}
                d["corpus_n"] = n
                rows_all.append(d)
        path = os.path.join(out_dir, f"{name}_golden.json")
        with open(path, "w") as fh:
            json.dump(rows_all, fh, indent=0)
            fh.write("\n")
        print(f"{name}: {len(rows_all)} rows "
              f"-> {os.path.basename(path)}  {schema}")
    spark.stop()


if __name__ == "__main__":
    main()
