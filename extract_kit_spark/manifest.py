"""Checkpoint manifests + per-partition lineage (Iceberg-style, hand-rolled).

No Iceberg runtime jar is available in this sandbox (SURVEY.md §7.1), so
the required commit-log semantics — exact resume, per-partition lineage,
atomic commits — are implemented as an Iceberg-style table layout:
partitioned parquet + a JSON commit log, with every commit written
temp-file-then-rename (atomic on POSIX). The API is narrow enough that a
real Iceberg catalog can be dropped in behind it unchanged.

Layout under <output_dir>/:
    data/bucket=<b>/part-*.parquet     extraction results
    lineage/group-<g>.parquet          one row per committed bucket
    _manifest.json                     commit log: job_id, committed buckets
"""

from __future__ import annotations

import json
import os
import tempfile
import time


class Manifest:
    def __init__(self, output_dir: str, job_id: str):
        self.output_dir = output_dir
        self.job_id = job_id
        self.path = os.path.join(output_dir, "_manifest.json")

    # -- read ----------------------------------------------------------------
    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {"job_id": self.job_id, "n_buckets": None,
                    "committed": {}}
        with open(self.path) as f:
            state = json.load(f)
        return state

    def committed_buckets(self) -> set[int]:
        state = self.load()
        if state.get("job_id") != self.job_id:
            return set()
        return {int(b) for b in state["committed"]}

    # -- write (atomic: temp + rename; idempotent per bucket) -----------------
    def commit(self, buckets: dict[int, dict], n_buckets: int) -> None:
        """Record buckets as done. bucket → {n_rows, n_ok, n_failed,
        bytes_in, checksum}. Re-committing a bucket overwrites its entry
        (idempotent for resume-after-partial-write)."""
        state = self.load()
        if state.get("job_id") != self.job_id:
            state = {"job_id": self.job_id, "n_buckets": n_buckets,
                     "committed": {}}
        state["n_buckets"] = n_buckets
        for b, info in buckets.items():
            state["committed"][str(b)] = {**info,
                                          "committed_at": time.time()}
        os.makedirs(self.output_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.output_dir,
                                   prefix="_manifest.", suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)  # atomic commit
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def is_complete(self) -> bool:
        state = self.load()
        n = state.get("n_buckets")
        return (state.get("job_id") == self.job_id and n is not None
                and len(state["committed"]) >= n)
