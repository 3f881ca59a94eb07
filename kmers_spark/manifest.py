"""Lineage manifest + checkpoint state for encode jobs.

Plays the role Iceberg metadata would (SURVEY.md §7 Plan B — no Iceberg
runtime jar in this sandbox): snapshot id, schema, per-bucket commit
markers, per-(bucket, column) codec choices and size stats, and the
seeds that make encoding reproducible (the reference records its code
assignment as an enum discriminant — naive.rs:49-74; we record ours
here). Updated atomically via write-tmp-then-rename.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any

MANIFEST_NAME = "manifest.json"


def _path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def load(out_dir: str) -> dict[str, Any] | None:
    p = _path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def init(out_dir: str, *, snapshot_id: str, schema: dict[str, str], num_buckets: int,
         key: str, seed: int = 42) -> dict[str, Any]:
    m = load(out_dir)
    if m is not None:
        if m["num_buckets"] != num_buckets or m["schema"] != schema:
            raise ValueError("existing manifest is incompatible with this job config")
        return m
    m = {
        "format_version": 1,
        "snapshot_id": snapshot_id,
        "schema": schema,          # {column: logical type}
        "key": key,                # ordering/bucketing key column
        "num_buckets": num_buckets,
        "seed": seed,
        "committed_buckets": [],   # checkpoint markers
        "blocks": {},              # str(bucket) -> [{column, codec, n_rows, raw, enc}]
        "wave_dirs": [],           # committed data dirs (manifest-list)
        "hot_keys": {},            # skew salting decisions {host: n_salts}
        "created_unix": int(time.time()),
    }
    save(out_dir, m)
    return m


def save(out_dir: str, m: dict[str, Any]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(out_dir))


@contextmanager
def commit_lock(out_dir: str):
    """Exclusive lock over manifest read-merge-save sections: concurrent
    committers (a resumed encode and a compaction, or two encodes on
    disjoint bucket sets) serialize instead of clobbering each other's
    wave registrations. flock covers local/NFS filesystems — on an
    object store replace with a conditional-put (Iceberg's commit CAS)."""
    import fcntl

    os.makedirs(out_dir, exist_ok=True)
    f = open(os.path.join(out_dir, ".manifest.lock"), "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(f, fcntl.LOCK_UN)
        f.close()


def commit_buckets(out_dir: str, bucket_stats: dict[int, list[dict]],
                   wave_dir: str | None = None) -> dict[str, Any]:
    """Record per-bucket block stats, mark the buckets committed, and
    (Iceberg manifest-list style) register the wave's data directory —
    readers only ever see directories this list names, so a job killed
    AFTER writing a wave but BEFORE this commit leaves an orphan dir
    that is never read and is swept on the next resume. The whole
    read-merge-save runs under the commit lock."""
    with commit_lock(out_dir):
        m = load(out_dir)
        if m is None:
            raise FileNotFoundError(f"no manifest in {out_dir}")
        done = set(m["committed_buckets"])
        # Iceberg-style commit validation: a bucket may be committed once.
        # A stale concurrent encode (planned its pending set before this
        # commit landed) fails HERE, before registering its wave — its
        # already-written dir stays an unregistered orphan and is swept.
        clash = sorted(b for b in bucket_stats if int(b) in done)
        if clash:
            raise ValueError(
                f"commit conflict: buckets {clash} are already committed "
                "(concurrent encode on the same snapshot?); this wave was "
                "not registered and will be swept"
            )
        for b, blocks in bucket_stats.items():
            m["blocks"][str(b)] = blocks
            done.add(int(b))
        m["committed_buckets"] = sorted(done)
        if wave_dir is not None:
            m.setdefault("wave_dirs", []).append(wave_dir)
            # wave -> buckets map: lets readers prune whole wave dirs for
            # bucket-filtered scans (file-level pruning above the parquet
            # row-group stats)
            m.setdefault("wave_buckets", {})[wave_dir] = sorted(
                int(b) for b in bucket_stats
            )
        save(out_dir, m)
    return m


def pending_buckets(out_dir: str) -> list[int]:
    m = load(out_dir)
    if m is None:
        return []
    done = set(m["committed_buckets"])
    return [b for b in range(m["num_buckets"]) if b not in done]
