"""Shared incremental-state plumbing for the streaming operators.

Three operators (greedy LSH dedup, cluster maintenance, and their
composition) keep cross-batch state as a hash-partitioned parquet table
plus an atomically-swapped JSON marker.  The protocol lives here ONCE —
each module's crash-safety argument depends on exactly this code, and
three drifting copies would silently pin different invariants
(round-5 code review).

* markers: ``write_marker`` goes through a tmp file + ``os.replace``
  (atomic on POSIX), so a marker is either absent or complete;
* existence: dynamic partition overwrite leaves no root ``_SUCCESS``,
  so a state table exists iff any ``<prefix>=`` partition dir does;
* bucket-count pinning: the partition count ``n`` is baked into every
  row's hash partition — reopening existing state under a different
  ``n`` silently corrupts it (pruned reads miss rows laid out under the
  old count; upserts write the same key into a second partition), so
  the count is persisted beside the state on first use and validated on
  every subsequent open.
"""
from __future__ import annotations

import json
import os


def read_marker(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def write_marker(path: str, **fields) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fields, f)
    os.replace(tmp, path)  # atomic swap


def have_partitioned_state(table_dir: str, prefix: str) -> bool:
    return os.path.isdir(table_dir) and any(
        p.startswith(prefix + "=") for p in os.listdir(table_dir)
    )


def ensure_bucket_count(state_dir: str, n: int, name: str = "buckets") -> None:
    """Pin ``n`` state buckets to ``state_dir`` on first use; refuse to
    open existing state under a different count."""
    meta_path = os.path.join(state_dir, "state_meta.json")
    meta = read_marker(meta_path)
    if name in meta:
        if meta[name] != n:
            raise ValueError(
                f"{state_dir}: state was created with {name}={meta[name]} "
                f"buckets but opened with {n}; the bucket count is baked "
                f"into the partition layout — reopen with "
                f"n_state_buckets={meta[name]} or start a fresh state_dir"
            )
        return
    os.makedirs(state_dir, exist_ok=True)
    meta[name] = n
    write_marker(meta_path, **meta)
