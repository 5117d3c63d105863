"""Atomic index manifest — zero-downtime publish/rollback for serving.

A 10^12-doc index rebuild (or a tombstone compaction, operators/merge.py)
takes hours; the serving tier must keep answering from the previous
artifact until the new one is complete, then switch atomically. The
reference swaps a pickle path by hand; here the switch is a MANIFEST.json
updated via the write-temp-then-rename idiom (atomic on POSIX filesystems
and on object stores with atomic rename semantics), keeping a version
history for instant rollback.

The manifest never contains index data — only paths — so publish/rollback
are O(1) regardless of index size, and a crashed publish leaves the old
manifest untouched (the temp file is simply orphaned).
"""

from __future__ import annotations

import json
import os

MANIFEST = "MANIFEST.json"


def _read(base_dir: str) -> dict:
    p = os.path.join(base_dir, MANIFEST)
    if not os.path.exists(p):
        return {"current": None, "versions": []}
    with open(p) as f:
        return json.load(f)


def _write_atomic(base_dir: str, doc: dict) -> None:
    os.makedirs(base_dir, exist_ok=True)
    tmp = os.path.join(base_dir, f".{MANIFEST}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(base_dir, MANIFEST))


def publish(base_dir: str, index_path: str, label: str | None = None) -> dict:
    """Atomically point ``base_dir``'s manifest at ``index_path``.

    The index must already be fully written (``write_sharded_index`` /
    ``build_and_write_sharded``); this call only flips the pointer. Returns
    the new manifest."""
    if not os.path.exists(os.path.join(index_path, "meta.json")):
        raise FileNotFoundError(
            f"not a sharded index (no meta.json): {index_path}"
        )
    doc = _read(base_dir)
    version = len(doc["versions"]) + 1
    doc["versions"].append(
        {"version": version, "path": index_path, "label": label}
    )
    doc["current"] = index_path
    _write_atomic(base_dir, doc)
    return doc


def rollback(base_dir: str, version: int | None = None) -> dict:
    """Point the manifest back at a previous version (default: the one
    before current). The rolled-back-to entry is re-appended so history
    stays append-only and auditable."""
    doc = _read(base_dir)
    if not doc["versions"]:
        raise ValueError("empty manifest")
    if version is None:
        candidates = [v for v in doc["versions"] if v["path"] != doc["current"]]
        if not candidates:
            raise ValueError("no previous version to roll back to")
        target = candidates[-1]
    else:
        matches = [v for v in doc["versions"] if v["version"] == version]
        if not matches:
            raise ValueError(f"no version {version} in manifest")
        target = matches[0]
    doc["versions"].append(
        {
            "version": len(doc["versions"]) + 1,
            "path": target["path"],
            "label": f"rollback-to-v{target['version']}",
        }
    )
    doc["current"] = target["path"]
    _write_atomic(base_dir, doc)
    return doc


def current_path(base_dir: str) -> str | None:
    return _read(base_dir)["current"]


def read_current(spark, base_dir: str):
    """Open the currently-published index (shards.read_sharded_index)."""
    from searchengine_spark.operators.shards import read_sharded_index

    path = current_path(base_dir)
    if path is None:
        raise FileNotFoundError(f"nothing published under {base_dir}")
    return read_sharded_index(spark, path)
