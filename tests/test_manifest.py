"""Atomic publish/rollback manifest (operators/manifest.py): the pointer
flip that lets serving keep answering from the old index while a rebuild
or tombstone compaction writes the new one."""

import json
import os

import pytest

from searchengine_spark.operators import manifest, merge, shards
from searchengine_spark.plans.wand import WandSearchEngine
from searchengine_spark.sources import webgen


def test_publish_read_rollback_cycle(spark, tmp_path):
    base = str(tmp_path / "serving")
    pages = webgen.generate_spark(spark, n_docs=200, partitions=2)
    v1_path = str(tmp_path / "v1")
    shards.build_and_write_sharded(spark, pages, v1_path, n_shards=2)

    doc = manifest.publish(base, v1_path, label="initial")
    assert doc["current"] == v1_path
    idx = manifest.read_current(spark, base)
    queries = webgen.reference_queries()
    r1 = WandSearchEngine(spark, idx).search_batch(queries, top_k=5).collect()
    assert r1

    # compaction publishes v2; v1 stays readable until the flip
    tomb = idx.docs.select("doc_id").limit(10)
    v2_path = str(tmp_path / "v2")
    compacted = merge.apply_tombstones(spark, idx, tomb)
    shards.write_sharded_index(compacted, v2_path)
    doc = manifest.publish(base, v2_path, label="post-compaction")
    assert doc["current"] == v2_path
    idx2 = manifest.read_current(spark, base)
    assert idx2.n_docs == idx.n_docs - 10

    # rollback restores v1 and appends to history (auditable)
    doc = manifest.rollback(base)
    assert doc["current"] == v1_path
    assert len(doc["versions"]) == 3
    assert manifest.read_current(spark, base).n_docs == idx.n_docs


def test_publish_refuses_non_index(tmp_path):
    with pytest.raises(FileNotFoundError):
        manifest.publish(str(tmp_path / "base"), str(tmp_path / "nope"))


def test_crashed_publish_leaves_manifest_intact(spark, tmp_path):
    base = str(tmp_path / "serving")
    pages = webgen.generate_spark(spark, n_docs=60, partitions=1)
    v1 = str(tmp_path / "v1")
    shards.build_and_write_sharded(spark, pages, v1, n_shards=1)
    manifest.publish(base, v1)
    # simulate a crash mid-publish: orphaned temp file must not shadow
    with open(os.path.join(base, f".{manifest.MANIFEST}.tmp.99999"), "w") as f:
        f.write("{corrupt")
    assert manifest.current_path(base) == v1
    with open(os.path.join(base, manifest.MANIFEST)) as f:
        json.load(f)  # still valid JSON
