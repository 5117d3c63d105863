"""Multimodal column plumbing (sources/multimodal.py): schema, Arrow batch
shape, determinism, frame sampling, and metadata-only column pruning."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.sources import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document text number {i} " * (i % 7 + 1)) for i in range(60)],
        "doc_id long, text string",
    )
    return multimodal.synth_media_from_documents(docs).cache()


def test_media_schema(media):
    got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in multimodal.MEDIA_SCHEMA.fields]
    assert got == want
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_meta_consistent_with_bytes(media):
    bad = media.filter(F.col("meta.n_bytes") != F.length("media")).count()
    assert bad == 0


def test_features_shape_and_determinism(media):
    f1 = multimodal.extract_features(media).collect()
    f2 = multimodal.extract_features(media.repartition(7)).collect()
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in f1)
    d1 = {r["media_id"]: r["features"] for r in f1}
    d2 = {r["media_id"]: r["features"] for r in f2}
    assert d1 == d2  # partitioning-invariant
    # histogram mass sums to ~1 (plus tiny seed offset)
    for feats in d1.values():
        assert 0.9 < sum(feats) < 1.2


def test_frame_sampling(media):
    frames = multimodal.sample_frames(media, frame_bytes=64, stride=2)
    rows = frames.collect()
    assert all(r["frame_no"] % 2 == 0 for r in rows)
    assert all(len(r["frame"]) <= 64 for r in rows)
    one = media.filter(F.col("media_id") == 59).collect()[0]
    n_total = (len(one["media"]) + 63) // 64
    n_kept = sum(1 for r in rows if r["media_id"] == 59)
    assert n_kept == (n_total + 1) // 2


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media("image", b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media("audio", b"RIFF")


def test_metadata_scan_prunes_media_column(media, tmp_path_factory):
    """A metadata-only query over the persisted media table must not read
    the (dominant) media byte column: ReadSchema excludes `media`."""
    path = str(tmp_path_factory.mktemp("media"))
    media.write.mode("overwrite").parquet(path)
    spark = media.sparkSession
    q = spark.read.parquet(path).select("media_id", "media_type", "meta.n_bytes")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "media_id" in plan
    explained = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "media:" not in explained.split("ReadSchema")[-1]
