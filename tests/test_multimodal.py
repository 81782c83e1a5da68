"""Multimodal plumbing: schema, Arrow batch shape, byte-capped rechunking,
frame sampling, and payload pruning for metadata-only queries."""

from invoice_extraction_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample,
    media_stats,
    synth_media,
)
from invoice_extraction_spark.plans.explain import read_schema


def test_synth_media_deterministic_schema(spark):
    df = synth_media(spark, 48)
    assert df.count() == 48
    rows = {r["media_id"]: r for r in df.collect()}
    again = {r["media_id"]: r for r in synth_media(spark, 48).collect()}
    assert rows[7]["payload"] == again[7]["payload"]
    assert rows[0]["media_type"] == "image" and rows[1]["media_type"] == "audio"
    assert rows[1]["meta"]["width"] is None  # audio has no dims
    assert rows[0]["meta"]["codec"] == "png"


def test_extract_features_shape_and_determinism(spark):
    feats = extract_features(synth_media(spark, 48)).collect()
    assert len(feats) == 48
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_bytes"] > 0 and len(r["sha1"]) == 40
        assert 16 <= r["decoded_w"] < 80
    # deterministic across runs
    again = extract_features(synth_media(spark, 48)).collect()
    assert {r["media_id"]: r["sha1"] for r in feats} == {
        r["media_id"]: r["sha1"] for r in again
    }


def test_byte_capped_rechunking_small_cap(spark):
    # cap smaller than any single batch -> kernel must still emit every row once
    feats = extract_features(synth_media(spark, 48), max_batch_bytes=1024).collect()
    assert sorted(r["media_id"] for r in feats) == list(range(48))


def test_frame_sample_only_videos(spark):
    media = synth_media(spark, 48)
    frames = frame_sample(media, n_frames=4).collect()
    video_ids = {r["media_id"] for r in media.filter("media_type = 'video'").collect()}
    assert {r["media_id"] for r in frames} == video_ids
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r)
    for rows in per.values():
        assert sorted(x["frame_idx"] for x in rows) == [0, 1, 2, 3]
        assert all(len(x["frame"]) > 0 for x in rows)


def test_media_stats_prunes_payload(spark, tmp_path):
    # write to parquet so ReadSchema reflects actual scan pruning
    p = str(tmp_path / "media")
    synth_media(spark, 48).write.parquet(p)
    q = media_stats(spark.read.parquet(p))
    rs = read_schema(q)
    assert "payload" not in rs, rs
    got = {(r["media_type"], r["codec"]): r["n"] for r in q.collect()}
    assert got[("image", "png")] == 16
    assert got[("audio", "opus")] == 16
    assert got[("video", "av1")] == 16
