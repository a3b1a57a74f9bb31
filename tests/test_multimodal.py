"""Multimodal plumbing tests: schema contracts, batch shapes, stub gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import multimodal as M
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog


@pytest.fixture()
def media(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents.limit(50)
    return M.attach_media(docs)


def test_attach_media_schema(media):
    assert [f.name for f in media.schema.fields] == \
        ["media_id", "kind", "payload", "mime", "n_bytes"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"abc")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"abc")


def test_extract_features_deterministic(media):
    out = M.extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    again = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert rows.keys() == again.keys()
    for k in rows:
        assert rows[k]["feat"] == again[k]["feat"]
        assert len(rows[k]["feat"]) == 4
        assert rows[k]["feat"][0] == float(rows[k]["n_bytes"])


def test_resize_images_contract(media):
    out = M.resize_images(media, width=8, height=8)
    rows = out.collect()
    assert all(r["n_bytes"] == 64 for r in rows)
    assert all(len(r["payload"]) == 64 for r in rows)
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)


def test_sample_frames_expands_rows(media):
    out = M.sample_frames(media, every_n_bytes=32, max_frames=4)
    rows = out.collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(rows) > n_videos  # 1 -> N expansion
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    for mid, frames in per.items():
        assert sorted(f["frame_idx"] for f in frames) == list(range(len(frames)))
        assert all(len(f["frame"]) <= 32 for f in frames)
