"""Multimodal plumbing tests: binary columns through Arrow-batched decode.

The decoders are deterministic stubs (no codec libs in this container);
what's under test is the distributed contract — schema, null handling,
fan-out shape, and determinism across runs.
"""

import pytest
from pyspark.sql import functions as F

from merchant_classification_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_meta,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNG fake bytes 0", "s3://bucket/0.png"),
        (1, "image", b"\x89PNG other bytes 1", "s3://bucket/1.png"),
        (2, "image", None, "s3://bucket/missing.png"),
        (3, "video", b"\xff\xd8 fake video 3", "s3://bucket/3.mp4"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_decode_schema_and_nulls(media):
    out = decode_image_meta(media)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[2].decode_ok is False and rows[2].width is None
    for mid in (0, 1, 3):
        r = rows[mid]
        assert r.decode_ok and r.width >= 64 and r.height >= 64
        assert 1 <= r.channels <= 4
        assert len(r.sha256) == 64


def test_decode_deterministic(media):
    a = sorted(map(tuple, decode_image_meta(media).collect()))
    b = sorted(map(tuple, decode_image_meta(media).collect()))
    assert a == b


def test_frame_sampling_fanout(media):
    frames = sample_frames(media.where(F.col("kind") == "video"), max_frames=8)
    rows = frames.collect()
    assert 1 <= len(rows) <= 8
    assert all(r.media_id == 3 for r in rows)
    assert [r.frame_idx for r in rows] == list(range(len(rows)))
    assert len({r.frame_sha256 for r in rows}) == len(rows)


def test_resize_contract(media):
    from merchant_classification_spark.operators.multimodal import resize_images

    out = resize_images(media, width=8, height=8)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    # null content propagates as not-ok, never a task failure
    assert rows[2].resize_ok is False and rows[2].content is None
    ok = rows[0]
    assert ok.resize_ok and ok.width == 8 and ok.height == 8
    assert len(ok.content) <= 8 * 8 * 3
    # deterministic across runs
    again = {r.media_id: r for r in resize_images(media, 8, 8).collect()}
    assert again[0].content == ok.content


def test_audio_features_fanout(media):
    from merchant_classification_spark.operators.multimodal import (
        extract_audio_features,
    )

    out = extract_audio_features(media, n_features=16, max_windows=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    # null-content row dropped entirely
    assert 2 not in by_id
    for mid, rows in by_id.items():
        assert 1 <= len(rows) <= 4
        assert sorted(r.window_idx for r in rows) == list(range(len(rows)))
        for r in rows:
            assert len(r.features) == 16
            assert all(0.0 <= v < 1.0 for v in r.features)


def test_decode_arrow_twin_bit_identical(media):
    from merchant_classification_spark.operators.multimodal import (
        decode_image_meta_arrow,
    )

    a = sorted(tuple(r) for r in decode_image_meta(media).collect())
    b = sorted(tuple(r) for r in decode_image_meta_arrow(media).collect())
    assert a == b and len(a) == 4
