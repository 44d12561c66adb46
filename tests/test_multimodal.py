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
