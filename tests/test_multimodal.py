"""Multimodal plumbing tests: binary media columns through Arrow-batched
mapInPandas — schema, null handling, deterministic fake featurization,
byte-budget partitioning, frame-sampling plan."""

import pytest
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG fake image bytes aaaa", "image/png", (640, 480, None)),
        (2, b"RIFF fake wav payload", "audio/wav", (None, None, 4500)),
        (3, b"\x00\x00ftyp fake mp4 video", "video/mp4", (1920, 1080, 10500)),
        (4, None, "image/png", (None, None, None)),
        (5, b"", "image/png", (1, 1, None)),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_features_fake(spark, media):
    out = M.extract_features(media).orderBy("media_id").collect()
    assert [r.media_id for r in out] == [1, 2, 3, 4, 5]
    assert out[0].n_bytes == 26 and len(out[0].features) == M.FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in out[0].features)
    # null media → null features, zero bytes
    assert out[3].features is None and out[3].n_bytes == 0
    # deterministic: same bytes → same features on a re-run
    again = M.extract_features(media).orderBy("media_id").collect()
    assert [r.features for r in again] == [r.features for r in out]


def test_strict_decoder_raises(spark, media):
    with pytest.raises(Exception) as exc_info:
        M.extract_features(media, decoder=M.strict_decoder).collect()
    assert "NotImplementedError" in str(exc_info.value) or "media decoding" in str(
        exc_info.value
    )


def test_image_resize_stub(spark, media):
    out = (
        M.image_resize(media.filter(F.col("media").isNotNull()), 64, 64)
        .orderBy("media_id")
        .collect()
    )
    assert all(len(r.media) == 16 for r in out)  # md5 digest stub
    # different target size → different payload (size participates)
    out2 = (
        M.image_resize(media.filter(F.col("media").isNotNull()), 32, 32)
        .orderBy("media_id")
        .collect()
    )
    assert all(a.media != b.media for a, b in zip(out, out2))


def test_repartition_for_media(spark):
    big = spark.range(100).select(
        F.col("id").alias("media_id"),
        F.lit(b"x" * 1024).alias("media"),
        F.lit("image/png").alias("mime"),
    )
    df = M.repartition_for_media(big, F.length("media"), target_bytes=16 * 1024)
    assert df.rdd.getNumPartitions() >= 7  # 100 KiB / 16 KiB
    assert df.count() == 100


def test_frame_sample_plan(spark, media):
    frames = M.frame_sample_plan(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_ts_ms)
    # ceil(duration/every) frames, every instant strictly below the
    # duration: 10.5 s video → 11 frames at 0..10000 (10000 < 10500 is
    # a valid decodable instant — the old floor form dropped it);
    # 4.5 s audio → 5 frames at 0..4000
    assert by_id[3] == [i * 1000 for i in range(11)]
    assert by_id[2] == [i * 1000 for i in range(5)]
    assert 1 not in by_id  # no duration → not sampled
