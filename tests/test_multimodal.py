"""Multimodal plumbing: schemas, batch shapes, deterministic fake decode."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from tsfresh_spark.operators.multimodal import (
    attach_media_metadata,
    deterministic_fake_decoder,
    extract_media_features,
    real_decoder_stub,
    resize_image_batch,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img1", bytes(range(100))),
        ("img2", bytes([7] * 64)),
    ]
    df = spark.createDataFrame(rows, "doc_id string, payload binary")
    return attach_media_metadata(df, kind="image", width=8, height=8)


def test_stub_raises_cleanly(spark, media_df):
    with pytest.raises(Exception) as exc:
        extract_media_features(media_df).collect()
    assert "NotImplementedError" in str(exc.value) or "codecs" in str(exc.value)


def test_fake_decode_features(spark, media_df):
    out = extract_media_features(
        media_df, decoder=deterministic_fake_decoder
    ).toPandas()
    assert len(out) == 2
    assert (out.n_samples == 64).all()  # 8x8 image signal
    feats = dict(out[out.doc_id == "img2"].features.iloc[0])
    assert feats["image__mean"] == pytest.approx(7 / 255.0)
    assert feats["image__variance"] == pytest.approx(0.0, abs=1e-30)


def test_fake_decode_deterministic(spark, media_df):
    a = extract_media_features(media_df, decoder=deterministic_fake_decoder).toPandas()
    b = extract_media_features(media_df, decoder=deterministic_fake_decoder).toPandas()
    fa = sorted(map(lambda m: tuple(sorted(m.items())), a.features))
    fb = sorted(map(lambda m: tuple(sorted(m.items())), b.features))
    assert fa == fb


def test_resize(spark, media_df):
    out = resize_image_batch(
        media_df, target=(4, 4), decoder=deterministic_fake_decoder
    ).toPandas()
    assert all(len(p) == 16 for p in out.pixels)
    # constant image stays constant through resize
    px = out[out.doc_id == "img2"].pixels.iloc[0]
    assert all(v == pytest.approx(7 / 255.0) for v in px)


def test_video_frame_sampling(spark):
    df = spark.createDataFrame(
        [("vid1", bytes(range(32)))], "doc_id string, payload binary"
    )
    df = attach_media_metadata(df, kind="video", n_frames=32)
    out = sample_video_frames(
        df, every_n=4, decoder=deterministic_fake_decoder
    ).toPandas()
    assert list(out.frame_idx.iloc[0]) == list(range(0, 32, 4))
    assert len(out.frames.iloc[0]) == 8
