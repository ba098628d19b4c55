"""Multimodal (image/audio/video) column handling.

Media payloads ride as opaque ``binary`` columns next to typed metadata
structs; the Spark-side plumbing — schemas, partition-preserving
``mapInPandas`` feature extraction, batch shapes, byte budgets — is real and
tested.  The codec step itself (JPEG/PNG decode, audio resample, video frame
demux) requires media libraries that are not part of the engine's executor
image; it is isolated behind ``decoder`` callables so deployments plug in
PIL/torchaudio/pyav without touching the plan.  The built-in
``deterministic_fake_decoder`` derives reproducible pseudo-pixels from the
payload bytes, which keeps every downstream stage executable and testable.

Schemas:

    media:     (doc_id string, payload binary, media struct<kind string,
                width int, height int, sample_rate int, n_frames int>)
    features:  (doc_id string, feat array<double>)
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "kind string, width int, height int, sample_rate int, n_frames int"
)


def attach_media_metadata(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    kind: str = "image",
    width: int | None = None,
    height: int | None = None,
    sample_rate: int | None = None,
    n_frames: int | None = None,
) -> DataFrame:
    """Add the typed metadata struct next to an opaque payload column."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(sample_rate).cast("int").alias("sample_rate"),
            F.lit(n_frames).cast("int").alias("n_frames"),
        ),
    )


def deterministic_fake_decoder(payload: bytes, media: dict) -> np.ndarray:
    """Stand-in decode: expands payload bytes into a deterministic float
    array shaped by the metadata (image → H*W grayscale, audio → 1s at the
    sample rate, video → n_frames).  Real deployments replace this with an
    actual codec; everything downstream is unchanged."""
    h = np.frombuffer(payload, dtype=np.uint8)
    if h.size == 0:
        h = np.zeros(1, dtype=np.uint8)
    kind = media.get("kind", "image")
    if kind == "image":
        size = int(media.get("width") or 8) * int(media.get("height") or 8)
    elif kind == "audio":
        size = int(media.get("sample_rate") or 8000)
    else:
        size = int(media.get("n_frames") or 16)
    reps = int(np.ceil(size / h.size))
    return np.tile(h, reps)[:size].astype(np.float64) / 255.0


def real_decoder_stub(payload: bytes, media: dict) -> np.ndarray:
    """The production decode hook.  Plug in PIL / soundfile / pyav here."""
    raise NotImplementedError(
        "media codecs are not bundled; pass decoder=deterministic_fake_decoder "
        "for testing or supply a real decoder callable"
    )


def extract_media_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_col: str = "media",
    decoder: Callable[[bytes, dict], np.ndarray] = real_decoder_stub,
    stats: bool = True,
) -> DataFrame:
    """Decode + featurize media payloads via ``mapInPandas``.

    Arrow batches of (payload, metadata) go to the python worker once; the
    decoder produces a 1-D signal per row; summary features come from the
    engine's kernel library (minimal set) so media signals and token series
    share one feature vocabulary.
    """
    from tsfresh_spark.extract import compute_series_features
    from tsfresh_spark.settings import minimal_settings

    settings = minimal_settings()

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for rid, payload, m in zip(
                pdf[id_col].values, pdf[payload_col].values, pdf[media_col].values
            ):
                media = m if isinstance(m, dict) else dict(m)
                signal = decoder(bytes(payload), media)
                feats = (
                    dict(
                        compute_series_features(
                            signal, media.get("kind", "media"), settings
                        )
                    )
                    if stats
                    else {}
                )
                rows.append(
                    {
                        id_col: rid,
                        "n_samples": len(signal),
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows)

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col, media_col).mapInPandas(
        run, f"{id_col} {id_type}, n_samples long, features map<string,double>"
    )


def resize_image_batch(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_col: str = "media",
    target: tuple[int, int] = (32, 32),
    decoder: Callable[[bytes, dict], np.ndarray] = real_decoder_stub,
) -> DataFrame:
    """Decode → nearest-neighbour resize → re-emit as float array (the
    resize arithmetic is real; only the codec is pluggable)."""

    th, tw = target

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for rid, payload, m in zip(
                pdf[id_col].values, pdf[payload_col].values, pdf[media_col].values
            ):
                media = m if isinstance(m, dict) else dict(m)
                h = int(media.get("height") or 8)
                w = int(media.get("width") or 8)
                img = decoder(bytes(payload), media).reshape(h, w)
                yi = (np.arange(th) * h // th).astype(int)
                xi = (np.arange(tw) * w // tw).astype(int)
                resized = img[yi[:, None], xi[None, :]]
                rows.append({id_col: rid, "pixels": resized.ravel().tolist()})
            yield pd.DataFrame(rows)

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col, media_col).mapInPandas(
        run, f"{id_col} {id_type}, pixels array<double>"
    )


def sample_video_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_col: str = "media",
    every_n: int = 4,
    decoder: Callable[[bytes, dict], np.ndarray] = real_decoder_stub,
) -> DataFrame:
    """Frame sampling: decode the frame-signal, keep every n-th frame."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for rid, payload, m in zip(
                pdf[id_col].values, pdf[payload_col].values, pdf[media_col].values
            ):
                media = m if isinstance(m, dict) else dict(m)
                frames = decoder(bytes(payload), media)
                kept = frames[::every_n]
                rows.append(
                    {
                        id_col: rid,
                        "frame_idx": list(range(0, len(frames), every_n)),
                        "frames": kept.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col, media_col).mapInPandas(
        run, f"{id_col} {id_type}, frame_idx array<int>, frames array<double>"
    )
