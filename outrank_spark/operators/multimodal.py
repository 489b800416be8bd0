"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition sizing, Arrow batch
shape, UDF signatures — is real and tested; the codec step itself is
stubbed behind ``DecoderRegistry`` because no image/audio libraries
exist in this container (clearly marked; swap in PIL/torchaudio
decoders by registering a callable with the same (bytes) -> ndarray
contract).

Design notes for 100 TB media tables:
* binary payloads dominate bytes -> metadata-only operations MUST
  prune the payload column (all functions here select explicitly, so
  parquet never materializes ``payload`` unless decode is requested);
* decode fan-out uses ``mapInPandas`` with a bounded Arrow batch size
  (``spark.sql.execution.arrow.maxRecordsPerBatch``) so one batch of
  decoded frames fits executor memory;
* per-item outputs (features, thumbnails, frame samples) are fixed-
  width arrays, never Python objects.
"""
from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["DecoderRegistry", "media_schema", "with_media_metadata",
           "decode_and_featurize", "sample_video_frames"]

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, payload binary, "
    "width int, height int, duration_ms int"
)


def media_schema() -> str:
    return MEDIA_SCHEMA


class DecoderRegistry:
    """kind -> decoder(bytes) -> np.ndarray.  Real deployments register
    PIL / libav decoders; the default registry has a deterministic
    fake (hash-seeded pixels) so plumbing is testable, and raises
    NotImplementedError for unknown kinds."""

    def __init__(self):
        self._decoders: dict[str, Callable[[bytes], np.ndarray]] = {}

    def register(self, kind: str, fn: Callable[[bytes], np.ndarray]) -> None:
        self._decoders[kind] = fn

    def decode(self, kind: str, payload: bytes) -> np.ndarray:
        if kind in self._decoders:
            return self._decoders[kind](payload)
        raise NotImplementedError(
            f"no decoder registered for media kind {kind!r} — image/audio "
            "codecs are not available in this environment (STUB); register "
            "one with DecoderRegistry.register(kind, fn)",
        )


def deterministic_fake_decoder(shape=(8, 8, 3)):
    """Hash-seeded fake decode: same payload -> same 'pixels'.  Stands
    in for a real codec so the distributed plumbing is testable."""

    def decode(payload: bytes) -> np.ndarray:
        seed = int(
            pd.util.hash_array(np.array([payload], dtype=object))[0]
            % (2 ** 32),
        )
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.integers(0, 256, size=shape, dtype=np.int64)

    return decode


def with_media_metadata(df: DataFrame) -> DataFrame:
    """Payload-free metadata features — verify with .explain that the
    parquet scan's ReadSchema excludes ``payload``."""
    return df.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms",
        F.length(F.col("mime")).alias("mime_len"),
        (F.col("width") * F.col("height")).alias("n_pixels"),
        F.when(F.col("duration_ms") > 0,
               F.col("width") * F.col("height") * F.col("duration_ms") / 1000.0)
        .otherwise(F.lit(None)).alias("pixel_seconds"),
    )


def decode_and_featurize(df: DataFrame, registry: DecoderRegistry,
                         feature_dim: int = 8) -> DataFrame:
    """Decode payloads and emit fixed-width mean-channel features:
    (media_id, feature array<double>).  The decode loop is per *item*
    (unavoidable for codecs), everything around it is vectorized."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
            ):
                arr = registry.decode(kind, bytes(payload)).astype(np.float64)
                flat = arr.reshape(-1)
                pad = np.resize(flat, feature_dim)
                feats.append((pad / 255.0).tolist())
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return df.select("media_id", "kind", "payload").mapInPandas(
        fn, schema="media_id long, feature array<double>",
    )


def sample_video_frames(df: DataFrame, registry: DecoderRegistry,
                        every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (media_id, frame_ts_ms, frame_feature).  The frame decode is the
    registry stub; the row-explosion shape is the real contract."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_ts, out_feat = [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["duration_ms"],
            ):
                ts_points = range(0, max(int(dur), 1), every_ms)
                for ts in ts_points:
                    arr = registry.decode(kind, bytes(payload) + str(ts).encode())
                    out_id.append(int(mid))
                    out_ts.append(int(ts))
                    out_feat.append(
                        (arr.astype(np.float64).reshape(-1)[:4] / 255.0).tolist(),
                    )
            yield pd.DataFrame({
                "media_id": out_id, "frame_ts_ms": out_ts,
                "frame_feature": out_feat,
            })

    return df.select("media_id", "kind", "payload", "duration_ms").mapInPandas(
        fn, schema="media_id long, frame_ts_ms long, frame_feature array<double>",
    )
