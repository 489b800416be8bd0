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
           "decode_and_featurize", "sample_video_frames",
           "decode_ppm", "decode_wav", "wav_sample_rate",
           "default_registry", "media_quality_gate"]

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


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy binary PPM (P6) decoder -> (h, w, 3) uint8.

    A REAL codec path (not the deterministic fake): PPM is the
    simplest uncompressed RGB container, decodable with numpy alone —
    which is exactly what this sandbox has.  Handles comments and
    maxval <= 255."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: magic, width, height, maxval — whitespace/comment
    # separated, then one whitespace byte, then raw RGB
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    # the single whitespace after maxval — Windows writers emit \r\n,
    # which must consume BOTH bytes or the raster shifts by one and
    # every pixel silently corrupts
    i += 2 if payload[i:i + 2] == b"\r\n" else 1
    if len(payload) - i < w * h * 3:
        raise ValueError("PPM raster truncated")
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=w * h * 3, offset=i)
    return data.reshape(h, w, 3).copy()


def decode_wav(payload: bytes) -> np.ndarray:
    """Pure-numpy RIFF/WAVE PCM16 decoder -> (n_samples, n_channels)
    int16.  Walks RIFF chunks (fmt / data), rejects non-PCM."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_channels, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            if audio_fmt != 1:
                raise ValueError(f"non-PCM wav (format {audio_fmt})")
            n_channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or n_channels is None:
        raise ValueError("wav missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"{bits}-bit PCM not supported (16 only)")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, n_channels).copy()


def wav_sample_rate(payload: bytes) -> int:
    """Sample rate from the fmt chunk (for duration gating)."""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"fmt ":
            return int.from_bytes(payload[pos + 12:pos + 16], "little")
        pos += 8 + size + (size & 1)
    raise ValueError("wav missing fmt chunk")


def default_registry() -> DecoderRegistry:
    """Registry with the REAL pure-numpy codecs registered
    (image/ppm, audio/wav); every other kind still raises the
    documented NotImplementedError until a library decoder is
    registered."""
    reg = DecoderRegistry()
    reg.register("image/ppm", decode_ppm)
    reg.register("audio/wav", decode_wav)
    return reg


def media_quality_gate(df: DataFrame, registry: DecoderRegistry,
                       min_pixels: int = 64,
                       min_audio_samples: int = 256) -> DataFrame:
    """Decode-verified quality gate: keep media whose DECODED shape
    clears the floor (images: h*w >= min_pixels; audio: samples >=
    min_audio_samples) — metadata lies, payloads don't.  Undecodable
    payloads are dropped (corrupt media is exactly what a cleaning
    pipeline removes).  Output: (media_id, kind, decoded_h, decoded_w,
    keep) — join back on media_id to filter the full table without
    re-shipping payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, hs, ws, keeps = [], [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
            ):
                # reset per item: a registered decoder may return None
                # without raising, which must read as "drop", not as
                # the previous item's verdict
                arr, keep = None, False
                try:
                    arr = registry.decode(kind, bytes(payload))
                except Exception:
                    arr = None
                if arr is not None:
                    if arr.ndim == 3:      # image (h, w, c)
                        keep = arr.shape[0] * arr.shape[1] >= min_pixels
                    else:                  # audio (samples, channels)
                        keep = arr.shape[0] >= min_audio_samples
                ids.append(int(mid))
                kinds.append(kind)
                hs.append(int(arr.shape[0]) if arr is not None else -1)
                ws.append(int(arr.shape[1]) if arr is not None else -1)
                keeps.append(bool(keep))
            yield pd.DataFrame({
                "media_id": ids, "kind": kinds, "decoded_h": hs,
                "decoded_w": ws, "keep": keeps,
            })

    return df.select("media_id", "kind", "payload").mapInPandas(
        fn, schema="media_id long, kind string, decoded_h int, "
                   "decoded_w int, keep boolean",
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
