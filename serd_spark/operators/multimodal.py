"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real and tested — schema, partition-aware
batch shapes, Arrow-batched ``mapInPandas`` decode/feature/resize/
frame-sample stages.  The *codec* step is stubbed deterministically
(this container has no image/audio libs): ``decode_stub`` derives
fake-but-stable features from the bytes themselves, and the real
implementation point is clearly marked.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "feat array<float>, ok boolean"
)


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(f"media:{i}".encode(),
                                  digest_size=64).digest() * (1 + i % 4)
        rows.append((i, kind, bytearray(payload), f"application/x-{kind}",
                     64 + i % 512, 64 + (i * 7) % 512, 1000 * (1 + i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """STUB: stands in for image decode / audio PCM / video frames.

    Real implementation point: replace with PIL/torchvision/ffmpeg
    calls; must stay a pure function of (payload, kind) so retries and
    the two-parallelism scaling run stay deterministic.  Raises for
    unknown kinds exactly like a real codec would.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for kind={kind!r}")
    h = hashlib.blake2b(payload, digest_size=4 * dim,
                        key=kind.encode()).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "little") / 2**32
            for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched decode + feature extraction; bad rows quarantined
    via ok=False (same lax posture as the parser, O-17)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                try:
                    feat = decode_stub(payload, r.kind, dim)
                    ok = True
                except NotImplementedError:
                    feat, ok = [], False
                out.append((int(r.media_id), r.kind, len(payload),
                            hashlib.sha1(payload).hexdigest(), feat, ok))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "sha1",
                              "feat", "ok"])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one row per planned frame timestamp
    (JVM-side sequence explode; the decode itself is decode_stub)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"),
                           F.lit(every_ms))).alias("frame_ts_ms"),
        )
    )


def probe_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """REAL (dependency-free) image header probe: container format +
    pixel dimensions from the first bytes of PNG / JPEG / GIF
    payloads — the metadata-extraction step that does NOT need a
    decoder, so it runs even in codec-less environments.  Returns
    (format, width, height) or None for unrecognized bytes.

    Formats (public specs): PNG IHDR (8-byte signature, big-endian
    W/H at offsets 16/20), GIF87a/89a (little-endian W/H at 6/8),
    JPEG SOF0/1/2 markers (big-endian H/W in the frame header).
    """
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" \
            and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("gif", w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                return None  # marker desync
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            i += 2 + seg_len
    return None


def image_metadata(media: DataFrame) -> DataFrame:
    """Header-derived image metadata over the binary column: detected
    container format and probed dimensions, plus a mismatch flag
    against the declared width/height columns (catalog-vs-bytes
    drift detection).  Arrow-batched; rows whose payload isn't a
    recognizable image get fmt=NULL (quarantine-style, never a
    failure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                probe = probe_image_dims(bytes(r.payload))
                fmt, w, h = probe if probe else (None, None, None)
                declared_ok = (probe is not None and w == r.width
                               and h == r.height)
                out.append((int(r.media_id), fmt, w, h, declared_ok))
            yield pd.DataFrame(
                out, columns=["media_id", "fmt", "probe_width",
                              "probe_height", "matches_declared"])

    return media.mapInPandas(
        run, schema="media_id long, fmt string, probe_width int, "
                    "probe_height int, matches_declared boolean")


def probe_wav_meta(payload: bytes) -> tuple[int, int, int, int] | None:
    """REAL (dependency-free) WAV header probe: (sample_rate,
    channels, bits_per_sample, duration_ms) from the RIFF/WAVE fmt
    and data chunks.  None for non-WAV bytes."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    rate = channels = bits = None
    data_len = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            channels = int.from_bytes(payload[i + 10 : i + 12], "little")
            rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not (rate and channels and bits and data_len is not None):
        return None
    bytes_per_sec = rate * channels * (bits // 8)
    dur_ms = (data_len * 1000) // bytes_per_sec if bytes_per_sec else 0
    return (rate, channels, bits, dur_ms)


def audio_metadata(media: DataFrame) -> DataFrame:
    """Header-derived audio metadata over the binary column (WAV);
    non-WAV payloads degrade to NULLs, duration drift vs the declared
    duration_ms column is flagged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                probe = probe_wav_meta(bytes(r.payload))
                rate, ch, bits, dur = probe if probe else (
                    None, None, None, None)
                ok = probe is not None and dur == r.duration_ms
                out.append((int(r.media_id), rate, ch, bits, dur, ok))
            yield pd.DataFrame(
                out, columns=["media_id", "sample_rate", "channels",
                              "bits", "probe_duration_ms",
                              "matches_declared"])

    return media.mapInPandas(
        run, schema="media_id long, sample_rate int, channels int, "
                    "bits int, probe_duration_ms int, "
                    "matches_declared boolean")
