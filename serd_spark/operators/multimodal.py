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
