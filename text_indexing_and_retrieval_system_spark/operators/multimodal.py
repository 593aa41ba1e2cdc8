"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as `binary`
columns with typed metadata and runs decode / feature-extraction /
resize / frame-sampling as Arrow-batched functions over `mapInPandas`.
The media codec libraries are not available in this container, so the
*decode kernels are stubs*: `decode_image` raises NotImplementedError
unless `fake=True`, in which case a clearly-marked deterministic fake
(seeded from the payload hash) produces feature vectors with the real
schema, partitioning, UDF signature and batch shape — everything Spark
cares about is real and tested; only the pixel math is faked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA_DDL = "media_id long, kind string, n_bytes int, feature array<float>"

FEATURE_DIM = 16


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.randint(0, 192)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.randint(16, 512)),
                int(rng.randint(16, 512)),
                int(rng.randint(100, 60000)),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA_DDL)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — a real deployment plugs Pillow/libvips here."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "container; use extract_features(..., fake=True) for the "
        "deterministic fake kernel"
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic FAKE feature: md5-seeded pseudo-embedding. Stands in
    for decode→resize→embed; same shape/dtype contract as the real path."""
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """media → (media_id, kind, n_bytes, feature[FEATURE_DIM]) via ONE
    mapInPandas pass (Arrow batches of binary payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if fake:
                    feats.append(_fake_feature(b).tolist())
                else:
                    decode_image(b)  # raises NotImplementedError
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA_DDL
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → (media_id, frame_idx, ts_ms) frame-sampling plan —
    pure relational (sequence + explode), the decode of each frame being
    the stubbed kernel above."""
    vids = media.filter(F.col("kind") == "video")
    idxs = F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
    return vids.select(
        "media_id",
        F.posexplode(idxs).alias("frame_idx", "_i"),
    ).select(
        "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
    )
