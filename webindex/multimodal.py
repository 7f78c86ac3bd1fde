"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as BINARY columns beside typed metadata
structs; decode / feature-extract / resize / frame-sample run as Arrow
pandas UDFs over mapInPandas. The decode step itself is STUBBED in this
container (no image/audio libs are installed): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder (seeded from the payload hash) produces stable feature rows — the
Spark-side plumbing (schemas, batching, partitioning, UDF signatures) is real
and tested; swap the stub for PIL/ffmpeg on a real cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("md5", T.StringType(), False),  # engine-portable digest
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    STUB: real decoding needs PIL/opencv (not in this container). fake=True
    returns a deterministic 8x8x3 array seeded by the payload hash so the
    downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; not available in this sandbox"
        )
    seed = int.from_bytes(hashlib.sha1(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(
    media: DataFrame, n_features: int = 16, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: payload -> (n_bytes, sha1, features).

    Feature vector = per-channel means of the (stub-)decoded image, padded
    deterministically — replace the body with a real model on a GPU cluster;
    the batch shape / schema / partitioning contract stays identical."""

    def fn(batches):
        for pdf in batches:
            ids, nb, shas, md5s, feats = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                ids.append(mid)
                nb.append(len(raw))
                shas.append(hashlib.sha1(raw).hexdigest())
                md5s.append(hashlib.md5(raw).hexdigest())
                img = decode_image(raw, fake=fake).astype(np.float64)
                base = img.mean(axis=(0, 1))  # 3 channel means
                vec = np.resize(base, n_features).astype(np.float32)
                feats.append(vec.tolist())
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nb, "sha1": shas, "md5": md5s, "features": feats}
            )

    return media.select("media_id", "payload").mapInPandas(fn, schema=FEATURES_SCHEMA)


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        rows.append(
            (
                i,
                kinds[i % 3],
                payload,
                {"mime": "application/octet-stream", "width": 8, "height": 8, "duration_ms": None},
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
