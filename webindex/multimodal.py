"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as BINARY columns beside typed metadata
structs; decode / feature-extract / resize / frame-sample run as Arrow
pandas UDFs over mapInPandas. Decode is REAL for the formats decodable with
numpy alone — uncompressed 24-bit BMP and binary PPM (fixed headers + raster
slice) — and raises NotImplementedError for compressed formats (JPEG/PNG
need PIL/opencv, absent in this container). `decode_image(fake=True)` keeps
a deterministic hash-seeded stub so plumbing tests can run on arbitrary
payloads; swap in PIL/ffmpeg on a real cluster, the Spark-side contract
(schemas, batching, partitioning, UDF signatures) is unchanged.
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


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BI_RGB BMP
    (bottom-up rows, 4-byte row padding) — pure numpy, used to build real
    binary fixtures for the decode path."""
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    pixel_bytes = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to an HxWx3 uint8 RGB array
    (top-down or bottom-up). Pure numpy: fixed headers + a strided raster
    slice. Anything else (palettes, RLE, 32-bit) raises ValueError."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    if hsize < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    img = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return img if top_down else img[::-1]


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as binary PPM (P6, maxval 255)."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) to an HxWx3 uint8 RGB array.
    Handles '#' comments and arbitrary whitespace in the header."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 RGB array.

    REAL decode for the raster formats decodable with numpy alone:
    uncompressed 24-bit BMP and binary PPM (P6). Compressed formats
    (JPEG/PNG/...) still raise NotImplementedError — they need PIL/opencv,
    which this container doesn't have; the Spark-side plumbing is identical
    either way. fake=True keeps the deterministic hash-seeded 8x8 stub for
    plumbing tests with arbitrary payloads."""
    if fake:
        seed = int.from_bytes(hashlib.sha1(payload or b"").digest()[:4], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "only BMP/PPM decode natively here; JPEG/PNG need PIL/opencv "
        "(not available in this sandbox)"
    )


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


CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("r_mean", T.DoubleType(), False),
        T.StructField("g_mean", T.DoubleType(), False),
        T.StructField("b_mean", T.DoubleType(), False),
    ]
)


def image_channel_stats(media: DataFrame) -> DataFrame:
    """REAL pixel statistics over decodable payloads (BMP/PPM): decode each
    image with the pure-numpy decoders and emit per-channel means — the
    simplest genuine feature-extraction pass. Same mapInPandas batch shape
    as extract_features; swap the stat for a model forward pass on a GPU
    cluster."""

    def fn(batches):
        for pdf in batches:
            ids, ws, hs, rs, gs, bs = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue  # MEDIA_SCHEMA allows NULL payloads: no pixels
                img = decode_image(bytes(payload))
                m = img.astype(np.float64).mean(axis=(0, 1))
                ids.append(mid)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                rs.append(float(m[0]))
                gs.append(float(m[1]))
                bs.append(float(m[2]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": ws,
                    "height": hs,
                    "r_mean": rs,
                    "g_mean": gs,
                    "b_mean": bs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        fn, schema=CHANNEL_STATS_SCHEMA
    )


def synth_bmp_media_df(spark, n: int = 50, size: int = 8) -> DataFrame:
    """Deterministic REAL-BMP media table: image i is a constant-color
    size x size image with RGB = (7i % 256, 13i % 256, 29i % 256), so its
    channel means are exact closed-form values an SQL oracle can recompute
    without touching the bytes."""
    rows = []
    for i in range(n):
        color = np.array([7 * i % 256, 13 * i % 256, 29 * i % 256], dtype=np.uint8)
        img = np.broadcast_to(color, (size, size, 3)).copy()
        rows.append(
            (
                i,
                "image",
                encode_bmp(img),
                {"mime": "image/bmp", "width": size, "height": size, "duration_ms": None},
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


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
