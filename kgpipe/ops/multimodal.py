"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery — schema, partition-preserving batch iteration,
UDF signatures, output row shape — is real and tested; the *codec* step
is stubbed (this container ships no image/audio libraries). Each stub is
either a clearly-marked ``NotImplementedError`` (``strict=True``) or a
deterministic fake derived from the bytes (default), so the pipeline
shape can be exercised end-to-end without the native decoders.

At 100 TB: binary payloads stay out of shuffle (all ops here are
narrow/mapInPandas — no wide transformation touches the bytes column);
metadata extraction prunes to the small typed columns before any join.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_png_ihdr(data: bytes) -> tuple[int, int] | None:
    """TRUE (width, height) from a PNG's IHDR chunk — pure Python, no
    native codec (PNG spec §5.2/§11.2.2: 8-byte signature, then the IHDR
    chunk whose first 8 data bytes are big-endian width/height). Returns
    None for non-PNG or truncated bytes, so callers fall through to
    their codec/stub path."""
    if (
        len(data) < 24
        or not data.startswith(_PNG_MAGIC)
        or data[12:16] != b"IHDR"
    ):
        return None
    width = int.from_bytes(data[16:20], "big")
    height = int.from_bytes(data[20:24], "big")
    if width == 0 or height == 0:
        return None
    return (width, height)


def _decode_image_stub(payload: bytes, strict: bool) -> tuple[int, int, str]:
    """No-codec decode: PNG headers are parsed for REAL dimensions (pure
    Python — no library needed); other formats fall back to the stub, a
    deterministic fake derived from the bytes so tests are reproducible.
    A real deployment swaps in PIL/opencv via ``decode=``/autodetect."""
    ihdr = parse_png_ihdr(payload or b"")
    if ihdr is not None:
        return (ihdr[0], ihdr[1], "png")
    if strict:
        raise NotImplementedError(
            "non-PNG image decode requires PIL/opencv, not present in this "
            "container (PNG dimensions parse codec-free via parse_png_ihdr)"
        )
    h = hashlib.sha256(payload or b"").digest()
    return (64 + h[0] % 64, 64 + h[1] % 64, ["png", "jpeg", "webp"][h[2] % 3])


def pil_image_decoder():
    """Real-codec autodetect: a PIL-backed ``decode(bytes) -> (width,
    height, format)`` callable when PIL is importable, else None.

    Used as the DEFAULT image decoder by :func:`image_metadata` when
    present (detected driver-side at operator construction; cloudpickle
    ships the callable to executors). Bytes PIL cannot parse fall back to
    the deterministic stub metadata so pipelines over synthetic/corrupt
    payloads stay total and reproducible — a deployment that wants hard
    failures injects its own raising decoder via ``decode=``.

    PIL is imported LAZILY inside ``decode`` (per-executor, cached by
    Python's module cache after the first call): driver-side detection
    only chooses the default, it must not make the shipped closure
    reference a module the executors may not have — on a cluster where
    only the driver has PIL, the task falls back to the stub instead of
    dying with an ImportError at deserialization time.
    """
    try:
        import PIL  # noqa: F401 — driver-side availability probe only
    except ImportError:
        return None

    def decode(data: bytes) -> tuple[int, int, str]:
        try:
            import io

            from PIL import Image  # lazy: executor may lack PIL → stub
            with Image.open(io.BytesIO(data)) as im:
                return (int(im.width), int(im.height), (im.format or "").lower())
        except Exception:
            return _decode_image_stub(data, strict=False)

    return decode


def image_metadata(
    media: DataFrame, strict: bool = False, decode=None
) -> DataFrame:
    """Decode/inspect images → typed metadata, via Arrow-batched
    mapInPandas (one Python roundtrip per batch, payload never shuffled).

    ``decode``: dependency-injected codec ``callable(bytes) -> (width,
    height, format)`` — a deployment with PIL/opencv wires its decoder in
    here without editing the operator (cloudpickle ships the callable to
    executors with the UDF). When omitted, a PIL decoder is autodetected
    (``pil_image_decoder``); absent PIL, the deterministic stub applies —
    or NotImplementedError under ``strict``. ``strict`` contracts with
    the stub path only, so combining it with an injected/autodetected
    real codec is ambiguous and raises ValueError."""
    if strict and decode is not None:
        raise ValueError(
            "strict=True is the no-codec contract (raise instead of fake "
            "metadata); it cannot combine with an injected decode callable"
        )
    if decode is None and not strict:
        decode = pil_image_decoder()  # None when PIL is absent → stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if decode is not None:
                    width, height, fmt = decode(data)
                else:
                    width, height, fmt = _decode_image_stub(data, strict)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "n_bytes": len(data),
                        "width": width,
                        "height": height,
                        "format": fmt,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return media.where(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_sha256", StringType(), True),
    ]
)


def sample_video_frames(
    media: DataFrame, every_n: int = 10, strict: bool = False, decode=None
) -> DataFrame:
    """Frame sampling plumbing: one input row → k output rows (UDTF shape).

    ``decode``: dependency-injected codec ``callable(bytes, every_n) ->
    list[bytes]`` returning the sampled frame payloads — a deployment
    with a real video library wires it in here. Default STUB codec:
    'frames' are deterministic byte slices (or NotImplementedError under
    ``strict``). As with ``image_metadata``, ``strict`` is the no-codec
    contract — combining it with an injected decode raises ValueError."""
    if strict and decode is not None:
        raise ValueError(
            "strict=True is the no-codec contract; it cannot combine with "
            "an injected decode callable"
        )

    def stub_frames(data: bytes, n: int) -> list:
        if strict:
            raise NotImplementedError("video decode not available here")
        n_frames = max(len(data) // max(n, 1), 1)
        return [data[i * n : (i + 1) * n] for i in range(min(n_frames, 8))]

    frame_fn = decode or stub_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                for idx, chunk in enumerate(frame_fn(data, every_n)):
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": idx,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return media.where(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-{kind}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
