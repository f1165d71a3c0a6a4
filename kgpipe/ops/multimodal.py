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


#: JPEG start-of-frame markers carrying the dimension payload (ITU T.81
#: table B.1): C0-CF minus DHT (C4), JPG (C8) and DAC (CC). SOF0
#: (baseline), SOF1 (extended sequential) and SOF2 (progressive) are the
#: ones met in practice; the lossless/arithmetic variants share the
#: exact payload layout, so they parse for free.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
#: standalone markers with NO length field (TEM, RSTn; SOI handled apart)
_JPEG_STANDALONE = frozenset(range(0xD0, 0xD8)) | {0x01}


def parse_jpeg_sof(data: bytes) -> tuple[int, int] | None:
    """TRUE (width, height) from a JPEG's SOF segment — pure Python, no
    native codec (round 7, VERDICT task 4; the IHDR move applied to the
    marker-segment container): walk FF-marker segments from SOI,
    skipping fill bytes and standalone markers, hop over each segment by
    its big-endian length, and read ``precision(1) height(2) width(2)``
    from the first SOFn payload. Returns None for non-JPEG, truncated
    bytes, or a stream hitting SOS/EOI before any SOF, so callers fall
    through to their codec/stub path."""
    data = data or b""
    n = len(data)
    if n < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 1 < n:
        if data[i] != 0xFF:
            return None  # lost marker alignment: corrupt stream
        while i < n and data[i] == 0xFF:
            i += 1  # fill bytes (spec B.1.1.2) collapse into the marker
        if i >= n:
            return None
        marker = data[i]
        i += 1
        if marker in _JPEG_STANDALONE or marker == 0xD8:
            continue
        if marker in (0xD9, 0xDA):
            return None  # EOI / entropy-coded data before any SOF
        if i + 2 > n:
            return None
        seg_len = int.from_bytes(data[i : i + 2], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF_MARKERS:
            # the declared segment must actually contain the dimension
            # fields (len 2 + precision 1 + height 2 + width 2 = 7); a
            # malformed SOF with a shorter declared length would otherwise
            # read "dimensions" out of the following segment's bytes
            if seg_len < 7 or i + 7 > n:
                return None
            height = int.from_bytes(data[i + 3 : i + 5], "big")
            width = int.from_bytes(data[i + 5 : i + 7], "big")
            if width == 0 or height == 0:
                return None
            return (width, height)
        i += seg_len
    return None


def parse_gif_lsd(data: bytes) -> tuple[int, int] | None:
    """TRUE (width, height) from a GIF's Logical Screen Descriptor —
    GIF87a/89a §18: 6-byte signature, then two little-endian uint16."""
    data = data or b""
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    if width == 0 or height == 0:
        return None
    return (width, height)


def parse_webp_header(data: bytes) -> tuple[int, int] | None:
    """TRUE (width, height) from a WebP RIFF header, all three layouts:
    'VP8 ' lossy (14-bit dims after the 9D012A sync), 'VP8L' lossless
    (14-bit packed dims after the 0x2F signature), 'VP8X' extended
    (24-bit canvas minus one)."""
    data = data or b""
    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    chunk = data[12:16]
    if chunk == b"VP8 ":
        if data[23:26] != b"\x9d\x01\x2a":
            return None
        width = int.from_bytes(data[26:28], "little") & 0x3FFF
        height = int.from_bytes(data[28:30], "little") & 0x3FFF
    elif chunk == b"VP8L":
        if data[20] != 0x2F:
            return None
        bits = int.from_bytes(data[21:25], "little")
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
    elif chunk == b"VP8X":
        width = int.from_bytes(data[24:27], "little") + 1
        height = int.from_bytes(data[27:30], "little") + 1
    else:
        return None
    if width == 0 or height == 0:
        return None
    return (width, height)


def _iter_mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, box_end) for the ISOBMFF boxes in
    ``data[start:end]`` (ISO/IEC 14496-12 §4.2: size(4) type(4), size==1
    → 64-bit largesize follows, size==0 → box runs to the container
    end). Stops silently at the first corrupt/truncated box — callers
    treat an incomplete walk as 'no dimensions found'."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(data[i : i + 4], "big")
        btype = data[i + 4 : i + 8]
        header = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(data[i + 8 : i + 16], "big")
            header = 16
        elif size == 0:
            size = end - i
        if size < header or i + size > end:
            return
        yield btype, i + header, i + size
        i += size


def parse_mp4_tkhd(data: bytes) -> tuple[int, int] | None:
    """TRUE (width, height) from an MP4/ISOBMFF track header — pure
    Python, no native codec (round 7: the IHDR/SOF move applied to the
    box container): require a leading ``ftyp`` box, walk
    moov → trak → tkhd, and read the two 16.16 fixed-point dimension
    words at the end of the tkhd payload (version 0 at offset 76,
    version 1 at 88 — §8.3.2). Audio tracks carry zero dimensions and
    are skipped; the first track with nonzero dimensions wins. Returns
    None for non-ISOBMFF, truncated boxes, or no visual track, so
    callers fall through to their codec/stub path."""
    data = data or b""
    n = len(data)
    if n < 16 or data[4:8] != b"ftyp":
        return None
    for btype, s, e in _iter_mp4_boxes(data, 0, n):
        if btype != b"moov":
            continue
        for t2, s2, e2 in _iter_mp4_boxes(data, s, e):
            if t2 != b"trak":
                continue
            for t3, s3, e3 in _iter_mp4_boxes(data, s2, e2):
                if t3 != b"tkhd" or s3 >= e3:
                    continue
                off = s3 + (88 if data[s3] == 1 else 76)
                if off + 8 > e3:
                    continue
                width = int.from_bytes(data[off : off + 4], "big") >> 16
                height = int.from_bytes(data[off + 4 : off + 8], "big") >> 16
                if width and height:
                    return (width, height)
    return None


#: codec-free header parsers tried in order by the no-codec decode path
_HEADER_PARSERS = (
    (parse_png_ihdr, "png"),
    (parse_jpeg_sof, "jpeg"),
    (parse_gif_lsd, "gif"),
    (parse_webp_header, "webp"),
)


def _decode_image_stub(payload: bytes, strict: bool) -> tuple[int, int, str]:
    """No-codec decode: PNG (IHDR), JPEG (SOFn), GIF (LSD) and WebP
    (RIFF VP8/VP8L/VP8X) headers are parsed for REAL dimensions (pure
    Python — no library needed); anything else falls back to the stub, a
    deterministic fake derived from the bytes so tests are reproducible.
    A real deployment swaps in PIL/opencv via ``decode=``/autodetect."""
    for parser, fmt in _HEADER_PARSERS:
        dims = parser(payload or b"")
        if dims is not None:
            return (dims[0], dims[1], fmt)
    if strict:
        raise NotImplementedError(
            "image decode beyond PNG/JPEG/GIF/WebP headers requires "
            "PIL/opencv, not present in this container (those four parse "
            "codec-free via the _HEADER_PARSERS table)"
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


#: video metadata carries the same typed columns as image metadata
VIDEO_META_SCHEMA = IMAGE_META_SCHEMA


def _decode_video_stub(payload: bytes, strict: bool) -> tuple[int, int, str]:
    """No-codec video decode: MP4/ISOBMFF track headers are parsed for
    REAL dimensions (pure Python, ``parse_mp4_tkhd``); anything else
    falls back to the deterministic stub — or NotImplementedError under
    ``strict``. A real deployment swaps in ffprobe/opencv via
    ``decode=``."""
    dims = parse_mp4_tkhd(payload or b"")
    if dims is not None:
        return (dims[0], dims[1], "mp4")
    if strict:
        raise NotImplementedError(
            "video decode beyond MP4/ISOBMFF track headers requires a "
            "real demuxer (ffprobe/opencv), not present in this container"
        )
    h = hashlib.sha256(payload or b"").digest()
    return (128 + h[0] % 128, 96 + h[1] % 96, ["mp4", "webm", "avi"][h[2] % 3])


def video_metadata(media: DataFrame, strict: bool = False, decode=None) -> DataFrame:
    """Inspect video payloads → typed metadata, via Arrow-batched
    mapInPandas (same narrow shape as :func:`image_metadata`: the binary
    column is read once per batch and never shuffled).

    ``decode``: dependency-injected ``callable(bytes) -> (width, height,
    format)``; when omitted, MP4/ISOBMFF dimensions parse codec-free and
    everything else is the deterministic stub — or NotImplementedError
    under ``strict``, which (as with images) contracts with the stub
    path only."""
    if strict and decode is not None:
        raise ValueError(
            "strict=True is the no-codec contract (raise instead of fake "
            "metadata); it cannot combine with an injected decode callable"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if decode is not None:
                    width, height, fmt = decode(data)
                else:
                    width, height, fmt = _decode_video_stub(data, strict)
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
                rows, columns=[f.name for f in VIDEO_META_SCHEMA.fields]
            )

    return media.where(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        batches, VIDEO_META_SCHEMA
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bits_per_sample", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)


def parse_wav_fmt(data: bytes) -> tuple[int, int, int, int] | None:
    """TRUE (sample_rate, channels, bits_per_sample, duration_ms) from a
    WAV's RIFF chunks — pure Python, no audio library (RIFF spec: 12-byte
    RIFF/WAVE header, then chunks of id(4) size(4, little-endian); the
    ``fmt `` chunk carries format(2) channels(2) sample_rate(4)
    byte_rate(4) block_align(2) bits(2), and duration derives from the
    ``data`` chunk's size over byte_rate). Chunks are padded to even
    offsets. Returns None for non-WAV or truncated/corrupt chunk walks,
    so callers fall through to their codec/stub path."""
    data = data or b""
    n = len(data)
    if n < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        body = i + 8
        if cid == b"fmt " and size >= 16 and body + 16 <= n:
            channels = int.from_bytes(data[body + 2 : body + 4], "little")
            sample_rate = int.from_bytes(data[body + 4 : body + 8], "little")
            byte_rate = int.from_bytes(data[body + 8 : body + 12], "little")
            bits = int.from_bytes(data[body + 14 : body + 16], "little")
            if channels and sample_rate and byte_rate:
                fmt = (sample_rate, channels, bits, byte_rate)
        elif cid == b"data":
            data_size = size
        i = body + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data_size is None:
        return None
    sample_rate, channels, bits, byte_rate = fmt
    duration_ms = int(data_size * 1000 // byte_rate)
    # an adversarial/corrupt header can push any of these past int32
    # (sample_rate is an unchecked uint32 field; duration from a huge
    # declared data size over a tiny byte_rate), which would fail the
    # Arrow conversion against AUDIO_META_SCHEMA's IntegerType at runtime
    # instead of falling back to the stub — treat it as unparseable here
    if max(duration_ms, sample_rate, channels, bits) > 2**31 - 1:
        return None
    return (sample_rate, channels, bits, duration_ms)


def _decode_audio_stub(payload: bytes, strict: bool) -> tuple[int, int, int, int, str]:
    """No-codec audio decode: WAV headers parse for REAL metadata (pure
    Python, ``parse_wav_fmt``); anything else falls back to the
    deterministic stub — or NotImplementedError under ``strict``."""
    meta = parse_wav_fmt(payload or b"")
    if meta is not None:
        return (*meta, "wav")
    if strict:
        raise NotImplementedError(
            "audio decode beyond WAV/RIFF headers requires a real audio "
            "library, not present in this container"
        )
    h = hashlib.sha256(payload or b"").digest()
    return (
        [8000, 16000, 22050, 44100][h[0] % 4],
        1 + h[1] % 2,
        [8, 16, 24][h[2] % 3],
        200 + int.from_bytes(h[3:5], "big") % 60000,
        ["wav", "mp3", "flac"][h[5] % 3],
    )


def audio_metadata(media: DataFrame, strict: bool = False, decode=None) -> DataFrame:
    """Inspect audio payloads → typed metadata, via Arrow-batched
    mapInPandas (same narrow no-shuffle shape as ``image_metadata`` /
    ``video_metadata``; the modality family is symmetric). ``decode``:
    dependency-injected ``callable(bytes) -> (sample_rate, channels,
    bits_per_sample, duration_ms, format)``; when omitted, WAV parses
    codec-free and everything else is the deterministic stub — or
    NotImplementedError under ``strict`` (stub-path contract only)."""
    if strict and decode is not None:
        raise ValueError(
            "strict=True is the no-codec contract (raise instead of fake "
            "metadata); it cannot combine with an injected decode callable"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if decode is not None:
                    rate, ch, bits, dur, fmt = decode(data)
                else:
                    rate, ch, bits, dur, fmt = _decode_audio_stub(data, strict)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "n_bytes": len(data),
                        "sample_rate": rate,
                        "channels": ch,
                        "bits_per_sample": bits,
                        "duration_ms": dur,
                        "format": fmt,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return media.where(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        batches, AUDIO_META_SCHEMA
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


# ---------------------------------------------------------------------------
# deterministic fixture builders: REAL container bytes (spec-conformant
# marker/chunk structure) whose dimensions are known from construction —
# shared by tests, synthetic_media and the queries.py oracle, which
# derives expected width/height from the construction PARAMETERS rather
# than by re-running the parsers under test
# ---------------------------------------------------------------------------


def png_fixture_bytes(width: int, height: int) -> bytes:
    """Minimal real PNG: signature + IHDR chunk (CRC zeroed — readers of
    the dimension fields never get that far)."""
    return (
        _PNG_MAGIC
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 6, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )


def jpeg_fixture_bytes(width: int, height: int, progressive: bool = False) -> bytes:
    """Minimal real JPEG: SOI, APP0/JFIF, DQT, SOF0 (or SOF2 when
    ``progressive``) carrying precision/height/width/3 components, EOI —
    every segment with a correct big-endian length."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x01\x00H\x00H\x00\x00"
    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(64)
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof_payload = (
        b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    sof = sof_marker + (len(sof_payload) + 2).to_bytes(2, "big") + sof_payload
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


def mp4_fixture_bytes(width: int, height: int, version: int = 0) -> bytes:
    """Minimal real MP4: ftyp, then moov containing an AUDIO trak
    (zero-dimension tkhd — the skip trap) followed by the video trak
    whose tkhd carries the 16.16 fixed-point dimensions (version 0 or
    1 layout), then an mdat stub. Every box has a correct 32-bit size."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return (len(payload) + 8).to_bytes(4, "big") + btype + payload

    def tkhd(w: int, h: int) -> bytes:
        if version == 1:
            times = (
                (0).to_bytes(8, "big") * 2  # creation/modification
                + (1).to_bytes(4, "big")  # track_ID
                + bytes(4)  # reserved
                + (0).to_bytes(8, "big")  # duration
            )
        else:
            times = bytes(8) + (1).to_bytes(4, "big") + bytes(4) + bytes(4)
        matrix = (
            (0x00010000).to_bytes(4, "big") + bytes(12)
            + (0x00010000).to_bytes(4, "big") + bytes(12)
            + (0x40000000).to_bytes(4, "big")
        )
        return (
            bytes([version, 0, 0, 7])  # version + flags
            + times
            + bytes(8)  # reserved
            + bytes(8)  # layer/alternate_group/volume/reserved
            + matrix
            + (w << 16).to_bytes(4, "big")
            + (h << 16).to_bytes(4, "big")
        )

    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2mp41")
    moov = box(
        b"moov",
        box(b"trak", box(b"tkhd", tkhd(0, 0)))  # audio track: skipped
        + box(b"trak", box(b"tkhd", tkhd(width, height))),
    )
    return ftyp + moov + box(b"mdat", bytes(16))


def wav_fixture_bytes(
    sample_rate: int, channels: int, n_frames: int, bits: int = 16
) -> bytes:
    """Minimal real WAV: RIFF/WAVE header, canonical 16-byte ``fmt ``
    chunk, and a zero-filled ``data`` chunk of ``n_frames`` sample
    frames — every size field correct, so duration_ms is exact from
    construction parameters (n_frames * 1000 // sample_rate)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_frames * block_align
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + data_size.to_bytes(4, "little") + bytes(data_size)
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def gif_fixture_bytes(width: int, height: int) -> bytes:
    """Minimal real GIF89a: signature + Logical Screen Descriptor (two
    little-endian uint16 dimensions) + trailer."""
    return (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([0x00, 0x00, 0x00])  # flags / bg index / aspect
        + b"\x3b"  # trailer
    )


def webp_fixture_bytes(width: int, height: int) -> bytes:
    """Minimal real WebP (VP8L lossless layout): RIFF/WEBP header + a
    VP8L chunk whose 0x2F signature byte is followed by the packed
    14-bit width-1 / height-1 fields."""
    bits = ((width - 1) & 0x3FFF) | (((height - 1) & 0x3FFF) << 14)
    # pad past the 30-byte floor parse_webp_header requires of any WebP
    # (real VP8L streams carry image data here)
    payload = b"\x2f" + bits.to_bytes(4, "little") + bytes(8)
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks. Image rows
    cycle real-PNG (i%9==0), real-JPEG (i%9==3, progressive every
    other), real-GIF (i%27==6), real-WebP (i%27==15) and an opaque stub
    (i%27==24); video rows cycle real-MP4 (i%9==5, tkhd version 1 every
    other) and opaque stubs; audio rows cycle real-WAV (i%9==7) and
    opaque stubs — so every codec-free header parser AND the
    deterministic stubs are all exercised by the same table."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image" and i % 9 == 0:
            payload = png_fixture_bytes(16 + i, 9 + i)
            mime = "image/png"
        elif kind == "image" and i % 9 == 3:
            payload = jpeg_fixture_bytes(32 + i, 18 + i, progressive=(i % 18 == 12))
            mime = "image/jpeg"
        elif kind == "image" and i % 27 == 6:
            payload = gif_fixture_bytes(20 + i, 11 + i)
            mime = "image/gif"
        elif kind == "image" and i % 27 == 15:
            payload = webp_fixture_bytes(24 + i, 13 + i)
            mime = "image/webp"
        elif kind == "video" and i % 9 == 5:
            payload = mp4_fixture_bytes(64 + i, 36 + i, version=(1 if i % 18 == 14 else 0))
            mime = "video/mp4"
        elif kind == "audio" and i % 9 == 7:
            payload = wav_fixture_bytes(8000 * (1 + i % 3), 1 + i % 2, 400 + 40 * i)
            mime = "audio/wav"
        else:
            payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
            mime = f"application/x-{kind}"
        rows.append((i, kind, bytearray(payload), mime))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
