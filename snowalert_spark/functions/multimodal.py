"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

Design for 100 TB: media bytes live in a ``binary`` column (or
pointer + bytes for large blobs); decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so
each task streams record batches without materializing the partition.
The image/audio codecs are not in this container, so the decode step
is STUBBED (``decode='fake'`` produces deterministic pseudo-features;
``decode='real'`` raises NotImplementedError) — the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_md5 string, "
    "feature array<float>"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents corpus: utf-8 bytes
    as the opaque payload, typed metadata derived deterministically."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit("raw").alias("format"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# Pluggable decoders: ``decode='real'`` resolves per-media-format
# decoders from this registry, so real decoding is an injection point
# rather than a hard dependency on codec libraries. A decoder is
# ``fn(data: bytes) -> list[float]`` (the feature vector). Formats with
# no registered decoder keep the honest NotImplementedError stub.
# Registered functions must be importable (pickled by reference into
# the Arrow worker closure).
# --------------------------------------------------------------------------
DECODERS: dict[str, "object"] = {}


def register_decoder(fmt: str, fn) -> None:
    DECODERS[fmt] = fn


def ppm_decode(data: bytes) -> list[float]:
    """Pure-stdlib P6 PPM parse: header dims + per-channel means —
    a real (if minimal) image decode with no codec deps."""
    parts = data.split(b"\n", 3)
    if parts[0] != b"P6":
        raise ValueError("not a P6 ppm")
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    pix = parts[3][: w * h * 3]
    n = max(len(pix) // 3, 1)
    means = [sum(pix[c::3]) / n / maxval for c in range(3)]
    return [float(w), float(h), *means]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/px


def png_decode(data: bytes) -> list[float]:
    """Pure-stdlib PNG decode (zlib inflate + scanline unfiltering per
    the public PNG spec): returns [width, height, *per-channel means]
    normalized to 0..1. Supports 8-bit greyscale/RGB/palette-less
    color types, non-interlaced — the mainstream training-corpus
    shape. Retires the PNG stub in the decoder registry; JPEG/MP3
    remain honest NotImplementedError stubs."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a png")
    pos, idat, ihdr = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("png missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS or color == 3:
        raise NotImplementedError(
            f"png depth={depth} color={color} interlace={interlace} unsupported"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(idat)
    stride = w * ch
    prev = bytearray(stride)
    sums = [0] * ch
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        # unfilter per the PNG spec: 0 None, 1 Sub, 2 Up, 3 Average,
        # 4 Paeth (left/up/up-left predictor)
        if ftype == 1:
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad png filter {ftype}")
        for i in range(stride):
            sums[i % ch] += line[i]
        prev = line
    n = max(w * h, 1)
    return [float(w), float(h), *(s / n / 255.0 for s in sums)]


def wav_decode(data: bytes) -> list[float]:
    """Pure-stdlib RIFF/WAVE header parse: channels, sample rate,
    bit depth, data length."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a wav")
    channels, rate = struct.unpack("<HI", data[22:28])
    bits = struct.unpack("<H", data[34:36])[0]
    data_len = struct.unpack("<I", data[40:44])[0]
    return [float(channels), float(rate), float(bits), float(data_len)]


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    ``fake`` decode: md5-derived 4-dim pseudo-embedding (deterministic,
    test-stable). ``real``: per-format decoders from the registry
    (meta.format → DECODERS); an unregistered format raises
    NotImplementedError — the honest stub, now bypassable by
    registering a decoder."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    decoders = dict(DECODERS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            for pdf in it:
                fmts = pdf["meta"].map(lambda m: (m or {}).get("format"))
                missing = set(fmts) - set(decoders)
                if missing:
                    # missing may mix None (rows without meta.format)
                    # with strings — stringify before sorting
                    raise NotImplementedError(
                        "no decoder registered for format(s) "
                        f"{sorted(map(str, missing))}; "
                        "register_decoder() one or use decode='fake'"
                    )
                data = pdf["data"]
                md5s = data.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
                feats = [
                    [float(x) for x in decoders[f](bytes(b))]
                    for f, b in zip(fmts, data)
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "n_bytes": data.map(len).astype("int64"),
                        "content_md5": md5s,
                        "feature": feats,
                    }
                )
            return
        for pdf in it:
            data = pdf["data"]
            md5s = data.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            feats = md5s.map(
                lambda h: [int(h[i : i + 8], 16) / 0xFFFFFFFF for i in range(0, 32, 8)]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": data.map(len).astype("int64"),
                    "content_md5": md5s,
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed — frame payload is a slice marker)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
