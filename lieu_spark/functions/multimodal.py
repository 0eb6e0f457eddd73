"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schemas, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested. Codec
status (no image/audio libraries exist in this container):

- BMP decodes AND resizes natively (``decode_bmp``, ``_bmp_pixels``,
  ``resize_image_real`` — pure struct/numpy, zero dependencies);
- other formats raise NotImplementedError with the intended
  production (PIL/libvips) behavior documented;
- ``decode_image_metadata(decoder="fake")`` is the deterministic
  oracle-fixture path (dimensions derived from the payload hash).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture path: treat UTF-8 text bytes as an opaque payload."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "payload_sha", F.sha2(F.col("payload"), 256)
    )


def decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """Dependency-free BMP (BITMAPINFOHEADER) decoder: (width, height,
    channels). Pure struct parsing of the public Windows BMP layout —
    magic 'BM', int32 LE width/height at offsets 18/22, uint16 LE bit
    depth at 28. Raises ValueError on anything that is not a BMP."""
    import struct

    if len(payload) < 30 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if width <= 0 or bpp == 0:
        raise ValueError(f"malformed BMP header: width={width} bpp={bpp}")
    # top-down BMPs store negative height; channels from bit depth
    return (width, abs(height), max(1, bpp // 8))


def encode_bmp(width: int, height: int, channels: int = 3) -> bytes:
    """Minimal valid BMP writer (test fixture twin of decode_bmp):
    solid-zero pixels, BITMAPINFOHEADER, row stride padded to 4 bytes."""
    import struct

    bpp = channels * 8
    stride = (width * channels + 3) & ~3
    pixel_bytes = stride * height
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, pixel_bytes, 2835, 2835, 0, 0)
    return header + b"\0" * pixel_bytes


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Real decode path: BMP is decoded natively (decode_bmp, zero
    dependencies); other formats require an imaging library absent in
    this container (production impl:
    PIL.Image.open(io.BytesIO(payload)) -> (width, height,
    len(getbands())))."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "only BMP decodes natively here; other formats require an "
        "imaging library not present in this container"
    )


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake: dimensions from a cheap byte hash."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return (64 + h % 1920, 64 + (h >> 16) % 1080, 1 + (h >> 40) % 4)


def decode_image_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas decode: Arrow batches of binary -> metadata rows.

    ``decoder="fake"`` (default, deterministic — the oracle fixture
    path over text-derived payloads); ``decoder="real"`` routes through
    ``decode_image_real`` — BMP payloads decode natively with zero
    dependencies, anything else raises, exactly as production would on
    a corrupt payload. Both share one batch shape (one pandas DF per
    Arrow batch, bytes objects in the payload column)."""
    use_real = decoder == "real"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, c, fmt = [], [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                if use_real:
                    dw, dh, dc = decode_image_real(raw)
                    fmt.append("bmp")
                else:
                    dw, dh, dc = _fake_dims(raw)
                    fmt.append("fake")
                w.append(dw)
                h.append(dh)
                c.append(dc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "format": fmt,
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "channels": pd.array(c, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_META_SCHEMA)


def _bmp_pixels(payload: bytes):
    """Parse an uncompressed 24/32-bpp BMP into an (h, w, c) uint8 numpy
    array (row 0 = top). Raises ValueError on paletted/compressed BMPs —
    resize through a palette needs a colour-space decision this
    dependency-free path deliberately does not make."""
    import struct

    import numpy as np

    width, height, channels = decode_bmp(payload)
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (compression,) = struct.unpack_from("<I", payload, 30)
    (raw_height,) = struct.unpack_from("<i", payload, 22)
    if compression != 0:
        raise ValueError(f"compressed BMP (BI_ code {compression}) not supported")
    if channels < 3:
        raise ValueError("paletted (<24-bpp) BMP pixel access not supported")
    stride = (width * channels + 3) & ~3
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes < {need} expected")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=data_offset)
    img = rows.reshape(height, stride)[:, : width * channels].reshape(height, width, channels)
    if raw_height > 0:  # bottom-up storage (the common case): flip to top-first
        img = img[::-1]
    return np.ascontiguousarray(img)


def _bmp_from_pixels(img) -> bytes:
    """Encode an (h, w, c>=3) uint8 array as a bottom-up BI_RGB BMP —
    the exact inverse of ``_bmp_pixels`` (roundtrip is byte-stable on
    the pixel content)."""
    import struct

    import numpy as np

    height, width, channels = img.shape
    stride = (width * channels + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * channels] = img[::-1].reshape(height, width * channels)
    pixel_bytes = rows.tobytes()
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, channels * 8, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return header + pixel_bytes


def resize_image_real(payload: bytes, width: int, height: int) -> bytes:
    """Real resize path: uncompressed 24/32-bpp BMPs resize natively
    (nearest-neighbor via numpy index gather — zero dependencies) and
    re-encode as BMP; other formats require an imaging library absent
    in this container (production impl: PIL.Image.open(io.BytesIO(
    payload)).resize((width, height)).save(buf, 'BMP'))."""
    if payload[:2] == b"BM":
        import numpy as np

        if width <= 0 or height <= 0:
            raise ValueError(f"invalid target size {width}x{height}")
        img = _bmp_pixels(payload)
        src_h, src_w = img.shape[:2]
        # nearest-neighbor: pixel-center mapping, same convention as PIL NEAREST
        ys = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
        xs = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
        return _bmp_from_pixels(img[np.ix_(ys, xs)])
    raise NotImplementedError(
        "only BMP resizes natively here; other formats require an "
        "imaging library not present in this container"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def byte_histogram_features(
    df: DataFrame, dim: int = 32, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Feature extraction plumbing: payload -> L2-normalized float vector
    (``array<float>``, ANN-ready — feeds operators/ann.py directly).

    The featurizer here is a byte-value histogram folded to ``dim``
    buckets: deterministic, numpy-vectorized per Arrow batch, zero
    codec dependencies. Production swaps the histogram for a real
    encoder (CLIP/ResNet forward pass per batch); the Spark-side shape —
    mapInPandas batching, float32 output, downstream LSH/IVF — is
    identical.
    """
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                if raw.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(raw % dim, minlength=dim).astype(np.float64)
                nrm = float(np.sqrt((hist * hist).sum()))
                feats.append((hist / nrm if nrm > 0 else hist).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "feature": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(featurize, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing (video analog): UDTF-style fan-out via
    mapInPandas — each payload yields up to max_frames byte slices.
    Real impl would demux containers; the slicing stands in for frames.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SCHEMA)
