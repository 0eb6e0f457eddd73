"""Video modality: REAL AVI/MJPEG container codec + frame ops, zero deps.

With the baseline JPEG codec (functions/jpeg.py) in hand, Motion-JPEG
in an AVI (RIFF) container decodes completely in pure python/numpy —
so video joins image and audio as a real end-to-end modality:

- ``parse_avi_meta``: RIFF chunk walk — 'avih' main header for
  (width, height, n_frames, us_per_frame); loud ValueError on
  non-AVI RIFFs or truncation;
- ``_avi_frames``: the '00dc' chunks of the 'movi' LIST, each one a
  complete baseline JPEG — decodable by ``jpeg._jpeg_pixels``;
- ``encode_avi_mjpeg``: the encoder twin (avih + strl vids/MJPG
  headers, word-aligned chunks) so roundtrips are testable;
- ``extract_frames``: Spark-side UDTF-style fan-out via mapInPandas —
  (doc_id, frame_idx, frame) rows with REAL JPEG payloads (the
  byte-slicing ``multimodal.sample_frames`` analog, now real);
- ``synthetic_video_payloads`` + ``decode_video_meta``: deterministic
  fixture whose frames are SOLID colors from integer functions of
  (doc_id, frame_idx). Uniform 8x8-aligned frames at quality 100
  roundtrip EXACTLY through the JPEG codec (quantization step 1 on an
  integer DC, chroma error < 0.5 before the final rint — asserted in
  tests), so the driver query ``video_meta`` can emit per-frame decoded
  pixel values and a DuckDB oracle re-derives them from pure
  arithmetic: the check covers the container walk AND the full JPEG
  entropy decode of every frame, with no export channel.

Reference parity note: the reference (openvenues/lieu) is text-only;
this is part of the training-data-pipeline multimodal surface the
build brief adds on top.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int, us_per_frame: int) -> bytes:
    """Minimal valid AVI (RIFF) wrapping pre-encoded JPEG frames as a
    single MJPG video stream: LIST hdrl {avih, LIST strl {strh, strf}},
    LIST movi {00dc...}. Chunks are word-aligned per RIFF."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    if us_per_frame <= 0:
        raise ValueError(f"invalid frame interval {us_per_frame}")

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    rate = max(1, round(1_000_000 / us_per_frame))
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, rate, 0, len(frames), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_meta(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, us_per_frame) from the avih header."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"LIST":
            kind = payload[pos + 8 : pos + 12]
            if kind == b"hdrl":
                pos += 12  # descend
                continue
        elif cid == b"avih":
            if clen < 40 or pos + 8 + 40 > len(payload):
                raise ValueError("truncated AVI avih header")
            v = struct.unpack_from("<IIIIIIIIII", payload, pos + 8)
            us_per_frame, n_frames, width, height = v[0], v[4], v[8], v[9]
            if width == 0 or height == 0 or us_per_frame == 0:
                raise ValueError("malformed AVI avih header")
            return (width, height, n_frames, us_per_frame)
        pos += 8 + clen + (clen & 1)
    raise ValueError("AVI missing avih header")


def _avi_frames(payload: bytes) -> list[bytes]:
    """The '00dc' compressed-video chunks of the 'movi' LIST, in order."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    frames: list[bytes] = []
    in_movi_end = -1
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"LIST":
            kind = payload[pos + 8 : pos + 12]
            if kind == b"movi":
                in_movi_end = pos + 8 + clen
                pos += 12  # descend
                continue
        elif cid == b"00dc" and pos < in_movi_end:
            if pos + 8 + clen > len(payload):
                raise ValueError("truncated AVI frame chunk")
            frames.append(payload[pos + 8 : pos + 8 + clen])
        pos += 8 + clen + (clen & 1)
    if not frames:
        raise ValueError("AVI movi LIST has no 00dc frames")
    return frames


VIDEO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("us_per_frame", LongType()),
        StructField("duration_us", LongType()),
        StructField("n_uniform_frames", LongType()),
        StructField("pix_sum", LongType()),
    ]
)


def synthetic_video_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MJPEG/AVI fixture: every property is a pure integer
    function of the id, and each frame is a SOLID color that roundtrips
    exactly through the q100 JPEG path:

        width        = 8 * (1 + id % 2)
        height       = 8 * (1 + (id % 4) // 2)
        n_frames     = 3 + id % 6
        us_per_frame = 33333 + (id % 5) * 1000
        frame f rgb  = ((id*11 + f*29) % 256,
                        (id*7  + f*13) % 256,
                        (id*3  + f*5)  % 256)
    """
    import numpy as np

    from .jpeg import encode_jpeg_baseline

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w = 8 * (1 + i % 2)
                h = 8 * (1 + (i % 4) // 2)
                nf = 3 + i % 6
                frames = []
                for f in range(nf):
                    rgb = (
                        (i * 11 + f * 29) % 256,
                        (i * 7 + f * 13) % 256,
                        (i * 3 + f * 5) % 256,
                    )
                    img = np.empty((h, w, 3), dtype=np.uint8)
                    img[..., 0], img[..., 1], img[..., 2] = rgb
                    frames.append(encode_jpeg_baseline(img, quality=100))
                payloads.append(
                    encode_avi_mjpeg(frames, w, h, 33333 + (i % 5) * 1000)
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        gen, schema
    )


def decode_video_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas REAL decode: walk the AVI container AND fully
    entropy-decode every MJPEG frame. Emits per video:

    - structural metadata from the avih header;
    - ``n_uniform_frames``: frames whose decoded pixels are constant
      per channel (a full-frame property of the ACTUAL decode);
    - ``pix_sum``: sum over frames of the decoded first pixel packed as
      r*65536 + g*256 + b — value-level evidence of the JPEG decode
      that a DuckDB oracle re-derives from arithmetic alone.
    """
    import numpy as np

    from .jpeg import _jpeg_pixels

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list[int]] = {
                k: []
                for k in (
                    "width", "height", "n_frames", "us_per_frame",
                    "duration_us", "n_uniform_frames", "pix_sum",
                )
            }
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                w, h, nf, uspf = parse_avi_meta(raw)
                frames = _avi_frames(raw)
                if len(frames) != nf:
                    raise ValueError(
                        f"AVI header says {nf} frames, movi has {len(frames)}"
                    )
                uniform = 0
                psum = 0
                for fb in frames:
                    img = _jpeg_pixels(fb)
                    if img.shape[:2] != (h, w):
                        raise ValueError("frame dims disagree with avih")
                    if all(
                        int(img[..., ch].max()) == int(img[..., ch].min())
                        for ch in range(img.shape[2])
                    ):
                        uniform += 1
                    r, g, b = (int(img[0, 0, ch]) for ch in range(3))
                    psum += r * 65536 + g * 256 + b
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_frames"].append(nf)
                cols["us_per_frame"].append(uspf)
                cols["duration_us"].append(nf * uspf)
                cols["n_uniform_frames"].append(uniform)
                cols["pix_sum"].append(psum)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(cols["width"], dtype="int32"),
                    "height": pd.array(cols["height"], dtype="int32"),
                    "n_frames": pd.array(cols["n_frames"], dtype="int64"),
                    "us_per_frame": pd.array(cols["us_per_frame"], dtype="int64"),
                    "duration_us": pd.array(cols["duration_us"], dtype="int64"),
                    "n_uniform_frames": pd.array(cols["n_uniform_frames"], dtype="int64"),
                    "pix_sum": pd.array(cols["pix_sum"], dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, VIDEO_META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def extract_frames(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling: UDTF-style fan-out of the AVI's '00dc'
    chunks — each output row carries a complete, decodable JPEG. The
    now-real counterpart of ``multimodal.sample_frames`` (which slices
    opaque bytes); same output schema, so downstream featurizers are
    interchangeable."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for fi, fb in enumerate(_avi_frames(bytes(payload))[: max_frames * every_n]):
                    if fi % every_n:
                        continue
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    frames.append(fb)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SCHEMA)


def synthetic_clip_payloads(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 4
) -> DataFrame:
    """Deterministic near-dup clip fixture: clip ``i``'s frame ``f`` is
    the Walsh-16 master tile of group ``(i + f) % 16`` (no flips),
    8x-upscaled to 64x64 and q90-JPEG'd inside a real AVI — every
    entropy-coded block is constant (DC-only), so the frame's
    perceptual aHash recovers the tile bits exactly (the
    functions/imagehash.py argument). Clips whose bases are close share
    a cyclic-interval overlap of frames: base offset 0 -> Jaccard 1,
    offset 1 -> 3/5, offset 2 -> 1/3, offset 3 -> 1/7, >= n_frames ->
    disjoint — the oracle re-derives all of it from doc_id arithmetic."""
    import numpy as np

    from .imagehash import _PHOTO_HI, _PHOTO_LO, _walsh16
    from .jpeg import encode_jpeg_baseline

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                frames = []
                for f in range(n_frames):
                    bits = _walsh16((i + f) % 16) * 0x0001000100010001
                    flat = np.array(
                        [(bits >> j) & 1 for j in range(64)], dtype=np.uint8
                    )
                    tile = np.where(flat == 1, _PHOTO_HI, _PHOTO_LO).astype(
                        np.uint8
                    ).reshape(8, 8)
                    big = np.repeat(np.repeat(tile, 8, axis=0), 8, axis=1)
                    frames.append(encode_jpeg_baseline(big, quality=90))
                payloads.append(encode_avi_mjpeg(frames, 64, 64, 33333))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        gen, schema
    )


def video_frame_hashes(
    clips: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """AVI clips -> distinct (doc_id, fp) per-frame perceptual
    fingerprints: real '00dc' JPEG frames fanned out by
    ``extract_frames``, each entropy-decoded and aHash'd by the image
    kernel. Feeds operators/mediadedup.fingerprint_jaccard_pairs."""
    from .imagehash import perceptual_hash_table

    frames = extract_frames(clips, id_col=id_col, payload_col=payload_col)
    return (
        perceptual_hash_table(frames, id_col="doc_id", payload_col="frame")
        .select("doc_id", F.col("ahash").alias("fp"))
        .distinct()
    )
