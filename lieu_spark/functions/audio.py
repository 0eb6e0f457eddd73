"""Audio modality: REAL WAV (RIFF/PCM) codec + numpy DSP, zero deps.

Unlike the image path (where JPEG entropy decode genuinely needs a
codec library), uncompressed PCM WAV decodes completely with stdlib
``struct`` + numpy — so the audio modality is real end to end here:

- ``parse_wav_meta`` / ``_wav_samples``: RIFF chunk walk (fmt + data),
  16-bit little-endian PCM to an (n_frames, channels) int16 array;
  loud ValueError on compressed codecs, other bit depths, or a
  malformed chunk stream — no guessing;
- ``encode_wav``: the exact inverse (canonical 44-byte header), so
  roundtrips are byte-stable;
- ``resample_audio``: linear-interpolation rate conversion, decoded
  and re-encoded in-container (numpy index/interp math);
- ``audio_features``: framed FFT band energies (numpy ``rfft``) folded
  to a fixed dim, L2-normalized ``array<float>`` — ANN-ready, feeds
  operators/ann.py exactly like the image/byte featurizers;
- ``synthetic_audio_payloads`` + ``decode_audio_meta``: a deterministic
  fixture whose rate/channels/frames AND the xor-checksum of every
  decoded sample are pure integer functions of doc_id, so a DuckDB
  oracle re-derives the full decode from arithmetic alone (driver
  query ``audio_meta`` — no export channel needed).

Reference parity note: the reference (openvenues/lieu) is text-only;
this module is part of the training-data-pipeline surface the build
brief adds on top (multimodal columns as first-class binary payloads).
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
    StructField,
    StructType,
)

AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_us", LongType()),
        StructField("xor_samples", LongType()),
    ]
)


def encode_wav(samples, sample_rate: int) -> bytes:
    """Encode an (n_frames, channels) int16 array as a canonical
    44-byte-header RIFF/WAVE PCM file — the exact inverse of
    ``_wav_samples`` (roundtrip is byte-stable)."""
    import struct

    import numpy as np

    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim != 2:
        raise ValueError(f"samples must be (n_frames, channels), got {samples.shape}")
    n_frames, channels = samples.shape
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def parse_wav_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Pure-struct RIFF chunk walk: (sample_rate, channels, bits,
    n_frames). Accepts any chunk ordering/extras (walks until fmt and
    data are both seen); raises ValueError on non-PCM format codes,
    truncation, or a missing chunk."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            if clen < 16 or pos + 8 + 16 > len(payload):
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            if pos + 8 + clen > len(payload):
                raise ValueError("truncated WAV data chunk")
            data_len = clen
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + clen + (clen & 1)
        if fmt is not None and data_len is not None:
            break
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _brate, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(
            f"WAV format code {audio_format} (compressed?) not supported — PCM only"
        )
    if channels == 0 or bits == 0:
        raise ValueError(f"malformed WAV fmt: channels={channels} bits={bits}")
    n_frames = data_len // (channels * (bits // 8))
    return (sample_rate, channels, bits, n_frames)


def _wav_samples(payload: bytes):
    """Decode 16-bit PCM WAV to an (n_frames, channels) int16 array.
    Raises ValueError on any other bit depth — widening 8/24-bit is a
    representation decision this dependency-free path refuses to make
    silently."""
    import struct

    import numpy as np

    sample_rate, channels, bits, n_frames = parse_wav_meta(payload)
    if bits != 16:
        raise ValueError(f"only 16-bit PCM decodes here, got {bits}-bit")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"data":
            raw = np.frombuffer(payload, dtype="<i2", count=n_frames * channels, offset=pos + 8)
            return raw.reshape(n_frames, channels).copy()
        pos += 8 + clen + (clen & 1)
    raise ValueError("WAV missing data chunk")  # unreachable after parse


def resample_audio(payload: bytes, target_rate: int) -> bytes:
    """Real rate conversion: decode PCM, linear-interpolate each channel
    onto the target sample grid (numpy ``interp`` over frame times),
    re-encode at the new rate. Output frame count =
    round(n_frames * target_rate / source_rate)."""
    import numpy as np

    if target_rate <= 0:
        raise ValueError(f"invalid target rate {target_rate}")
    src_rate, channels, _bits, n_frames = parse_wav_meta(payload)
    samples = _wav_samples(payload).astype(np.float64)
    n_out = max(1, round(n_frames * target_rate / src_rate))
    src_t = np.arange(n_frames, dtype=np.float64) / src_rate
    out_t = np.arange(n_out, dtype=np.float64) / target_rate
    out = np.empty((n_out, channels), dtype=np.float64)
    for ch in range(channels):
        out[:, ch] = np.interp(out_t, src_t, samples[:, ch])
    return encode_wav(np.clip(np.rint(out), -32768, 32767).astype("<i2"), target_rate)


def synthetic_audio_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV fixture: each id gets a REAL 16-bit PCM payload
    whose every property is a pure integer function of the id — so a
    SQL oracle re-derives the full decode from arithmetic alone:

        sample_rate = 8000 * (1 + id % 3)
        channels    = 1 + id % 2
        n_frames    = 64 + (id * 13) % 192
        sample[t,c] = (id*7 + t*31 + c*17) % 65536 - 32768   (int16)
    """
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                rate = 8000 * (1 + i % 3)
                channels = 1 + i % 2
                n_frames = 64 + (i * 13) % 192
                t = np.arange(n_frames, dtype=np.int64)[:, None]
                c = np.arange(channels, dtype=np.int64)[None, :]
                vals = (i * 7 + t * 31 + c * 17) % 65536 - 32768
                payloads.append(encode_wav(vals.astype("<i2"), rate))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        gen, schema
    )


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas REAL decode: parse every WAV header AND decode every
    sample, emitting (rate, channels, bits, n_frames, duration_us,
    xor_samples) per payload. ``xor_samples`` is the xor-fold of the
    decoded samples' unsigned 16-bit representation — a value-level
    checksum of the full PCM decode, not just the header walk.
    ``duration_us = n_frames * 1_000_000 // sample_rate`` (exact
    integer math, engine-portable)."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("n_bytes", "sample_rate", "channels", "bits", "n_frames", "duration_us", "xor_samples")}
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                rate, channels, bits, n_frames = parse_wav_meta(raw)
                samples = _wav_samples(raw)
                xor = int(np.bitwise_xor.reduce(samples.view(np.uint16), axis=None)) if samples.size else 0
                rows["n_bytes"].append(len(raw))
                rows["sample_rate"].append(rate)
                rows["channels"].append(channels)
                rows["bits"].append(bits)
                rows["n_frames"].append(n_frames)
                rows["duration_us"].append(n_frames * 1_000_000 // rate)
                rows["xor_samples"].append(xor)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array(rows["n_bytes"], dtype="int64"),
                    "sample_rate": pd.array(rows["sample_rate"], dtype="int32"),
                    "channels": pd.array(rows["channels"], dtype="int32"),
                    "bits": pd.array(rows["bits"], dtype="int32"),
                    "n_frames": pd.array(rows["n_frames"], dtype="int64"),
                    "duration_us": pd.array(rows["duration_us"], dtype="int64"),
                    "xor_samples": pd.array(rows["xor_samples"], dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, AUDIO_META_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def audio_features(
    df: DataFrame,
    dim: int = 16,
    frame_len: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Real DSP featurizer: decode PCM, mix channels down, split into
    ``frame_len``-sample frames, FFT each (numpy ``rfft``), average the
    magnitude spectrum over frames, fold to ``dim`` log-energy bands,
    L2-normalize — an ANN-ready ``array<float>`` feeding
    operators/ann.py exactly like the image featurizer. All numpy per
    Arrow batch; no per-row Python in the hot loop beyond the payload
    iteration itself."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                mono = _wav_samples(bytes(payload)).astype(np.float64).mean(axis=1)
                n = (mono.size // frame_len) * frame_len
                if n == 0:  # shorter than one frame: zero-pad a single frame
                    frames = np.zeros((1, frame_len))
                    frames[0, : mono.size] = mono
                else:
                    frames = mono[:n].reshape(-1, frame_len)
                spec = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
                bands = np.zeros(dim)
                idx = (np.arange(spec.size) * dim) // spec.size
                np.add.at(bands, idx, spec)
                bands = np.log1p(bands)
                nrm = float(np.sqrt((bands * bands).sum()))
                feats.append((bands / nrm if nrm > 0 else bands).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "feature": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(featurize, AUDIO_FEATURE_SCHEMA)


def synthetic_track_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    n_windows: int = 4,
    win: int = 256,
    groups: int = 12,
) -> DataFrame:
    """Deterministic near-dup track fixture: track ``i`` is mono 16 kHz
    PCM of ``n_windows`` windows of ``win`` samples; window ``w``'s
    content belongs to group ``g = (i + w) % groups`` with sample
    ``t`` (within the window) = (g*31 + t*17) % 65536 - 32768. Tracks
    with nearby bases share a cyclic interval of windows — the same
    overlap structure as the video clip fixture, re-derivable from
    doc_id arithmetic in SQL."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                t = np.arange(win, dtype=np.int64)
                parts = []
                for w in range(n_windows):
                    g = (i + w) % groups
                    parts.append((g * 31 + t * 17) % 65536 - 32768)
                samples = np.concatenate(parts)[:, None].astype("<i2")
                payloads.append(encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        gen, schema
    )


AUDIO_FP_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("fp", LongType())]
)


def audio_fingerprint_table(
    df: DataFrame,
    win: int = 256,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL decode -> per-window exact fingerprints: 16-bit PCM samples
    (channel-0) fold into one 48-bit value per non-overlapping window of
    ``win`` samples — sample t contributes its uint16 at bit lane
    16*(t%3), xor-accumulated (lanes stop at 47 so the value is exact
    signed-64 in BOTH engines; no sign-bit wrap to reason about).
    Trailing partial windows are dropped (their fold would depend on
    length, breaking cross-length matches). Production would use
    spectral landmark hashes (float FFT — not cross-engine exact); the
    xor-lane fold keeps the SAME set-Jaccard dedup shape while staying
    integer-exact for the oracle. Output: distinct (doc_id, fp)."""
    import numpy as np

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples = _wav_samples(bytes(payload))[:, 0].astype(np.uint16)
                n_full = len(samples) // win
                lanes = (np.arange(win, dtype=np.int64) % 3) * 16
                for w in range(n_full):
                    chunk = samples[w * win : (w + 1) * win].astype(np.int64)
                    fp = np.bitwise_xor.reduce(chunk << lanes)
                    ids.append(int(doc_id))
                    fps.append(int(fp))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "fp": pd.array(fps, dtype="int64"),
                }
            )

    return (
        df.select(id_col, payload_col)
        .mapInPandas(fingerprint, AUDIO_FP_SCHEMA)
        .distinct()
    )
