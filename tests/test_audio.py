"""Audio modality: real WAV/RIFF PCM codec, resampling, FFT features,
and the Spark-side plumbing (mapInPandas decode, fixture determinism,
ANN-ready feature output). Zero codec dependencies — 16-bit PCM WAV
decodes completely with stdlib struct + numpy, so unlike JPEG this
modality has no stubbed path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lieu_spark.functions.audio import (
    _wav_samples,
    audio_features,
    decode_audio_meta,
    encode_wav,
    parse_wav_meta,
    resample_audio,
    synthetic_audio_payloads,
)


def test_wav_codec_roundtrip_and_refusals():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=(200, 2), dtype=np.int16)
    p = encode_wav(s, 16000)
    assert parse_wav_meta(p) == (16000, 2, 16, 200)
    assert np.array_equal(_wav_samples(p), s)
    assert encode_wav(_wav_samples(p), 16000) == p  # byte-stable

    # extra chunks before data (LIST/INFO-style) still parse: splice a
    # junk chunk between fmt and data
    import struct

    junk = b"LIST" + struct.pack("<I", 5) + b"xxxxx" + b"\x00"  # odd + pad
    spliced = p[:36] + junk + p[36:]
    assert parse_wav_meta(spliced) == (16000, 2, 16, 200)
    assert np.array_equal(_wav_samples(spliced), s)

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav_meta(b"OggS" + b"\x00" * 40)
    bad = bytearray(p)
    bad[20] = 3  # format code -> IEEE float
    with pytest.raises(ValueError, match="PCM only"):
        parse_wav_meta(bytes(bad))
    bad = bytearray(p)
    bad[34] = 8  # bits -> 8
    with pytest.raises(ValueError, match="16-bit"):
        _wav_samples(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        parse_wav_meta(p[:60])


def test_resample_linear():
    # halve and 1.5x the rate: frame counts follow round(n * ratio)
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, size=(200, 2), dtype=np.int16)
    p = encode_wav(s, 16000)
    assert parse_wav_meta(resample_audio(p, 8000)) == (8000, 2, 16, 100)
    assert parse_wav_meta(resample_audio(p, 24000)) == (24000, 2, 16, 300)
    # constant signal is invariant under linear interpolation
    c = encode_wav(np.full((100, 1), 123, dtype=np.int16), 8000)
    rc = resample_audio(c, 12000)
    assert np.all(_wav_samples(rc) == 123)
    # identity resample keeps the samples exactly
    same = resample_audio(p, 16000)
    assert np.array_equal(_wav_samples(same), s)
    with pytest.raises(ValueError):
        resample_audio(p, 0)


def test_fixture_xor_matches_decoded_samples():
    """The arithmetic xor the DuckDB oracle computes == the xor of the
    samples actually decoded from the PCM bytes, for several ids."""
    for i in (0, 1, 2, 37, 254):
        rate, ch, nf = 8000 * (1 + i % 3), 1 + i % 2, 64 + (i * 13) % 192
        t = np.arange(nf, dtype=np.int64)[:, None]
        c = np.arange(ch, dtype=np.int64)[None, :]
        vals = ((i * 7 + t * 31 + c * 17) % 65536 - 32768).astype(np.int16)
        wav = encode_wav(vals, rate)
        decoded = _wav_samples(wav)
        assert np.array_equal(decoded, vals)
        xor_decoded = int(np.bitwise_xor.reduce(decoded.view(np.uint16), axis=None))
        xor_arith = 0
        for tt in range(nf):
            for c2 in range(ch):
                xor_arith ^= (i * 7 + tt * 31 + c2 * 17) % 65536
        assert xor_decoded == xor_arith


def test_spark_audio_meta_plumbing(spark):
    ids = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    meta = decode_audio_meta(synthetic_audio_payloads(ids))
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert len(rows) == 60
    for i in (0, 1, 5, 59):
        r = rows[i]
        assert r["sample_rate"] == 8000 * (1 + i % 3)
        assert r["channels"] == 1 + i % 2
        assert r["bits"] == 16
        assert r["n_frames"] == 64 + (i * 13) % 192
        assert r["n_bytes"] == 44 + r["n_frames"] * r["channels"] * 2
        assert r["duration_us"] == r["n_frames"] * 1_000_000 // r["sample_rate"]


def test_audio_features_feed_ann(spark):
    """FFT band features are deterministic, unit-norm, fixed-dim —
    ANN-ready exactly like the image featurizer — and identical
    payloads land in identical hyperplane buckets."""
    from lieu_spark.operators.ann import hyperplane_buckets

    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    pay = synthetic_audio_payloads(ids)
    feats = audio_features(pay, dim=16)
    pdf = feats.toPandas().set_index("doc_id")
    assert len(pdf) == 40
    for v in pdf["feature"]:
        arr = np.asarray(v, dtype=np.float64)
        assert arr.shape == (16,)
        assert abs(float(np.sqrt((arr * arr).sum())) - 1.0) < 1e-5
    # determinism across a recompute
    pdf2 = audio_features(pay, dim=16).toPandas().set_index("doc_id")
    for i in pdf.index:
        assert np.allclose(pdf.loc[i, "feature"], pdf2.loc[i, "feature"])
    # plumbed into ANN: bucket assignment runs and same-vector ids collide
    e = feats.select(
        F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    dup = e.union(e.select(F.col("vec_id") + 1000, "embedding"))
    b = hyperplane_buckets(dup)
    pairs = (
        b.alias("l")
        .join(b.alias("r"), ["table", "bucket"])
        .filter(F.col("l.id") + 1000 == F.col("r.id"))
        .select("l.id")
        .distinct()
        .count()
    )
    assert pairs == 40  # every planted copy shares every bucket
