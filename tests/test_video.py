"""Video modality: real AVI/MJPEG container codec over the baseline
JPEG decoder, plus the Spark-side plumbing (meta decode, frame
extraction fan-out, fixture determinism). Zero codec dependencies."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lieu_spark.functions.jpeg import _jpeg_pixels, encode_jpeg_baseline
from lieu_spark.functions.video import (
    _avi_frames,
    decode_video_meta,
    encode_avi_mjpeg,
    extract_frames,
    parse_avi_meta,
    synthetic_video_payloads,
)


def test_avi_container_roundtrip_and_refusals():
    frames = [
        encode_jpeg_baseline(np.full((8, 16, 3), v, np.uint8), 100)
        for v in (10, 200, 99)
    ]
    avi = encode_avi_mjpeg(frames, 16, 8, 40000)
    assert parse_avi_meta(avi) == (16, 8, 3, 40000)
    assert _avi_frames(avi) == frames  # frame bytes carried verbatim
    for fb, v in zip(_avi_frames(avi), (10, 200, 99)):
        img = _jpeg_pixels(fb)
        assert img.shape == (8, 16, 3) and np.all(img == v)

    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_meta(b"RIFF\x10\x00\x00\x00WAVExxxxxxxx")
    with pytest.raises(ValueError):
        _avi_frames(avi[:40])
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 8, 8, 40000)
    with pytest.raises(ValueError):
        encode_avi_mjpeg(frames, 8, 8, 0)


def test_solid_q100_frames_roundtrip_exactly():
    """The fixture's exactness premise: solid-color 8x8-aligned frames
    survive the q100 JPEG path bit-exact, across the color range the
    fixture formulas produce."""
    for i in (0, 1, 7, 123, 200, 255, 499):
        for f in range(8):
            rgb = ((i * 11 + f * 29) % 256, (i * 7 + f * 13) % 256, (i * 3 + f * 5) % 256)
            img = np.empty((16, 8, 3), dtype=np.uint8)
            img[..., 0], img[..., 1], img[..., 2] = rgb
            assert np.array_equal(
                _jpeg_pixels(encode_jpeg_baseline(img, quality=100)), img
            ), (i, f, rgb)


def test_spark_video_meta_plumbing(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    meta = decode_video_meta(synthetic_video_payloads(ids))
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert len(rows) == 40
    for i in (0, 1, 5, 39):
        r = rows[i]
        nf = 3 + i % 6
        assert r["width"] == 8 * (1 + i % 2)
        assert r["height"] == 8 * (1 + (i % 4) // 2)
        assert r["n_frames"] == nf
        assert r["us_per_frame"] == 33333 + (i % 5) * 1000
        assert r["duration_us"] == nf * r["us_per_frame"]
        assert r["n_uniform_frames"] == nf  # every frame decoded constant
        expect = sum(
            ((i * 11 + f * 29) % 256) * 65536
            + ((i * 7 + f * 13) % 256) * 256
            + ((i * 3 + f * 5) % 256)
            for f in range(nf)
        )
        assert r["pix_sum"] == expect


def test_extract_frames_fanout(spark):
    """Every extracted row is a complete decodable JPEG; every_n strides
    and max_frames caps behave; schema matches sample_frames."""
    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    pay = synthetic_video_payloads(ids)
    rows = extract_frames(pay).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(12):
        nf = 3 + i % 6
        got = sorted(per_doc[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(nf))
        for f, r in enumerate(got):
            img = _jpeg_pixels(bytes(r["frame"]))
            assert int(img[0, 0, 0]) == (i * 11 + f * 29) % 256
    # stride: every_n=2 keeps even frame indices only
    strided = extract_frames(pay, every_n=2).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in strided)
    # cap: max_frames=1 keeps one frame per doc
    capped = extract_frames(pay, max_frames=1).collect()
    assert len(capped) == 12
