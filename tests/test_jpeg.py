"""Baseline JPEG codec (functions/jpeg.py): component-level checks
against the PUBLIC spec (zigzag sequence, DCT definition) so encoder/
decoder conjugate bugs cannot cancel, then end-to-end bounds.

The strongest check is codec-vs-simulation equality: a full
encode->decode must reproduce EXACTLY the image given by DCT ->
quantize -> dequantize -> IDCT with no entropy coding — proving the
Huffman tables, bit packing, byte stuffing, zigzag, and DC prediction
are collectively lossless, so all loss is the inherent quantization."""

import numpy as np
import pytest

from lieu_spark.functions.jpeg import (
    DCT_T,
    ZIGZAG,
    _jpeg_pixels,
    _quality_tables,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    encode_jpeg_baseline,
)


def test_zigzag_pinned_to_spec():
    """First ten entries and the last entry of the T.81 zigzag scan."""
    expected = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    got = [(int(z) // 8, int(z) % 8) for z in ZIGZAG[:10]]
    assert got == expected
    assert (int(ZIGZAG[63]) // 8, int(ZIGZAG[63]) % 8) == (7, 7)
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_dct_matches_direct_definition():
    """T @ f @ T.T equals the spec's 1/4*c(u)*c(v) double-cosine form,
    and T is orthonormal (so the inverse is exactly T.T @ F @ T)."""
    assert np.allclose(DCT_T @ DCT_T.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(1)
    f = rng.normal(size=(8, 8))
    F = DCT_T @ f @ DCT_T.T

    def direct(u, v):
        c = lambda k: (1 / np.sqrt(2) if k == 0 else 1.0)  # noqa: E731
        s = sum(
            f[x, y]
            * np.cos((2 * x + 1) * u * np.pi / 16)
            * np.cos((2 * y + 1) * v * np.pi / 16)
            for x in range(8)
            for y in range(8)
        )
        return 0.25 * c(u) * c(v) * s

    for u, v in [(0, 0), (0, 3), (5, 2), (7, 7)]:
        assert abs(F[u, v] - direct(u, v)) < 1e-10


def _quant_sim(img: np.ndarray, quality: int) -> np.ndarray:
    """Independent DCT->quantize->dequantize->IDCT simulation with no
    entropy coding — the theoretical output of a faithful codec."""
    ql, qc = _quality_tables(quality)
    h, w = img.shape[:2]
    gray = img.shape[2] == 1
    planes = (
        img[..., 0].astype(np.float64)[..., None]
        if gray
        else _rgb_to_ycbcr(img.astype(np.float64))
    )
    bh, bw = -(-h // 8), -(-w // 8)
    out = np.empty((bh * 8, bw * 8, planes.shape[2]))
    for ci in range(planes.shape[2]):
        q = (ql if ci == 0 else qc).reshape(8, 8)
        p = np.pad(planes[..., ci], ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge") - 128.0
        for y0 in range(0, bh * 8, 8):
            for x0 in range(0, bw * 8, 8):
                f = DCT_T @ p[y0 : y0 + 8, x0 : x0 + 8] @ DCT_T.T
                f = np.rint(f / q) * q
                out[y0 : y0 + 8, x0 : x0 + 8, ci] = DCT_T.T @ f @ DCT_T + 128.0
    out = out[:h, :w]
    if not gray:
        out = _ycbcr_to_rgb(out)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [35, 75, 90])
def test_codec_equals_quantization_simulation(quality):
    """Full encode->decode is BIT-EQUAL to the quantize-only simulation:
    the entropy layer is lossless. Odd dimensions exercise edge pads."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(29, 37, 3), dtype=np.uint8)
    full = _jpeg_pixels(encode_jpeg_baseline(img, quality=quality))
    assert np.array_equal(full, _quant_sim(img, quality))


def test_uniform_color_q100_exact():
    img = np.full((24, 16, 3), 200, dtype=np.uint8)
    back = _jpeg_pixels(encode_jpeg_baseline(img, quality=100))
    assert back.shape == (24, 16, 3)
    assert int(np.abs(back.astype(int) - 200).max()) <= 1


def test_grayscale_roundtrip():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(17, 19), dtype=np.uint8)
    payload = encode_jpeg_baseline(g, quality=100)
    back = _jpeg_pixels(payload)
    assert back.shape == (17, 19, 1)
    assert int(np.abs(back[..., 0].astype(int) - g.astype(int)).max()) <= 1
    # bit-equal to the simulation at a lossy quality too
    assert np.array_equal(
        _jpeg_pixels(encode_jpeg_baseline(g, quality=50)),
        _quant_sim(g[..., None], 50),
    )


def test_byte_stuffing_writer_reader_pair():
    """0xFF bytes in the entropy stream are stuffed (FF 00) by the
    writer and transparently unstuffed by the reader."""
    from lieu_spark.functions.jpeg import _BitReader, _BitWriter

    wr = _BitWriter()
    for v, n in ((0xFF, 8), (0xFFFF, 16), (0b101, 3), (0, 5)):
        wr.write(v, n)
    data = wr.flush()
    assert data.startswith(b"\xff\x00\xff\x00\xff\x00")  # 3 stuffed FFs
    rd = _BitReader(data, 0)
    assert rd.bits(8) == 0xFF
    assert rd.bits(16) == 0xFFFF
    assert rd.bits(3) == 0b101
    assert rd.bits(5) == 0


def test_header_parser_reads_codec_output():
    from lieu_spark.functions.multimodal import parse_image_dims

    img = np.zeros((10, 14, 3), dtype=np.uint8)
    assert parse_image_dims(encode_jpeg_baseline(img)) == ("jpeg", 14, 10, 3)
    g = np.zeros((10, 14), dtype=np.uint8)
    assert parse_image_dims(encode_jpeg_baseline(g)) == ("jpeg", 14, 10, 1)


def test_resize_through_container():
    from lieu_spark.functions.multimodal import parse_image_dims, resize_image_real

    yy, xx = np.mgrid[0:32, 0:24]
    img = np.stack([yy * 8, xx * 10, (yy + xx) * 4], axis=-1).astype(np.uint8)
    out = resize_image_real(encode_jpeg_baseline(img, quality=95), 12, 16)
    assert parse_image_dims(out) == ("jpeg", 12, 16, 3)
    decoded = _jpeg_pixels(out).astype(int)
    # lossy but close: downsampled gradient should track the source
    src = img[::2, ::2].astype(int)
    assert np.abs(decoded - src).mean() < 12


def test_refusals():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    good = encode_jpeg_baseline(img, quality=90)
    # progressive frame marker rejected loudly
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        _jpeg_pixels(prog)
    with pytest.raises(ValueError, match="SOI"):
        _jpeg_pixels(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        _jpeg_pixels(good[: len(good) // 2])
    with pytest.raises(ValueError):
        encode_jpeg_baseline(img, quality=0)
    with pytest.raises(ValueError):
        encode_jpeg_baseline(np.zeros((0, 4, 3), dtype=np.uint8))
