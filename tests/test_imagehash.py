"""Perceptual image hashing + image near-dup (functions/imagehash.py).

The fixture arithmetic (Walsh tiles + per-doc flips) is the DuckDB
oracle's twin; these tests pin the kernel side: the REAL container
decode chain (BMP / PNG zlib / GIF LZW / JPEG Huffman) must recover the
expected bit pattern exactly, across containers, resolutions, and the
lossy arm, and the blocked pair pipeline must equal brute force.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lieu_spark.functions.imagehash import (
    PHOTO_GROUPS,
    _decode_pixels,
    _luma,
    _walsh16,
    ahash64,
    dhash64,
    expected_ahash,
    image_neardup_pairs,
    perceptual_hash_table,
    photo_payload,
    synthetic_photo_payloads,
)


def test_walsh_code_separation():
    words = [_walsh16(g) for g in range(PHOTO_GROUPS)]
    dists = [
        bin(a ^ b).count("1")
        for i, a in enumerate(words)
        for b in words[i + 1 :]
    ]
    assert min(dists) == 8  # repeated 4x in the tile -> 32-bit separation


def test_ahash_known_pattern():
    # hand-built image: top half 200, bottom half 40 -> bits 0..31 set
    img = np.full((8, 8), 40, np.uint8)
    img[:4] = 200
    assert ahash64(img) == (1 << 32) - 1


def test_dhash_known_pattern():
    # strictly increasing rows -> every right neighbor larger -> all 64 set
    img = np.tile(np.arange(16, dtype=np.uint8) * 10, (8, 1))
    assert dhash64(img) == -1  # all 64 bits -> signed -1


@pytest.mark.parametrize("doc_id", list(range(0, 48)) + [101, 202, 303, 404, 479])
def test_real_decode_recovers_expected_bits(doc_id):
    fmt, img = _decode_pixels(photo_payload(doc_id))
    assert fmt == ["bmp", "png", "jpeg", "gif"][(doc_id // 16) % 4]
    assert ahash64(_luma(img, fmt)) == expected_ahash(doc_id)


def test_cross_container_cross_size_invariance():
    # same group (i % 16 == 5), no flips (i % 3 == 0): BMP/PNG/JPEG/GIF at
    # different sizes must agree on BOTH hashes exactly
    ids = [i for i in range(480) if i % 16 == 5 and i % 3 == 0][:8]
    assert len({(i // 16) % 4 for i in ids}) == 4  # all four containers
    hashes = set()
    for i in ids:
        fmt, img = _decode_pixels(photo_payload(i))
        gray = _luma(img, fmt)
        hashes.add((ahash64(gray), dhash64(gray)))
    assert len(hashes) == 1


def test_cross_group_separation_exceeds_threshold():
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = list(range(32))  # two full group cycles with flips
    for i in ids:
        for j in ids:
            if i < j and i % 16 != j % 16:
                assert ham(expected_ahash(i), expected_ahash(j)) >= 20


def test_neardup_pipeline_equals_brute_force(spark):
    ids = spark.range(0, 128).select(F.col("id").alias("doc_id"))
    hashes = perceptual_hash_table(synthetic_photo_payloads(ids))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in image_neardup_pairs(hashes, hamming_max=6, chunks=8).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    exp = set()
    for a in range(128):
        for b in range(a + 1, 128):
            d = ham(expected_ahash(a), expected_ahash(b))
            if d <= 6:
                exp.add((a, b, d))
    assert got == exp
    assert len(exp) > 0  # non-vacuous: planted groups produced pairs


def test_hamming_max_must_fit_pigeonhole(spark):
    ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    hashes = perceptual_hash_table(synthetic_photo_payloads(ids))
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(hashes, hamming_max=8, chunks=8)


def test_image_decon_keep_exact(spark):
    from lieu_spark.functions.imagehash import image_decon_keep

    train = spark.createDataFrame(
        [(1, 0), (2, 7), (3, 63), (4, -1)], "doc_id long, ahash long"
    )
    ev = spark.createDataFrame([(100, 1)], "doc_id long, ahash long")
    # hamming to eval 1: id1 -> 1, id2 -> 2, id3 -> 5 (all dropped at
    # max 6); id4 (-1 = all 64 bits) -> 63 (kept)
    kept = {r.doc_id for r in image_decon_keep(train, ev, 6, 8).collect()}
    assert kept == {4}


def test_image_decon_boundary_hamming(spark):
    from lieu_spark.functions.imagehash import image_decon_keep

    # exactly 6 bits apart -> dropped; exactly 7 -> kept (verify bound,
    # even though pigeonhole candidates cover <= 7)
    train = spark.createDataFrame(
        [(1, 0b111111), (2, 0b1111111)], "doc_id long, ahash long"
    )
    ev = spark.createDataFrame([(100, 0)], "doc_id long, ahash long")
    kept = {r.doc_id for r in image_decon_keep(train, ev, 6, 8).collect()}
    assert kept == {2}


def test_image_decon_rejects_bad_pigeonhole(spark):
    from lieu_spark.functions.imagehash import image_decon_keep

    t = spark.createDataFrame([(1, 0)], "doc_id long, ahash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        image_decon_keep(t, t, hamming_max=8, chunks=8)


def test_hot_chunk_cap_bounds_buckets_subset_semantics(spark):
    from lieu_spark.functions.imagehash import image_neardup_pairs

    # pathological perceptual bucket: 40 identical hashes + 2 outliers
    rows = [(i, 12345) for i in range(40)] + [(100, -1), (101, -2)]
    hashes = spark.createDataFrame(rows, "doc_id long, ahash long")
    exact = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(hashes, 6, 8).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(hashes, 6, 8, hot_chunk_cap=8).collect()
    }
    # documented trade: salting only ever DROPS pairs (bounded buckets),
    # never invents them; the mega-bucket still yields within-sub pairs
    assert capped <= exact
    assert len(capped) > 0
    # outlier pair at hamming((-1)^(-2)) unaffected by the split
    exp_out = {(100, 101)} & exact
    assert exp_out <= capped or not exp_out


def test_quarantine_on_error_isolates_corrupt_payloads(spark):
    from lieu_spark.functions.imagehash import (
        image_neardup_pairs,
        perceptual_hash_table,
        synthetic_photo_payloads,
    )

    ids = spark.range(0, 32).select(F.col("id").alias("doc_id"))
    good = synthetic_photo_payloads(ids)
    bad = spark.createDataFrame(
        [(900, bytearray(b"not an image")), (901, bytearray(b"\x89PNG\r\n\x1a\nXX"))],
        "doc_id long, payload binary",
    )
    mixed = good.unionByName(bad)

    # default contract: corrupt payload fails the stage loudly
    with pytest.raises(Exception):
        perceptual_hash_table(mixed).collect()

    hashes = perceptual_hash_table(mixed, on_error="quarantine")
    rows = {r.doc_id: r for r in hashes.collect()}
    assert rows[900].format == "error" and rows[900].ahash is None
    assert rows[901].format == "error" and rows[901].width is None
    # survivors hash exactly as without the corrupt rows
    assert rows[5].ahash == expected_ahash(5)
    # null hashes never form pairs: same pair set as the clean run
    clean = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(
            perceptual_hash_table(good), 6, 8
        ).collect()
    }
    quarantined = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(
            hashes.filter(F.col("format") != "error"), 6, 8
        ).collect()
    }
    assert clean == quarantined


def test_on_error_rejects_unknown_policy(spark):
    from lieu_spark.functions.imagehash import perceptual_hash_table

    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="on_error"):
        perceptual_hash_table(df, on_error="ignore")


def test_quarantine_catches_every_corrupt_payload_shape(spark):
    """struct.error (truncated IHDR), zlib.error (IDAT not a zlib
    stream), TypeError (NULL payload), IndexError (0x0 image reaching
    the resize) — every shape quarantines; none is a ValueError
    subclass, so the old narrow except died on each."""
    import struct
    import zlib

    from lieu_spark.functions.imagehash import perceptual_hash_table

    def png_chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    short_ihdr = sig + png_chunk(b"IHDR", b"\x00" * 5)  # 5 < 13 bytes
    bad_idat = (
        sig
        + png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + png_chunk(b"IDAT", b"notzlib")
        + png_chunk(b"IEND", b"")
    )
    zero_dims = (
        sig
        + png_chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0))
        + png_chunk(b"IDAT", zlib.compress(b""))
        + png_chunk(b"IEND", b"")
    )
    rows = [
        (1, bytearray(short_ihdr)),
        (2, bytearray(bad_idat)),
        (3, bytearray(zero_dims)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in
           perceptual_hash_table(df, on_error="quarantine").collect()}
    assert len(out) == 4
    assert all(out[i].format == "error" and out[i].ahash is None
               for i in (1, 2, 3, 4)), {i: out[i].format for i in out}
    # default mode still fails loudly on each
    import pytest as _pytest
    for i in range(4):
        with _pytest.raises(Exception):
            perceptual_hash_table(
                spark.createDataFrame([rows[i]], "doc_id long, payload binary")
            ).collect()


def test_decon_hot_chunk_cap_subset_and_clean_rows(spark):
    """Capped decon candidates are a subset of exact decon's; rows the
    exact path keeps are always kept under the cap (the cap can only
    MISS contamination, never invent it)."""
    from lieu_spark.functions.imagehash import (
        image_decon_keep,
        perceptual_hash_table,
        synthetic_photo_payloads,
    )

    train = perceptual_hash_table(
        synthetic_photo_payloads(
            spark.range(0, 64).select(F.col("id").alias("doc_id"))
        )
    )
    ev = perceptual_hash_table(
        synthetic_photo_payloads(
            spark.range(0, 8).select((F.col("id") * 16).alias("doc_id"))
        )
    )
    exact = {r.doc_id for r in image_decon_keep(train, ev).collect()}
    capped = {
        r.doc_id
        for r in image_decon_keep(train, ev, hot_chunk_cap=2).collect()
    }
    assert exact <= capped  # capped may keep MORE (missed contamination)
    # and the exact-clean rows are identical when the cap is loose
    loose = {
        r.doc_id
        for r in image_decon_keep(train, ev, hot_chunk_cap=100000).collect()
    }
    assert loose == exact
