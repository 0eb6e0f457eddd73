"""ANN (brute force vs hyperplane LSH recall) + text-analysis functions
+ multimodal plumbing on the driver-provided tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lieu_spark.functions import analysis as A
from lieu_spark.functions.multimodal import (
    decode_image_metadata,
    decode_image_real,
    sample_frames,
    with_binary_payload,
)
from lieu_spark.operators.ann import (
    brute_force_topk,
    hyperplane_buckets,
    hyperplane_lsh_topk,
    hyperplane_multiprobe_topk,
    hyperplane_probes,
    ivf_centroids,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_lsh_topk_recall_vs_brute_force(spark, embeddings):
    """This corpus's true neighbors sit at cosine ~0.3 (near-random
    vectors) where hyperplane LSH prunes aggressively by design; the
    measured recall must match the theory (~0.55 at nbits=6, T=16),
    not degrade below it."""
    k = 5
    bf = brute_force_topk(embeddings, k)
    lsh = hyperplane_lsh_topk(embeddings, k)
    bf_set = {(r.id_a, r.id_b) for r in bf.collect()}
    lsh_set = {(r.id_a, r.id_b) for r in lsh.collect()}
    recall = len(bf_set & lsh_set) / len(bf_set)
    assert recall >= 0.4, recall


def test_multiprobe_probe0_is_member_bucket(spark, embeddings):
    """probe_rank 0 of hyperplane_probes is bit-identical to
    hyperplane_buckets at the same knobs — the member rows ARE the
    single-probe index, so the stored side never grows with nprobes."""
    b = hyperplane_buckets(embeddings, nbits=8, ntables=8)
    p0 = hyperplane_probes(
        embeddings, nbits=8, ntables=8, nprobes=4
    ).filter("probe_rank = 0").select("id", "table", "bucket")
    assert b.exceptAll(p0).count() == 0 and p0.exceptAll(b).count() == 0


def test_multiprobe_candidates_superset_and_recall(spark, embeddings):
    """Multi-probe candidates contain every single-probe collision
    (probe 0 reproduces them; flips only ADD buckets), so recall@5 is
    monotone in nprobes; measured on this corpus it must strictly beat
    the same-knob single-probe run."""
    k = 5
    bf = {(r.id_a, r.id_b) for r in brute_force_topk(embeddings, k).collect()}
    single = {
        (r.id_a, r.id_b)
        for r in hyperplane_lsh_topk(
            embeddings, k, nbits=8, ntables=8
        ).collect()
    }
    multi = {
        (r.id_a, r.id_b)
        for r in hyperplane_multiprobe_topk(
            embeddings, k, nbits=8, ntables=8, nprobes=8
        ).collect()
    }
    r_single = len(bf & single) / len(bf)
    r_multi = len(bf & multi) / len(bf)
    assert r_multi > r_single, (r_multi, r_single)
    assert r_multi >= 0.4, r_multi


def test_ivf_topk_recall_vs_brute_force(spark, embeddings):
    """IVF on this near-random corpus: probing nprobe/ncentroids of the
    space plus the query-locality bonus gives ~0.77 measured at (8, 4)
    (numpy prototype); assert a safe floor well above the 0.5 blind
    mass fraction."""
    k = 5
    bf = brute_force_topk(embeddings, k)
    ivf = ivf_topk(embeddings, k, ncentroids=8, nprobe=4)
    bf_set = {(r.id_a, r.id_b) for r in bf.collect()}
    ivf_set = {(r.id_a, r.id_b) for r in ivf.collect()}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.6, recall


def test_ivf_cosines_exact_and_deterministic(spark, embeddings):
    """IVF candidates are re-ranked with EXACT cosine, and the whole
    path (sample -> k-means -> assignment) is seed-deterministic."""
    bf = {(r.id_a, r.id_b): r.cosine for r in brute_force_topk(embeddings, 5).collect()}
    rows1 = ivf_topk(embeddings, 5, ncentroids=8, nprobe=4).collect()
    for r in rows1:
        if (r.id_a, r.id_b) in bf:
            assert abs(bf[(r.id_a, r.id_b)] - r.cosine) < 1e-12
    rows2 = ivf_topk(embeddings, 5, ncentroids=8, nprobe=4).collect()
    assert {(r.id_a, r.id_b, r.rank) for r in rows1} == {
        (r.id_a, r.id_b, r.rank) for r in rows2
    }


def test_ivf_finds_planted_neardups(spark, embeddings):
    """The clustered regime IVF is built for: a noisy copy lands in its
    source's cell, so even nprobe=1 must recover nearly all planted
    pairs as rank-1 neighbors."""
    import pandas as pd

    base = embeddings.limit(30).toPandas()
    rng = np.random.default_rng(0)
    rows = []
    for _, r in base.iterrows():
        v = np.array(r.embedding, dtype=np.float64)
        noisy = v + rng.normal(0, 0.02 * np.linalg.norm(v) / 8, v.shape)
        rows.append((int(r.vec_id) + 100000, [float(x) for x in noisy], int(r.label)))
    aug = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    allv = embeddings.select("vec_id", "embedding", "label").unionByName(aug)
    cents = ivf_centroids(allv, ncentroids=8)
    top1 = ivf_topk(allv, k=1, ncentroids=8, nprobe=1, centroids=cents)
    got = {(r.id_a, r.id_b) for r in top1.collect()}
    planted = {(int(r.vec_id) + 100000, int(r.vec_id)) for _, r in base.iterrows()}
    hit = planted & got
    assert len(hit) >= 0.93 * len(planted), (len(hit), len(planted))


def test_lsh_finds_planted_neardups(spark, embeddings):
    """The near-dup use case (cosine >= 0.95): plant noisy copies of 30
    vectors; LSH near-dup search must recover nearly all planted pairs."""
    import pandas as pd

    from lieu_spark.operators.ann import embedding_neardup_pairs

    base = embeddings.limit(30).toPandas()
    rng = np.random.default_rng(0)
    rows = []
    for _, r in base.iterrows():
        v = np.array(r.embedding, dtype=np.float64)
        noisy = v + rng.normal(0, 0.02 * np.linalg.norm(v) / 8, v.shape)
        rows.append((int(r.vec_id) + 100000, [float(x) for x in noisy], int(r.label)))
    aug = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    allv = embeddings.select("vec_id", "embedding", "label").unionByName(aug)
    got = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(allv, threshold=0.95).collect()
    }
    planted = {(int(r.vec_id), int(r.vec_id) + 100000) for _, r in base.iterrows()}
    hit = planted & got
    assert len(hit) >= 0.93 * len(planted), (len(hit), len(planted))


def test_lsh_topk_cosine_values_exact(spark, embeddings):
    """LSH candidates are re-ranked with EXACT cosine — any returned
    (id_a, id_b) must carry the same cosine as brute force."""
    bf = {(r.id_a, r.id_b): r.cosine for r in brute_force_topk(embeddings, 5).collect()}
    for r in hyperplane_lsh_topk(embeddings, 5).collect():
        if (r.id_a, r.id_b) in bf:
            assert abs(bf[(r.id_a, r.id_b)] - r.cosine) < 1e-12


def test_quality_and_langid_ranges(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.select(
        A.quality_score6(F.col("text")).alias("q6"),
        A.lang_guess(F.col("text")).alias("lg"),
        A.doc_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert all(0 <= r.q6 <= 1_000_000 for r in q)
    assert all(r.lg in ("en", "es", "de", "fr", "unknown", "other") for r in q)
    assert all(0 <= r.fp < (1 << 31) - 1 for r in q)


def test_fingerprint_matches_pure_python_oracle(spark):
    """doc_fingerprint rows-only entry gets its oracle here instead of
    DuckDB: rolling polynomial over token xxhash64."""
    from lieu_spark import oracle
    from lieu_spark.functions.analysis import MOD31
    from lieu_spark.hashing import to_unsigned64, xxh64_string

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    got = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", A.doc_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, text in texts.items():
        acc = 0
        for t in oracle.tokens(text):
            acc = (acc * 131 + to_unsigned64(xxh64_string(t)) % (1 << 31)) % MOD31
        assert got[doc_id] == acc, doc_id


def test_multimodal_plumbing(spark):
    docs = with_binary_payload(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    meta = decode_image_metadata(docs)
    rows = meta.collect()
    assert len(rows) == docs.count()
    assert all(r.n_bytes > 0 and r.width >= 64 and r.channels in (1, 2, 3, 4) for r in rows)
    # deterministic: same payload -> same fake dims
    again = {r.doc_id: (r.width, r.height) for r in decode_image_metadata(docs).collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)

    frames = sample_frames(docs.limit(5))
    f = frames.collect()
    assert all(len(r.frame) > 0 and r.frame_idx >= 0 for r in f)

    with pytest.raises(NotImplementedError):
        decode_image_real(b"not-an-image")


def test_multimodal_feature_extraction_feeds_ann(spark):
    """payload -> byte-histogram feature (array<float>, L2-normalized)
    -> hyperplane LSH ANN: the multimodal feature path is ANN-ready."""
    import numpy as np

    from lieu_spark.functions.multimodal import (
        byte_histogram_features,
        resize_image_real,
    )
    from lieu_spark.operators.ann import hyperplane_lsh_topk

    docs = with_binary_payload(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    feats = byte_histogram_features(docs, dim=16)
    rows = feats.collect()
    assert len(rows) == docs.count()
    # L2-normalized, deterministic
    for r in rows[:20]:
        v = np.array(r.feature, dtype=np.float64)
        assert v.shape == (16,)
        assert abs(float(np.sqrt((v * v).sum())) - 1.0) < 1e-5
    again = {r.doc_id: r.feature for r in byte_histogram_features(docs, dim=16).collect()}
    assert all(again[r.doc_id] == r.feature for r in rows)

    # pure-python oracle for one doc
    text = docs.select("doc_id", "text").limit(1).collect()[0]
    raw = np.frombuffer(text.text.encode("utf-8"), dtype=np.uint8)
    hist = np.bincount(raw % 16, minlength=16).astype(np.float64)
    hist /= np.sqrt((hist * hist).sum())
    got = dict((r.doc_id, r.feature) for r in rows)[text.doc_id]
    assert np.allclose(np.array(got, dtype=np.float64), hist, atol=1e-6)

    # ANN over the extracted features
    emb = feats.limit(200).select(
        F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    topk = hyperplane_lsh_topk(emb, k=3)
    assert topk.count() > 0
    assert set(topk.columns) >= {"id_a", "id_b", "rank", "cosine"}

    with pytest.raises(NotImplementedError):
        resize_image_real(b"x", 8, 8)


def test_hll_sketches_for_scale_distinct_counts(spark):
    """Approximate distinct (datasketches HLL) — the 100 TB substitute
    for exact countDistinct: bounded error vs exact, and sketches merge
    across batches (hll_union_agg of per-batch sketches == one-shot
    estimate), which is what makes incremental index maintenance cheap."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).collect()[0].n
    est = o.select(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").alias("n")
    ).collect()[0].n
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # mergeability: sketch per orderpriority batch, then union
    per_batch = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    merged = per_batch.select(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("n")
    ).collect()[0].n
    # union of per-batch sketches is not bit-identical to a one-shot
    # sketch (internal mode transitions) but must carry the same
    # accuracy guarantee
    assert abs(merged - exact) / exact < 0.05, (merged, exact)


def test_bmp_real_decode_end_to_end(spark):
    """The real decoder path on an actual (generated) BMP corpus:
    encode_bmp fixtures flow through the SAME mapInPandas plumbing as
    the fake path and round-trip their true dimensions — the multimodal
    decode is no longer stub-only for every format (round-2 verdict #7:
    one end-to-end non-stub codec)."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from lieu_spark.functions.multimodal import decode_bmp, encode_bmp

    dims = [(101, 37, 3), (64, 1, 1), (640, 480, 4), (7, 7, 3)]
    rows = [(i, bytearray(encode_bmp(w, h, c))) for i, (w, h, c) in enumerate(dims)]
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    df = spark.createDataFrame(rows, schema)
    got = {
        r.doc_id: (r.width, r.height, r.channels, r.format, r.n_bytes)
        for r in decode_image_metadata(df, decoder="real").collect()
    }
    for i, (w, h, c) in enumerate(dims):
        gw, gh, gc, fmt, nb = got[i]
        assert (gw, gh, gc) == (w, h, c), (i, got[i])
        assert fmt == "bmp" and nb == len(encode_bmp(w, h, c))
    # driver-side kernel agrees (top-down negative-height variant too)
    import struct

    payload = bytearray(encode_bmp(33, 9, 3))
    struct.pack_into("<i", payload, 22, -9)  # top-down encoding
    assert decode_bmp(bytes(payload)) == (33, 9, 3)
    with pytest.raises(ValueError):
        decode_bmp(b"BM tiny")
    # non-BMP payloads still refuse loudly through the real path
    with pytest.raises(NotImplementedError):
        decode_image_real(b"not-an-image")


def test_bmp_native_resize_real():
    """Native BMP resize (nearest-neighbor, zero dependencies): pixel
    roundtrip is exact, upscale duplicates blocks, downscale picks
    pixel centers, top-down inputs normalize, and the output is itself
    a decodable BMP — the resize path is no longer stub-only for BMP."""
    import struct

    import numpy as np

    from lieu_spark.functions.multimodal import (
        _bmp_from_pixels,
        _bmp_pixels,
        decode_bmp,
        resize_image_real,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    payload = _bmp_from_pixels(img)
    assert decode_bmp(payload) == (13, 9, 3)
    assert np.array_equal(_bmp_pixels(payload), img)  # exact roundtrip

    # upscale 2x: every source pixel becomes a 2x2 block (NN semantics)
    small = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    up = _bmp_pixels(resize_image_real(_bmp_from_pixels(small), 4, 4))
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up, np.repeat(np.repeat(small, 2, axis=0), 2, axis=1))

    # downscale matches an independent center-sampling oracle
    big = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    down = _bmp_pixels(resize_image_real(_bmp_from_pixels(big), 5, 7))
    ys = np.minimum(((np.arange(7) + 0.5) * 16 / 7).astype(int), 15)
    xs = np.minimum(((np.arange(5) + 0.5) * 16 / 5).astype(int), 15)
    assert np.array_equal(down, big[np.ix_(ys, xs)])

    # top-down (negative height) input resizes to the same pixels
    td = bytearray(_bmp_from_pixels(img))
    h, stride = 9, (13 * 3 + 3) & ~3
    (data_offset,) = struct.unpack_from("<I", bytes(td), 10)
    body = bytes(td)[data_offset:]
    flipped = b"".join(
        body[(h - 1 - r) * stride : (h - r) * stride] for r in range(h)
    )
    struct.pack_into("<i", td, 22, -h)
    td = bytes(td)[:data_offset] + flipped
    assert np.array_equal(_bmp_pixels(td), img)
    assert np.array_equal(
        _bmp_pixels(resize_image_real(td, 26, 18)),
        _bmp_pixels(resize_image_real(payload, 26, 18)),
    )

    # refusals: paletted pixels, bad target size, non-BMP
    from lieu_spark.functions.multimodal import encode_bmp

    with pytest.raises(ValueError):
        _bmp_pixels(encode_bmp(8, 8, 1))
    with pytest.raises(ValueError):
        resize_image_real(payload, 0, 4)
    with pytest.raises(NotImplementedError):
        resize_image_real(b"\x89PNG....", 8, 8)


def test_png_native_pixel_codec():
    """Native PNG pixel codec (stdlib zlib + numpy, zero dependencies):
    every scanline filter of the public spec inverts exactly, every
    8-bit channel layout roundtrips, resize emits a decodable PNG whose
    pixels match the BMP path on identical content, and malformed
    payloads refuse loudly instead of guessing."""
    import struct
    import zlib

    import numpy as np

    from lieu_spark.functions.multimodal import (
        _bmp_from_pixels,
        _bmp_pixels,
        _nn_resize,
        _png_from_pixels,
        _png_pixels,
        encode_png,
        parse_image_dims,
        resize_image_real,
    )

    rng = np.random.default_rng(11)
    # all five filters x all four color layouts invert exactly
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        for f in (0, 1, 2, 3, 4):
            assert np.array_equal(_png_pixels(_png_from_pixels(img, [f] * 13)), img)
        mixed = rng.integers(0, 5, size=13)
        assert np.array_equal(_png_pixels(_png_from_pixels(img, mixed)), img)

    # the zero-pixel fixture encoder decodes to zeros (shared raw layout)
    z = _png_pixels(encode_png(8, 5, 3))
    assert z.shape == (5, 8, 3) and not z.any()

    # resize through the container == the raw NN gather, and the output
    # is itself a valid PNG the header parser agrees with
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    payload = _png_from_pixels(img, [4] * 16)
    out = resize_image_real(payload, 7, 5)
    assert parse_image_dims(out) == ("png", 7, 5, 3)
    assert np.array_equal(_png_pixels(out), _nn_resize(img, 7, 5))

    # cross-codec agreement: identical pixels resize identically via
    # the BMP container and the PNG container
    assert np.array_equal(
        _bmp_pixels(resize_image_real(_bmp_from_pixels(img), 26, 9)),
        _png_pixels(resize_image_real(_png_from_pixels(img), 26, 9)),
    )

    # refusals: palette color type, 16-bit depth, interlace, CRC, filter
    def mutate_ihdr(payload, offset, value):
        buf = bytearray(payload)
        buf[16 + offset] = value
        ihdr = bytes(buf[12:16]) + bytes(buf[16:29])
        struct.pack_into(">I", buf, 29, zlib.crc32(ihdr) & 0xFFFFFFFF)
        return bytes(buf)

    good = _png_from_pixels(img)
    with pytest.raises(ValueError, match="palette"):
        _png_pixels(mutate_ihdr(good, 9, 3))  # color type -> 3
    with pytest.raises(ValueError, match="bit depth"):
        _png_pixels(mutate_ihdr(good, 8, 16))
    with pytest.raises(ValueError, match="interlaced"):
        _png_pixels(mutate_ihdr(good, 12, 1))
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        _png_pixels(bytes(bad_crc))
    # corrupt filter byte inside the deflate stream
    raw = bytearray((b"\x07" + b"\x00" * (12 * 3)) * 16)
    body = zlib.compress(bytes(raw))
    bad = (
        good[: good.index(b"IDAT") - 4]
        + struct.pack(">I", len(body))
        + b"IDAT"
        + body
        + struct.pack(">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF)
        + good[good.rindex(b"IEND") - 4 :]
    )
    with pytest.raises(ValueError, match="filter type"):
        _png_pixels(bad)
    with pytest.raises(ValueError, match="truncated|missing|signature"):
        _png_pixels(b"\x89PNG\r\n\x1a\n")


def test_gif_native_pixel_codec():
    """Native GIF pixel codec (variable-width LZW, clear/EOI, 4-pass
    de-interlace, palette expansion): roundtrips exact for 2..256-color
    images, interlaced and not; resize emits a decodable GIF; palette
    overflow and malformed streams refuse loudly."""
    import numpy as np

    from lieu_spark.functions.multimodal import (
        _gif_from_pixels,
        _gif_pixels,
        _nn_resize,
        parse_image_dims,
        resize_image_real,
    )

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 7, size=(19, 11))]
    for interlace in (False, True):
        p = _gif_from_pixels(img, interlace=interlace)
        assert parse_image_dims(p) == ("gif", 11, 19, 3)
        assert np.array_equal(_gif_pixels(p), img), f"interlace={interlace}"

    # palette-size edges: 2 colors (mcs floor) and the full 256
    two = np.where(
        rng.integers(0, 2, size=(5, 5, 1)).astype(bool), 255, 0
    ).astype(np.uint8).repeat(3, axis=2)
    assert np.array_equal(_gif_pixels(_gif_from_pixels(two)), two)
    pal256 = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    img256 = pal256[rng.integers(0, 256, size=(64, 64))]
    assert np.array_equal(_gif_pixels(_gif_from_pixels(img256)), img256)

    # resize through the container == the raw NN gather
    out = resize_image_real(_gif_from_pixels(img), 6, 8)
    assert parse_image_dims(out) == ("gif", 6, 8, 3)
    assert np.array_equal(_gif_pixels(out), _nn_resize(img, 6, 8))

    # refusals: >256 distinct colors, truncated stream, bad block tag
    with pytest.raises(ValueError, match="palette"):
        _gif_from_pixels(rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        _gif_pixels(b"GIF89a" + b"\x00" * 4)
    good = bytearray(_gif_from_pixels(img))
    good[13 + 3 * 8] = 0x99  # first block tag after the 8-entry GCT
    with pytest.raises(ValueError, match="unknown GIF block"):
        _gif_pixels(bytes(good))


def test_universal_header_parsers_roundtrip():
    """parse_image_dims reads back exactly what the fixture encoders
    wrote, for every format and channel layout the fixture produces —
    plus GIF (parser-only; no encoder fixture needed, the header is 10
    bytes) and loud refusals on malformed payloads."""
    import struct

    import pytest as _pytest

    from lieu_spark.functions.multimodal import (
        encode_bmp,
        encode_jpeg_header,
        encode_png,
        parse_image_dims,
    )

    for w, h in ((8, 8), (31, 17), (640, 480), (1, 1)):
        for c in (3, 4):
            assert parse_image_dims(encode_bmp(w, h, c)) == ("bmp", w, h, c)
        for c in (1, 2, 3, 4):
            assert parse_image_dims(encode_png(w, h, c)) == ("png", w, h, c)
        for c in (1, 3):
            assert parse_image_dims(encode_jpeg_header(w, h, c)) == (
                "jpeg", w, h, c,
            )
    # GIF logical screen descriptor (little-endian u16 pair at offset 6)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_dims(gif) == ("gif", 320, 200, 3)
    # a PNG fixture is itself decodable by a strict third party check:
    # IDAT inflates to exactly height * (1 + width*channels) bytes
    import zlib

    png = encode_png(5, 4, 3)
    idat_off = png.index(b"IDAT") + 4
    (idat_len,) = struct.unpack_from(">I", png, png.index(b"IDAT") - 4)
    assert len(zlib.decompress(png[idat_off : idat_off + idat_len])) == 4 * (1 + 5 * 3)
    # refusals
    for bad in (b"", b"\xff\xd8\xff\xd9", b"\x89PNG\r\n\x1a\nXXXX", b"nope"):
        with _pytest.raises(ValueError):
            parse_image_dims(bad)


def test_mixed_format_real_decode_end_to_end(spark):
    """The mixed BMP/PNG/JPEG/GIF fixture flows through the REAL
    decoder's mapInPandas plumbing and every header parses back to the
    arithmetic dims the fixture encoded — the Spark half of the
    multimodal_meta driver oracle."""
    from lieu_spark.functions.multimodal import (
        decode_image_metadata,
        synthetic_image_payloads,
    )

    ids = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    pay = synthetic_image_payloads(ids)
    got = {
        r.doc_id: (r.format, r.width, r.height, r.channels, r.n_bytes)
        for r in decode_image_metadata(pay, decoder="real").collect()
    }
    assert len(got) == 60
    for i in range(60):
        fmt = ("bmp", "png", "jpeg", "gif")[i % 4]
        w, h = 8 + i % 24, 8 + (i * 7) % 24
        if fmt == "gif":
            c = 3
        elif fmt == "jpeg":
            c = 3 if i % 2 == 0 else 1
        else:
            c = 3 if i % 2 == 0 else 4
        gf, gw, gh, gc, nb = got[i]
        assert (gf, gw, gh, gc) == (fmt, w, h, c), (i, got[i])
        assert nb > 0


def test_bigram_lm_scores_hand_computed(spark):
    """Laplace-smoothed bigram LM on a corpus small enough to score by
    hand.  Counts: (a,b):3 (b,a):1 (b,c):1; contexts a:3 b:2; vocab
    {a,b,c,x} so V=4.  score6(a,b)=round(ln(4/7)e6)=-559616,
    score6(b,a)=score6(b,c)=round(ln(2/6)e6)=-1098612.  Docs with <2
    tokens (d3, d4, d5) have no bigrams and drop out."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "A b, c!"), (3, "x"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.lm_score6)
        for r in A.bigram_lm_scores(docs).collect()
    }
    assert got == {
        1: (3, round((2 * -559616 - 1098612) / 3)),  # -739281
        2: (2, (-559616 - 1098612) // 2),            # -829114
    }


def test_embedding_neardup_pairs_survive_either_side(spark):
    # 60 identical vectors: with the top-50 per-side cut, pair (0, 55)
    # is outside 0's neighbor list but inside 55's — normalizing with
    # least/greatest BEFORE dedup must keep it (the old id_a < id_b
    # post-rank filter dropped every pair found only from the larger
    # id's side: 1275 pairs instead of ~1725)
    from lieu_spark.operators.ann import embedding_neardup_pairs

    rows = [(i, [1.0, 0.5, 0.25, 0.125]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(df, threshold=0.99).collect()
    }
    assert all(a < b for a, b in pairs)
    assert (0, 55) in pairs, "pair found only from the large-id side lost"
    assert len(pairs) > 1275


def test_ann_parameter_and_empty_guards(spark, embeddings):
    with pytest.raises(ValueError, match="nprobes"):
        hyperplane_probes(embeddings, nprobes=0).collect()
    empty = embeddings.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        ivf_centroids(empty)
