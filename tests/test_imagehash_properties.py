"""Property tests for the perceptual-hash kernels: the invariances the
operators RELY on, checked on arbitrary images rather than the oracle
fixture's Walsh tiles."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from lieu_spark.functions.imagehash import (
    _decode_pixels,
    _luma,
    ahash64,
    dhash64,
)

_img8 = arrays(np.uint8, (8, 8), elements=st.integers(0, 255))


@given(img=_img8, k=st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_ahash_invariant_under_integer_upscale(img, k):
    big = np.repeat(np.repeat(img, k, axis=0), k, axis=1)
    assert ahash64(big) == ahash64(img)


@given(img=_img8, k=st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_dhash_invariant_under_integer_upscale(img, k):
    big = np.repeat(np.repeat(img, k, axis=0), k, axis=1)
    assert dhash64(big) == dhash64(img)


@given(img=_img8)
@settings(max_examples=40, deadline=None)
def test_hashes_invariant_under_lossless_containers(img):
    from lieu_spark.functions.multimodal import _bmp_from_pixels, _png_from_pixels

    rgb = np.stack([img] * 3, axis=-1)
    expect = (ahash64(img), dhash64(img))
    for payload in (_png_from_pixels(img[..., None]), _png_from_pixels(rgb),
                    _bmp_from_pixels(rgb)):
        fmt, pix = _decode_pixels(payload)
        gray = _luma(pix, fmt)
        assert (ahash64(gray), dhash64(gray)) == expect


@given(img=_img8)
@settings(max_examples=30, deadline=None)
def test_ahash_bit_count_excludes_max_only_rows(img):
    # structural sanity: a constant image hashes to exactly 0 (strict >
    # mean), and flipping one pixel up changes the hash
    const = np.full((8, 8), int(img[0, 0]), np.uint8)
    assert ahash64(const) == 0
    if const[0, 0] < 255:
        bumped = const.copy()
        bumped[3, 3] += 1
        h = ahash64(bumped)
        assert h != 0 and bin(h & ((1 << 64) - 1)).count("1") == 1


@given(
    sets=st.lists(
        st.frozensets(st.integers(0, 15), min_size=1, max_size=8),
        min_size=2,
        max_size=6,
    ),
    thresh=st.sampled_from([1, 250000, 500000, 900000]),
)
@settings(max_examples=10, deadline=None)
def test_fingerprint_jaccard_matches_bruteforce(spark, sets, thresh):
    from lieu_spark.operators.mediadedup import fingerprint_jaccard_pairs

    rows = [(i, int(f)) for i, s in enumerate(sets) for f in s]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r.id_a, r.id_b): (r.shared_fp, r.fp_xor, r.jaccard6)
        for r in fingerprint_jaccard_pairs(df, min_jaccard6=thresh).collect()
    }
    exp = {}
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = sets[a] & sets[b]
            if not inter:
                continue
            j6 = round(1e6 * len(inter) / len(sets[a] | sets[b]))
            if j6 >= thresh:
                x = 0
                for f in inter:
                    x ^= f
                exp[(a, b)] = (len(inter), x, j6)
    assert got == exp
