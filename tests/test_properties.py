"""Property-based tests (hypothesis) over the pure-python oracle and the
numpy Spark-path kernels — no SparkSession needed, so these run fast and
explore a much wider input space than the example-based tests."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lieu_spark import oracle
from lieu_spark.config import DedupeConfig
from lieu_spark.functions.minhash import oph_batch
from lieu_spark.functions.simhash import _simhash_batch
from lieu_spark.hashing import xxh64_string
from lieu_spark.operators.spans import lcs_pair

CFG = DedupeConfig()

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=120,
)
token_lists = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), max_size=40
)
hash_lists = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200
)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_and_clean(t):
    c = oracle.canonicalize(t)
    assert oracle.canonicalize(c) == c
    assert "  " not in c and c == c.strip()


@given(texts, st.integers(min_value=2, max_value=6))
@settings(max_examples=100, deadline=None)
def test_shingle_hashes_sorted_distinct(t, k):
    sh = oracle.shingle_hashes(t, k)
    assert sh == sorted(set(sh))
    # collapsing whitespace runs never changes the shingle set
    assert oracle.shingle_hashes(" ".join(t.split()), k) == sh


@given(hash_lists, hash_lists)
@settings(max_examples=100, deadline=None)
def test_jaccard_symmetric_bounded(a, b):
    ja = oracle.jaccard(set(a), set(b))
    assert 0.0 <= ja <= 1.0
    assert ja == oracle.jaccard(set(b), set(a))
    if set(a) == set(b) and a:
        assert ja == 1.0


@given(hash_lists)
@settings(max_examples=100, deadline=None)
def test_oph_udf_matches_oracle(hashes):
    got = list(oph_batch(pd.Series([np.array(hashes, dtype=np.int64)]), CFG.num_perm).iat[0])
    want = oracle.minhash_signature(hashes, CFG)
    assert got == want


@given(hash_lists, hash_lists)
@settings(max_examples=60, deadline=None)
def test_minhash_agreement_tracks_containment(a, b):
    """Identical sets -> identical signatures; supersets never DECREASE
    agreement below disjoint expectation... minimal sanity: equality."""
    sa = oracle.minhash_signature(a, CFG)
    sb = oracle.minhash_signature(b, CFG)
    if set(a) == set(b):
        assert sa == sb


@given(token_lists)
@settings(max_examples=60, deadline=None)
def test_simhash_udf_matches_oracle(toks):
    hashes = np.array([xxh64_string(t) for t in toks], dtype=np.int64)
    got = int(_simhash_batch(pd.Series([hashes])).iat[0])
    assert got == oracle.simhash(toks, CFG)
    # order invariance
    assert got == oracle.simhash(list(reversed(toks)), CFG)


def _brute_lcs(a: str, b: str):
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            l = 0
            while i + l < len(a) and j + l < len(b) and a[i + l] == b[j + l]:
                l += 1
            best = max(best, l)
    return best


@given(
    st.text(alphabet="abc", max_size=40), st.text(alphabet="abc", max_size=40)
)
@settings(max_examples=80, deadline=None)
def test_lcs_pair_matches_quadratic_brute_force(a, b):
    sa, sb, ln = lcs_pair(a, b, 1000)
    assert ln == _brute_lcs(a, b)
    assert a[sa : sa + ln] == b[sb : sb + ln]


@given(hash_lists)
@settings(max_examples=60, deadline=None)
def test_band_keys_deterministic(hashes):
    sig = oracle.minhash_signature(hashes, CFG)
    k1 = oracle.band_keys(sig, CFG)
    k2 = oracle.band_keys(list(sig), CFG)
    assert k1 == k2
    assert len(k1) == CFG.lsh_bands


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30))))
@settings(max_examples=100, deadline=None)
def test_union_find_is_min_of_component(edges):
    comp = oracle.cluster_pairs(edges)
    # every node's label is <= itself and is a member of its component
    for node, root in comp.items():
        assert root <= node
        assert comp.get(root, root) == root


# --- codec properties (functions/multimodal.py, jpeg.py, audio.py) ---------

_img_arrays = st.integers(min_value=1, max_value=3).flatmap(
    lambda _: st.tuples(
        st.integers(min_value=1, max_value=12),  # h
        st.integers(min_value=1, max_value=12),  # w
        st.sampled_from([1, 2, 3, 4]),           # channels
        st.integers(min_value=0, max_value=2**32 - 1),
    )
)


def _rand_img(h, w, c, seed):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)


@given(_img_arrays, st.lists(st.integers(min_value=0, max_value=4), min_size=12, max_size=12))
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_property(dims, filters):
    """PNG encode(decode) is the identity for every size/channel/filter
    mix hypothesis throws at it."""
    from lieu_spark.functions.multimodal import _png_from_pixels, _png_pixels

    h, w, c, seed = dims
    img = _rand_img(h, w, c, seed)
    assert np.array_equal(_png_pixels(_png_from_pixels(img, filters[:h])), img)


@given(
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=1, max_value=6),   # palette size
    st.integers(min_value=0, max_value=2**32 - 1),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_gif_codec_roundtrip_property(h, w, ncol, seed, interlace):
    from lieu_spark.functions.multimodal import _gif_from_pixels, _gif_pixels

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, size=(h, w))]
    assert np.array_equal(_gif_pixels(_gif_from_pixels(img, interlace=interlace)), img)


@given(
    st.integers(min_value=1, max_value=20),  # h
    st.integers(min_value=1, max_value=20),  # w
    st.sampled_from([1, 3]),
    st.sampled_from([35, 60, 90, 100]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_entropy_layer_lossless_property(h, w, c, quality, seed):
    """The strongest JPEG invariant, property-tested: full encode->decode
    is BIT-EQUAL to DCT->quantize->dequantize->IDCT with no entropy
    coding, for arbitrary content, size, grayscale/color, quality."""
    from lieu_spark.functions.jpeg import _jpeg_pixels, encode_jpeg_baseline
    from tests.test_jpeg import _quant_sim

    img = _rand_img(h, w, c, seed)
    full = _jpeg_pixels(encode_jpeg_baseline(img if c == 3 else img[..., 0], quality=quality))
    assert np.array_equal(full, _quant_sim(img, quality))


@given(
    st.integers(min_value=1, max_value=300),  # n_frames
    st.sampled_from([1, 2]),                  # channels
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_codec_roundtrip_property(n, ch, rate, seed):
    from lieu_spark.functions.audio import _wav_samples, encode_wav, parse_wav_meta

    s = np.random.default_rng(seed).integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    p = encode_wav(s, rate)
    assert parse_wav_meta(p) == (rate, ch, 16, n)
    assert np.array_equal(_wav_samples(p), s)
    assert encode_wav(_wav_samples(p), rate) == p
