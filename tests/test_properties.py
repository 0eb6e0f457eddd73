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
