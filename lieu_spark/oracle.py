"""Pure-Python/numpy oracle for every pipeline stage.

Shares only *configuration* (DedupeConfig, minhash params) with the Spark
path — no Spark imports, no shared transform code — so pytest can compare
the two implementations stage by stage (SURVEY.md §5). Plays the role the
reference's in-memory CLI plays for its Spark job: an independent
single-node execution of the same semantics
(/root/reference/scripts/dedupe_geojson:145-470).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .config import MASK64, DedupeConfig
from .hashing import to_unsigned64, xxh64_chain, xxh64_string

# ---------------------------------------------------------------------------
# text canonicalization / shingling
# (Spark twin: lieu_spark/functions/text.py — lower + \p{L}\p{N} regex)
# ---------------------------------------------------------------------------


def canonicalize(text: str | None) -> str:
    """Lowercase; every non-alphanumeric char → space; collapse; trim.

    Python's str.isalnum() covers exactly {L*, Nd, Nl, No} — the same set
    as Java/RE2 ``[\\p{L}\\p{N}]`` — so this matches the Spark/DuckDB
    ``regexp_replace(lower(text), '[^\\p{L}\\p{N}]+', ' ')`` twin.
    Analog of libpostal ``normalized_tokens``
    (/root/reference/lib/lieu/dedupe.py:328-331).
    """
    if not text:
        return ""
    lowered = text.lower()
    out = "".join(c if c.isalnum() else " " for c in lowered)
    return " ".join(out.split())


def tokens(text: str | None) -> list[str]:
    c = canonicalize(text)
    return c.split(" ") if c else []


def shingles(toks: list[str], k: int) -> list[str]:
    """Ordered k-word shingles (with duplicates). <k tokens → one shingle
    of everything; 0 tokens → []."""
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def shingle_set(text: str | None, k: int) -> set[str]:
    return set(shingles(tokens(text), k))


def shingle_hashes(text: str | None, k: int) -> list[int]:
    """Distinct shingle hashes, sorted — Spark-twin of
    functions/text.shingle_hash_set: shingle key = chained xxhash64 over
    the window's token hashes (hashed as longs, seed 42)."""
    th = [xxh64_string(t) for t in tokens(text)]
    if not th:
        return []
    if len(th) < k:
        return [xxh64_chain([th])]
    return sorted({xxh64_chain([th[i : i + k]]) for i in range(len(th) - k + 1)})


def char_kgram_hashes(text: str | None, k: int) -> list[int]:
    """Distinct char-k-gram hashes over the space-stripped canonical
    text, sorted — twin of functions/text.char_kgram_hash_set
    (xxhash64 of each window's UTF-8 string)."""
    c = canonicalize(text).replace(" ", "")
    if not c:
        return []
    if len(c) < k:
        return [xxh64_string(c)]
    return sorted({xxh64_string(c[i : i + k]) for i in range(len(c) - k + 1)})


def use_char_fallback(text: str | None, cfg: DedupeConfig) -> bool:
    """Twin of functions/text.char_fallback_cond."""
    t = tokens(text)
    if not t:
        return False
    c = canonicalize(text).replace(" ", "")
    return len(c) / len(t) >= cfg.char_fallback_avg_len


def adaptive_shingle_hashes(text: str | None, cfg: DedupeConfig) -> list[int]:
    """Twin of the build_features shingle column: char k-grams for
    no-space-script docs, word shingles otherwise."""
    if use_char_fallback(text, cfg):
        return char_kgram_hashes(text, cfg.char_kgram_k)
    return shingle_hashes(text, cfg.shingle_k)


def in_fallback_band(text: str | None, cfg: DedupeConfig) -> bool:
    """Twin of functions/text.char_fallback_band."""
    if cfg.char_fallback_hysteresis <= 0:
        return False
    t = tokens(text)
    if not t:
        return False
    c = canonicalize(text).replace(" ", "")
    # multiplicative form, matching char_fallback_band bit for bit
    lo = cfg.char_fallback_avg_len * (1.0 - cfg.char_fallback_hysteresis)
    hi = cfg.char_fallback_avg_len * (1.0 + cfg.char_fallback_hysteresis)
    return lo * len(t) <= len(c) < hi * len(t)


def family_hashes(text: str | None, cfg: DedupeConfig) -> tuple[list[int], list[int]]:
    """Twin of the (word, char) family columns build_features emits:
    (word_hashes, char_hashes) — the primary family always populated,
    the other only inside the hysteresis band."""
    char_primary = use_char_fallback(text, cfg)
    banded = in_fallback_band(text, cfg)
    word = shingle_hashes(text, cfg.shingle_k) if (not char_primary or banded) else []
    char = (
        char_kgram_hashes(text, cfg.char_kgram_k) if (char_primary or banded) else []
    )
    return word, char


def family_jaccard(text_a: str | None, text_b: str | None, cfg: DedupeConfig) -> float:
    """Twin of verify_pairs' family-aligned jaccard (shingles mode):
    word-to-word when both sides carry word sets, else char-to-char."""
    wa, ca = family_hashes(text_a, cfg)
    wb, cb = family_hashes(text_b, cfg)
    if wa and wb:
        return jaccard(set(wa), set(wb))
    return jaccard(set(ca), set(cb))


# ---------------------------------------------------------------------------
# MinHash / LSH
# ---------------------------------------------------------------------------


GOLD = 0x9E3779B97F4A7C15  # densification offset constant (shared param)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def minhash_signature(hashes: list[int], cfg: DedupeConfig) -> list[int]:
    """One-permutation-hashing signature, pure-python twin of
    functions/minhash.py (bucket by top bits, min per bucket, rotation
    densification with d*GOLD offsets). Empty set → all MASK64 sentinel.
    Returned as signed int64 (Spark long)."""
    B = cfg.num_perm
    shift = 64 - (B.bit_length() - 1)
    if not hashes:
        return [_signed(MASK64)] * B
    mins: dict[int, int] = {}
    for h in hashes:
        u = to_unsigned64(h)
        j = u >> shift
        if j not in mins or u < mins[j]:
            mins[j] = u
    sig = []
    for j in range(B):
        if j in mins:
            sig.append(mins[j])
        else:
            for d in range(1, B):
                src = (j + d) % B
                if src in mins:
                    sig.append((mins[src] + d * GOLD) & MASK64)
                    break
    return [_signed(u) for u in sig]


def band_keys(sig: list[int], cfg: DedupeConfig) -> list[tuple[int, int]]:
    """[(band_idx, band_hash)] with band_hash = xxhash64(band_idx::long,
    sig[band*r : band*r+r]) — Spark-equal chained hashing."""
    r = cfg.lsh_rows
    out = []
    for band in range(cfg.lsh_bands):
        chunk = sig[band * r : (band + 1) * r]
        out.append((band, xxh64_chain([band, chunk])))
    return out


def jaccard(set_a: set, set_b: set) -> float:
    """J(∅,∅) := 0 by policy — see operators/verify.py."""
    inter = len(set_a & set_b)
    union = len(set_a) + len(set_b) - inter
    return inter / union if union else 0.0


def multiset_jaccard(toks_a: list[str], toks_b: list[str]) -> float:
    """Term-frequency-weighted Jaccard — parity with the reference's
    ``jaccard_similarity`` (/root/reference/lib/lieu/similarity.py:63-79):
    sum(min(c1,c2)) / (sum(c1)+sum(c2)-sum(min))."""
    c1, c2 = Counter(toks_a), Counter(toks_b)
    inter = sum((c1 & c2).values())
    denom = sum(c1.values()) + sum(c2.values()) - inter
    return inter / denom if denom else 1.0


def signature_agreement(sig_a: list[int], sig_b: list[int]) -> float:
    assert len(sig_a) == len(sig_b)
    # J(empty, empty) := 0 — twin of the Spark-side all-sentinel guard
    # (an empty doc's signature is all MASK64, stored as long -1)
    if all(x == -1 for x in sig_a) and all(y == -1 for y in sig_b):
        return 0.0
    eq = sum(1 for x, y in zip(sig_a, sig_b) if x == y)
    return eq / len(sig_a)


def tfidf_scores(docs: dict, min_df: int = 1) -> dict:
    """{doc_id: {token: (tf, df, score, score_norm)}} — pure-python twin
    of functions/weighting.tfidf_scores (lieu lib/lieu/tfidf.py:85-98)."""
    import math

    n_docs = len(docs)
    dfreq: Counter = Counter()
    for toks in docs.values():
        dfreq.update(set(toks))
    out: dict = {}
    for doc_id, toks in docs.items():
        tf = Counter(toks)
        scored = {}
        for tok, cnt in tf.items():
            if dfreq[tok] < min_df:
                continue
            scored[tok] = math.log(cnt + 1.0) * math.log(n_docs / dfreq[tok])
        l2 = math.sqrt(sum(s * s for s in scored.values()))
        out[doc_id] = {
            tok: (
                tf[tok],
                dfreq[tok],
                s,
                s / l2 if l2 > 0 else 1.0 / math.sqrt(len(scored)),
            )
            for tok, s in scored.items()
        }
    return out


def information_gain(docs: dict, min_count: int = 1) -> dict:
    """{token: ig} — twin of functions/weighting.information_gain,
    reference-parity formula (lieu lib/lieu/information_gain.py:47-102,
    InformationGainBuilder): p(x) = docfreq/num_docs, joint normalized
    per word over its co-occurrence mass, clamp on the SUM; pruned
    words (docfreq < min_count) are nonexistent both as the scored word
    and as context."""
    import math

    marg: Counter = Counter()
    co: dict = {}
    for toks in docs.values():
        ts = sorted(set(toks))
        marg.update(ts)
        for w in ts:
            for c in ts:
                if w != c:
                    co.setdefault(w, Counter())[c] += 1
    n_docs = len(docs) or 1
    marg = Counter({w: c for w, c in marg.items() if c >= min_count})
    ig: dict = {}
    for w, ctx in co.items():
        if w not in marg:
            continue
        kept = {c: cnt for c, cnt in ctx.items() if c in marg}
        if not kept:
            continue
        n_y = sum(kept.values())
        s = 0.0
        for c, cnt in kept.items():
            p_xy = cnt / n_y
            p_c = marg[c] / n_docs
            s += p_xy * math.log2(p_xy / p_c)
        ig[w] = max(0.0, s)
    for w, cnt in marg.items():
        if w not in ig:
            ig[w] = -math.log2(cnt / n_docs)
    return ig


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(toks: list[str], cfg: DedupeConfig) -> int:
    """64-bit SimHash over token unigrams weighted by term frequency,
    token hash = Spark-equal xxhash64(token). Signed int64."""
    if not toks:
        return 0
    counts = Counter(toks)
    acc = np.zeros(cfg.simhash_bits, dtype=np.int64)
    for tok, cnt in counts.items():
        h = to_unsigned64(xxh64_string(tok))
        bits = (h >> np.arange(cfg.simhash_bits, dtype=np.uint64)) & np.uint64(1)
        acc += (bits.astype(np.int64) * 2 - 1) * cnt
    out = np.uint64(0)
    for i in range(cfg.simhash_bits):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return np.uint64(out).astype(np.int64).item()


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & MASK64).count("1")


def simhash_chunk_keys(sh: int, cfg: DedupeConfig) -> list[tuple[int, int]]:
    """Pigeonhole blocking: split the 64-bit simhash into ``simhash_chunks``
    equal chunks; two hashes within hamming<=chunks-1 share >=1 chunk."""
    width = cfg.simhash_bits // cfg.simhash_chunks
    u = to_unsigned64(sh)
    mask = (1 << width) - 1
    return [(i, (u >> (i * width)) & mask) for i in range(cfg.simhash_chunks)]


# ---------------------------------------------------------------------------
# clustering oracle: union-find
# ---------------------------------------------------------------------------


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = self.find(p)
        return self.parent[x]

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo

    def components(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


def cluster_pairs(pairs: list[tuple]) -> dict:
    """id -> cluster_id (= min member) for every id appearing in pairs."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return uf.components()


# ---------------------------------------------------------------------------
# suffix-array longest common substring (copied-span oracle)
# ---------------------------------------------------------------------------


def suffix_array(s: list[int]) -> list[int]:
    """O(n log^2 n) doubling suffix array over an int sequence."""
    n = len(s)
    sa = list(range(n))
    rank = list(s)
    tmp = [0] * n
    k = 1
    while True:
        def key(i: int) -> tuple[int, int]:
            return (rank[i], rank[i + k] if i + k < n else -1)

        sa.sort(key=key)
        tmp[sa[0]] = 0
        for i in range(1, n):
            tmp[sa[i]] = tmp[sa[i - 1]] + (1 if key(sa[i]) != key(sa[i - 1]) else 0)
        rank = tmp[:]
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_array(s: list[int], sa: list[int]) -> list[int]:
    """Kasai: lcp[i] = LCP(sa[i-1], sa[i])."""
    n = len(s)
    rank = [0] * n
    for i, p in enumerate(sa):
        rank[p] = i
    lcp = [0] * n
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> tuple[int, int, int]:
    """(start_a, start_b, length) of the longest common substring, via
    suffix array + Kasai over a+SEP+b. Ties: smallest (start_a, start_b).
    """
    if not a or not b:
        return (0, 0, 0)
    sep = -1  # sentinel below any code point
    seq = [ord(c) for c in a] + [sep] + [ord(c) for c in b]
    na = len(a)
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    best = (0, 0, 0)
    for i in range(1, len(seq)):
        p, q = sa[i - 1], sa[i]
        in_a_p, in_a_q = p < na, q < na
        if in_a_p == in_a_q:
            continue
        length = lcp[i]
        if length == 0:
            continue
        pa = p if in_a_p else q
        pb = (q if in_a_p else p) - na - 1
        cand = (pa, pb, length)
        if length > best[2] or (length == best[2] and (pa, pb) < (best[0], best[1])):
            best = cand
    return best
