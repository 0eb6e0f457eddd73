"""Soft-TFIDF pair verifier — token-edit-tolerant fuzzy matching.

Reference parity: lieu's Soft-TFIDF hybrid similarity
(/root/reference/lib/lieu/similarity.py:14-60, Cohen/Ravikumar/Fienberg
IJCAI'03): for each token t1 of the SHORTER side, find the token t2 of
the other side with the highest Jaro-Winkler similarity; every t1 whose
best sim >= theta contributes sim * tfidf(t1) * tfidf(t2) to the score,
where tfidf values are the L2-normalized per-doc TF-IDF weights
(lib/lieu/tfidf.py:85-98). Set-based Jaccard collapses when many tokens
carry one-character typos ("recieve"/"receive"); Soft-TFIDF is the tier
that catches exactly that.

Engine-parity design (everything the DuckDB oracle must reproduce):
- Jaro-Winkler operates on UTF-8 BYTES, boost applies only when
  jaro > 0.7, prefix capped at 4, scale 0.1, any empty side -> 0.0 —
  probed to match DuckDB's ``jaro_winkler_similarity`` exactly
  (including its byte-level treatment of multi-byte codepoints).
- Similarities are quantized to sim6 = round(jw * 1e6) BEFORE the
  theta threshold and the argmax, so cross-engine float ULP noise can
  never flip a comparison; ties on sim6 pick the larger token index
  (lieu's ``max([(sim, j) ...])`` tie-break).
- The per-doc token list is capped at the ``max_tokens`` RAREST tokens
  ranked by (df ASC, tf DESC, token ASC) — an integer-only rank both
  engines compute identically (ranking by the float score itself would
  be ULP-unstable). The L2 norm stays over the FULL token vector.

Scale shape: runs only on candidate pairs (already blocked), cost per
pair is O(max_tokens^2) string pairs, deduplicated per Arrow batch and
prefiltered by a length upper bound on JW — linear in pairs, never in
corpus size. The whole kernel is whole-batch numpy (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

THETA6 = 950_000          # lieu's theta=0.95, quantized
MAX_TOKENS = 64           # rarest-token cap per side


# ---------------------------------------------------------------------------
# vectorized byte-level Jaro-Winkler (DuckDB-parity semantics)
# ---------------------------------------------------------------------------


def _pad_bytes(strs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """list of bytes -> (uint8 matrix padded with 0, lengths)."""
    n = len(strs)
    ls = np.fromiter((len(s) for s in strs), np.int64, count=n)
    L = int(ls.max()) if n else 0
    out = np.zeros((n, max(L, 1)), np.uint8)
    total = int(ls.sum())
    if total:
        flat = np.frombuffer(b"".join(strs), np.uint8)
        ends = np.cumsum(ls)
        rows = np.repeat(np.arange(n), ls)
        cols = np.arange(total) - np.repeat(ends - ls, ls)
        out[rows, cols] = flat
    return out, ls


def _jw_block(A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Jaro-Winkler for row-aligned byte matrices. Returns float64 in [0,1]."""
    M, La = A.shape
    Lb = B.shape[1]
    d = np.maximum(np.maximum(la, lb) // 2 - 1, 0)[:, None]  # match window
    jcols = np.arange(Lb)[None, :]
    valid_b = jcols < lb[:, None]
    used = np.zeros((M, Lb), bool)
    amatch = np.zeros((M, La), bool)
    for i in range(La):
        win = (jcols >= i - d) & (jcols <= i + d) & valid_b & ~used
        eq = win & (B == A[:, i : i + 1]) & (i < la)[:, None]
        any_ = eq.any(1)
        rows = np.nonzero(any_)[0]
        j = eq.argmax(1)[rows]
        used[rows, j] = True
        amatch[rows, i] = True
    m = used.sum(1)
    maxm = int(m.max()) if M else 0
    seqa = np.zeros((M, max(maxm, 1)), np.uint8)
    seqb = np.zeros((M, max(maxm, 1)), np.uint8)
    ra, ca = np.nonzero(amatch)
    seqa[ra, (np.cumsum(amatch, 1) - 1)[ra, ca]] = A[ra, ca]
    rb, cb = np.nonzero(used)
    seqb[rb, (np.cumsum(used, 1) - 1)[rb, cb]] = B[rb, cb]
    # DuckDB floors the half-transposition count (mismatches // 2), unlike
    # the textbook count/2 — probed; matters when a char matches out of
    # window order and the mismatch count is odd
    half_t = ((seqa != seqb).sum(1) // 2).astype(np.float64)
    mf = m.astype(np.float64)
    laf = la.astype(np.float64)
    lbf = lb.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / laf + mf / lbf + (mf - half_t) / mf) / 3.0
    jaro = np.where((m == 0) | (la == 0) | (lb == 0), 0.0, jaro)
    # common prefix, capped at 4 and at min(la, lb)
    P = min(4, La, Lb)
    if P:
        pl = np.minimum(np.minimum(la, lb), P)
        eqp = (A[:, :P] == B[:, :P]) & (np.arange(P)[None, :] < pl[:, None])
        neq = ~eqp
        pref = np.where(neq.any(1), neq.argmax(1), P)
    else:
        pref = np.zeros(M, np.int64)
    return np.where(jaro > 0.7, jaro + pref * 0.1 * (1.0 - jaro), jaro)


def jaro_winkler_sim6(
    a_strs: list[bytes], b_strs: list[bytes], chunk: int = 1 << 16
) -> np.ndarray:
    """round(jw * 1e6) as int64 for element-wise byte-string pairs."""
    n = len(a_strs)
    out = np.zeros(n, np.int64)
    todo = np.fromiter(
        (a != b and a and b for a, b in zip(a_strs, b_strs)), bool, count=n
    )
    out[np.fromiter((a == b and len(a) > 0 for a, b in zip(a_strs, b_strs)), bool, count=n)] = 1_000_000
    idx = np.nonzero(todo)[0]
    for s in range(0, idx.size, chunk):
        part = idx[s : s + chunk]
        A, la = _pad_bytes([a_strs[i] for i in part])
        B, lb = _pad_bytes([b_strs[i] for i in part])
        out[part] = np.round(_jw_block(A, la, B, lb) * 1e6).astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# whole-batch Soft-TFIDF kernel
# ---------------------------------------------------------------------------


def soft_tfidf_batch(
    toks_i: pd.Series,
    scores_i: pd.Series,
    toks_j: pd.Series,
    scores_j: pd.Series,
    theta6: int = THETA6,
) -> tuple[np.ndarray, np.ndarray]:
    """(n_close int64, soft float64) per pair row.

    Side i is the iteration (shorter) side; side j the match side —
    the caller performs lieu's strict ``len2 < len1`` swap relationally.
    Unique token pairs are JW'd once per batch; combos whose length
    upper bound jw <= 0.4 + 0.6*(mn/la + mn/lb + 1)/3 cannot reach
    theta are skipped (safe: a skipped combo's true sim < theta, so it
    could only have been a sub-theta argmax contributing 0 anyway).
    """
    n = len(toks_i)
    n_close = np.zeros(n, np.int64)
    soft = np.zeros(n, np.float64)
    if n == 0:
        return n_close, soft

    rows_i: list[np.ndarray] = [np.asarray(v, dtype=object) for v in toks_i]
    rows_j: list[np.ndarray] = [np.asarray(v, dtype=object) for v in toks_j]
    k1 = np.fromiter((len(v) for v in rows_i), np.int64, count=n)
    k2 = np.fromiter((len(v) for v in rows_j), np.int64, count=n)

    # batch vocabulary: encode every token once
    all_tok = np.concatenate([v for v in rows_i + rows_j if len(v)]) if (k1.sum() + k2.sum()) else np.array([], object)
    vocab, _ = np.unique(all_tok.astype("U")), None
    vid = {t: i for i, t in enumerate(vocab.tolist())}
    vbytes = [t.encode("utf-8") for t in vocab.tolist()]
    vlen = np.fromiter((len(b) for b in vbytes), np.int64, count=len(vbytes))

    # flat combos: for pair r, i in [0,k1), j in [0,k2)
    nc = k1 * k2
    if int(nc.sum()) == 0:
        return n_close, soft
    pair_of = np.repeat(np.arange(n), nc)
    i_idx = np.concatenate([np.repeat(np.arange(k1[r]), k2[r]) for r in range(n) if nc[r]])
    j_idx = np.concatenate([np.tile(np.arange(k2[r]), k1[r]) for r in range(n) if nc[r]])
    aid = np.concatenate(
        [np.repeat(np.fromiter((vid[t] for t in rows_i[r]), np.int64, count=k1[r]), k2[r]) for r in range(n) if nc[r]]
    )
    bid = np.concatenate(
        [np.tile(np.fromiter((vid[t] for t in rows_j[r]), np.int64, count=k2[r]), k1[r]) for r in range(n) if nc[r]]
    )

    # length prefilter: jw upper bound < theta -> skip
    la = vlen[aid]
    lb = vlen[bid]
    mn = np.minimum(la, lb).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro_ub = (mn / la + mn / lb + 1.0) / 3.0
    jw_ub6 = np.round((0.4 + 0.6 * np.where((la == 0) | (lb == 0), 0.0, jaro_ub)) * 1e6)
    keep = jw_ub6 >= theta6
    pair_of, i_idx, j_idx, aid, bid = (
        pair_of[keep], i_idx[keep], j_idx[keep], aid[keep], bid[keep],
    )
    if pair_of.size == 0:
        return n_close, soft

    # JW once per unique (aid, bid) token pair
    key = aid * len(vocab) + bid
    ukey, inv = np.unique(key, return_inverse=True)
    ua = (ukey // len(vocab)).astype(np.int64)
    ub = (ukey % len(vocab)).astype(np.int64)
    usim6 = jaro_winkler_sim6([vbytes[x] for x in ua], [vbytes[x] for x in ub])
    sim6 = usim6[inv]

    # argmax per (pair, i): max sim6, ties -> larger j (lieu's tuple max)
    gid = pair_of * (int(k1.max()) + 1) + i_idx
    order = np.lexsort((j_idx, sim6, gid))
    g_sorted = gid[order]
    last = np.nonzero(np.r_[g_sorted[1:] != g_sorted[:-1], True])[0]
    best = order[last]
    bmask = sim6[best] >= theta6
    best = best[bmask]
    if best.size == 0:
        return n_close, soft

    br = pair_of[best]
    s_i = np.concatenate([np.asarray(v, np.float64) for v in scores_i if len(v)])
    s_j = np.concatenate([np.asarray(v, np.float64) for v in scores_j if len(v)])
    offs_i = np.r_[0, np.cumsum(k1)][:-1]
    offs_j = np.r_[0, np.cumsum(k2)][:-1]
    contrib = (sim6[best] / 1e6) * s_i[offs_i[br] + i_idx[best]] * s_j[offs_j[br] + j_idx[best]]
    # best is ordered by (pair, i) ascending -> deterministic sum order
    np.add.at(soft, br, contrib)
    np.add.at(n_close, br, 1)
    return n_close, soft


# ---------------------------------------------------------------------------
# relational wrapper
# ---------------------------------------------------------------------------

_RESULT = StructType(
    [StructField("n_close", IntegerType()), StructField("soft", DoubleType())]
)


def make_soft_tfidf_udf(theta6: int = THETA6):
    @F.pandas_udf(_RESULT)
    def soft_udf(ti: pd.Series, si: pd.Series, tj: pd.Series, sj: pd.Series) -> pd.DataFrame:
        n_close, soft = soft_tfidf_batch(ti, si, tj, sj, theta6=theta6)
        return pd.DataFrame({"n_close": n_close.astype("int32"), "soft": soft})

    return soft_udf


def capped_token_scores(
    docs_tokens: DataFrame, id_col: str = "doc_id", max_tokens: int = MAX_TOKENS
) -> DataFrame:
    """(id, n_tok, toks asc, scores aligned): the max_tokens RAREST
    tokens per doc (rank df ASC, tf DESC, token ASC — integers only),
    L2-renormalized over the KEPT vector. toks sorted ascending so the
    array index is the deterministic j of the argmax tie-break.

    Why renormalize: the full-vector norm spreads unit mass over every
    distinct token, so for docs with >> max_tokens distinct tokens the
    kept 64 carry only a fraction of squared mass and even a PERFECT
    match (every kept token at sim 1.0) scores far below
    threshold_likely — silent recall loss on long near-identical docs
    (round-2 advisory). Renormalizing over the kept vector restores
    "identical docs -> 1.0" at any length; for docs with <= max_tokens
    distinct tokens the kept set IS the full vector, so this is
    exactly the reference's full-iteration semantics
    (lib/lieu/similarity.py:14-60 iterates all tokens, no cap)."""
    from .weighting import tfidf_scores

    scored = tfidf_scores(docs_tokens, id_col=id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("df").asc(), F.col("tf").desc(), F.col("token").asc()
    )
    kept = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= max_tokens
    )
    kw = Window.partitionBy(id_col)
    kept = kept.withColumn(
        "_knorm", F.sqrt(F.sum(F.col("score_norm") * F.col("score_norm")).over(kw))
    ).withColumn(
        "score_norm",
        F.when(F.col("_knorm") > 0, F.col("score_norm") / F.col("_knorm")).otherwise(
            F.col("score_norm")
        ),
    ).drop("_knorm")
    pairs = kept.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("token"), F.col("score_norm")))
        ).alias("ts")
    )
    return pairs.select(
        F.col(id_col).alias("id"),
        F.size("ts").alias("n_tok"),
        F.col("ts.token").alias("toks"),
        F.col("ts.score_norm").alias("scores"),
    )


def soft_tfidf_for_pairs(
    pairs: DataFrame,
    docs_tokens: DataFrame,
    id_col: str = "doc_id",
    theta6: int = THETA6,
    max_tokens: int = MAX_TOKENS,
) -> DataFrame:
    """(id_a, id_b) pairs -> (id_a, id_b, n_a, n_b, n_close, soft6).

    soft6 = round(1e6 * Soft-TFIDF similarity). The iteration side is
    the one with FEWER kept tokens (strict: swap only when n_b < n_a),
    matching lieu similarity.py:52-53.
    """
    ts = capped_token_scores(docs_tokens, id_col=id_col, max_tokens=max_tokens)
    a = ts.select(
        F.col("id").alias("id_a"), F.col("n_tok").alias("n_a"),
        F.col("toks").alias("toks_a"), F.col("scores").alias("scores_a"),
    )
    b = ts.select(
        F.col("id").alias("id_b"), F.col("n_tok").alias("n_b"),
        F.col("toks").alias("toks_b"), F.col("scores").alias("scores_b"),
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    swap = F.col("n_b") < F.col("n_a")
    staged = joined.select(
        "id_a", "id_b", "n_a", "n_b",
        F.when(swap, F.col("toks_b")).otherwise(F.col("toks_a")).alias("ti"),
        F.when(swap, F.col("scores_b")).otherwise(F.col("scores_a")).alias("si"),
        F.when(swap, F.col("toks_a")).otherwise(F.col("toks_b")).alias("tj"),
        F.when(swap, F.col("scores_a")).otherwise(F.col("scores_b")).alias("sj"),
    )
    udf = make_soft_tfidf_udf(theta6)
    out = staged.withColumn("r", udf("ti", "si", "tj", "sj"))
    return out.select(
        "id_a", "id_b", "n_a", "n_b",
        F.col("r.n_close").alias("n_close"),
        F.round(F.col("r.soft") * 1e6).cast("long").alias("soft6"),
    )
