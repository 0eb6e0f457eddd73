"""No-space-script (CJK) char-k-gram fallback — the libpostal-tokenizer
gap (/root/reference/lib/lieu/dedupe.py:328-331).

Under the word tokenizer an unsegmented CJK conversation is ONE token,
so word-shingle near-dup detection degenerates to exact match. The
fallback (functions/text.char_kgram_hash_set, wired into
build_features) switches such docs to char 12-grams. Planted CJK
near-dup conversations must reach dup-pair recall >= 0.99 through the
FULL pipeline — and demonstrably be missed with the fallback disabled.
"""

import pytest
from pyspark.sql import functions as F

from lieu_spark.config import DedupeConfig
from lieu_spark.operators.verify import dupe_pairs
from lieu_spark.pipeline import run_pipeline
from lieu_spark.queries import CJK37, LATIN37

N_CONVS = 25


def _cjk_transcripts(spark):
    """25 CJK conversations (3 turns each) + near-dup copies (suffix
    appended to the last turn). Text is a translate() of deterministic
    latin sentences, so the corpus is reproducible with no RNG."""
    import datetime as dt

    base_words = (
        "spark merge window batch table join line agg small slow stream "
        "customer group data vector shuffle broadcast salt skew plan"
    ).split()
    t0 = dt.datetime(2026, 1, 1)
    rows = []
    for c in range(N_CONVS):
        for t in range(3):
            words = [base_words[(c * 7 + t * 3 + k) % len(base_words)] for k in range(18)]
            latin = " ".join(words) + f" conv{c}marker{t}"
            role = "user" if t % 2 == 0 else "assistant"
            ts = t0 + dt.timedelta(minutes=t)
            rows.append((f"conv{c}", t, role, latin, None, ts))
            dup_text = latin + (" qq" if t == 2 else "")
            rows.append((f"dup{c}", t, role, dup_text, None, ts))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    cjk = F.translate(F.col("text"), LATIN37, CJK37)
    return df.withColumn("text", cjk)


def _planted_recall(verified):
    got = {
        (r.id_a, r.id_b)
        for r in dupe_pairs(verified).select("id_a", "id_b").collect()
    }
    want = {tuple(sorted((f"conv{c}", f"dup{c}"))) for c in range(N_CONVS)}
    hit = sum(1 for p in want if p in got or (p[1], p[0]) in got)
    return hit / len(want)


@pytest.mark.slow
def test_cjk_neardup_recall_with_fallback(spark):
    tr = _cjk_transcripts(spark)
    res = run_pipeline(spark, tr, DedupeConfig(), with_spans=False)
    assert _planted_recall(res.verified) >= 0.99


@pytest.mark.slow
def test_cjk_neardup_missed_without_fallback(spark):
    """Same corpus, fallback disabled: the word-shingle tier sees one
    shingle per conversation and the near-dups (not byte-identical)
    vanish — the degeneration the fallback exists for."""
    tr = _cjk_transcripts(spark)
    cfg = DedupeConfig(char_fallback_avg_len=1e18)
    res = run_pipeline(spark, tr, cfg, with_spans=False)
    assert _planted_recall(res.verified) == 0.0


def test_fallback_untouched_for_latin(spark):
    """Latin docs (~5-6 chars/token) never trigger the fallback: the
    adaptive shingle column equals the plain word-shingle column."""
    from lieu_spark.functions.text import (
        canon_nospace,
        char_fallback_cond,
        shingle_hash_set,
        token_hashes,
        tokenize,
    )
    from lieu_spark.queries import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    d = d.withColumn("tokens", tokenize(F.col("text")))
    d = d.withColumn("cns", canon_nospace(F.col("text")))
    n_fallback = d.filter(
        char_fallback_cond(F.col("cns"), F.col("tokens"), 10.0)
    ).count()
    assert n_fallback == 0
