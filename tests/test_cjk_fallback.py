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


def _boundary_transcripts(spark):
    """Near-dup pairs that STRADDLE the fallback boundary (ratio ~10):
    a mostly-CJK clause plus a tail of latin tokens; the dup drops two
    latin tokens, nudging its chars-per-token ratio across avg_len while
    the original stays below. Both land inside the default 20%
    hysteresis band."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    cjk_letters = CJK37.replace(" ", "")
    for c in range(8):
        # one 107-char unsegmented CJK token + 20 latin tokens of 5
        # chars: base ratio (107+100)/21 = 9.86 (word-primary, in band);
        # dup drops the LAST latin token -> (107+95)/20 = 10.1
        # (char-primary, in band) — a genuine straddle. Word-shingle
        # J = 16/17 = 0.941 >= threshold_likely.
        clause = "".join(
            cjk_letters[(c * 11 + i) % len(cjk_letters)] for i in range(107)
        )
        tail = [f"w{c}{i:02d}x" for i in range(20)]
        base = clause + " " + " ".join(tail)
        dup = clause + " " + " ".join(tail[:-1])
        rows.append((f"bconv{c}", 0, "user", base, None, t0))
        rows.append((f"bdup{c}", 0, "user", dup, None, t0))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_boundary_straddling_pairs_found_with_hysteresis(spark):
    """Round-2 advisory: a near-dup pair with one doc on each side of
    char_fallback_avg_len used to land in disjoint hash families
    (guaranteed J=0, pair lost). With the hysteresis band both docs
    emit both families, band in both, and verify family-aligned."""
    from pyspark.sql import functions as F2

    from lieu_spark.functions.text import canon_nospace, char_fallback_cond, tokenize
    from lieu_spark.oracle import family_jaccard

    tr = _boundary_transcripts(spark)
    cfg = DedupeConfig()

    # fixture sanity: at least one pair must genuinely straddle avg_len
    docs = tr.withColumn("tokens", tokenize(F2.col("text"))).withColumn(
        "cns", canon_nospace(F2.col("text"))
    )
    sides = {
        r.conv_id: r.cp
        for r in docs.select(
            "conv_id",
            char_fallback_cond(
                F2.col("cns"), F2.col("tokens"), cfg.char_fallback_avg_len
            ).alias("cp"),
        ).collect()
    }
    straddling = [
        c for c in range(8) if sides[f"bconv{c}"] != sides[f"bdup{c}"]
    ]
    assert straddling, f"fixture never straddles the boundary: {sides}"

    res = run_pipeline(spark, tr, cfg, with_spans=False)
    got = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in dupe_pairs(res.verified).select("id_a", "id_b").collect()
    }
    texts = {r.conv_id: r.text for r in tr.collect()}
    for c in straddling:
        pair = tuple(sorted((f"bconv{c}", f"bdup{c}")))
        # only require pairs the family-aligned oracle scores as dupes
        if family_jaccard(texts[pair[0]], texts[pair[1]], cfg) >= cfg.threshold_likely:
            assert pair in got, (pair, sorted(got))

    # regression direction: with hysteresis disabled these same pairs
    # are guaranteed lost (disjoint families -> J=0)
    res0 = run_pipeline(
        spark, tr, DedupeConfig(char_fallback_hysteresis=0.0), with_spans=False
    )
    got0 = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in dupe_pairs(res0.verified).select("id_a", "id_b").collect()
    }
    for c in straddling:
        assert tuple(sorted((f"bconv{c}", f"bdup{c}"))) not in got0


def test_hysteresis_zero_alt_columns_empty(spark):
    """char_fallback_hysteresis=0 reproduces the single-family feature
    table exactly: alt arrays empty, alt sigs null — and the latin
    corpus never pays the band even at the default setting."""
    from pyspark.sql import functions as F2

    from lieu_spark.corpus import generate_df
    from lieu_spark.operators.assemble import assemble_conversations
    from lieu_spark.pipeline import build_features

    convs = assemble_conversations(generate_df(spark, 42, 40))
    for cfg in (DedupeConfig(), DedupeConfig(char_fallback_hysteresis=0.0)):
        feats = build_features(convs, cfg)
        n_alt = feats.filter(
            (F2.size("alt_hashes") > 0) | F2.col("alt_sig").isNotNull()
        ).count()
        assert n_alt == 0, cfg.char_fallback_hysteresis


def test_boundary_straddling_pair_signatures_mode(spark):
    """The family alignment must hold in verify_mode='signatures' too:
    a straddling pair compares word-sig to word-sig via the band side's
    alt_sig, not primary-to-primary across disjoint families."""
    tr = _boundary_transcripts(spark)
    cfg = DedupeConfig(verify_mode="signatures")
    res = run_pipeline(spark, tr, cfg, with_spans=False)
    got = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in dupe_pairs(res.verified).select("id_a", "id_b").collect()
    }
    # identical token multisets -> identical word sigs -> agreement 1.0;
    # the byte-identical fixture pairs are the guaranteed subset
    # (signature agreement is an ESTIMATOR for near-dups, so only exact
    # word-set twins are asserted here)
    from pyspark.sql import functions as F2

    from lieu_spark.functions.text import canon_nospace, char_fallback_cond, tokenize

    docs = tr.withColumn("tokens", tokenize(F2.col("text"))).withColumn(
        "cns", canon_nospace(F2.col("text"))
    )
    sides = {
        r.conv_id: r.cp
        for r in docs.select(
            "conv_id",
            char_fallback_cond(
                F2.col("cns"), F2.col("tokens"), cfg.char_fallback_avg_len
            ).alias("cp"),
        ).collect()
    }
    straddling = [c for c in range(8) if sides[f"bconv{c}"] != sides[f"bdup{c}"]]
    assert straddling
    # word-shingle sets differ only by trailing windows (J=16/17), so
    # sig agreement is high; require the pairs to at least be CANDIDATES
    # that verified >= review tier rather than vanishing at J=0
    reviewed = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in res.verified.filter("jaccard >= 0.7").select("id_a", "id_b").collect()
    }
    for c in straddling:
        pair = tuple(sorted((f"bconv{c}", f"bdup{c}")))
        assert pair in (got | reviewed), (pair, sorted(got | reviewed))
