"""Distributed BPE training (functions/bpe.py).

The classic Sennrich example must learn the textbook merges; the
wrapped-symbol string-replace must behave exactly like the published
greedy left-to-right merge-all pass on back-to-back merge sites; and
token counting must fall back to character count out-of-vocab.
"""

from pyspark.sql import functions as F

from lieu_spark.functions.bpe import bpe_token_counts, train_bpe


def test_bpe_learns_textbook_merges(spark):
    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "low new wider"),
        ],
        ["doc_id", "text"],
    )
    merges, vocab = train_bpe(docs, n_merges=5)
    got = [(r.step, r.w1, r.w2, r.pair_count) for r in merges.orderBy("step").collect()]
    assert got == [
        (1, "l", "o", 6),
        (2, "lo", "w", 6),
        (3, "e", "w", 5),
        (4, "n", "ew", 5),
        (5, "e", "r", 3),
    ]
    seg = {r.word: r.seq for r in vocab.collect()}
    assert seg["low"] == " low "
    assert seg["newest"] == " new  e  s  t "


def test_bpe_greedy_back_to_back_merges(spark):
    # [a,b,a,b] with merge (a,b) must become [ab, ab] — both sites fire
    # (the double-wrap keeps the next site's boundary intact); [a,a,a]
    # with (a,a) must become [aa, a] (left-to-right, non-overlapping).
    docs = spark.createDataFrame([(1, "abab abab"), (2, "aaa")], ["doc_id", "text"])
    merges, vocab = train_bpe(docs, n_merges=2)
    got = [(r.w1, r.w2) for r in merges.orderBy("step").collect()]
    # pair counts in 'abab': (a,b)x2, (b,a)x1 per occurrence, x2 words;
    # 'aaa' adds (a,a)x2 -> argmax step1 = (a,b) count 4
    assert got[0] == ("a", "b")
    seg = {r.word: r.seq for r in vocab.collect()}
    assert seg["abab"].split() == ["ab", "ab"]
    # step 2 is a tie — (ab,ab) count 2 vs (a,a) count 2 — and the
    # (w1, w2) ascending tie-break makes (a,a) win deterministically,
    # so the left-to-right non-overlap property is always exercised.
    assert got[1] == ("a", "a")
    assert seg["aaa"].split() == ["aa", "a"]


def test_bpe_argmax_tiebreak_deterministic(spark):
    # (a,b) and (c,d) both count 2: tie-break is (w1, w2) ascending
    docs = spark.createDataFrame([(1, "ab ab cd cd")], ["doc_id", "text"])
    merges, _ = train_bpe(docs, n_merges=1)
    r = merges.collect()[0]
    assert (r.w1, r.w2, r.pair_count) == ("a", "b", 2)


def test_bpe_token_counts_oov_fallback_and_empty(spark):
    train = spark.createDataFrame(
        [(1, "hello hello hello world world")], ["doc_id", "text"]
    )
    _, vocab = train_bpe(train, n_merges=3)
    apply_docs = spark.createDataFrame(
        [(1, "hello world"), (2, "zzz"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bpe_tokens, r.n_words)
        for r in bpe_token_counts(apply_docs, vocab).collect()
    }
    seg = {r.word: len(r.seq.split()) for r in vocab.collect()}
    assert got[1] == (seg["hello"] + seg["world"], 2)
    assert got[2] == (3, 1)  # OOV 'zzz' falls back to char count
    assert got[3] == (0, 0)  # empty doc visible


def test_bpe_pair_exhaustion_keeps_vocab(spark):
    # n_merges beyond the corpus's supply of pairs: the exhausted steps
    # have an EMPTY argmax frame, which must leave the vocab table
    # untouched (a crossJoin there would wipe it to zero rows) and emit
    # no merge rows for those steps.
    docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    merges, vocab = train_bpe(docs, n_merges=4)
    got = [(r.step, r.w1, r.w2, r.pair_count) for r in merges.orderBy("step").collect()]
    assert got == [(1, "a", "b", 3)]
    rows = vocab.collect()
    assert [(r.word, r.cnt, r.seq) for r in rows] == [("ab", 3, " ab ")]


def test_bpe_min_word_count_prunes_hapax(spark):
    docs = spark.createDataFrame([(1, "aa aa aa zq")], ["doc_id", "text"])
    merges, vocab = train_bpe(docs, n_merges=1, min_word_count=2)
    assert [r.word for r in vocab.collect()] == ["aa"]
    r = merges.collect()[0]
    assert (r.w1, r.w2, r.pair_count) == ("a", "a", 3)


def test_bpe_token_counts_shuffle_join_parity(spark):
    # broadcast_vocab=False (corpus-scale vocab) must be value-identical
    # to the default map-side join
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer"), (3, "")],
        "doc_id long, text string",
    )
    _, vocab = train_bpe(docs, n_merges=4)
    a = {r.doc_id: (r.n_bpe_tokens, r.n_words)
         for r in bpe_token_counts(docs, vocab).collect()}
    b = {r.doc_id: (r.n_bpe_tokens, r.n_words)
         for r in bpe_token_counts(docs, vocab, broadcast_vocab=False).collect()}
    assert a == b
