"""operators/chunking.py — sliding-window chunk boundaries, HF
convention parity with a pure-python twin, and coverage invariants."""

import pytest

from lieu_spark.operators.chunking import chunk_documents


def _py_tokens(text):
    # ASCII twin of functions/text.tokenize (fixtures here are ASCII;
    # the full \p{L}\p{N} parity lives in test_text.py)
    import re

    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _py_chunks(text, max_tokens, overlap):
    toks = _py_tokens(text)
    n = len(toks)
    if n == 0:
        return []
    step = max_tokens - overlap
    c = 1 if n <= max_tokens else -(-(n - max_tokens) // step) + 1
    out = []
    for i in range(c):
        start = i * step
        window = toks[start : start + max_tokens]
        out.append((i, start, len(window), " ".join(window)))
    return out


def _collect(spark, docs, max_tokens, overlap):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = chunk_documents(df, max_tokens, overlap).orderBy(
        "doc_id", "chunk_idx"
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_tok, r.n_chunk_tokens, r.chunk_text)
        )
    return got


def test_chunk_documents_matches_python_twin(spark):
    docs = [
        (0, "a b c d e f g h i j"),          # 10 toks: 3 chunks at max=4,ov=1
        (1, "one two three"),                 # fits: single chunk
        (2, ""),                              # empty: no rows
        (3, None),                            # null: no rows
        (4, " ".join(f"t{i}" for i in range(13))),  # 13 toks
        (5, "x " * 4),                        # exactly max: single chunk
    ]
    got = _collect(spark, docs, max_tokens=4, overlap=1)
    for doc_id, text in docs:
        assert got.get(doc_id, []) == _py_chunks(text, 4, 1), doc_id
    assert 2 not in got and 3 not in got
    # explicit boundary check for doc 0: starts 0, 3, 6 and the final
    # window carries the last 4 tokens
    assert [(c[1], c[3]) for c in got[0]] == [
        (0, "a b c d"),
        (3, "d e f g"),
        (6, "g h i j"),
    ]


def test_chunk_documents_invariants_and_overlap_content(spark):
    import random

    rng = random.Random(7)
    docs = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(0, 90))))
        for i in range(40)
    ]
    max_tokens, overlap = 16, 5
    step = max_tokens - overlap
    got = _collect(spark, docs, max_tokens, overlap)
    for doc_id, text in docs:
        toks = _py_tokens(text)
        chunks = got.get(doc_id, [])
        assert chunks == _py_chunks(text, max_tokens, overlap)
        if not toks:
            continue
        # contiguous indices, fixed stride, full coverage, bounded size
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        covered = set()
        for idx, start, nct, ctext in chunks:
            assert start == idx * step
            assert 1 <= nct <= max_tokens
            assert ctext.split(" ") == toks[start : start + nct]
            covered.update(range(start, start + nct))
        assert covered == set(range(len(toks)))
        # consecutive full chunks share exactly `overlap` tokens
        for (_, s1, n1, t1), (_, s2, _, t2) in zip(chunks, chunks[1:]):
            if n1 == max_tokens:
                assert t1.split(" ")[max_tokens - overlap :] == t2.split(" ")[:overlap]


def test_chunk_documents_validates_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 0, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, 4)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, -1)
