"""Distributed BPE tokenizer training — byte-pair-encoding merge
learning (Sennrich et al. 2016) as pure Catalyst relational algebra.

The published algorithm: split every word into characters, repeatedly
count adjacent symbol pairs (weighted by word frequency) and merge the
most frequent pair everywhere, left-to-right greedy. The standard
implementation works on the DISTINCT-WORD table, not the corpus — and
that is exactly what makes it scale on Spark: one corpus pass builds
(word, count), then every merge iteration is one map-side-combinable
aggregation + one broadcast join over the vocab-sized table. The
corpus (100 TB) is touched once for counting and once to apply the
learned segmentation; the k-iteration loop never sees it.

No UDF anywhere. The symbol sequence of a word is a STRING with every
symbol wrapped in single spaces (``" a  b  a "``): applying merge
(a, b) is then one ``replace(seq, ' a  b ', ' ab ')`` — string replace
is left-to-right non-overlapping with the scan resuming after the
replacement, which is exactly BPE's greedy merge-all pass (the
double-wrap keeps the boundary space of the NEXT candidate intact, so
back-to-back merge sites all fire: " a  b  a  b " -> " ab  ab ").
Tokens contain only \\p{L}\\p{N} (functions/text.tokenize), so a space
can never occur inside a symbol. Every step is replayable in ANSI SQL
— the DuckDB oracle re-learns all the merges from raw text and must
pick identical pairs with identical counts.

The argmax pair per iteration is a LAZY 1-row aggregate applied via
broadcast crossJoin (no driver action at plan-construction time, per
the repo rule); each iteration's vocab frame is lazily
localCheckpoint'ed so the k-step lineage doesn't nest k explodes deep
(same recipe as the connected-components loop, operators/cluster.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(word, cnt) distinct-word frequencies — the one corpus pass."""
    from .text import tokenize

    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_seq(word) -> "F.Column":
    """' c1  c2  ...  cn ' — every character wrapped in single spaces."""
    chars = F.split(word, "")
    chars = F.filter(chars, lambda c: c != "")
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _syms(seq) -> "F.Column":
    return F.split(F.trim(seq), "  ")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency — one
    explode + one combinable agg over the vocab table."""
    s = vocab.select("cnt", _syms(F.col("seq")).alias("syms"))
    pairs = s.select(
        "cnt",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) < 2 THEN array() "
                "ELSE transform(sequence(2, size(syms)), "
                "i -> struct(syms[i-2] AS w1, syms[i-1] AS w2)) END"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.w1", "p.w2").agg(
        F.sum("cnt").cast("long").alias("pair_count")
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_word_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, vocab):
    merges = (step, w1, w2, pair_count) in learning order;
    vocab  = (word, cnt, seq) with the final segmentation (``seq`` in
    the wrapped-symbol form; ``size(split(trim(seq), '  '))`` is the
    word's subword count). ``min_word_count`` prunes hapax words from
    the working table (the standard vocab-size guard at scale)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    wc = word_counts(docs, id_col, text_col)
    if min_word_count > 1:
        wc = wc.filter(F.col("cnt") >= min_word_count)
    vocab = wc.select("word", "cnt", _initial_seq(F.col("word")).alias("seq"))
    merges = []
    for step in range(1, n_merges + 1):
        vocab = vocab.localCheckpoint(eager=False)
        pc = _pair_counts(vocab)
        m = (
            pc.orderBy(F.desc("pair_count"), "w1", "w2")
            .limit(1)
            .select(F.lit(step).alias("step"), "w1", "w2", "pair_count")
        )
        merges.append(m)
        # LEFT join on a constant key, not crossJoin: if the corpus runs
        # out of pairs before n_merges, the argmax frame is EMPTY and a
        # crossJoin would silently wipe the whole vocab table (and every
        # later step); the left join leaves seq untouched instead.
        mk = m.select("w1", "w2").withColumn("__k", F.lit(1))
        vocab = (
            vocab.withColumn("__k", F.lit(1))
            .join(F.broadcast(mk), "__k", "left")
            .select(
                "word",
                "cnt",
                F.when(F.col("w1").isNull(), F.col("seq"))
                .otherwise(
                    F.replace(
                        F.col("seq"),
                        F.concat(
                            F.lit(" "), F.col("w1"), F.lit("  "), F.col("w2"), F.lit(" ")
                        ),
                        F.concat(F.lit(" "), F.col("w1"), F.col("w2"), F.lit(" ")),
                    )
                )
                .alias("seq"),
            )
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out, vocab


def bpe_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-doc token count under the learned segmentation: each doc's
    words join the vocab for their subword count and sum — the corpus
    is touched once, words outside the trained vocab fall back to
    character count (their untrained segmentation), empty docs stay
    visible with 0.

    ``broadcast_vocab``: the vocab is one row per distinct word of the
    TRAINING corpus — small for a trained tokenizer, but unbounded when
    the vocab was learned over the scoring corpus itself. The default
    forces the map-side join (no shuffle of the word stream); pass
    False for corpus-scale vocabs so the join degrades to a shuffle
    instead of a driver-OOM broadcast (the same measured-gate rule
    refresh applies to its CDC prunes, CLAUDE.md)."""
    from .text import tokenize

    seg = vocab.select(
        "word", F.size(_syms(F.col("seq"))).cast("long").alias("n_sub")
    )
    if broadcast_vocab:
        seg = F.broadcast(seg)
    dw = docs.select(
        F.col(id_col).alias(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
    )
    per_word = dw.join(seg, "word", "left").select(
        id_col,
        F.coalesce(F.col("n_sub"), F.length("word").cast("long")).alias("n_sub"),
    )
    agg = per_word.groupBy(id_col).agg(
        F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        F.count("*").cast("long").alias("n_words"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0).cast("long")).alias(
                "n_bpe_tokens"
            ),
            F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
        )
    )
