"""Bloom-filter decontamination prefilter — the fixed-size-bitmap
scale path for exact n-gram screening.

The GPT-3-style verbatim rule (see queries.q_verbatim_13gram_decon and
functions/text.verbatim_ngram_keys) equi-joins training n-gram keys
against the eval corpus's n-gram keys. That join shuffles the training
side on the gram key — correct, but at 100 TB the screening stage
should not shuffle at all when the eval set is fixed: fold the eval
n-grams into an m-bit Bloom bitmap once, broadcast it, and test every
training gram map-side. No lieu analog (lieu's blocking joins raw keys,
lib/lieu/spark/dedupe.py); this is a beyond-reference scale operator in
the spirit of SURVEY.md §7's decontamination stage.

Physical shape (scale-first):
- the bitmap is RELATIONAL: ``bloom_words`` reduces the eval grams to
  at most ceil(m/64) ``(word_idx, word)`` rows via one combinable
  ``bit_or`` agg — the only shuffle, over the (small) eval side, and
  its size is FIXED by m regardless of eval-corpus size;
- ``bloom_screen`` collapses those rows to a single map<long,long> row
  (lazy 1-row agg, no driver action) and broadcast-cross-joins it onto
  the gram stream; the k probe positions, the map lookups, and the
  bit tests are all closed-form Catalyst expressions inside one
  whole-stage-codegen span — ZERO shuffle, ZERO explode, ZERO UDF on
  the (huge) training side;
- probes hash with seeded md5-prefix arithmetic (the house pattern:
  ``conv(substr(md5('bloom<s>:' || g), 1, 15), 16, 10) % m``), so a
  DuckDB oracle re-derives the bitmap AND every membership verdict in
  pure SQL;
- false positives are the standard Bloom rate ((1 - e^{-kn/m})^k);
  there are NO false negatives, so the exact equi-join (the verify
  stage) runs only on the screened survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def probe_positions(g: Column, m: int, k: int) -> Column:
    """array<long> of the k Bloom bit positions for one gram key —
    seeded md5-prefix arithmetic, identical in DuckDB as
    ``CAST(concat('0x', substr(md5('bloom<s>:' || g), 1, 15)) AS
    BIGINT) % m``. 15 hex digits < 2^60, so the cast never overflows
    and pmod == % (non-negative)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"bloom{s}:"), g)), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(m),
            )
            for s in range(k)
        ]
    )


def bloom_words(grams: DataFrame, gram_col: str = "g", m: int = 1 << 16,
                k: int = 4) -> DataFrame:
    """(word_idx:long, word:long, __m:long, __k:long) bitmap words for
    the gram set — at most ceil(m/64) rows. One explode over the
    (small) member side and one map-side-combinable bit_or agg; hot
    grams pre-reduce. The build parameters ride along as constant
    metadata columns so bloom_screen can verify it probes with the
    same (m, k) the bits were set with — a silent mismatch would
    produce FALSE NEGATIVES, breaking the one guarantee the exact
    verify stage downstream relies on."""
    # NULL grams out: probe_positions(NULL) yields k NULL positions,
    # which become a (word_idx=NULL, word=NULL) bitmap row that makes
    # bloom_screen's map_from_entries throw 'map key cannot be null'
    # at runtime — same pre-sketch null policy as the KMV family
    pos = grams.filter(F.col(gram_col).isNotNull()).select(
        F.explode(probe_positions(F.col(gram_col), m, k)).alias("__pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("__pos"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
                "__bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
        .withColumn("__m", F.lit(m).cast("long"))
        .withColumn("__k", F.lit(k).cast("long"))
    )


def bloom_screen(
    grams: DataFrame,
    bloom: DataFrame,
    gram_col: str = "g",
    m: int = 1 << 16,
    k: int = 4,
    out: str = "might_contain",
) -> DataFrame:
    """grams + a boolean ``might_contain`` column — true iff all k
    probe bits are set in the bitmap. The bitmap rows collapse to ONE
    map<long,long> row (lazy agg — no action during plan construction)
    broadcast onto the stream; every probe is a map lookup + bit test
    in codegen, so the training side moves through with no shuffle.
    An empty bloom (no members) screens everything out.

    If the bitmap carries bloom_words' (__m, __k) metadata columns, the
    plan VERIFIES they equal this call's (m, k) — probing with
    different parameters than the build silently yields false
    negatives, so a mismatch aborts the job (in-plan assert_true; no
    driver action). An empty bitmap has no recorded parameters and
    passes (it screens everything out regardless of m/k)."""
    aggs = [
        F.map_from_entries(
            F.coalesce(
                F.collect_list(F.struct("word_idx", "word")),
                F.array().cast("array<struct<word_idx:long,word:long>>"),
            )
        ).alias("__bloom")
    ]
    check_params = "__m" in bloom.columns and "__k" in bloom.columns
    if check_params:
        aggs += [F.min("__m").alias("__bm"), F.min("__k").alias("__bk")]
    blob = bloom.groupBy().agg(*aggs)
    probed = grams.crossJoin(F.broadcast(blob)).withColumn(
        "__probes", probe_positions(F.col(gram_col), m, k)
    )
    hit_all = F.expr(
        "forall(__probes, p -> "
        "(coalesce(element_at(__bloom, shiftright(p, 6)), CAST(0 AS BIGINT)) "
        "& shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) <> 0)"
    )
    drop = ["__bloom", "__probes"]
    if check_params:
        ok = F.col("__bm").isNull() | (
            (F.col("__bm") == F.lit(m)) & (F.col("__bk") == F.lit(k))
        )
        guard = F.assert_true(
            ok,
            F.lit(
                f"bloom_screen(m={m}, k={k}) does not match the bitmap's "
                "build parameters — probing with different m/k than "
                "bloom_words used produces false negatives"
            ),
        )
        # assert_true is NULL when ok and throws otherwise; folding it
        # into the output column keeps it from being pruned away
        hit_all = F.when(guard.isNull(), hit_all)
        drop += ["__bm", "__bk"]
    return probed.withColumn(out, hit_all).drop(*drop)
