"""Tiered dedup report — token/doc survival per dedup tier.

The accounting layer of a web-scale dedup stack: for one corpus, how
many documents and tokens survive each successively looser tier —

  raw        — the corpus as ingested
  exact      — byte-identical document dedupe (sha key)
  normalized — normalize-then-hash dedupe (functions/text.py
               normalize_template: the Falcon/RefinedWeb tier that
               collapses counter/case/whitespace variants)
  line       — C4-style corpus-wide line dedup (operators/linededup.py
               first-occurrence rule, blanks exempt)

This is the report that sizes a 100 TB dedup plan (what fraction of
the token budget each tier buys) before committing to the expensive
near-dup tiers; the near/semantic tiers have their own operators
(lsh.py, semdedup.py) whose outputs aren't a fixed-key grouping, so
they report through curate()'s stage metrics instead.

Scale shape: ONE corpus-wide hash agg to the (sha, norm_key) grain —
both doc-level tiers then re-aggregate that tiny frame, so the corpus
is scanned and shuffled once for three tiers (the exact/normalized
re-aggs are map-side combinable over an already-reduced input). The
line tier rides kept_lines()'s three bounded equi-shuffles. Percentages
are exact integer math ((1e6 * kept) div raw — both engines truncate
non-negative integer division identically), so the DuckDB oracle
re-derives every row bit-for-bit.

No lieu analog (lieu emits pairwise dupes, not budget accounting);
beyond-reference training-data operator in the spirit of SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from .linededup import explode_lines, kept_lines


def tier_report(
    docs: DataFrame, id_col: str = "doc_id", lines_col: str = "lines"
) -> DataFrame:
    """4-row frame (tier, n_units, n_tokens, tokens_pct6) over a
    (id, lines: array<string>) corpus; document text is the
    newline-join of its lines."""
    joined = F.concat_ws("\n", F.col(lines_col))
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(lines_col).alias("__lines"),
        F.md5(joined).alias("__sha"),
        F.md5(T.normalize_template(joined)).alias("__nkey"),
        F.size(T.tokenize(joined)).cast("long").alias("__ntok"),
    )
    # one corpus-wide shuffle to the (sha, norm_key) grain; text is
    # constant within a cell, so min(__ntok) is THE token count.
    # Materialized: three differently-pruned consumers (raw / exact /
    # normalized re-aggs) would otherwise each re-run the corpus agg —
    # column pruning defeats exchange reuse (see CLAUDE.md); the frame
    # is already reduced to <= one row per distinct document.
    # localCheckpoint, not persist: persist() entries live in the cache
    # manager until an explicit unpersist nobody here can issue (the
    # consumers are lazy), leaking one distinct-doc-scale cached table
    # per call in chained sessions; checkpoint blocks are context-
    # cleaned when the frame is GC'd.
    g = base.groupBy("__sha", "__nkey").agg(
        F.count("*").cast("long").alias("__cnt"),
        F.min("__id").alias("__mid"),
        F.min("__ntok").alias("__ntok"),
    ).localCheckpoint(eager=False)

    raw = g.agg(
        F.lit("1_raw").alias("tier"),
        F.sum("__cnt").cast("long").alias("n_units"),
        F.sum(F.col("__cnt") * F.col("__ntok")).cast("long").alias("n_tokens"),
    )
    exact = g.groupBy("__sha").agg(F.min("__ntok").alias("__t")).agg(
        F.lit("2_exact").alias("tier"),
        F.count("*").cast("long").alias("n_units"),
        F.sum("__t").cast("long").alias("n_tokens"),
    )
    # normalized-tier representative = the member with the smallest id
    # (token counts DIFFER within a normalized group)
    norm = (
        g.groupBy("__nkey")
        .agg(F.min(F.struct("__mid", "__ntok")).alias("__rep"))
        .agg(
            F.lit("3_normalized").alias("tier"),
            F.count("*").cast("long").alias("n_units"),
            F.sum("__rep.__ntok").cast("long").alias("n_tokens"),
        )
    )
    kept = kept_lines(
        explode_lines(base.select(F.col("__id").alias(id_col), F.col("__lines").alias(lines_col)), id_col, lines_col),
        id_col,
    )
    # n_units counts docs with >= 1 NON-BLANK surviving line: blank
    # lines are dedup-exempt, so a doc whose real lines all dedup away
    # still has its blanks in kept — counting it as a surviving unit
    # overstated line-tier survival vs curate()'s line_dedup stage,
    # which drops exactly those rebuilt-empty docs (blank lines
    # tokenize to 0, so n_tokens is unaffected either way)
    line = kept.select(
        F.col(id_col),
        F.size(T.tokenize(F.col("line"))).cast("long").alias("__t"),
        F.when(F.trim(F.col("line")) != "", F.col(id_col)).alias("__nbid"),
    ).agg(
        F.lit("4_line").alias("tier"),
        F.countDistinct("__nbid").cast("long").alias("n_units"),
        F.sum("__t").cast("long").alias("n_tokens"),
    )

    tiers = raw.unionByName(exact).unionByName(norm).unionByName(line)
    raw_tot = raw.select(F.col("n_tokens").alias("__raw_tokens"))
    # guard the ANSI integer div: a degenerate-but-valid corpus whose
    # every line tokenizes to [] has __raw_tokens = 0 — emit NULL
    # percentages instead of DIVIDE_BY_ZERO killing the report
    return tiers.crossJoin(F.broadcast(raw_tot)).select(
        "tier",
        "n_units",
        "n_tokens",
        F.expr(
            "case when __raw_tokens > 0"
            " then (1000000 * n_tokens) div __raw_tokens end"
        ).alias("tokens_pct6"),
    )
