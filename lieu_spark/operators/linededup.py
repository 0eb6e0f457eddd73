"""C4-style line-level exact deduplication (first occurrence kept).

The C4 / RefinedWeb recipe removes every repeated LINE across the whole
corpus except its first occurrence (by document order, then position) —
the workhorse against boilerplate headers/footers/navigation that
survives document-level dedupe because the surrounding text differs.
No lieu analog (lieu dedupes whole records); this is a training-data
pipeline addition in the spirit of SURVEY.md §7's funnel stages.

Physical shape (scale-first):
- input is the exploded (doc_id, line_idx, line) occurrence table;
- first occurrence per distinct line = ``groupBy(md5(line)).agg(min
  (struct(doc_id, line_idx)))`` — a map-side-combinable partial agg, so
  hot boilerplate lines (the entire point of the operator) never skew a
  shuffle: each map task pre-reduces them to one row;
- occurrences join the firsts table on the fixed-width 32-char md5 key
  (never the raw line text) and keep the row iff it IS the first;
- per-doc reassembly is one groupBy(doc_id) with an in-memory
  ``array_sort(collect_list(struct(line_idx, line)))`` — bounded by
  lines-per-doc, not corpus size.

Three shuffles total (agg on line key, join back, re-agg on doc) — each
an equi-hash exchange AQE can size; nothing is ever sorted globally and
no window runs over the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
) -> DataFrame:
    """(id, line_idx, line) occurrence table from an array<string>
    column; line_idx is the 0-based position within the doc."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.col(lines_col)).alias("line_idx", "line"),
    )


def kept_lines(
    lined: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The surviving occurrences ``(id_col, line_idx, line)`` of a
    corpus-wide first-occurrence line dedup: a line occurrence survives
    iff it IS the global ``min(struct(id, line_idx))`` for its distinct
    line value.

    Blank lines (empty after trim) are EXEMPT and always survive: an
    empty line is paragraph structure, not boilerplate — deduping it
    corpus-wide would strip every paragraph separator except one global
    first occurrence. The exemption also keeps blank occurrences out of
    the dedup shuffle entirely (they'd otherwise be the hottest key in
    the corpus)."""
    blank = F.trim(F.col("line")) == F.lit("")
    occ = lined.filter(~blank).withColumn("__line_key", F.md5(F.col("line")))
    firsts = occ.groupBy("__line_key").agg(
        F.min(F.struct(F.col(id_col), F.col("line_idx"))).alias("__first")
    )
    survivors = (
        occ.join(firsts, "__line_key")
        .filter(
            (F.col(id_col) == F.col(f"__first.{id_col}"))
            & (F.col("line_idx") == F.col("__first.line_idx"))
        )
        .select(id_col, "line_idx", "line")
    )
    return survivors.unionByName(
        lined.filter(blank).select(id_col, "line_idx", "line")
    )


def dedupe_lines_text(
    lined: DataFrame,
    id_col: str = "doc_id",
    text_alias: str = "text",
) -> DataFrame:
    """The C4 mutation itself: per-doc kept text — surviving lines
    re-joined with ``\\n`` in original order. A doc whose every line was
    seen earlier comes back with an empty string; callers decide the
    empty-doc policy (curate() drops them)."""
    kept = kept_lines(lined, id_col)
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_alias)
    )


def dedupe_lines(
    lined: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide first-occurrence line dedup over an occurrence table
    ``(id_col, line_idx, line)``.

    Returns one row per input document:
    ``(id_col, n_lines, n_kept, kept_sha)`` where ``kept_sha`` is the
    sha256 of the surviving lines re-joined with ``\\n`` in original
    order — an exact, order-sensitive witness of the kept text.
    """
    kept = kept_lines(lined, id_col)
    totals = lined.groupBy(id_col).agg(F.count("*").cast("long").alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sha2(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda s: s["line"],
                ),
            ),
            256,
        ).alias("kept_sha"),
    )
    # left join so a doc whose every line was seen earlier still reports
    # (n_kept=0, kept_sha of "") instead of vanishing.
    empty_sha = F.sha2(F.lit(""), 256)
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce(F.col("kept_sha"), empty_sha).alias("kept_sha"),
    )
