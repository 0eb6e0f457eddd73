"""P8 asymmetric-evidence guard + F10 auxiliary-field verdict revision.

Reference parity:
  - P8: ``(a1_street and not a2_street) or (a2_street and not a1_street)
    -> NULL_DUPE`` and the house-number twin
    (lib/lieu/dedupe.py:103-108), generalized by
    ``one_address_is_missing_field`` (lib/lieu/dedupe.py:166-169). The
    transcript analog: a field (e.g. ``tool`` — tool-call turns) present
    in exactly ONE conversation of a pair is asymmetric evidence — the
    pair is refused classification (``null_dupe``) rather than scored,
    because the similarity tiers never saw the evidence one side has.
  - F10: ``PhoneNumberDeduper.revised_dupe_class``
    (lib/lieu/dedupe.py:356-372): a NEEDS_REVIEW verdict upgrades to
    LIKELY when the auxiliary signal matches, a LIKELY verdict
    downgrades to NEEDS_REVIEW when both sides carry the signal and it
    mismatches; absent-on-either-side leaves the verdict alone.

Both rules operate on the PAIR frame: one narrow per-conversation
signature table (conv_id, field_sig) double-joined onto the pairs —
the J2 shape — then a pure Catalyst CASE rewrite of ``status``. At
scale the signature table is one map-side-combinable aggregation over
the raw turn rows (the per-conv distinct-value set is bounded by the
application's tool vocabulary), and the double join broadcasts when
small / shuffles on the pair ids once otherwise — no new shuffle shape
beyond what verification already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .verify import STATUS_LIKELY, STATUS_NULL, STATUS_REVIEW


def field_signatures(
    transcripts: DataFrame, field: str = "tool", id_col: str = "conv_id"
) -> DataFrame:
    """(conv_id, field_sig) — the per-conversation auxiliary-field
    signature: '|'-joined sorted distinct non-empty trimmed values of
    ``field`` across the conversation's turns; NULL when the
    conversation has none (the "missing field" side of P8).

    Mirrors the reference's ``a.get(field, '').strip()`` presence test
    (lib/lieu/dedupe.py:166-169): whitespace-only values count as
    absent. collect_set skips nulls, so the WHEN guard both trims and
    filters in one expression; the buffer holds the conversation's
    DISTINCT tool names only (app-vocabulary-bounded, unlike a
    neighborhood list).

    Encoding is INJECTIVE: each value is length-prefixed ("3:web")
    before the '|' join, so {'a|b'} and {'a','b'} produce different
    signatures — a bare join would let distinct value sets collide
    into equal sigs and silently upgrade verdicts on evidence that
    does not match. Any canonical order works (set equality iff sig
    equality), so both engines sort the PREFIXED strings."""
    vals = transcripts.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("conv_id"),
        F.trim(F.col(field)).alias("_v"),
    )
    agg = vals.groupBy("conv_id").agg(
        F.collect_set(F.when(F.length("_v") > 0, F.col("_v"))).alias("_s0")
    )
    pref = F.array_sort(
        F.transform(
            F.col("_s0"),
            lambda v: F.concat(F.length(v).cast("string"), F.lit(":"), v),
        )
    )
    return agg.select(
        "conv_id",
        F.when(F.size("_s0") > 0, F.array_join(pref, "|")).alias("field_sig"),
    )


def combined_field_signatures(
    transcripts: DataFrame,
    fields: list[str],
    id_col: str = "conv_id",
    presence_field: str | None = None,
) -> DataFrame:
    """(conv_id, aux_sig[, aux_class]) — one string combining the
    per-field signatures of every active auxiliary field. Used by the
    pipeline's subgrouped exact star: two conversations land in the
    same subgroup iff EVERY active rule sees them identically.

    Injective like field_signatures: each component (the per-field sig,
    or '\\x00' for absent) is itself length-prefixed before the '\\x1f'
    join, so no value content can forge a component boundary.

    ``presence_field`` (must be one of ``fields``): adds ``aux_class``
    — that field's presence flag ('1'/'0'), the verdict-equivalence
    class the subgrouped star's hub-star keys on (the guard refuses on
    presence XOR only; revision never touches EXACT). None → constant
    '' (single class: no guard active, every same-sha pair is exact)."""
    ordered = sorted(set(fields))
    out = None
    for i, f in enumerate(ordered):
        s = field_signatures(transcripts, field=f, id_col=id_col).select(
            "conv_id", F.col("field_sig").alias(f"_f{i}")
        )
        out = s if out is None else out.join(s, "conv_id", "outer")

    def _component(c):
        v = F.coalesce(F.col(c), F.lit("\x00"))
        return F.concat(F.length(v).cast("string"), F.lit(":"), v)

    sig_cols = [f"_f{i}" for i in range(len(ordered))]
    cls = F.lit("")
    if presence_field is not None:
        if presence_field not in ordered:
            raise ValueError(
                f"presence_field {presence_field!r} not in fields {ordered!r}"
            )
        pcol = f"_f{ordered.index(presence_field)}"
        cls = F.when(F.col(pcol).isNotNull(), F.lit("1")).otherwise(F.lit("0"))
    return out.select(
        "conv_id",
        F.concat_ws("\x1f", *[_component(c) for c in sig_cols]).alias("aux_sig"),
        cls.alias("aux_class"),
    )


def _join_sigs(
    pairs: DataFrame, sigs: DataFrame, id_a: str, id_b: str
) -> DataFrame:
    sa = sigs.select(
        F.col("conv_id").alias(id_a), F.col("field_sig").alias("field_sig_a")
    )
    sb = sigs.select(
        F.col("conv_id").alias(id_b), F.col("field_sig").alias("field_sig_b")
    )
    # LEFT joins: a conversation absent from the signature table (no
    # turn rows at all) is field-absent, not droppable
    return pairs.join(sa, id_a, "left").join(sb, id_b, "left")


def apply_asymmetry_guard(
    verified: DataFrame,
    sigs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """P8: pairs where the auxiliary field is present on exactly one
    side are reclassified ``null_dupe`` (refused), whatever the
    similarity verdict said — parity with the reference's street /
    house-number one-side-missing rule (lib/lieu/dedupe.py:103-108).
    Schema-preserving: only ``status`` changes."""
    cols = verified.columns
    enriched = _join_sigs(verified, sigs, id_a, id_b)
    asym = F.col("field_sig_a").isNotNull() != F.col("field_sig_b").isNotNull()
    return enriched.withColumn(
        "status", F.when(asym, F.lit(STATUS_NULL)).otherwise(F.col("status"))
    ).select(*cols)


def revise_verdicts(
    verified: DataFrame,
    sigs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    keep_same_field: bool = False,
) -> DataFrame:
    """F10: revise each pair's verdict on the auxiliary-field signature
    (lib/lieu/dedupe.py:356-372 semantics):

      needs_review + both present & equal    -> likely_duplicate
      likely_duplicate + both present & diff -> needs_review
      anything else                          -> unchanged

    ``keep_same_field=True`` appends the reference's companion boolean
    (``same_field`` — its ``same_phone_number`` return) for callers
    that report it."""
    cols = verified.columns
    enriched = _join_sigs(verified, sigs, id_a, id_b)
    have = F.col("field_sig_a").isNotNull() & F.col("field_sig_b").isNotNull()
    same = have & (F.col("field_sig_a") == F.col("field_sig_b"))
    diff = have & (F.col("field_sig_a") != F.col("field_sig_b"))
    revised = (
        F.when((F.col("status") == STATUS_REVIEW) & same, F.lit(STATUS_LIKELY))
        .when((F.col("status") == STATUS_LIKELY) & diff, F.lit(STATUS_REVIEW))
        .otherwise(F.col("status"))
    )
    out = enriched.withColumn("status", revised)
    if keep_same_field:
        return out.select(*cols, same.alias("same_field"))
    return out.select(*cols)


def apply_aux_rules(
    verified: DataFrame,
    transcripts: DataFrame,
    asymmetry_field: str | None,
    revision_field: str | None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Config-driven composition used by run_pipeline / api.match: the
    guard preempts (a refused pair is no longer REVIEW/LIKELY, so
    revision cannot resurrect it — same precedence as the reference,
    where NULL_DUPE returns before any scoring)."""
    if asymmetry_field is None and revision_field is None:
        return verified
    fields = {f for f in (asymmetry_field, revision_field) if f is not None}
    # lazy localCheckpoint per field: each signature frame feeds TWO
    # join consumers (the id_a and id_b sides), which are differently
    # projected subtrees — exchange reuse does not unify them (the
    # repo-wide Catalyst lesson), so without the checkpoint every
    # downstream action re-ran the transcripts-wide signature
    # aggregation up to twice per field (r5 advisory). Values are
    # unchanged; the checkpoint only truncates lineage to a one-pass
    # materialization on first use.
    sig_by_field = {
        f: field_signatures(transcripts, field=f).localCheckpoint(eager=False)
        for f in sorted(fields)
    }
    out = verified
    if asymmetry_field is not None:
        out = apply_asymmetry_guard(
            out, sig_by_field[asymmetry_field], id_a, id_b
        )
    if revision_field is not None:
        out = revise_verdicts(out, sig_by_field[revision_field], id_a, id_b)
    return out
