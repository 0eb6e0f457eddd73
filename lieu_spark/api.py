"""Public library API — parity with the reference's embeddable surface
``AddressDeduperSpark.{dupe_sims, match, unique}`` and
``NameAddressDeduperSpark.dupe_sims``
(/root/reference/lib/lieu/spark/dedupe.py:24-48,100-115,235-313), rebuilt
on DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG, DedupeConfig
from .operators.assemble import assemble_conversations
from .operators.lsh import band_table_dual, match_pairs
from .operators.verify import verify_pairs
from .pipeline import PipelineResult, build_features, run_pipeline


def dedupe(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: DedupeConfig = DEFAULT_CONFIG,
    **kwargs,
) -> PipelineResult:
    """Full pipeline: transcripts -> pairs + clusters + spans.

    Reference: NameAddressDeduperSpark.dupe_sims (spark/dedupe.py:235).
    """
    return run_pipeline(spark, transcripts, cfg, **kwargs)


def match(
    spark: SparkSession,
    canonical_transcripts: DataFrame,
    incoming_transcripts: DataFrame,
    cfg: DedupeConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Dedupe an incoming batch against a canonical set: returns verified
    (canonical_id=id_a side, incoming_id=id_b side) pairs.

    Reference: AddressDeduperSpark.match (spark/dedupe.py:24-48).

    Scale guards — the same blocking policy as run_pipeline
    (pipeline.py:191-206), which banding the raw feature tables would
    bypass: content-empty docs never band (their all-sentinel MinHash
    signature collides in EVERY band with every other empty doc — a
    quadratic blowup match_pairs has no salting against), and the
    canonical side bands ONE representative per text_sha (a k-copy
    boilerplate group would otherwise flood each band with all k
    members). Verified representative pairs are expanded back to every
    identical-text canonical member afterwards — exact, because
    identical text implies identical features, hence identical
    verdicts. Byte-identical matches (including content-empty docs,
    which the previous banding-only path could only find through the
    sentinel collision) come from a direct text_sha equi-join. The
    incoming side is banded unblocked — each incoming id must appear
    in the output individually, and incoming is the small side.
    """
    from pyspark.sql import Window

    # both feature tables fan out to several consumers below (banding,
    # sha equi-join, verify features, member expansion) — persist so the
    # assembly shuffle + MinHash/SimHash UDF pass over each corpus runs
    # ONCE per action, not once per consumer subtree (column pruning
    # gives each branch a different subtree, so Catalyst cannot reuse
    # the exchange on its own). Lazy markers: populated at the caller's
    # first action, evicted LRU; long-lived drivers running many
    # match() calls can spark.catalog.clearCache() between them.
    # max_turns flows through exactly as in run_pipeline/refresh: a
    # capped conv must get the SAME doc/text_sha here as in the
    # pipeline-built state it is matched against, and the cap is also
    # what bounds the collect_list buffer against a pathological conv
    canon = build_features(
        assemble_conversations(
            canonical_transcripts, max_turns=cfg.max_turns_per_conv
        ),
        cfg,
    )
    inc = build_features(
        assemble_conversations(
            incoming_transcripts, max_turns=cfg.max_turns_per_conv
        ),
        cfg,
    ).persist()
    rep_w = Window.partitionBy("text_sha")
    canon_tag = canon.withColumn("_rep", F.min("conv_id").over(rep_w)).persist()
    canon_reps = canon_tag.filter(F.col("conv_id") == F.col("_rep")).drop("_rep")
    cb = band_table_dual(canon_reps.filter(F.size("shingle_hashes") > 0), cfg)
    ib = band_table_dual(inc.filter(F.size("shingle_hashes") > 0), cfg)
    # hot_cap: rep-dedup collapses byte-identical copies but NOT
    # near-identical boilerplate (distinct shas, shared bands) — the
    # same bound the refresh cross path applies
    lsh_cand = match_pairs(cb, ib, cfg, hot_cap=cfg.hot_band_cap).select(
        F.col("canonical_id").alias("id_a"), F.col("incoming_id").alias("id_b")
    )
    sha_cand = (
        canon_reps.select(F.col("conv_id").alias("id_a"), "text_sha")
        .join(inc.select(F.col("conv_id").alias("id_b"), "text_sha"), "text_sha")
        .select("id_a", "id_b")
    )
    cand = lsh_cand.unionByName(sha_cand).dropDuplicates(["id_a", "id_b"])
    # cross-set verification: union the two feature tables (ids disjoint
    # by construction; caller guarantees distinct key spaces). Only rep
    # ids appear on the canonical side of cand, so reps suffice.
    feats = canon_reps.unionByName(inc)
    v = verify_pairs(cand, feats, cfg, method="match")
    # expand each rep verdict to the rep's identical-text members
    members = canon_tag.select(
        F.col("_rep").alias("id_a"), F.col("conv_id").alias("canonical_id")
    )
    out = v.join(members, "id_a").select(
        "canonical_id",
        F.col("id_b").alias("incoming_id"),
        "jaccard",
        "is_exact",
        "status",
        "method",
    )
    # P8 guard / F10 revision applied AFTER member expansion: identical
    # text does NOT imply identical auxiliary fields (two byte-equal
    # convs can differ in tool usage), so each expanded member pair is
    # judged on its OWN conversation's field signature, not its rep's.
    from .operators.asymmetry import apply_aux_rules

    if cfg.asymmetry_field is not None or cfg.revision_field is not None:
        out = apply_aux_rules(
            out,
            canonical_transcripts.unionByName(incoming_transcripts),
            cfg.asymmetry_field,
            cfg.revision_field,
            id_a="canonical_id",
            id_b="incoming_id",
        )
    return out


def responses(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: DedupeConfig = DEFAULT_CONFIG,
    **kwargs,
) -> DataFrame:
    """Full pipeline + per-record DedupeResponse assembly: one row per
    conversation with (is_dupe, is_canonical, cluster_id, same_as,
    possibly_same_as) — the reference job's output record
    (lib/lieu/api.py:48-144, scripts/jobs/dedupe_geojson.py:179-198).
    """
    from .operators.response import dedupe_responses

    res = run_pipeline(spark, transcripts, cfg, with_spans=False, **kwargs)
    return dedupe_responses(res.conversations, res.verified, res.clusters)


def unique(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: DedupeConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Conversations that are their cluster's canonical representative —
    one row per distinct conversation (AddressDeduperSpark.unique,
    spark/dedupe.py:109-115: left_anti of dupes).
    """
    res = run_pipeline(spark, transcripts, cfg, with_spans=False)
    canon = res.clusters.filter(F.col("conv_id") == F.col("cluster_id")).select("conv_id")
    return res.conversations.join(canon, "conv_id", "left_semi")
