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
    """
    canon = build_features(assemble_conversations(canonical_transcripts), cfg)
    inc = build_features(assemble_conversations(incoming_transcripts), cfg)
    cb = band_table_dual(canon, cfg)
    ib = band_table_dual(inc, cfg)
    cand = match_pairs(cb, ib, cfg).select(
        F.col("canonical_id").alias("id_a"), F.col("incoming_id").alias("id_b")
    )
    # cross-set verification: union the two feature tables (ids disjoint by
    # construction; caller guarantees distinct key spaces)
    feats = canon.unionByName(inc)
    v = verify_pairs(cand, feats, cfg, method="match")
    return v.select(
        F.col("id_a").alias("canonical_id"),
        F.col("id_b").alias("incoming_id"),
        "jaccard",
        "is_exact",
        "status",
        "method",
    )


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
