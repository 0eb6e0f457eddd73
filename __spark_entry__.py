"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-dup pipeline on sf0.001-derived
transcripts. ``queries()`` / ``oracle_sql()`` — one entry per operator
family from SURVEY.md §2 plus the training-data ops (dedup variants,
ANN, text analysis, multimodal plumbing); DuckDB oracles live in
lieu_spark/oracle_sql.py. Entries without an oracle are genuinely
non-SQL-expressible (MinHash signatures / band keys / SimHash /
suffix-array spans) and are covered by the pure-python-oracle pytest
suite instead (tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lieu_spark import queries as Q  # noqa: E402
from lieu_spark.config import DedupeConfig  # noqa: E402
from lieu_spark.oracle_sql import ORACLE  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedupe pipeline over transcripts derived from the
    sf0.001 documents table -> verified duplicate pairs."""
    return Q.q_dedupe_pairs_pipeline(spark, "/root/testdata/sf0.001")


# --- non-SQL-expressible extras (rows-only driver check) -------------------


def _q_minhash_band_sizes(spark, sf_dir):
    from lieu_spark.functions.minhash import with_minhash
    from lieu_spark.operators.lsh import band_stats, band_table

    cfg = DedupeConfig()
    feats = with_minhash(Q.doc_features(spark, sf_dir), cfg)
    return band_stats(band_table(feats, cfg), cfg).orderBy(
        "band", "band_hash"
    )


def _q_simhash_pairs(spark, sf_dir):
    from lieu_spark.functions.simhash import with_simhash
    from lieu_spark.operators.simhash_path import simhash_candidate_pairs

    cfg = DedupeConfig()
    feats = with_simhash(Q.doc_features(spark, sf_dir), cfg)
    return simhash_candidate_pairs(feats, cfg).orderBy("id_a", "id_b")


def _q_copied_spans(spark, sf_dir):
    from lieu_spark.config import DedupeConfig as DC
    from lieu_spark.operators.spans import copied_spans, winnow_span_candidates

    cfg = DC(span_min_len=40)
    feats = Q.doc_features(spark, sf_dir)
    cand = winnow_span_candidates(feats, cfg)
    docs = feats.select("conv_id", "doc")
    pa = docs.select(F.col("conv_id").alias("id_a"), F.col("doc").alias("doc_a"))
    pb = docs.select(F.col("conv_id").alias("id_b"), F.col("doc").alias("doc_b"))
    return copied_spans(cand.join(pa, "id_a").join(pb, "id_b"), cfg).orderBy(
        "id_a", "id_b"
    )


def _q_ann_lsh_topk(spark, sf_dir):
    from lieu_spark.operators.ann import hyperplane_lsh_topk

    e = Q.load(spark, sf_dir, "embeddings")
    t = hyperplane_lsh_topk(e, k=5)
    return t.select(
        F.col("id_a").alias("vec_id"),
        "rank",
        F.col("id_b").alias("nbr_id"),
        F.round(F.col("cosine") * 1e6).cast("long").alias("cos6"),
    ).orderBy("vec_id", "rank")


def _q_ann_ivf_topk(spark, sf_dir):
    from lieu_spark.operators.ann import ivf_topk

    e = Q.load(spark, sf_dir, "embeddings")
    t = ivf_topk(e, k=5, ncentroids=16, nprobe=6)
    return t.select(
        F.col("id_a").alias("vec_id"),
        "rank",
        F.col("id_b").alias("nbr_id"),
        F.round(F.col("cosine") * 1e6).cast("long").alias("cos6"),
    ).orderBy("vec_id", "rank")


def _q_multimodal_meta(spark, sf_dir):
    from lieu_spark.functions.multimodal import decode_image_metadata, with_binary_payload

    d = with_binary_payload(Q.load(spark, sf_dir, "documents"))
    return decode_image_metadata(d).orderBy("doc_id")


def _q_doc_fingerprint(spark, sf_dir):
    return Q.q_doc_fingerprint(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        # TPC-H-ish operator parity (SURVEY §2.2-2.7)
        "agg_lineitem": Q.q_agg_lineitem,
        "join_enrich": Q.q_join_enrich,
        "anti_join": Q.q_anti_join,
        "semi_join": Q.q_semi_join,
        "argmax_per_group": Q.q_argmax_per_group,
        "topk_orders": Q.q_topk_orders,
        "set_ops": Q.q_set_ops,
        "rollup_sales": Q.q_rollup_sales,
        "cube_sales": Q.q_cube_sales,
        "revenue_by_nation": Q.q_revenue_by_nation,
        "window_events": Q.q_window_events,
        "sessionize": Q.q_sessionize,
        "id_assignment": Q.q_id_assignment,
        "json_extract": Q.q_json_extract,
        "term_counts_top": Q.q_term_counts_top,
        "tfidf_top_terms": Q.q_tfidf_top_terms,
        "multiset_jaccard": Q.q_multiset_jaccard,
        "weighted_jaccard": Q.q_weighted_jaccard,
        "order_price_quantiles": Q.q_order_price_quantiles,
        "above_avg_orders": Q.q_above_avg_orders,
        "ntile_price_deciles": Q.q_ntile_price_deciles,
        "conditional_agg_shipmodes": Q.q_conditional_agg_shipmodes,
        "index_merge_batches": Q.q_index_merge_batches,
        # text analysis (training-data ops)
        "doc_tokens": Q.q_doc_tokens,
        "doc_quality": Q.q_doc_quality,
        "doc_langid": Q.q_doc_langid,
        "binary_meta": Q.q_binary_meta,
        # document dedupe
        "exact_dup_groups": Q.q_exact_dup_groups,
        "exact_dup_pairs": Q.q_exact_dup_pairs,
        "ngram_jaccard_pairs": Q.q_ngram_jaccard_pairs,
        "contamination_pairs": Q.q_contamination_pairs,
        "dedupe_pairs_pipeline": Q.q_dedupe_pairs_pipeline,
        "match_pairs": Q.q_match_pairs,
        "dedupe_clusters": Q.q_dedupe_clusters,
        "cluster_size_hist": Q.q_cluster_size_hist,
        "response_pairs_ranked": Q.q_response_pairs_ranked,
        "transcript_roundtrip": Q.q_transcript_roundtrip,
        # embeddings / similarity search
        "ann_topk": Q.q_ann_topk,
        "embedding_neardup": Q.q_embedding_neardup,
        # non-SQL-expressible (rows-only): signatures, bands, simhash,
        # spans, LSH-accelerated ANN, multimodal decode plumbing
        "minhash_band_sizes": _q_minhash_band_sizes,
        "simhash_pairs": _q_simhash_pairs,
        "copied_spans": _q_copied_spans,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "multimodal_meta": _q_multimodal_meta,
        "doc_fingerprint": _q_doc_fingerprint,
    }
    return base


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
