"""lieu_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine for multi-turn conversation / agent transcripts.

Capability parity target: openvenues/lieu (blocking -> pairwise verify ->
cluster dedupe; see SURVEY.md). Architecture is Spark-first: DataFrame /
Catalyst plans everywhere, Arrow-batched pandas UDFs only for MinHash /
SimHash signatures and suffix-array span detection, no per-row Python.

Public API (mirrors lieu's AddressDeduper{Spark}.{dupe_sims,match,unique},
/root/reference/lib/lieu/spark/dedupe.py:24-115):

    from lieu_spark.api import dedupe, match, unique

Beyond the reference, ``lieu_spark.curate.curate`` composes the full
training-data funnel (annotate -> filter -> scrub -> decontaminate ->
dedupe -> leakage-safe split -> sequence packing) with per-stage
checkpoint/resume and lineage metrics.
"""

__version__ = "0.1.0"
