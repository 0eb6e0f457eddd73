"""Incremental transcript ingest — Structured Streaming front door.

The reference has no streaming (SURVEY.md §2.9); its incremental shape
is batch-over-batch index merging (``update_doc_frequency``,
/root/reference/lib/lieu/spark/tfidf.py:43-45). We keep that shape and
put Structured Streaming in front of it: ``readStream`` over an arriving
directory/table of turn rows, ``foreachBatch`` assembling each
micro-batch's *complete* conversations and matching them against the
canonical feature index (the ``match()`` ingest-against-index mode,
lib/lieu/spark/dedupe.py:24-48), then folding new signatures into the
index — exactly how a 100 TB deployment dedupes arriving data without
re-blocking the corpus.

Semantics note: a conversation is matchable once all its turns have
arrived in one micro-batch window here; cross-batch turn assembly is
provided by ``streaming/stateful.py`` (``applyInPandasWithState`` keyed
by conv_id with an event-time timeout) — same output contract, so the
two front doors are interchangeable. Event-time windowed aggregations
with watermarked late-data handling live in ``streaming/windows.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, DedupeConfig
from ..metrics import record_stage
from ..operators.assemble import assemble_conversations
from ..operators.exact import exact_star_pairs
from ..operators.lsh import band_table, candidate_pairs, match_pairs
from ..operators.verify import verify_pairs
from ..pipeline import build_features

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_transcripts(
    spark: SparkSession, input_dir: str, files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of turn rows (parquet files landing in a dir).
    In production this is a Kafka/Iceberg CDC source with a watermark on
    ``ts``; the file source keeps the container test hermetic.
    files_per_trigger=1 with one file per chunk gives deterministic
    batch boundaries (the parity test's arrival schedule)."""
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(input_dir)
    )


class IncrementalDeduper:
    """foreachBatch handler: match each micro-batch against the canonical
    index, append verified pairs, fold new uniques into the index."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        pairs_dir: str,
        cfg: DedupeConfig = DEFAULT_CONFIG,
        metrics_dir: str | None = None,
        run_id: str = "stream",
    ) -> None:
        self.spark = spark
        self.index_dir = index_dir
        self.pairs_dir = pairs_dir
        self.cfg = cfg
        self.metrics_dir = metrics_dir
        self.run_id = run_id

    def _load_index(self, before_batch: int) -> DataFrame | None:
        """Canonical index as of the start of ``before_batch``: the
        union of batch subdirectories with batch_id < before_batch.

        Per-batch subdirs + the strict < filter make replays
        deterministic: if a batch partially wrote its own index subdir
        before a failure, the rerun neither matches the batch against
        its own half-written output nor double-counts it — the replay
        sees exactly the pre-batch state and OVERWRITES its own subdir.

        Failure modes are distinguished from fresh state, not collapsed
        into it: a readable index without the batch_id partition is a
        pre-upgrade (flat append) layout and raises rather than being
        silently ignored (which would rebuild the index from scratch
        into a mixed, unreadable directory), and an index containing
        batch ids NEWER than the current batch means the stream
        checkpoint was lost or re-pointed — batch ids restarted — and
        proceeding would OVERWRITE old state subdir by subdir."""
        from pyspark.errors import AnalysisException

        try:
            df = self.spark.read.parquet(self.index_dir)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return None  # genuinely fresh state
            raise
        if "batch_id" not in df.columns:
            raise ValueError(
                f"index at {self.index_dir} has no batch_id partitioning — "
                "it was written by the pre-idempotent (flat append) layout. "
                "Rebuild the stream state in a fresh work_dir (replaying "
                "the landing directory reproduces it)."
            )
        newest = df.agg(F.max("batch_id")).collect()[0][0]
        # a batch that folded zero uniques leaves an empty (invisible)
        # index subdir, so ALSO consult the pairs dir — a batch always
        # writes it — before trusting "no newer batch exists"
        try:
            newest_pairs = (
                self.spark.read.parquet(self.pairs_dir)
                .agg(F.max("batch_id"))
                .collect()[0][0]
            )
            if newest_pairs is not None:
                newest = max(newest or 0, newest_pairs)
        except AnalysisException:
            pass
        if newest is not None and newest > before_batch:
            raise ValueError(
                f"stream state at {self.index_dir} already contains "
                f"batch {newest} but the stream is processing batch "
                f"{before_batch} — the streaming checkpoint was lost or "
                "re-pointed and batch ids restarted. Proceeding would "
                "overwrite existing state; restore the original "
                "checkpoint or start a fresh work_dir."
            )
        return df.filter(F.col("batch_id") < before_batch).drop("batch_id")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Candidates = within-batch self-pairs (LSH bands + exact-sha
        star — the same families as the batch pipeline, so a batch's OWN
        near-dups pair here, not just batch-vs-index) ∪ incoming-vs-index
        pairs (LSH match ∪ text_sha equi-join). Dupe members (the id_b
        side — min-id canonical stays) are withheld from the index fold,
        so connected components over the accumulated pairs reproduces
        the batch pipeline's clusters (parity asserted at sf-scale in
        tests/test_streaming.py and timed in bench.py).

        Banding uses the batch pipeline's rep-blocking: one content-
        bearing representative per text_sha (pipeline.py feat_reps) —
        a boilerplate-heavy micro-batch with a k-copy group would
        otherwise flood every band with all k members and generate
        O(k^2) within-batch pairs the exact star already implies.
        Member edges are recovered exactly: rep-vs-X similarity edge +
        (rep, member) star edge close through connected components,
        and the member is withheld from the index as the id_b side of
        its star edge. The cross-batch text_sha join is what makes the
        pipeline's GLOBAL exact star hold across batches — it also
        covers content-empty conversations, which rep-blocking excludes
        from banding (the batch pipeline's P3/exact-only policy).

        Exactly-once state under at-least-once foreachBatch: pairs and
        index fold are written to per-batch subdirectories with
        mode=overwrite — a checkpoint replay of the same deterministic
        batch overwrites its own output instead of appending a second
        copy (the standard foreachBatch idempotence recipe)."""
        import time as _time

        from pyspark.sql import Window

        t0 = _time.time()
        convs = assemble_conversations(batch_df)
        feats = build_features(convs, self.cfg).persist()
        rep_w = Window.partitionBy("text_sha")
        feat_reps = (
            feats.filter(F.size("shingle_hashes") > 0)
            .withColumn("_rep", F.min("conv_id").over(rep_w))
            .filter(F.col("conv_id") == F.col("_rep"))
            .drop("_rep")
        )
        feat_bands = band_table(feat_reps, self.cfg)
        within = candidate_pairs(feat_bands, self.cfg).unionByName(
            exact_star_pairs(feats)
        )
        index = self._load_index(before_batch=batch_id)
        if index is not None:
            cross_lsh = match_pairs(
                band_table(index, self.cfg), feat_bands, self.cfg
            ).select(
                F.col("canonical_id").alias("id_a"),
                F.col("incoming_id").alias("id_b"),
            )
            cross_sha = index.select(
                F.col("conv_id").alias("id_a"), "text_sha"
            ).join(
                feats.select(F.col("conv_id").alias("id_b"), "text_sha"),
                "text_sha",
            ).select("id_a", "id_b")
            cand = within.unionByName(cross_lsh).unionByName(
                cross_sha
            ).dropDuplicates(["id_a", "id_b"])
            all_feats = index.unionByName(feats)
        else:
            cand = within.dropDuplicates(["id_a", "id_b"])
            all_feats = feats
        # persist: pairs write and the index fold below are two actions
        # over this plan — unpersisted, the second re-runs banding,
        # the full-index scan, and verification end-to-end
        verified = verify_pairs(
            cand, all_feats, self.cfg, method="stream_match"
        ).persist()
        verified.write.mode("overwrite").parquet(
            f"{self.pairs_dir}/batch_id={batch_id}"
        )
        dupe_ids = (
            verified.filter(
                F.col("status").isin("exact_duplicate", "likely_duplicate")
            )
            .select(F.col("id_b").alias("conv_id"))
            .distinct()
        )
        new_uniques = feats.join(dupe_ids, "conv_id", "left_anti")
        # S8 parity: fold this batch's uniques into the canonical index
        new_uniques.write.mode("overwrite").parquet(
            f"{self.index_dir}/batch_id={batch_id}"
        )
        if self.metrics_dir is not None:
            # per-batch, per-partition lineage (north_rule): one cheap
            # pass over the PERSISTED feature table, no recompute
            record_stage(
                self.spark,
                self.metrics_dir,
                self.run_id,
                f"stream_features@batch{batch_id}",
                feats,
                _time.time() - t0,
                self.cfg.fingerprint(),
            )
        verified.unpersist()
        feats.unpersist()


def run_stream(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    cfg: DedupeConfig = DEFAULT_CONFIG,
    available_now: bool = True,
    files_per_trigger: int = 8,
    metrics_dir: str | None = None,
):
    """Wire the stream; with available_now=True drains what's on disk and
    stops (test mode / catch-up mode).

    Config guard (the streaming twin of checkpoint.StageStore's
    fingerprint invalidation): the first run stamps
    ``work_dir/_config.json`` with the config fingerprint; a rerun with
    a different config refuses to resume — folding, say, k=7 shingle
    features into a k=5 index would silently corrupt every subsequent
    match. Start a fresh work_dir (or delete the old one) to change
    config."""
    import json as _json

    from pyspark.errors import AnalysisException

    # marker I/O goes through Spark's Hadoop filesystem (a one-line text
    # "directory file"), NOT driver-local open(): a work_dir on
    # hdfs:// or s3:// must hit the same store as the state it guards —
    # a local-path marker would silently no-op the guard for remote dirs
    marker = f"{work_dir}/_config_marker"
    fp = cfg.fingerprint()
    stored = None
    marker_exists = True
    try:
        lines = [r.value for r in spark.read.text(marker).collect()]
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            marker_exists = False  # first run: stamp below
        else:
            raise
    if marker_exists:
        try:
            stored = _json.loads("".join(lines))["fingerprint"]
        except (ValueError, KeyError):
            # a corrupt marker next to existing state must NOT be
            # silently re-stamped with the CURRENT config — that is the
            # exact corruption the guard exists to refuse
            raise ValueError(
                f"config marker {marker} is unreadable; refusing to "
                "guess which config built this work_dir. Restore the "
                "marker or start a fresh work_dir."
            )
        if stored != fp:
            raise ValueError(
                f"work_dir {work_dir} was built with config fingerprint "
                f"{stored}; current config is {fp}. Resuming would mix "
                "incompatible features into one index — use a fresh "
                "work_dir (or delete this one) to change config."
            )
    else:
        spark.createDataFrame(
            [(_json.dumps({"fingerprint": fp}),)], "value string"
        ).coalesce(1).write.mode("overwrite").text(marker)

    dedupe = IncrementalDeduper(
        spark, f"{work_dir}/index", f"{work_dir}/pairs", cfg,
        metrics_dir=metrics_dir,
    )
    stream = stream_transcripts(spark, input_dir, files_per_trigger)
    writer = (
        stream.writeStream.foreachBatch(dedupe.process_batch)
        .option("checkpointLocation", f"{work_dir}/_stream_checkpoint")
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
