"""Checkpointed stage tables with content-addressed configs.

north_rule: "every stage writes per-partition lineage + metrics ... and
checkpoints so the pipeline resumes mid-run without recomputing completed
partitions". Structural parity with the reference's incremental
batch-over-batch index merge (lib/lieu/spark/tfidf.py:43-45), generalized
to every stage.

In production these are Iceberg tables (``df.writeTo(tbl)``, bucket by
conv_id); this container has no Iceberg runtime jar, so the default
backend is parquet directories with an atomic ``_meta.json`` marker.
The marker stores a fingerprint = hash(pipeline config + input
signature): a resume with any changed config or input recomputes instead
of silently reusing stale outputs (SURVEY.md §7.3 hard part e). The
input signature is the hashed sorted source-file list
(``input_signature``) — metadata-only, no data scan; an in-memory input
(no backing files) contributes nothing and falls back to config-only
addressing, and files overwritten IN PLACE under the same names are not
detected (an Iceberg deployment gets true content addressing from
snapshot ids instead). Marker I/O goes through the Hadoop FileSystem
(``lieu_spark.fsutil``) so hdfs:// / s3:// checkpoint roots behave like
local ones — a driver-local ``open()`` would crash on the scheme prefix
after the (expensive) stage data write already succeeded.
The Iceberg backend is the same class with ``fmt="iceberg"`` — gated on
the runtime being present.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass

from py4j.protocol import Py4JJavaError
from pyspark.sql import DataFrame, SparkSession

from .fsutil import (
    fs_delete,
    fs_read_text,
    fs_rename_overwrite,
    fs_write_text,
    path_exists,
)


def input_signature(df: DataFrame) -> str:
    """Metadata-only signature of a DataFrame's file sources: hash of the
    sorted input-file list (``df.inputFiles()`` — a listing, not a scan).
    Empty for non-file inputs (in-memory test frames): those fall back to
    config-only checkpoint addressing."""
    files = sorted(df.inputFiles())
    if not files:
        return ""
    return hashlib.sha256("\n".join(files).encode("utf-8")).hexdigest()[:16]


@dataclass
class StageStore:
    root: str
    fmt: str = "parquet"  # or "iceberg" (needs iceberg-spark-runtime on cp)

    def _dir(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def _meta_path(self, stage: str) -> str:
        return f"{self.root}/{stage}._meta.json"

    def _spark(self, spark: SparkSession | None) -> SparkSession:
        s = spark or SparkSession.getActiveSession()
        if s is None:
            raise RuntimeError("StageStore needs an active SparkSession")
        return s

    def has(
        self, stage: str, fingerprint: str, spark: SparkSession | None = None
    ) -> bool:
        # one marker-read path (meta): an unreadable marker means
        # "recompute" here, exactly the non-strict meta() contract
        meta = self.meta(stage, spark)
        return bool(
            meta
            and meta.get("fingerprint") == fingerprint
            and meta.get("complete")
        )

    def save(self, spark: SparkSession, stage: str, df: DataFrame, fingerprint: str) -> DataFrame:
        path = self._dir(stage)
        if self.fmt == "iceberg":
            df.writeTo(f"{self.root}.{stage}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(path)
        meta = {
            "stage": stage,
            "fingerprint": fingerprint,
            "complete": True,
            "created_unix": time.time(),
        }
        # write-tmp-then-rename marker: the atomic overwrite rename is
        # the commit point — a crash mid-write leaves the old marker (or
        # none) intact and the stage recomputes; there is never a window
        # with no valid marker at the final path
        tmp = self._meta_path(stage) + ".tmp"
        fs_write_text(spark, tmp, json.dumps(meta))
        fs_rename_overwrite(spark, tmp, self._meta_path(stage))
        return self.load(spark, stage)

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(f"{self.root}.{stage}")
        return spark.read.parquet(self._dir(stage))

    def meta(
        self,
        stage: str,
        spark: SparkSession | None = None,
        strict: bool = False,
    ) -> dict | None:
        """The stage's marker metadata (fingerprint/complete/created), or
        None when the marker is absent — lets callers validate that a
        store was written under the config they are about to extend it
        with. ``strict=False`` (the resume path) also maps an UNREADABLE
        marker to None — any doubt means "recompute", which is safe.
        ``strict=True`` (validation gates, e.g. refresh_pipeline's
        config check) re-raises read/parse errors instead: for a gate,
        treating a transient store error or a marker lost in a partial
        copy as "no metadata, proceed" would silently skip the check the
        caller exists to enforce."""
        spark = self._spark(spark)
        try:
            if not path_exists(spark, self._meta_path(stage)):
                return None
            return json.loads(fs_read_text(spark, self._meta_path(stage)))
        except (OSError, ValueError, Py4JJavaError) as e:
            if strict:
                # uniform gate-error type; the cause chain keeps the
                # underlying store error (e.g. the local-FS CRC
                # mismatch a hand-edited marker trips) visible
                raise ValueError(
                    f"unreadable stage marker for {stage!r} at "
                    f"{self._meta_path(stage)!r}: {e}"
                ) from e
            return None

    def invalidate(self, stage: str, spark: SparkSession | None = None) -> None:
        spark = self._spark(spark)
        if path_exists(spark, self._meta_path(stage)):
            fs_delete(spark, self._meta_path(stage))
