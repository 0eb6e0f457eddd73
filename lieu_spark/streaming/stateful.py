"""Cross-batch conversation assembly with applyInPandasWithState.

Closes the gap documented in streaming/ingest.py: turns for one
conversation may arrive across micro-batches. State is kept per conv_id
(the accumulated turn set); a conversation is emitted once its event
time goes quiet for ``gap`` (event-time timeout against the watermark),
mirroring how the batch assembler only sees complete conversations.

Emitted rows carry the same (conv_id, n_turns, doc, text_sha) contract
as operators/assemble.assemble_conversations — text_sha computed with
hashlib.sha256 over the same TURN_SEP-joined doc, byte-equal to
F.sha2(doc, 256), so downstream feature/dedupe stages are identical.

This is the custom stateful operator path (task brief:
"applyInPandasWithState for custom stateful operators"); dedupe of
emitted conversations then proceeds exactly as in
streaming/ingest.IncrementalDeduper.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.assemble import TURN_SEP

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("doc", StringType()),
        StructField("text_sha", StringType()),
    ]
)

# state: parallel arrays of the turns seen so far + max event time (us)
STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", StringType()),  # csv of ints (compact, arrow-safe)
        StructField("texts_json", StringType()),
        StructField("max_ts_us", LongType()),
    ]
)


def _assemble_doc(turns: dict[int, str]) -> tuple[int, str, str]:
    ordered = [turns[i] for i in sorted(turns)]
    doc = TURN_SEP.join(t if t is not None else "" for t in ordered)
    sha = hashlib.sha256(doc.encode("utf-8")).hexdigest()
    return len(ordered), doc, sha


def make_assembler(gap_ms: int = 60_000):
    """Returns the applyInPandasWithState function (captured gap)."""
    import json

    def assemble(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            (idx_csv, texts_json, _max_ts) = state.get
            turns = {
                int(i): t
                for i, t in zip(idx_csv.split(","), json.loads(texts_json))
            }
            n, doc, sha = _assemble_doc(turns)
            state.remove()
            yield pd.DataFrame(
                [(conv_id, n, doc, sha)],
                columns=["conv_id", "n_turns", "doc", "text_sha"],
            )
            return

        turns: dict[int, str] = {}
        max_ts_us = 0
        if state.exists:
            idx_csv, texts_json, max_ts_us = state.get
            turns = {
                int(i): t
                for i, t in zip(idx_csv.split(","), json.loads(texts_json))
            }
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # zip over Series, not iterrows() — iterrows materializes a
            # Series object per row (measurable at high turn counts)
            for i, t in zip(pdf["turn_idx"], pdf["text"]):
                # null text -> '' mirrors the batch choke point
                # (assemble.py coalesces before the struct); collision
                # rule: keep the MIN text — deterministic regardless of
                # file/batch arrival order. Re-deliveries (identical
                # text) are idempotent under any rule; for genuinely
                # conflicting texts the batch assembler's lowest-full-
                # struct winner coincides with min(text) whenever the
                # duplicate rows differ only in text.
                t = "" if t is None else t
                i = int(i)
                turns[i] = t if i not in turns else min(turns[i], t)
            max_ts_us = max(max_ts_us, int(pdf["ts"].max().value // 1000))
        idxs = sorted(turns)
        state.update(
            (
                ",".join(str(i) for i in idxs),
                json.dumps([turns[i] for i in idxs]),
                max_ts_us,
            )
        )
        # emit when event time goes quiet for `gap` past the watermark;
        # clamp: the engine rejects timeouts earlier than the current
        # watermark (possible when another partition raced it forward)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts_us // 1000 + gap_ms, wm + 1))
        yield pd.DataFrame(columns=["conv_id", "n_turns", "doc", "text_sha"])

    return assemble


def assemble_stream(
    turns_stream: DataFrame, watermark: str = "1 minute", gap_ms: int = 60_000
) -> DataFrame:
    """turn-row stream -> stream of fully-assembled conversations.

    Null conv_id / turn_idx rows are dropped HERE, mirroring the batch
    assembler's choke-point policy (operators/assemble.py) — unfiltered,
    a null turn_idx arrives in pandas as NaN (Arrow int-with-nulls) and
    ``int(i)`` would kill the whole streaming query, and a null conv_id
    would emit a conversation the batch path drops. Null ts rows are
    dropped too: they carry no event time for the watermark/timeout."""
    from pyspark.sql import functions as F

    turns_stream = turns_stream.filter(
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & F.col("ts").isNotNull()
    )
    return (
        turns_stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_assembler(gap_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
