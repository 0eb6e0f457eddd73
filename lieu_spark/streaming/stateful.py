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
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.assemble import TURN_SEP

# n_turns is LONG, matching the batch assembler's F.size(...).cast
# ("long") — an IntegerType here broke schema-merge/strict-append when
# stream- and batch-assembled conversations land in one dataset
OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
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


def _turn_key(entry: list) -> tuple:
    """Ordering key replaying the batch assembler's duplicate-turn
    winner: array_sort on struct(turn_idx, role, text, tool, ts) keeps
    the LOWEST struct per turn_idx, and Spark's struct ordering sorts a
    NULL field FIRST ascending — mirror that with a (0, '') sentinel.
    entry = [text, role, tool, ts_us]; text is post-coalesce (never
    None), ts never null on this path (assemble_stream filters it)."""
    text, role, tool, ts_us = entry
    return (
        (0, "") if role is None else (1, role),
        text,
        (0, "") if tool is None else (1, tool),
        ts_us,
    )


def _parse_state_turns(idx_csv: str, texts_json) -> dict[int, list]:
    """State decode, tolerant of the pre-struct format (plain text
    strings) so an in-flight checkpoint survives the upgrade."""
    import json

    vals = json.loads(texts_json)
    out: dict[int, list] = {}
    for i, v in zip(idx_csv.split(","), vals):
        out[int(i)] = v if isinstance(v, list) else [v, None, None, 0]
    return out


def _assemble_doc(turns: dict[int, list]) -> tuple[int, str, str]:
    ordered = [turns[i][0] for i in sorted(turns)]
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
            turns = _parse_state_turns(idx_csv, texts_json)
            n, doc, sha = _assemble_doc(turns)
            state.remove()
            yield pd.DataFrame(
                [(conv_id, n, doc, sha)],
                columns=["conv_id", "n_turns", "doc", "text_sha"],
            )
            return

        turns: dict[int, list] = {}
        max_ts_us = 0
        if state.exists:
            idx_csv, texts_json, max_ts_us = state.get
            turns = _parse_state_turns(idx_csv, texts_json)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # zip over Series, not iterrows() — iterrows materializes a
            # Series object per row (measurable at high turn counts)
            for i, t, role, tool, ts in zip(
                pdf["turn_idx"], pdf["text"], pdf["role"], pdf["tool"], pdf["ts"]
            ):
                # null text -> '' mirrors the batch choke point
                # (assemble.py coalesces before the struct). Collision
                # rule: keep the LOWEST (role, text, tool, ts) — the
                # SAME winner the batch assembler's min-struct dedupe
                # picks (min(text) alone diverged whenever conflicting
                # duplicate rows differed in role: different winner ->
                # different doc/text_sha -> a conv ingested once per
                # path escaped exact-dup detection).
                entry = [
                    "" if t is None else t,
                    None if role is None or role != role else role,
                    None if tool is None or tool != tool else tool,
                    0 if ts is None else int(ts.value // 1000),
                ]
                i = int(i)
                if i not in turns or _turn_key(entry) < _turn_key(turns[i]):
                    turns[i] = entry
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
