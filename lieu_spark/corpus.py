"""Deterministic synthetic transcript corpus with planted duplicates.

The driver's parquet tables don't include a transcripts table, and the
round instructions direct us to synthesize the ``input_hint`` shape
deterministically. Every conversation is a pure function of
(seed, conv index), so Spark-parallel generation (mapInPandas over
spark.range) produces byte-identical rows to the single-process pytest
generator regardless of partitioning.

Layout (index arithmetic, no global state):
  i % 10 in {0..6} -> background conversation (negatives)
  i % 10 == 7      -> exact copy of conv (i - 7)        [kind="exact"]
  i % 10 == 8      -> near copy of conv (i - 8), token edit rate drawn
                      from rng(i): half "likely" (J >~ 0.9), half in the
                      review band (J ~ 0.7-0.85)        [kind="near"]
  i % 10 == 9      -> fresh conversation sharing one long copied span
                      with conv (i - 8) (a background)  [kind="span"]

Ground truth (truth_pairs) is derived from the same arithmetic. The
recall gate, however, is measured against the brute-force Jaccard oracle,
not against intent (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np

BASE_TS = datetime(2025, 1, 1, 0, 0, 0)
ROLES = ["user", "assistant"]
TOOLS = ["", "", "", "search", "python", "browser"]  # '' weighted 3x
VOCAB_SIZE = 1200


def _vocab() -> list[str]:
    return [f"tok{j:04d}" for j in range(VOCAB_SIZE)]


_VOCAB = _vocab()


def _rng(seed: int, i: int, salt: int = 0) -> np.random.Generator:
    return np.random.default_rng([seed, i, salt])


@dataclass(frozen=True)
class TurnRow:
    conv_id: str
    turn_idx: int
    role: str
    text: str
    tool: str
    ts: datetime


def conv_id_str(i: int) -> str:
    return f"c{i:09d}"


def _base_turns(seed: int, i: int) -> list[tuple[str, str, str]]:
    """[(role, text, tool)] for a fresh conversation — pure fn of (seed,i)."""
    rng = _rng(seed, i, salt=1)
    n_turns = int(rng.integers(3, 11))
    turns = []
    for t in range(n_turns):
        role = ROLES[t % 2]
        tool = ""
        if role == "assistant" and rng.random() < 0.25:
            tool = TOOLS[int(rng.integers(3, len(TOOLS)))]
        n_words = int(rng.integers(8, 60))
        words = [_VOCAB[int(w)] for w in rng.integers(0, VOCAB_SIZE, n_words)]
        turns.append((role, " ".join(words), tool))
    return turns


def _edit_tokens(turns: list[tuple[str, str, str]], rng: np.random.Generator, rate: float) -> list[tuple[str, str, str]]:
    out = []
    for role, text, tool in turns:
        words = text.split(" ")
        for j in range(len(words)):
            if rng.random() < rate:
                words[j] = _VOCAB[int(rng.integers(0, VOCAB_SIZE))]
        out.append((role, " ".join(words), tool))
    return out


def _kind_of(i: int) -> tuple[str, int | None]:
    m = i % 10
    if m == 7:
        return "exact", i - 7
    if m == 8:
        return "near", i - 8
    if m == 9:
        return "span", i - 8  # span partner is a background conv
    return "background", None


def conv_turns(seed: int, i: int) -> list[tuple[str, str, str]]:
    """The (role, text, tool) turns of conversation i — pure function."""
    kind, src = _kind_of(i)
    if kind == "background":
        return _base_turns(seed, i)
    if kind == "exact":
        return _base_turns(seed, src)
    if kind == "near":
        rng = _rng(seed, i, salt=2)
        # half the near copies land in the likely zone, half in review
        rate = 0.004 if rng.random() < 0.5 else 0.02
        return _edit_tokens(_base_turns(seed, src), rng, rate)
    # span: fresh conversation + one turn carries a long span copied from src
    rng = _rng(seed, i, salt=3)
    turns = _base_turns(seed, i)
    src_turns = conv_turns(seed, src)
    src_text = " ".join(t[1] for t in src_turns)
    src_words = src_text.split(" ")
    span_len = min(len(src_words), int(rng.integers(80, 160)))
    start = int(rng.integers(0, max(1, len(src_words) - span_len + 1)))
    span = " ".join(src_words[start : start + span_len])
    slot = int(rng.integers(0, len(turns)))
    role, text, tool = turns[slot]
    turns[slot] = (role, text + " " + span, tool)
    return turns


def conv_rows(seed: int, i: int) -> list[TurnRow]:
    cid = conv_id_str(i)
    rows = []
    for t, (role, text, tool) in enumerate(conv_turns(seed, i)):
        ts = BASE_TS + timedelta(seconds=i * 600 + t * 30)
        rows.append(TurnRow(cid, t, role, text, tool, ts))
    # emit turns in a scrambled order to exercise stable-ordering assembly
    perm = _rng(seed, i, salt=4).permutation(len(rows))
    return [rows[int(p)] for p in perm]


def truth_pairs(seed: int, n_convs: int) -> list[tuple[str, str, str]]:
    """(id_a, id_b, kind) with id_a < id_b, from layout arithmetic."""
    out = []
    for i in range(n_convs):
        kind, src = _kind_of(i)
        if kind == "background" or src is None or src < 0:
            continue
        a, b = conv_id_str(src), conv_id_str(i)
        out.append((min(a, b), max(a, b), kind))
    return out


def generate_rows(seed: int, n_convs: int) -> list[TurnRow]:
    rows: list[TurnRow] = []
    for i in range(n_convs):
        rows.extend(conv_rows(seed, i))
    return rows


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def generate_df(spark, seed: int, n_convs: int, partitions: int | None = None):
    """Spark-parallel deterministic generation via mapInPandas."""
    import pandas as pd

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)
    idx = spark.range(0, n_convs, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            recs = []
            for i in pdf["id"]:
                for r in conv_rows(seed, int(i)):
                    recs.append(
                        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
                    )
            yield pd.DataFrame(
                recs, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return idx.mapInPandas(gen, TRANSCRIPT_SCHEMA)


def truth_df(spark, seed: int, n_convs: int):
    return spark.createDataFrame(
        truth_pairs(seed, n_convs), "id_a string, id_b string, kind string"
    )
