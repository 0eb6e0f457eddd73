"""Sliding-window document chunking for training-sequence preparation.

``pack_sequences`` (operators/packing.py) bins WHOLE documents into
fixed-capacity training sequences and deliberately gives oversize docs
their own bin; this module is the complementary step that standard
LM-training pipelines run first: split each over-length document into
overlapping ``max_tokens`` windows with a ``stride`` (the Hugging Face
``return_overflowing_tokens``/GPT-2 sliding-window convention), so no
single document exceeds the model context and boundary-straddling
content appears intact in at least one chunk.

Chunk-count convention (matches the HF sliding window exactly): with
step ``s = max_tokens - overlap``,

    n <= max_tokens          -> 1 chunk (the whole doc)
    n >  max_tokens          -> ceil((n - max_tokens) / s) + 1 chunks

i.e. windows start at 0, s, 2s, ... and the last window is the first
one that reaches the end of the document (it may be shorter than
``max_tokens``). Zero-token documents emit no chunks.

Scale shape: one pure-Catalyst projection (tokenize staged as a column
— never inlined into a lambda, see BENCH.md lesson 2) plus one narrow
``explode`` over the per-doc chunk index sequence — no shuffle, no UDF,
no window; chunk count per doc is bounded by ``n / s`` so the fan-out
is linear in corpus token count. All arithmetic is exact integer math
so the DuckDB oracle twin re-derives every chunk boundary bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into sliding windows of at
    most ``max_tokens`` tokens, consecutive windows sharing ``overlap``
    tokens. Emits one row per chunk:

      (id, chunk_idx, start_tok, n_chunk_tokens, chunk_text)

    ``chunk_text`` is the space-joined token window (the canonical
    tokenized form — the downstream packer/tokenizer consumes tokens,
    not raw bytes). ``start_tok`` is the 0-based token offset of the
    window. Deterministic: depends only on the text and the two
    parameters."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap} vs {max_tokens}"
        )
    step = max_tokens - overlap
    d = (
        docs.withColumn("__toks", tokenize(F.col(text_col)))
        .withColumn("__n", F.size("__toks").cast("long"))
        .filter(F.col("__n") > 0)
    )
    # exact integer ceil: n > max_tokens guarantees the numerator >= 1.
    # `div`, not `/`: Spark's / on longs is DOUBLE division — exact only
    # below 2^52, and the module contract is integer-exact boundaries.
    nchunks = F.when(F.col("__n") <= max_tokens, F.lit(1).cast("long")).otherwise(
        F.expr(f"(__n - {max_tokens} + {step - 1}) div {step}") + F.lit(1)
    )
    d = d.withColumn("__c", nchunks).withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), F.col("__c") - 1))
    )
    start = (F.col("chunk_idx") * step).cast("long")
    chunk = F.slice(F.col("__toks"), start + 1, max_tokens)
    return d.select(
        F.col(id_col),
        F.col("chunk_idx"),
        start.alias("start_tok"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
