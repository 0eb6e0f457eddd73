"""Sources and sinks (SURVEY.md §2.1 parity).

Reference surface -> ours:
  S1 text-file scan (sc.textFile over S3/local)      -> spark.read with an
      explicit schema (parquet / Iceberg-at-rest; JSON at the edge)
  S2 per-line json.loads                              -> from_json / schema'd
      spark.read.json (typed, codegen'd — no per-row Python)
  S3 GeoJSONParser / GeoJSONLineParser (+.bz2)        -> read_transcripts_json:
      line-delimited or multiLine; compression inferred from extension
      (.bz2/.gz handled by Hadoop codecs)
  S5 RocksDB feature store                            -> joins against the
      conversations/feature DataFrames (no point-lookup store needed)
  S6 saveAsTextFile(JSON)                             -> write_json
  S7 TSV index sink (csv.writer / saveAsTextFile)     -> write_tsv
  Iceberg: read_transcripts_iceberg / write_iceberg are thin wrappers,
      gated on an Iceberg catalog being configured (no runtime jar in
      this container; on a real cluster add
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0 and a
      catalog conf, then these work unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


# Alias-map ingest (reference: lib/lieu/address.py:41-169 — 100+
# source-key aliases coalesced into canonical components, first key in
# declared priority order wins, an existing canonical key outranks all
# aliases). Heterogeneous multi-source exports land on TRANSCRIPT_SCHEMA
# through one select; per-row F.coalesce across the present alias
# columns generalizes the reference's per-record dict replace.
TRANSCRIPT_ALIASES: dict[str, list[str]] = {
    "conv_id": ["conv_id", "conversation_id", "session_id", "thread_id", "dialog_id"],
    "turn_idx": ["turn_idx", "turn_index", "turn", "message_idx", "seq", "position"],
    "role": ["role", "speaker", "author", "sender"],
    "text": ["text", "content", "message", "body", "utterance"],
    "tool": ["tool", "tool_name", "function", "tool_call"],
    "ts": ["ts", "timestamp", "time", "created_at", "event_time"],
}


def coalesce_aliases(
    df: DataFrame, extra_aliases: dict[str, list[str]] | None = None
) -> DataFrame:
    """Heterogeneous-column transcript ingest -> TRANSCRIPT_SCHEMA.

    For each canonical field, the present alias columns are coalesced in
    priority order (canonical name first — the reference's rule that an
    existing canonical key is never overwritten) and try_cast to the
    canonical type, so a malformed value (non-numeric turn, unparseable
    timestamp) degrades to NULL instead of failing the job under ANSI
    mode. Rows with null conv_id or turn_idx are dropped — the same
    malformed-row policy as parse_transcript_lines. Unknown columns are
    discarded. ``extra_aliases`` appends per-deployment names after the
    built-ins."""
    alias_map = {k: list(v) for k, v in TRANSCRIPT_ALIASES.items()}
    known = {f.name for f in TRANSCRIPT_SCHEMA.fields}
    unknown = set(extra_aliases or {}) - known
    if unknown:
        # a typo'd key would otherwise be silently ignored (the output
        # loop iterates canonical fields only) and ship an all-null
        # column with no warning
        raise ValueError(
            f"extra_aliases keys {sorted(unknown)} are not TRANSCRIPT_SCHEMA "
            f"fields {sorted(known)}"
        )
    for k, names in (extra_aliases or {}).items():
        alias_map.setdefault(k, []).extend(n for n in names if n not in alias_map[k])
    # case-insensitive matching, the same resolution rule Spark itself
    # applies to column references: a warehouse export with 'CONV_ID'
    # headers must map to conv_id, not silently become an all-null
    # column that the null-key filter then empties out. First match
    # wins on case collisions (df.columns order), mirroring Spark's
    # ambiguity being an error only when actually referenced.
    by_folded: dict[str, str] = {}
    for n in df.columns:
        by_folded.setdefault(n.lower(), n)
    out = []
    for field in TRANSCRIPT_SCHEMA.fields:
        present = [
            by_folded[n.lower()]
            for n in alias_map[field.name]
            if n.lower() in by_folded
        ]
        if present:
            # try_cast EACH alias column, then coalesce: coalescing
            # mixed native types first would make Spark insert a strict
            # ANSI cast to the common type inside the COALESCE, which
            # throws on the first malformed value instead of degrading
            # it to NULL. Per-column try_cast also means a malformed
            # value in a higher-priority column falls through to the
            # next alias rather than nulling the whole field.
            c = F.coalesce(*[F.col(n).try_cast(field.dataType) for n in present])
        elif field.name in ("conv_id", "turn_idx"):
            # a REQUIRED key field with no matching column would become
            # an all-null literal, and the trailing null-key filter
            # would then silently empty the whole corpus — the exact
            # quiet failure the extra_aliases typo guard above exists
            # to prevent; fail loudly with the columns we saw
            raise ValueError(
                f"coalesce_aliases: no column matches required field "
                f"{field.name!r} (aliases {alias_map[field.name]}) in "
                f"input columns {df.columns}; add an extra_aliases entry"
            )
        else:
            c = F.lit(None).try_cast(field.dataType)
        out.append(c.alias(field.name))
    res = df.select(*out)
    return res.filter(F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)


def read_transcripts_json(
    spark: SparkSession, path: str, multi_line: bool = False
) -> DataFrame:
    """Line-delimited (default) or whole-file JSON arrays; .gz/.bz2
    transparent. Explicit schema — no sampling pass, stable types.
    Malformed rows (PERMISSIVE null keys) are dropped here, the SAME
    policy parse_transcript_lines / coalesce_aliases / the CSV reader
    enforce — a null sort key would land the turn at an arbitrary
    position in the assembled doc, making text_sha depend on which
    ingest path a conversation arrived through."""
    reader = spark.read.schema(TRANSCRIPT_SCHEMA).option("multiLine", multi_line)
    return reader.json(path).filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )


def parse_transcript_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """S2 parity for pre-loaded line DataFrames (e.g. Kafka values):
    from_json with the fixed schema; malformed rows -> null conv_id,
    filtered (PERMISSIVE semantics made explicit). Rows with null
    turn_idx are dropped too — the same policy as coalesce_aliases: a
    null sort key would land the turn at an arbitrary position in the
    assembled doc, making text_sha (and therefore dedupe results)
    depend on which ingest path a conversation arrived through."""
    parsed = lines.select(
        F.from_json(F.col(col), TRANSCRIPT_SCHEMA).alias("r")
    ).select("r.*")
    return parsed.filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )


def read_transcripts_iceberg(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.format("iceberg").load(table)


def read_transcripts_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    multi_line: bool = True,
) -> DataFrame:
    """CSV/TSV ingest with the fixed schema (no sampling pass) and the
    same malformed-row policy as the JSON paths: PERMISSIVE nulls on
    unparseable fields, then rows missing conv_id or turn_idx dropped —
    a null sort key would make the assembled doc (and every dedupe
    verdict downstream) depend on which ingest path a conversation
    arrived through. .gz/.bz2 transparent like every Spark text
    source.

    multi_line defaults True because transcript text routinely embeds
    newlines (Spark's own CSV writer quotes them): without it the record
    splits at the newline and PERMISSIVE silently drops both fragments.
    The cost is that multiLine files are NOT split within a file — at
    100 TB, shard the corpus into many files (any sane writer does) or
    pass multi_line=False for corpora known newline-free.

    Known CSV limitation: the format cannot represent empty-string vs
    NULL for string fields (Spark's reader conflates both to NULL), so
    '' text/tool values do not roundtrip byte-exactly. Dedupe verdicts
    are still ingest-path-invariant: assemble_conversations normalizes
    null text to '' at the shared choke point."""
    # enforceSchema=False: with the default (true) Spark IGNORES the
    # file's header names and maps columns purely by position — a CSV
    # whose column order differs from TRANSCRIPT_SCHEMA would load role
    # strings into turn_idx (every row silently nulled away) or tool
    # values into text (wrong text_sha, wrong verdicts, zero
    # diagnostics). With it off, a header that doesn't match the schema
    # names fails LOUDLY at read time. Headerless files (header=False)
    # are unaffected: there is nothing to validate, order is the
    # contract.
    df = (
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("sep", sep)
        .option("header", header)
        .option("enforceSchema", False)
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    return df.filter(F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())


def read_transcripts_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingest (typed at rest, schema enforced on read — the other
    columnar format warehouses commonly hand over besides parquet)."""
    return spark.read.schema(TRANSCRIPT_SCHEMA).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7 parity: flat columns only (arrays/structs must be serialized
    by the caller first, as the reference's TSV index writer did)."""
    df.write.mode(mode).option("sep", "\t").option("header", "true").csv(path)


def write_iceberg(df: DataFrame, table: str) -> None:
    df.writeTo(table).createOrReplace()


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed+sorted parquet table in the session catalog — the
    vanilla-Spark analog of the north rule's Iceberg ``bucket(conv_id)``
    table layout. Stage tables written this way make every downstream
    join/aggregation keyed on ``key`` read co-located: Catalyst drops
    the Exchange (and with sortBy, the Sort) on the bucketed side —
    asserted in tests/test_bucketing.py. At 100 TB this converts the
    two biggest shuffles (feature join-back in verification, cluster
    join-back in output assembly) into local reads."""
    # one file per bucket (repartition on the bucket key first): Spark
    # only trusts the on-disk sort order — and drops the Sort below the
    # merge join — when a bucket is a single file
    out = df.repartition(buckets, F.col(key))
    w = out.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
