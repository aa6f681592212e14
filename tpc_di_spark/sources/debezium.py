"""Debezium-envelope JSON changelog source — the realistic "binlog in"
adapter (SURVEY S1-family extension; the reference's intake is extract
FILES, but real CDC tails arrive as Debezium/Connect change events over
Kafka or object-store drops).

Parses newline-delimited Debezium change events into the engine's
CHANGE_EVENT envelope, entirely with Column expressions (``from_json``
+ struct field access — no row Python):

- ``op``: ``c``/``r`` (create / snapshot read) -> ``I``, ``u`` -> ``U``,
  ``d`` -> ``D``.
- row image: ``after`` for c/r/u; ``d`` carries only ``before`` (the
  engine's 'D' needs just the business key — exactly what Debezium
  guarantees is present).
- ``cdc_dsn``: the source position (``source.lsn``, falling back to
  ``source.pos`` then ``ts_ms``) — the monotone ordering the engine's
  LWW fold ties on.
- ``ts``: ``ts_ms`` epoch milliseconds.
- Both the raw Connect envelope (fields under ``payload``) and the
  flattened form produced by the ``ExtractNewRecordState`` unwrap SMT
  (fields at the top level) are accepted.

Malformed lines (unparseable JSON, missing/unknown ``op``, no row
image) are NOT dropped silently: they come back as a QUARANTINE
DataFrame of (raw line, reason) — the P12 alert-side-output pattern
applied to the intake (a poisoned binlog record must surface, not
vanish).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _envelope_schema(payload_schema: StructType) -> StructType:
    source = StructType(
        [StructField("lsn", LongType(), True), StructField("pos", LongType(), True)]
    )
    inner = [
        StructField("op", StringType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("before", payload_schema, True),
        StructField("after", payload_schema, True),
        StructField("source", source, True),
    ]
    # Accept both the raw Connect envelope ({"payload": {...}}) and the
    # unwrap-SMT flattened form ({...}) in ONE parse: the schema carries
    # both shapes and the reader coalesces. ``_corrupt`` captures
    # unparseable lines (from_json's PERMISSIVE mode otherwise yields an
    # all-null struct indistinguishable from a parsed-but-empty event).
    return StructType(
        inner
        + [
            StructField("payload", StructType(inner), True),
            StructField("_corrupt", StringType(), True),
        ]
    )


def read_debezium_json(
    spark: SparkSession, path: str, payload_schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Parse a Debezium JSONL changelog into (events, quarantine).

    ``events`` carries the engine envelope ``(cdc_flag, cdc_dsn,
    <payload columns>, ts)`` ready for ``CdcOrchestrator.apply_batch``;
    ``quarantine`` is ``(raw, reason)`` for every rejected line.
    """
    raw = spark.read.text(path).withColumnRenamed("value", "raw")
    return parse_debezium(raw, payload_schema)


def stream_debezium_events(
    spark: SparkSession,
    source_dir: str,
    payload_schema: StructType,
    max_files_per_trigger: int = 8,
    allow_ts_ms_position: bool = False,
):
    """Streaming twin of :func:`read_debezium_json`: a Debezium JSONL
    file-tail. Returns ``(raw_stream, transform)`` to hand to
    ``streaming.stream_apply.start_cdc_stream(events=raw_stream,
    transform=transform, quarantine_dir=...)`` — the parse runs INSIDE
    each micro-batch so quarantined lines are routed to a durable sink
    rather than dropped (the module's no-silent-loss invariant holds on
    the streaming path too)."""
    raw = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(source_dir)
        .withColumnRenamed("value", "raw")
    )

    def transform(batch_df: DataFrame):
        return parse_debezium(batch_df, payload_schema, allow_ts_ms_position)

    return raw, transform


def parse_debezium(
    raw: DataFrame,
    payload_schema: StructType,
    allow_ts_ms_position: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Column-expression Debezium parse over any ``raw: string`` lines
    DataFrame (batch or streaming).

    ``allow_ts_ms_position=True`` lets an event with no source position
    fall back to ``ts_ms`` as its ``cdc_dsn``. OFF by default: lsn/pos
    and epoch-millis are incomparable numeric domains, and one
    ts_ms-positioned event in an lsn-ordered feed would win every future
    LWW tie for its key (silently discarding later legitimate changes) —
    positionless events are quarantined instead."""
    parsed = raw.withColumn(
        "_e",
        F.from_json(
            F.col("raw"),
            _envelope_schema(payload_schema),
            {"columnNameOfCorruptRecord": "_corrupt"},
        ),
    )

    def pick(field: str):
        return F.coalesce(F.col(f"_e.payload.{field}"), F.col(f"_e.{field}"))

    op = pick("op")
    flag = (
        F.when(op.isin("c", "r"), F.lit("I"))
        .when(op == "u", F.lit("U"))
        .when(op == "d", F.lit("D"))
    )
    # 'd' rides the BEFORE image only (Debezium's contract, and what the
    # engine needs: the business key of the row being deleted). Taking a
    # stray after-image instead would delete the wrong key on
    # nonstandard key-change deletes. c/r/u need `after`.
    row_image = F.when(op == "d", pick("before")).otherwise(pick("after"))
    position = F.coalesce(
        pick("source").getField("lsn"), pick("source").getField("pos")
    )
    dsn = F.coalesce(position, pick("ts_ms")) if allow_ts_ms_position else position
    reason = (
        F.when(
            F.col("_e").isNull() | F.col("_e._corrupt").isNotNull(),
            # PERMISSIVE from_json lands both broken framing AND
            # schema-coercion failures here — name both so quarantine
            # triage doesn't hunt for the wrong producer defect.
            F.lit("malformed json or schema mismatch"),
        )
        .when(flag.isNull(), F.lit("missing or unknown op"))
        .when(row_image.isNull(), F.lit("no row image for op"))
        .when(pick("ts_ms").isNull(), F.lit("missing ts_ms"))
        .when(dsn.isNull(), F.lit("missing source position"))
    )
    tagged = parsed.select(
        "raw",
        reason.alias("reason"),
        flag.alias("cdc_flag"),
        dsn.cast("long").alias("cdc_dsn"),
        row_image.alias("_img"),
        F.timestamp_millis(pick("ts_ms")).alias("ts"),
    )
    payload_cols = [
        F.col(f"_img.{f.name}").alias(f.name)
        for f in payload_schema.fields
        if f.name != "ts"
    ]
    events = tagged.filter(F.col("reason").isNull()).select(
        "cdc_flag", "cdc_dsn", *payload_cols, "ts"
    )
    quarantine = tagged.filter(F.col("reason").isNotNull()).select("raw", "reason")
    return events, quarantine
