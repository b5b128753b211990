"""Incremental transcript ingest via Structured Streaming.

The reference's chunked reader (serd_reader_read_chunk,
/root/reference/src/reader.c:380-408) parses exactly one statement
group per call for pipe/socket use; the Spark re-expression is a
micro-batch ``foreachBatch`` loop running the same parse stages per
batch — state (Env fold, blank numbering) is re-derivable per
conversation because ids are pure functions of input coordinates, so
no keyed state store is needed for the parse itself.

``windowed_turn_counts`` adds the time-driven piece serd doesn't have
(serd is order-driven): watermark on ``ts`` for late turns + tumbling
per-conversation windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.parse import parse_documents, split_quarantine
from ..transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, input_path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )


def start_incremental_parse(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    syntax: str = "turtle",
    available_now: bool = True,
):
    """foreachBatch: each micro-batch's conversations are parsed with
    the batch-mode stages and appended to the triples sink.  Exactly-
    once via the streaming checkpoint + idempotent (deterministic)
    output rows."""
    stream = stream_transcripts(spark, input_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_documents(batch_df, syntax=syntax, lax=True)
        triples, errors = split_quarantine(parsed)
        triples.write.mode("append").parquet(f"{output_path}/triples")
        errors.write.mode("append").parquet(f"{output_path}/errors")

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_counts(
    transcripts: DataFrame, watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Late-data-tolerant per-conversation turn counts in tumbling
    windows (works on both batch and streaming DataFrames)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_turns"))
        .select("conv_id", F.col("w.start").alias("window_start"),
                "n_turns")
    )
