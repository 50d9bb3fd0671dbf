"""Structured Streaming adaptations (SURVEY.md §2.11).

The reference is a one-shot batch converter; the north rule demands a
resumable batch job (covered by sources/warehouse.py). This module
exists because the stateless pipeline PREFIX — span explode -> SOSI
tokenize -> reproject -> cell encode — runs unchanged under
Structured Streaming: the same narrow operators compose over
readStream, giving an incremental-ingest path for a documents table
that grows continuously. Joins/aggregations past the prefix would
need watermark design and are deliberately out of scope (documented,
not planned).

Also provides the watermarked windowed-aggregation demo over the
driver's `events` table shape: the standard late-data-tolerant
tumbling-window count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from topo2osm_spark.schema import DOCUMENTS


def stream_parse_prefix(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a parquet documents directory -> parsed +
    reprojected geometry objects (the stateless pipeline prefix)."""
    from topo2osm_spark.operators.reproject import reproject
    from topo2osm_spark.sources import sosi

    docs = (spark.readStream.schema(DOCUMENTS)
            .option("maxFilesPerTrigger", 8)
            .parquet(input_dir))
    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select("doc_id", "span_idx", "span.kind", "span.text",
             "span.media_ref", "span.offset")
    parsed = sosi.tokenize_spans(spans.where(F.col("kind") == "sosi"))
    return reproject(parsed)


def windowed_event_counts(events: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data dropped past
    the watermark). Works identically on a batch DataFrame (window()
    is a plain function) and a streaming one."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def run_stream_to_memory(spark: SparkSession, input_dir: str,
                         name: str = "stream_objects") -> DataFrame:
    """Drive the streaming prefix to completion against a static dir
    (memory sink + processAllAvailable) — the smoke-test harness."""
    q = (stream_parse_prefix(spark, input_dir)
         .select("doc_id", "span_idx", "obj_kind", "obj_id", "objtype")
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
