"""Structured Streaming surfaces.

The crawl loop itself is micro-batch by construction (SURVEY §2.11): the
reference has no streaming — its "live progress" is a polled background
thread (api/routes.py:217-263). Two genuine streaming surfaces are still
useful at scale and are provided here:

- ``ingest_seed_stream``: continuous seed admission. A file-source stream of
  seed CSVs lands new frontier rows via ``foreachBatch``; the batch body is
  the SAME normalization + admission dataflow the batch path uses (the
  foreachBatch-wraps-the-round-unchanged pattern).
- ``hourly_rollup_stream``: watermarked event-time hourly aggregation of an
  events stream with late-data tolerance — the streaming twin of the batch
  ``events_hourly`` query.

Both are exercised with ``availableNow`` triggers in tests (no long-running
daemons in CI); on a cluster the same code runs with a processing-time
trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..operators import faults
from ..schemas import FRONTIER, SEEDS_RAW

_FRONTIER_COLS = [f.name for f in FRONTIER.fields]


def _admit_batch(batch: DataFrame, batch_id: int, frontier_table) -> None:
    """foreachBatch body: normalize seed rows → valid frontier rows appended
    with strict per-batch FIFO priority (same semantics as CrawlRun.start;
    batch_id stratifies priority so earlier files keep earlier order)."""
    w = Window.orderBy(F.monotonically_increasing_id())
    seeds = batch.withColumn("row_index", F.row_number().over(w) - 1)
    valid = seeds.filter(U.is_valid_url(F.col("url")))
    rows = (
        valid.withColumn(
            "priority",
            faults.seed_priority(F.col("row_index") + F.lit(batch_id) * 1_000_000),
        )
        .withColumn("url", U.remove_anchors(F.col("url")))
        .withColumn("url_hash", U.url_hash(F.col("url")))
        .withColumn("host", U.url_host(F.col("url")))
        .withColumn("depth", F.lit(0))
        .withColumn("attempts", F.lit(0))
        .withColumn("discovered_round", F.lit(0))
        .withColumn("parent_url", F.lit(None).cast("string"))
        .select(*_FRONTIER_COLS)
    )
    frontier_table.append(rows)


def ingest_seed_stream(
    spark: SparkSession,
    seeds_dir: str,
    frontier_table,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Stream seed CSVs from a directory into the frontier table.

    Returns the StreamingQuery (already started). With ``available_now``
    the query drains existing files and stops — the test/CI mode; without
    it the stream keeps watching the directory.
    """
    src = (
        spark.readStream.schema(SEEDS_RAW)
        .option("header", True)
        .option("maxFilesPerTrigger", 8)
        .csv(seeds_dir)
    )
    writer = (
        src.writeStream.foreachBatch(
            lambda df, bid: _admit_batch(df, bid, frontier_table)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_rollup_stream(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time hourly rollup (streaming DataFrame in, ready
    for ``writeStream``): counts + exact-cents value sums per
    (event_type, hour window); late rows beyond the watermark are dropped."""
    cents = F.round(F.col("value") * 100).cast("long")
    # NTZ parquet timestamps must become session-TZ (UTC-pinned) event time
    # before a watermark can track them
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("sum_cents"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            (F.col("sum_cents").cast("double") / 100.0).alias("sum_value"),
        )
    )
