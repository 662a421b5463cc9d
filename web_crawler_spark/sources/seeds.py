"""Seed-list CSV source (S2/S3) with the reference's normalization semantics.

reference: utils/csv_processor.py:10-16 (required ['url'], optional mode/
scope_class/scope_id/format/download_images/link_type/exclude_anchors),
:44-66 (parse + row provenance row_number=idx+2), :107-136 (formats split on
comma OR space + lower; booleans from {true,yes,1,y}; safe strip), and the
admission gate api/routes.py:200-207 (reject > MAX_URLS_PER_CSV).

Normalization is deterministic column expressions — no pandas inference
(SURVEY §1.3). Row provenance: seed lists are small by contract (the
reference hard-caps at 1000), so a single-partition row_number window is the
honest way to pin file order; everything downstream is fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import SEEDS_RAW

MAX_URLS_PER_CSV = 1000  # reference: api/routes.py:200 (env default)

_TRUTHY = ["true", "yes", "1", "y"]  # csv_processor.py:125-136


class AdmissionError(ValueError):
    pass


def read_seeds(
    spark: SparkSession, path: str, max_urls: int = MAX_URLS_PER_CSV
) -> DataFrame:
    """Load + normalize a seed CSV → columns:
    row_index, url, mode, formats(array), download_images(bool), link_type,
    exclude_anchors(bool), scope_class, scope_id, row_number (csv line №)."""
    # Read header-aware (name-keyed, like the reference's DictReader):
    # an explicit schema + header=True would map columns by POSITION and
    # silently misparse reordered seed files. Missing optional columns
    # become NULL; a missing 'url' column is a hard error.
    raw = spark.read.option("header", True).csv(path)
    if "url" not in raw.columns:
        raise AdmissionError("seed CSV has no 'url' column")
    for f_ in SEEDS_RAW.fieldNames():
        if f_ not in raw.columns:
            raw = raw.withColumn(f_, F.lit(None).cast("string"))
    raw = raw.select(*[F.col(f_).cast("string") for f_ in SEEDS_RAW.fieldNames()])
    n = raw.count()
    if n > max_urls:
        raise AdmissionError(f"CSV has {n} URLs; limit is {max_urls}")
    w = Window.orderBy(F.monotonically_increasing_id())
    strip = lambda c: F.trim(F.coalesce(F.col(c), F.lit("")))  # noqa: E731
    return (
        raw.coalesce(1)
        .withColumn("row_index", F.row_number().over(w) - 1)
        .withColumn("row_number", F.col("row_index") + 2)  # csv_processor.py:63
        .withColumn("url", F.trim(F.col("url")))
        .withColumn(
            "mode",
            F.when(F.lower(strip("mode")).isin("content", "link"), F.lower(strip("mode")))
            .otherwise(F.lit("content")),
        )
        .withColumn(
            "formats",
            F.array_distinct(
                F.filter(
                    F.split(F.lower(strip("format")), r"[,\s]+"),
                    lambda x: F.length(x) > 0,
                )
            ),
        )
        .withColumn("formats", F.when(F.size("formats") == 0, F.array(F.lit("txt"))).otherwise(F.col("formats")))
        .withColumn("download_images", F.lower(strip("download_images")).isin(_TRUTHY))
        .withColumn(
            "link_type",
            F.when(
                F.lower(strip("link_type")).isin("all", "internal", "external"),
                F.lower(strip("link_type")),
            ).otherwise(F.lit("all")),
        )
        .withColumn("exclude_anchors", F.lower(strip("exclude_anchors")).isin(_TRUTHY))
        .select(
            "row_index",
            "row_number",
            "url",
            "mode",
            "formats",
            "download_images",
            "link_type",
            "exclude_anchors",
            F.col("scope_class"),
            F.col("scope_id"),
        )
    )
