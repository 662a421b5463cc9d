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


def _auth_columns(df: DataFrame, global_auth: dict | None) -> DataFrame:
    """Typed per-row credentials from the raw CSV strings (csv_processor.py:
    89-102 + tasks.py:505-555): when ``auth_enabled`` is truthy, ``auth_type``
    (default 'cookies') selects exactly ONE channel; rows WITHOUT their own
    auth fall back to ``global_auth`` (routes.py:190-197 stamps it only onto
    rows lacking auth_enabled). Cookie strings parse as JSON-or-pairs
    (U10); header strings parse as JSON, malformed → NULL (the reference's
    bare try/except). Everything is column expressions — no UDF."""
    from pyspark.sql.types import MapType, StringType

    from ..functions.urls import parse_cookie_string

    enabled = F.lower(F.trim(F.coalesce(F.col("auth_enabled"), F.lit("")))).isin(
        _TRUTHY
    )
    atype_raw = F.lower(F.trim(F.coalesce(F.col("auth_type"), F.lit(""))))
    atype = F.when(atype_raw == "", F.lit("cookies")).otherwise(atype_raw)
    null_map = F.lit(None).cast(MapType(StringType(), StringType()))
    null_str = F.lit(None).cast("string")

    g = global_auth or {}
    g_method = (g.get("auth_method") or "cookies").lower()
    g_cookies = (
        parse_cookie_string(F.lit(g["cookies"]))
        if g_method == "cookies" and g.get("cookies")
        else null_map
    )
    g_headers = (
        F.from_json(F.lit(g["auth_headers"]), MapType(StringType(), StringType()))
        if g_method == "headers" and g.get("auth_headers")
        else null_map
    )
    g_user = (
        F.lit(g.get("basic_auth_username")) if g_method == "basic" else null_str
    )
    g_pass = (
        F.lit(g.get("basic_auth_password")) if g_method == "basic" else null_str
    )

    # channel gates: a row with auth selects by auth_type; a row without
    # takes the global channel (or NULLs when no global auth is configured)
    row_cookies = F.when(
        atype == "cookies", parse_cookie_string(F.col("cookies"))
    ).otherwise(null_map)
    row_headers = F.when(
        atype == "headers",
        F.from_json(F.col("auth_headers"), MapType(StringType(), StringType())),
    ).otherwise(null_map)
    row_user = F.when(atype == "basic", F.trim(F.col("basic_auth_username"))).otherwise(
        null_str
    )
    row_pass = F.when(atype == "basic", F.trim(F.col("basic_auth_password"))).otherwise(
        null_str
    )
    return (
        df.withColumn("cookies", F.when(enabled, row_cookies).otherwise(g_cookies))
        .withColumn(
            "auth_headers", F.when(enabled, row_headers).otherwise(g_headers)
        )
        .withColumn(
            "basic_auth_user", F.when(enabled, row_user).otherwise(g_user)
        )
        .withColumn(
            "basic_auth_pass", F.when(enabled, row_pass).otherwise(g_pass)
        )
    )


def read_seeds(
    spark: SparkSession,
    path: str,
    max_urls: int = MAX_URLS_PER_CSV,
    global_auth: dict | None = None,
) -> DataFrame:
    """Load + normalize a seed CSV → columns:
    row_index, url, mode, formats(array), download_images(bool), link_type,
    exclude_anchors(bool), scope_class, scope_id, row_number (csv line №),
    cookies/auth_headers (map), basic_auth_user/basic_auth_pass.
    ``global_auth`` mirrors the reference's bulk-upload global authentication
    (routes.py:190-197): {"auth_method": "cookies"|"headers"|"basic", plus
    the matching "cookies"/"auth_headers"/"basic_auth_username"/
    "basic_auth_password" entries}, applied to rows without their own."""
    # Read header-aware (name-keyed, like the reference's DictReader):
    # an explicit schema + header=True would map columns by POSITION and
    # silently misparse reordered seed files. Missing optional columns
    # become NULL; a missing 'url' column is a hard error.
    # escape='"': RFC-4180 doubled quotes inside quoted fields — what the
    # reference's csv.DictReader (and every spreadsheet export) produces,
    # e.g. cookie/header JSON like "{""k"": ""v""}". Spark's default escape
    # is backslash, which would leave the doubled quotes in the value.
    raw = spark.read.option("header", True).option("escape", '"').csv(path)
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
    normalized = (
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
    )
    return _auth_columns(normalized, global_auth).select(
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
        "cookies",
        "auth_headers",
        "basic_auth_user",
        "basic_auth_pass",
    )
