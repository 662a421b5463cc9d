"""Crawler-trap detection: per-host URL-shape signals that flag hosts
generating unbounded synthetic URL spaces (session-id query explosions,
calendar pages, looping path cycles) so the frontier can quarantine them.

Beyond-reference, first-class (crawl-frontier hygiene): the reference
crawler bounds damage per run with MAX_URLS_PER_CSV (config.py) but has no
per-host shape analysis; at a 10^10-URL frontier, trap hosts are where the
budget goes to die, and the signals below are the standard defenses
(Heritrix's ``TooManyPathSegments``/queue-budget analogues) expressed as
one linear aggregation.

Signals (all exact integers, SQL-replayable):

* ``n_urls`` vs ``n_paths`` (distinct query-stripped paths):
  ``variant_bp = (10000 * n_urls) // n_paths`` — a host serving many URLs
  over few paths is a query-string trap (sess ids, trackers, calendars),
* ``max_dup_segments`` — repeated path segments (``/a/b/a/b/a``) indicate
  a relative-link cycle inflating depth,
* ``max_depth`` and ``n_param_urls`` as supporting evidence columns.

Scale shape at 100 TB: narrow projections (regexp, split — whole-stage
codegen) then ONE groupBy(host). Host cardinality is bounded (~10^8 hosts
on the public web), the output is driver-safe to join back broadcast, and
no row ever leaves the executor except the per-host summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host

# authority matcher used only to strip scheme://authority off the front of
# the URL when deriving the path; the HOST column itself must come from the
# same definition the scheduler uses (url_host = try_parse_url HOST, no
# userinfo/port) or quarantine joins in plans/round.py silently miss hosts
# that carry a port (e.g. "spam.example:8080")
_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def url_shape(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL shape columns: host, query-stripped path, segment depth,
    duplicate-segment count, has_params. Pure column expressions."""
    url = F.col(url_col)
    rest = F.regexp_replace(url, _AUTHORITY_RE, "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return df.select(
        url.alias("url"),
        url_host(url).alias("host"),
        path.alias("path"),
        F.size(segs).cast("long").alias("depth"),
        (F.size(segs) - F.size(F.array_distinct(segs)))
        .cast("long")
        .alias("dup_segments"),
        F.instr(rest, "?").cast("long").alias("_qpos"),
    ).withColumn("has_params", F.col("_qpos") > 0).drop("_qpos")


def detect_url_traps(
    df: DataFrame,
    url_col: str = "url",
    *,
    variant_ratio_bp: int = 30000,
    dup_segment_threshold: int = 2,
    min_urls: int = 20,
) -> DataFrame:
    """Aggregate :func:`url_shape` per host and flag traps.

    A host is a trap when it has at least ``min_urls`` URLs AND either its
    URL-to-distinct-path ratio reaches ``variant_ratio_bp`` basis points
    (default 3×: three URLs per path) or any of its paths repeats a
    segment ``dup_segment_threshold`` or more times.

    Returns one row per host: (host, n_urls, n_paths, n_param_urls,
    max_depth, max_dup_segments, variant_bp, is_trap).
    """
    shaped = url_shape(df, url_col)
    agg = shaped.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("path").cast("long").alias("n_paths"),
        F.sum(F.col("has_params").cast("long")).alias("n_param_urls"),
        F.max("depth").alias("max_depth"),
        F.max("dup_segments").alias("max_dup_segments"),
    )
    variant_bp = F.expr("(10000 * n_urls) div n_paths")
    return agg.select(
        "host",
        "n_urls",
        "n_paths",
        "n_param_urls",
        "max_depth",
        "max_dup_segments",
        variant_bp.cast("long").alias("variant_bp"),
        (
            (F.col("n_urls") >= int(min_urls))
            & (
                (variant_bp >= int(variant_ratio_bp))
                | (F.col("max_dup_segments") >= int(dup_segment_threshold))
            )
        ).alias("is_trap"),
    )
