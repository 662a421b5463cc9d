"""Driver-contract query registry: every SURVEY §2 operator family plus the
training-data pipeline operators, each as a (Spark callable, DuckDB oracle
SQL) pair over the driver's parquet testdata.

The oracle SQL replays the *same algorithm* the Spark side runs (not an
idealized answer), so approximate operators (MinHash LSH, hyperplane ANN)
check exactly too. Determinism rules used throughout:

- every count/int output is BIGINT on both sides;
- doubles are derived from exact integers (cents/quantized embeddings) by
  the *same* expression shape, so both engines produce identical bits;
- thresholds on ratios are integer inequalities (``5·inter ≥ 4·union``),
  never rounded-double compares;
- hash parity via ``md5_long`` (functions/text.py) — identical in DuckDB as
  ``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``.

Each entry's docstring cites the SURVEY §2 operator id and the reference
file it re-expresses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import urls as U
from ..operators import similarity as SIM
from ..operators import textdedup as TD
from ..operators.dedupe import collision_suffix, first_wins
from ..operators.politeness import two_phase_topk

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


MD5L = "CAST(('0x' || substr(md5({x}),1,15)) AS BIGINT)"

def _shingle_cte(src: str = "documents") -> str:
    return f"""
sh AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS grams
  FROM {src} WHERE length(text) >= 5),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
sizes AS (SELECT doc_id, len(grams) AS n FROM sh)
"""


_SHINGLE_CTE = _shingle_cte()

_QUANT_CTE = """
v AS (SELECT vec_id, list_transform(embedding,
        x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS qv
      FROM embeddings)
"""



# one definition of the whitespace-token count (shared by content_stats,
# token_counts and the corpus-curation pipeline — parity requires the SQL
# expression to be literally identical everywhere it appears)
_WS_TOKENS_SQL = r"""CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)"""

def _dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1,64), i -> {a}[i]*{b}[i])) AS DOUBLE)"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_dot_sql(a, b)} / sqrt({_dot_sql(a, a)}) / sqrt({_dot_sql(b, b)})"
    )


# ---------------------------------------------------------------------------
# §2.7 aggregations
# ---------------------------------------------------------------------------

def q_agg_link_stats(spark, sf_dir):
    """A1 (api/tasks.py:393-407): count / count_if / countDistinct shape,
    over orders standing in for the links table."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("total_orders"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_final"),
        F.countDistinct(
            F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority"))
        ).alias("n_final_priorities"),
    )


SQL_AGG_LINK_STATS = """
SELECT CAST(COUNT(*) AS BIGINT) AS total_orders,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_final,
       CAST(COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderpriority END) AS BIGINT)
         AS n_final_priorities
FROM orders
"""


def q_agg_success_rate(spark, sf_dir):
    """A3 (utils/csv_processor.py:163-183): success/failure tally + rate,
    with exact cents arithmetic for the double outputs."""
    li = t(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    price_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    g = li.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        F.sum(qty_cents).alias("__qc"),
        F.sum(price_cents).alias("__pc"),
    )
    return g.select(
        "l_linestatus",
        "n_rows",
        "n_returned",
        F.round(
            F.col("n_returned").cast("double") / F.col("n_rows").cast("double"), 4
        ).alias("return_rate"),
        (F.col("__qc").cast("double") / 100.0).alias("sum_qty"),
        F.round(
            (F.col("__pc").cast("double") / 100.0) / F.col("n_rows").cast("double"), 4
        ).alias("avg_price"),
    )


SQL_AGG_SUCCESS_RATE = """
SELECT l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_returned,
       ROUND(CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 4) AS return_rate,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
       ROUND((CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0)
             / CAST(COUNT(*) AS DOUBLE), 4) AS avg_price
FROM lineitem GROUP BY l_linestatus
"""


def q_topk_freq(spark, sf_dir):
    """A7/W2 (api/routes.py:654-660): top-50 class frequency — explode/
    groupBy/orderBy/limit with a deterministic tie-break."""
    p = t(spark, sf_dir, "part")
    return (
        p.groupBy("p_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("p_type").asc())
        .limit(50)
    )


SQL_TOPK_FREQ = """
SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n
FROM part GROUP BY p_type ORDER BY n DESC, p_type ASC LIMIT 50
"""


# ---------------------------------------------------------------------------
# §2.8 sorts / limits / windows
# ---------------------------------------------------------------------------

def q_recent_first(spark, sf_dir):
    """W1 (api/models.py:230-237): recent-first top-N."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
        )
    )


SQL_RECENT_FIRST = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 100
"""


def q_per_key_budget(spark, sf_dir):
    """W4 (north rule per-host selection): skew-safe two-phase top-3 orders
    per customer by (price DESC, key ASC); identical to the naive window."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    sel = two_phase_topk(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
        F.xxhash64("o_orderkey"),
        8,
    )
    return sel.select("o_custkey", "o_orderkey", "o_totalprice")


SQL_PER_KEY_BUDGET = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
"""


def q_first_wins(spark, sf_dir):
    """D1 (crawler/link_extractor.py:109-113): first-occurrence-wins dedupe
    as a window — one lineitem per order, lowest line number."""
    li = t(spark, sf_dir, "lineitem")
    # l_linenumber repeats within an order in this synthetic data, so the
    # dedupe "document position" is the full tuple — first_wins needs a
    # total order per key to be deterministic (same rule as the frontier's
    # (priority, url_hash) tie-break).
    order = [F.col("l_linenumber").asc(), F.col("l_partkey").asc(), F.col("l_suppkey").asc()]
    return first_wins(li, "l_orderkey", order).select(
        "l_orderkey",
        F.col("l_partkey").alias("first_partkey"),
        F.col("l_linenumber").cast("long").alias("first_linenumber"),
    )


SQL_FIRST_WINS = """
SELECT l_orderkey, l_partkey AS first_partkey,
       CAST(l_linenumber AS BIGINT) AS first_linenumber
FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
                           ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC) = 1
"""


def q_collision_suffix(spark, sf_dir):
    """D3 (image_downloader.py:183-192): per-base filename counters."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return collision_suffix(p, "p_brand", "p_partkey").select(
        "p_partkey", "final_name"
    )


SQL_COLLISION_SUFFIX = """
SELECT p_partkey,
       CASE WHEN rn = 1 THEN p_brand
            ELSE p_brand || '_' || CAST(rn - 1 AS VARCHAR) END AS final_name
FROM (SELECT p_partkey, p_brand,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
      FROM part)
"""


# ---------------------------------------------------------------------------
# §2.6 joins / §2.9 set ops
# ---------------------------------------------------------------------------

def q_anti_join_unseen(spark, sf_dir):
    """J3/D4 (the frontier ∖ seen anti-join): customers with no orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


SQL_ANTI_JOIN_UNSEEN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_broadcast_dim_join(spark, sf_dir):
    """J1/J4 (broadcast of small dims — converters.py:62-82, robots join):
    suppliers per region through two broadcast joins."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"))
    )


SQL_BROADCAST_DIM_JOIN = """
SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# §2.3/2.4 URL predicates + scalar functions (synthesized URL columns)
# ---------------------------------------------------------------------------

_URL_EXPR = (
    "'https://img' || CAST(p_partkey % 7 AS VARCHAR) || '.example.com/p/' "
    "|| CAST(p_partkey AS VARCHAR) || CASE WHEN p_partkey % 3 = 0 THEN '#sec' ELSE '' END"
)


def q_url_normalize(spark, sf_dir):
    """U2/U8/U20-without-hash (link_extractor.py:39-42, writer.py:25-53):
    fragment strip + host extraction + slug over synthesized URLs."""
    p = t(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://img"),
        (F.col("p_partkey") % 7).cast("string"),
        F.lit(".example.com/p/"),
        F.col("p_partkey").cast("string"),
        F.when(F.col("p_partkey") % 3 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return p.select(
        "p_partkey",
        U.remove_anchors(url).alias("canonical"),
        U.url_host(url).alias("host"),
        U.domain_and_path_slug(url).alias("slug"),
    )


SQL_URL_NORMALIZE = f"""
WITH u AS (SELECT p_partkey, {_URL_EXPR} AS url FROM part)
SELECT p_partkey,
       regexp_replace(url, '(?s)#.*', '') AS canonical,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1), '\\.', '_', 'g')
         || '_' || regexp_extract(url, '^https?://[^/]+/([^/#]+)', 1) AS slug
FROM u
"""


def q_url_canonicalize(spark, sf_dir):
    """U1/U7 (link_extractor.py:15-37): the vectorized-urljoin pandas UDF
    over the four reference truth-table cases; oracle pins the expected
    RFC 3986 resolutions."""
    p = t(spark, sf_dir, "part")
    base = F.lit("https://h5.example.com/dir/page.html")
    href = (
        F.when(F.col("p_partkey") % 4 == 0, F.lit("/abs/x"))
        .when(F.col("p_partkey") % 4 == 1, F.lit("img.png"))
        .when(F.col("p_partkey") % 4 == 2, F.lit("//cdn.example.com/y"))
        .otherwise(F.lit("https://ext.example.org/z#frag"))
    )
    return p.select(
        "p_partkey", U.canonicalize(href, base, strip_fragment=True).alias("resolved")
    )


SQL_URL_CANONICALIZE = """
SELECT p_partkey,
       CASE p_partkey % 4
         WHEN 0 THEN 'https://h5.example.com/abs/x'
         WHEN 1 THEN 'https://h5.example.com/dir/img.png'
         WHEN 2 THEN 'https://cdn.example.com/y'
         ELSE 'https://ext.example.org/z' END AS resolved
FROM part
"""


def q_url_valid_partition(spark, sf_dir):
    """F1/T1 (utils/validators.py:10-42): valid/invalid URL partition
    counts over a synthesized mix of good, bad-scheme, empty, skip-list."""
    p = t(spark, sf_dir, "part")
    url = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit("ftp://files.example.com/a"))
        .when(F.col("p_partkey") % 5 == 1, F.lit(""))
        .when(F.col("p_partkey") % 5 == 2, F.lit("javascript:void(0)"))
        .otherwise(
            F.concat(F.lit("https://ok"), (F.col("p_partkey") % 9).cast("string"), F.lit(".example.com/"))
        )
    )
    d = p.select(url.alias("url"), U.is_valid_url(url).alias("valid"))
    return d.groupBy("valid").agg(F.count("*").alias("n"))


SQL_URL_VALID_PARTITION = """
WITH u AS (
  SELECT CASE p_partkey % 5
           WHEN 0 THEN 'ftp://files.example.com/a'
           WHEN 1 THEN ''
           WHEN 2 THEN 'javascript:void(0)'
           ELSE 'https://ok' || CAST(p_partkey % 9 AS VARCHAR) || '.example.com/' END AS url
  FROM part)
SELECT regexp_matches(url, '^https?://[^/]+') AS valid, CAST(COUNT(*) AS BIGINT) AS n
FROM u GROUP BY 1
"""


def q_error_taxonomy(spark, sf_dir):
    """E1/E2 (utils/error_handler.py:87-296, fetcher.py:73-93): status-code →
    error-type taxonomy + retry policy as columns over synthesized codes."""
    e = t(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_id") % 10 < 6, F.lit(200))
        .when(F.col("event_id") % 10 == 6, F.lit(404))
        .when(F.col("event_id") % 10 == 7, F.lit(500))
        .when(F.col("event_id") % 10 == 8, F.lit(403))
        .otherwise(F.lit(0))
    )
    etype = (
        F.when(code == 200, F.lit("none"))
        .when(code == 0, F.lit("network_error"))
        .when(code == 403, F.lit("permission_error"))
        .when(code >= 500, F.lit("http_error"))
        .otherwise(F.lit("http_error"))
    )
    retry = (code >= 500) | (code == 0)
    d = e.select(etype.alias("error_type"), retry.alias("retry_possible"))
    return d.groupBy("error_type", "retry_possible").agg(F.count("*").alias("n"))


SQL_ERROR_TAXONOMY = """
WITH c AS (
  SELECT CASE WHEN event_id % 10 < 6 THEN 200
              WHEN event_id % 10 = 6 THEN 404
              WHEN event_id % 10 = 7 THEN 500
              WHEN event_id % 10 = 8 THEN 403
              ELSE 0 END AS code
  FROM events)
SELECT CASE WHEN code = 200 THEN 'none'
            WHEN code = 0 THEN 'network_error'
            WHEN code = 403 THEN 'permission_error'
            ELSE 'http_error' END AS error_type,
       (code >= 500 OR code = 0) AS retry_possible,
       CAST(COUNT(*) AS BIGINT) AS n
FROM c GROUP BY 1, 2
"""


def q_content_stats(spark, sf_dir):
    """U13/A2 (crawler/parser.py:257-266): word/char counts per document."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.ws_token_count(F.col("text")).cast("long").alias("word_count"),
        F.length("text").cast("long").alias("char_count"),
    )


SQL_CONTENT_STATS = f"""
SELECT doc_id,
       {_WS_TOKENS_SQL}
         AS word_count,
       CAST(length(text) AS BIGINT) AS char_count
FROM documents
"""


def q_events_hourly(spark, sf_dir):
    """A5/A8-style time rollup over the events stream table (batch side of
    the §2.11 micro-batch loop), exact cents arithmetic."""
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    # ts is TIMESTAMP_NTZ: format it as a wall-clock string so the result is
    # independent of whatever session timezone the harness runs under
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    return (
        e.groupBy("event_type", hour.alias("hour_ts"))
        .agg(F.count("*").alias("n"), F.sum(cents).alias("__c"))
        .select(
            "event_type",
            "hour_ts",
            "n",
            (F.col("__c").cast("double") / 100.0).alias("sum_value"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_ts,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Flagship: the scheduling round over a synthesized frontier (W4+ordering)
# ---------------------------------------------------------------------------

def q_frontier_schedule(spark, sf_dir):
    """The SURVEY §7 minimum slice as an oracle-checkable query: synthesize a
    frontier from orders (url/host/priority), run the skew-safe per-host
    budget selection (budget 3) and emit the deterministic fetch order.
    Tie-break here is (priority DESC, url ASC) — url_hash has no DuckDB
    twin; the engine's xxhash64 tie-break is pinned by tests instead."""
    o = t(spark, sf_dir, "orders")
    host = F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"), F.lit(".shop.example"))
    url = F.concat(F.lit("https://"), host, F.lit("/o/"), F.col("o_orderkey").cast("string"))
    frontier = o.select(
        url.alias("url"), host.alias("host"), F.col("o_totalprice").alias("priority")
    )
    sel = two_phase_topk(
        frontier,
        ["host"],
        [F.col("priority").desc(), F.col("url").asc()],
        3,
        F.xxhash64("url"),
        8,
    )
    w = Window.orderBy(F.col("priority").desc(), F.col("url").asc())
    return sel.withColumn("fetch_seq", F.row_number().over(w).cast("long")).select(
        "fetch_seq", "url", "host", "priority"
    )


SQL_FRONTIER_SCHEDULE = """
WITH f AS (
  SELECT 'https://h' || CAST(o_custkey % 50 AS VARCHAR) || '.shop.example/o/'
           || CAST(o_orderkey AS VARCHAR) AS url,
         'h' || CAST(o_custkey % 50 AS VARCHAR) || '.shop.example' AS host,
         o_totalprice AS priority
  FROM orders),
sel AS (
  SELECT * FROM f
  QUALIFY ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, url ASC) <= 3)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, url ASC) AS BIGINT) AS fetch_seq,
       url, host, priority
FROM sel
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: dedup family (documents)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact content-hash dedupe (hash-groupBy). The corpus has no verbatim
    dupes, so the grouping key is the canonical bag-of-words fingerprint —
    sorted distinct lowercase words — which clusters reordered copies."""
    d = t(spark, sf_dir, "documents")
    bag = F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(T.words(F.col("text"))))))
    return (
        d.select("doc_id", bag.alias("bag_hash"))
        .groupBy("bag_hash")
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


SQL_DEDUP_EXACT = """
WITH bags AS (
  SELECT doc_id,
         -- COALESCE: list_aggr over an empty word list is NULL in DuckDB,
         -- while Spark's concat_ws over an empty array is '' — a wordless
         -- document must hash as md5('') in both engines (ADVICE r1 #3)
         md5(COALESCE(
           list_aggr(list_sort(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))),
                     'string_agg', ' '), '')) AS bag_hash
  FROM documents)
SELECT bag_hash, MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM bags GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact all-pairs 5-gram Jaccard ≥ 0.8 via the shingle inverted-index
    join (never a cross join); integer-exact threshold 5·|∩| ≥ 4·|∪|.

    Bounded to the first 1000 doc_ids: this corpus is a low-entropy worst
    case (every doc shares shingles with every other), so the exact
    quadratic baseline is deliberately run on a fixed slice; the minhash-LSH
    entry is the scale path over the full corpus. The bound is a no-op at
    the sf0.01 correctness scale (500 docs)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = TD.ngram_jaccard_pairs(
        d, "doc_id", "text", k=5, threshold=0.8
    )
    return pairs.select("doc_a", "doc_b", "n_inter", "n_union")


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH docs_bounded AS (SELECT * FROM documents WHERE doc_id < 1000),
{_shingle_cte("docs_bounded")},
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ni
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       CAST(ni AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - ni AS BIGINT) AS n_union
FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
WHERE 5 * ni >= 4 * (sa.n + sb.n - ni)
"""


def _neardup_index(spark, sf_dir):
    """Per-sf_dir NearDupIndex (build/probe split — the IVF pattern applied
    to the dedup suite): the first call materializes confirmed pairs +
    components into SnapshotTables; every later call (any process) loads.
    The pipeline is deterministic, so loaded == rebuilt and the oracles are
    unchanged."""
    import os as _o
    import tempfile as _t

    from ..operators.textdedup import NearDupIndex

    key = ("neardup_index", sf_dir)
    idx = _FIXTURE_CACHE.get(key)
    if idx is None or idx.spark is not spark:
        slug = sf_dir.strip("/").replace("/", "-")
        root = _o.path.join(_t.gettempdir(), f"wcs-neardup-index-{slug}")
        idx = NearDupIndex.load_or_build(
            t(spark, sf_dir, "documents"), root,
            id_col="doc_id", text_col="text",
            k=5, perms=32, bands=4, threshold=0.8,
        )
        _FIXTURE_CACHE[key] = idx
    return idx


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash (32 perms, xor family) + banded LSH (4 bands × 8 rows)
    candidates, confirmed by exact Jaccard ≥ 0.8, served from the
    NearDupIndex (built once per corpus, reused by clusters/prune). The
    oracle replays the identical signature/band/verify pipeline in SQL."""
    return _neardup_index(spark, sf_dir).pairs().select(
        "doc_a", "doc_b", "n_inter", "n_union"
    )


_BAND_HASH = MD5L.format(x="string_agg(CAST(m AS VARCHAR), ',' ORDER BY p)")
_PERM_CONST = MD5L.format(x="'perm:' || CAST(pp.p AS VARCHAR)")
_GRAM_HASH = MD5L.format(x="g")

SQL_DEDUP_MINHASH_LSH = f"""
WITH {_SHINGLE_CTE},
pm AS (
  SELECT doc_id, pp.p AS p, MIN(xor({_GRAM_HASH}, {_PERM_CONST})) AS m
  FROM ex, range(32) pp(p) GROUP BY doc_id, pp.p),
bands AS (
  SELECT doc_id, p // 8 AS b, {_BAND_HASH} AS bh
  FROM pm GROUP BY doc_id, p // 8),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
inter AS (
  SELECT e1.doc_id AS da, e2.doc_id AS db, COUNT(*) AS ni
  FROM ex e1 JOIN ex e2 ON e1.g = e2.g AND e1.doc_id < e2.doc_id
  GROUP BY 1, 2)
SELECT c.da AS doc_a, c.db AS doc_b,
       CAST(i.ni AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - i.ni AS BIGINT) AS n_union
FROM cand c
JOIN inter i ON i.da = c.da AND i.db = c.db
JOIN sizes sa ON sa.doc_id = c.da
JOIN sizes sb ON sb.doc_id = c.db
WHERE 5 * i.ni >= 4 * (sa.n + sb.n - i.ni)
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster assignment (VERDICT r1 #4): minhash-LSH pairs →
    connected components by iterative hash-min label propagation →
    (doc_id, cluster_id = min reachable doc id). The oracle replays the
    identical pair pipeline and computes min-reachable via a recursive CTE
    (both equal the component minimum, independent of iteration order)."""
    return _neardup_index(spark, sf_dir).clusters()


# shared CTE chain: minhash-LSH pairs → undirected edges → transitive
# min-reachable components (used by dedup_clusters, dedup_prune AND the
# corpus-curation pipeline, which runs it over a filtered source)
def _cluster_ctes(src: str = "documents") -> str:
    return f"""{_shingle_cte(src)},
pm AS (
  SELECT doc_id, pp.p AS p, MIN(xor({_GRAM_HASH}, {_PERM_CONST})) AS m
  FROM ex, range(32) pp(p) GROUP BY doc_id, pp.p),
bands AS (
  SELECT doc_id, p // 8 AS b, {_BAND_HASH} AS bh
  FROM pm GROUP BY doc_id, p // 8),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
inter AS (
  SELECT e1.doc_id AS da, e2.doc_id AS db, COUNT(*) AS ni
  FROM ex e1 JOIN ex e2 ON e1.g = e2.g AND e1.doc_id < e2.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT c.da AS doc_a, c.db AS doc_b
  FROM cand c
  JOIN inter i ON i.da = c.da AND i.db = c.db
  JOIN sizes sa ON sa.doc_id = c.da
  JOIN sizes sb ON sb.doc_id = c.db
  WHERE 5 * i.ni >= 4 * (sa.n + sb.n - i.ni)),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(doc, l) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.l FROM edges e JOIN reach r ON r.doc = e.dst),
comp AS (
  SELECT doc, MIN(l) AS cluster FROM reach GROUP BY doc)"""


_CLUSTER_CTES = _cluster_ctes()

SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_CLUSTER_CTES}
SELECT doc AS doc_id, CAST(cluster AS BIGINT) AS cluster_id FROM comp
"""


def q_dedup_prune(spark, sf_dir):
    """Corpus pruning: one row per SURVIVING document after near-dup
    clustering — representatives keep their cluster, unclustered docs pass
    through. The operator that actually shrinks a training corpus. Served
    from the NearDupIndex components — two doc_id joins, zero shingling."""
    d = t(spark, sf_dir, "documents")
    return _neardup_index(spark, sf_dir).prune(d, "doc_id")


SQL_DEDUP_PRUNE = f"""
WITH RECURSIVE {_CLUSTER_CTES}
SELECT d.doc_id,
       CASE WHEN c.doc IS NOT NULL THEN 'representative' ELSE 'unique' END AS kept_as
FROM documents d
LEFT JOIN comp c ON c.doc = d.doc_id AND c.doc = c.cluster
WHERE NOT EXISTS (SELECT 1 FROM comp x WHERE x.doc = d.doc_id AND x.doc <> x.cluster)
"""


def q_dedup_simhash(spark, sf_dir):
    """SimHash(60-bit, 5-gram shingles) near-dup pairs at hamming ≤ 3, with
    exact-recall band candidates. Oracle computes the same simhash in SQL
    and brute-forces pairs (equal by the pigeonhole guarantee)."""
    d = t(spark, sf_dir, "documents")
    return TD.simhash_pairs(d, "doc_id", "text", max_hamming=3, bands=4)


SQL_DEDUP_SIMHASH = f"""
WITH sh0 AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, length(text)-4), i -> substr(text, i, 5)))) AS g
  FROM documents WHERE length(text) >= 5),
th AS (SELECT doc_id, {MD5L.format(x='g')} AS h FROM sh0),
bitsums AS (
  SELECT doc_id, b.bit AS bit,
         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, range(60) b(bit) GROUP BY 1, 2),
sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS sh
  FROM bitsums GROUP BY 1)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: text analysis (documents)
# ---------------------------------------------------------------------------

def q_text_lang_id(spark, sf_dir):
    """Language-ID heuristic: CJK-ratio gate then stopword-ratio argmax."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


def _stoplist_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + "]"


_LANG_CASE_EXPR = """CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) * 4 > length(text) THEN 'zh'
            WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
            WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
            ELSE 'fr' END"""


def _lang_ctes(src: str = "documents", w: str = "w", s: str = "s") -> str:
    return f"""{w} AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z]+') AS toks
  FROM {src}),
{s} AS (
  SELECT doc_id, text,
         len(list_filter(toks, t -> list_contains({_stoplist_sql('en')}, t))) AS s_en,
         len(list_filter(toks, t -> list_contains({_stoplist_sql('de')}, t))) AS s_de,
         len(list_filter(toks, t -> list_contains({_stoplist_sql('es')}, t))) AS s_es,
         len(list_filter(toks, t -> list_contains({_stoplist_sql('fr')}, t))) AS s_fr
  FROM {w})"""


SQL_TEXT_LANG_ID = f"""
WITH {_lang_ctes()}
SELECT doc_id, {_LANG_CASE_EXPR} AS lang_pred
FROM s
"""


def q_text_quality(spark, sf_dir):
    """Quality scoring: exact integer signals + the frozen composite score."""
    d = t(spark, sf_dir, "documents")
    f = T.quality_features(F.col("text"))
    toks = T.words(F.col("text"))
    return d.select(
        "doc_id",
        f["n_chars"].cast("long").alias("n_chars"),
        f["n_tokens"].cast("long").alias("n_tokens"),
        T.stopword_count(toks, "en").cast("long").alias("n_stop"),
        T.quality_score(F.col("text")).alias("score"),
    )


def _quality_f_cte(src: str = "documents", name: str = "f") -> str:
    return rf"""{name} AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                         t -> list_contains({_stoplist_sql('en')}, t))) AS n_stop
  FROM {src})"""


_QUALITY_SCORE_EXPR = """ROUND(GREATEST(LEAST(
         0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         + 0.4 * LEAST(CAST(n_stop AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE) * 5.0, 1.0)
         + 0.2 * (1.0 - LEAST(CAST(n_punct AS DOUBLE) / CAST(GREATEST(n_tokens, 1) AS DOUBLE) * 5.0, 1.0))
         - 0.2 * LEAST(CAST(n_digit AS DOUBLE) / CAST(GREATEST(n_tokens, 1) AS DOUBLE) * 5.0, 1.0),
         1.0), 0.0), 4)"""


SQL_TEXT_QUALITY = f"""
WITH {_quality_f_cte()}
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stop,
       {_QUALITY_SCORE_EXPR} AS score
FROM f
"""


def q_token_counts(spark, sf_dir):
    """Token counting: whitespace and BPE-ish regex tokenizations."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.ws_token_count(F.col("text")).cast("long").alias("ws_tokens"),
        T.regex_token_count(F.col("text")).cast("long").alias("re_tokens"),
    )


SQL_TOKEN_COUNTS = rf"""
SELECT doc_id,
       {_WS_TOKENS_SQL}
         AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
         AS re_tokens
FROM documents
"""


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition signals per document, all exact ints:
    non-blank line count + duplicate-line count (identical lines repeated
    verbatim — boilerplate/spam marker) and word-bigram totals + the top
    bigram's multiplicity (high top-share = degenerate repetition). Line
    features are pure column expressions; the top-bigram count is one
    explode + two aggs keyed by doc_id — linear, map-side-combined, no
    all-pairs stage."""
    d = t(spark, sf_dir, "documents")
    lines = T.nonblank_lines(F.col("text"))
    line_feats = d.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(F.array_distinct(lines)))
        .cast("long")
        .alias("n_dup_lines"),
    )
    bg = d.select("doc_id", F.explode(T.word_bigrams(F.col("text"))).alias("g"))
    bg_feats = (
        bg.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.max("c").cast("long").alias("top_bigram_n"),
        )
    )
    return line_feats.join(bg_feats, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "n_dup_lines",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).alias("top_bigram_n"),
    )


SQL_TEXT_REPETITION = r"""
WITH l AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\r?\n'),
                     x -> length(trim(x)) > 0) AS ls
  FROM documents),
lf AS (
  SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
         CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS n_dup_lines
  FROM l),
w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i + 1])) AS g
  FROM w WHERE len(ws) >= 2),
cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bf AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_n
  FROM cnt GROUP BY 1)
SELECT lf.doc_id, lf.n_lines, lf.n_dup_lines,
       COALESCE(bf.n_bigrams, 0) AS n_bigrams,
       COALESCE(bf.top_bigram_n, 0) AS top_bigram_n
FROM lf LEFT JOIN bf ON lf.doc_id = bf.doc_id
"""


_DECON_K = 8  # benchmark shingle width
_DECON_BP = 8000  # keep iff ≥80% of the benchmark's shingles appear
_DECON_OFF, _DECON_LEN = 41, 160  # the slice of each bench doc used as prompt


def q_decontamination(spark, sf_dir):
    """Eval-set decontamination: benchmark prompts (a deterministic slice
    of every 31st document's text — stand-ins for eval questions) checked
    for n-gram containment in the full corpus. Direction-sensitive: the
    denominator is the BENCHMARK doc's shingle count (a prompt fully
    embedded in a long document is contamination even at tiny Jaccard).
    The benchmark side broadcasts; the corpus explodes shingles once."""
    from ..operators.textdedup import contamination_check

    d = t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 31 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.substring("text", _DECON_OFF, _DECON_LEN).alias("text"),
    )
    return contamination_check(
        d, bench, k=_DECON_K, min_frac_bp=_DECON_BP
    ).select("doc_id", "bench_id", "n_hits", "n_bench")


SQL_DECONTAMINATION = f"""
WITH bench AS (
  SELECT doc_id AS bench_id, substr(text, {_DECON_OFF}, {_DECON_LEN}) AS text
  FROM documents WHERE doc_id % 31 = 0),
bsh AS (
  SELECT bench_id, list_distinct(list_transform(
           generate_series(1, length(text) - {_DECON_K - 1}),
           i -> substr(text, i, {_DECON_K}))) AS grams
  FROM bench WHERE length(text) >= {_DECON_K}),
bex AS (SELECT bench_id, len(grams) AS n_bench, unnest(grams) AS g FROM bsh),
csh AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, length(text) - {_DECON_K - 1}),
           i -> substr(text, i, {_DECON_K}))) AS grams
  FROM documents WHERE length(text) >= {_DECON_K}),
cex AS (SELECT doc_id, unnest(grams) AS g FROM csh),
hits AS (
  SELECT cex.doc_id, bex.bench_id, bex.n_bench, COUNT(*) AS n_hits
  FROM cex JOIN bex ON cex.g = bex.g
  GROUP BY 1, 2, 3)
SELECT doc_id, bench_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_bench AS BIGINT) AS n_bench
FROM hits
WHERE n_hits * 10000 >= {_DECON_BP} * n_bench
"""


_LINE_WORDS = 3  # words per derived line (3-word lines over the ~30-word
# vocabulary give a natural mid-range cross-doc duplicate rate)
_LINE_MIN_DOCS = 2


def _wrapped_lines(text_col):
    """Deterministically wrap single-line word-soup text into 3-word lines
    — the multi-line document shape line_dedupe operates on. One codegen'd
    regex pass (non-overlapping matches group words left-to-right in 3s),
    mirrored verbatim by the SQL twin; RE2 and Java regex agree on this
    shape."""
    return F.regexp_replace(text_col, r"(\S+ \S+ \S+) ", "$1\n")


def q_line_dedupe(spark, sf_dir):
    """Global line-level dedup (C4 §2.1 / RefinedWeb line-wise filter):
    wrap each document into 3-word lines (the small vocabulary makes lines
    recur across documents, exactly like web boilerplate), then remove
    every line whose trimmed form appears in ≥2 distinct documents and
    reassemble the survivors in order. Two shuffles, no all-pairs stage;
    the boilerplate set is small by construction so the anti-join
    broadcasts. See operators/textdedup.py:line_dedupe."""
    from ..operators.textdedup import line_dedupe

    d = t(spark, sf_dir, "documents")
    wrapped = d.select("doc_id", _wrapped_lines(F.col("text")).alias("text"))
    return line_dedupe(wrapped, "doc_id", "text", min_docs=_LINE_MIN_DOCS)


SQL_LINE_DEDUPE = rf"""
WITH wrapped AS (
  SELECT doc_id,
         regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g') AS text
  FROM documents),
ls AS (SELECT doc_id, regexp_split_to_array(text, '\r?\n') AS a FROM wrapped),
l AS (
  SELECT doc_id,
         unnest(generate_series(1, len(a))) AS pos,
         unnest(a) AS line
  FROM ls),
boiler AS (
  SELECT trim(line) AS k FROM l WHERE trim(line) <> ''
  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= {_LINE_MIN_DOCS}),
kept AS (
  SELECT * FROM l WHERE trim(line) NOT IN (SELECT k FROM boiler)),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY 1),
tot AS (SELECT doc_id, COUNT(*) AS n_total FROM l GROUP BY 1)
SELECT tot.doc_id,
       COALESCE(reb.clean_text, '') AS clean_text,
       CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(tot.n_total - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_removed
FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub (BigScience/ROOTS-style corpus hygiene): emails, IPv4s and
    international phone numbers redacted with typed tokens + per-category
    counts. The documents corpus is digit-free, so PII strings are planted
    deterministically from doc_id (email on doc_id%3=0, IP on doc_id%2=0,
    phone always) — the SQL twin plants the identical strings and replays
    the identical sequential regex passes. Pure column expressions, zero
    UDFs; a codegen'd linear scan at 100 TB."""
    from ..functions.text import pii_redact

    d = t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact user"), sid, F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 250).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" call +66 2 555 01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    r = pii_redact(aug)
    return d.select(
        "doc_id",
        r["clean_text"].alias("clean_text"),
        r["n_email"].alias("n_email"),
        r["n_ip"].alias("n_ip"),
        r["n_phone"].alias("n_phone"),
    )


SQL_PII_REDACT = r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END
         || ' call +66 2 555 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
         AS t0
  FROM documents),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM aug),
s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
         regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
  FROM s1)
SELECT doc_id,
       regexp_replace(t2, '\+\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS clean_text,
       n_email, n_ip,
       CAST(len(regexp_extract_all(t2, '\+\d[\d\- ]{7,}\d')) AS BIGINT) AS n_phone
FROM s2
"""


_PACK_BUDGET = 200  # tokens per packed sequence (docs are 10-99 ws-tokens
# at every SF, so bins hold ~2-5 docs and the layout is non-trivial)
_PACK_BUCKETS = 8


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (T5/GPT-style context filling): documents walked in
    id order within hash buckets and packed greedy next-fit into
    token-budget bins. One shuffle + an Arrow applyInPandas per bucket; the
    per-bucket walk is the inherent serial section and n_buckets the
    parallelism knob. Bucket expr is doc_id % N here so plain SQL replays
    it (production default: pmod(xxhash64(id), N)). See
    operators/packing.py:pack_sequences."""
    from ..operators.packing import pack_sequences

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.ws_token_count(F.col("text")).alias("n_tokens"))
    return pack_sequences(
        toks,
        budget=_PACK_BUDGET,
        n_buckets=_PACK_BUCKETS,
        bucket_expr=F.col("doc_id") % _PACK_BUCKETS,
    )


SQL_PACK_SEQUENCES = rf"""
WITH RECURSIVE t AS (
  SELECT doc_id % {_PACK_BUCKETS} AS bucket, doc_id,
         {_WS_TOKENS_SQL} AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY doc_id % {_PACK_BUCKETS}
                            ORDER BY doc_id) AS rn
  FROM documents),
pack AS (
  SELECT bucket, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin_seq, CAST(0 AS BIGINT) AS pos_in_bin,
         n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN p.fill + t.n_tokens > {_PACK_BUDGET}
              THEN p.bin_seq + 1 ELSE p.bin_seq END,
         CASE WHEN p.fill + t.n_tokens > {_PACK_BUDGET}
              THEN CAST(0 AS BIGINT) ELSE p.pos_in_bin + 1 END,
         CASE WHEN p.fill + t.n_tokens > {_PACK_BUDGET}
              THEN t.n_tokens ELSE p.fill + t.n_tokens END
  FROM pack p JOIN t ON t.bucket = p.bucket AND t.rn = p.rn + 1)
SELECT bucket, doc_id, n_tokens, bin_seq, pos_in_bin,
       n_tokens > {_PACK_BUDGET} AS oversized
FROM pack
"""


_ES_K = 8
_ES_P1 = "the quick brown fox jumps over the lazy dog near the river bank"
_ES_P2 = "all work and no play makes a dull day for everyone involved here"


def q_exact_substring(spark, sf_dir):
    """Exact-substring duplicate spans (Lee et al. 2022 ExactSubstr, the
    k-token sliding-window inverted-index formulation): the word-soup
    corpus shares no verbatim 8-grams, so passages are planted
    deterministically (P1 on doc_id%7==0, P2 on doc_id%11==0 — docs
    hitting both carry two disjoint spans) and the SQL twin plants the
    identical strings. One groupBy on the window key + an islands-and-gaps
    merge per doc. See operators/textdedup.py:exact_substring_spans."""
    d = t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" " + _ES_P1)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" " + _ES_P2)).otherwise(F.lit("")),
        ).alias("text"),
    )
    return TD.exact_substring_spans(aug, "doc_id", "text", k=_ES_K)


SQL_EXACT_SUBSTRING = rf"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' {_ES_P1}' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' {_ES_P2}' ELSE '' END AS text
  FROM documents),
tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM aug WHERE length(trim(text)) > 0),
w AS (
  SELECT doc_id, tk, unnest(generate_series(1, len(tk) - {_ES_K} + 1)) AS pos
  FROM tok WHERE len(tk) >= {_ES_K}),
wh AS (
  SELECT doc_id, pos,
         CAST(('0x' || substr(md5(array_to_string(
           array_slice(tk, pos, pos + {_ES_K} - 1), ' ')), 1, 15)) AS BIGINT)
           AS whash
  FROM w),
dup AS (
  SELECT whash FROM wh GROUP BY whash HAVING COUNT(DISTINCT doc_id) >= 2),
dw AS (
  SELECT doc_id, pos FROM wh WHERE whash IN (SELECT whash FROM dup)),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM dw)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + {_ES_K} - 1 AS BIGINT) AS end_tok,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, island
"""


def q_url_traps(spark, sf_dir):
    """Crawler-trap detection (frontier hygiene at 10^10 URLs): synthesize
    per-host URL populations from orders — hostkey%5==0 hosts are
    query-string traps (5 paths, a sess param per order), %5==1 hosts are
    path-loop traps (repeated /p/<k>/p/<k> segments), the rest clean — then
    flag via the integer variant ratio + duplicate-segment signals. One
    groupBy(host); everything else is codegen'd projections. See
    operators/traps.py:detect_url_traps."""
    from ..operators.traps import detect_url_traps

    o = t(spark, sf_dir, "orders")
    hostkey = F.col("o_custkey") % 40
    host = F.concat(F.lit("h"), hostkey.cast("string"), F.lit(".shop.example"))
    okey = F.col("o_orderkey").cast("string")
    shape = (
        F.when(
            hostkey % 5 == 0,
            F.concat(
                F.lit("/cat/"), (F.col("o_orderkey") % 5).cast("string"),
                F.lit("?sess="), okey,
            ),
        )
        .when(
            hostkey % 5 == 1,
            F.concat(
                F.lit("/p/"), (F.col("o_orderkey") % 50).cast("string"),
                F.lit("/p/"), (F.col("o_orderkey") % 50).cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("/item/"), okey))
    )
    urls = o.select(F.concat(F.lit("https://"), host, shape).alias("url"))
    return detect_url_traps(urls)


SQL_URL_TRAPS = r"""
WITH u AS (
  SELECT 'https://h' || CAST(o_custkey % 40 AS VARCHAR) || '.shop.example'
         || CASE
              WHEN (o_custkey % 40) % 5 = 0
                THEN '/cat/' || CAST(o_orderkey % 5 AS VARCHAR)
                     || '?sess=' || CAST(o_orderkey AS VARCHAR)
              WHEN (o_custkey % 40) % 5 = 1
                THEN '/p/' || CAST(o_orderkey % 50 AS VARCHAR)
                     || '/p/' || CAST(o_orderkey % 50 AS VARCHAR)
              ELSE '/item/' || CAST(o_orderkey AS VARCHAR)
            END AS url
  FROM orders),
shaped AS (
  SELECT url,
         -- replay try_parse_url(url, 'HOST'): authority minus userinfo/port
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#:]+)', 1) AS host,
         regexp_extract(regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', ''),
                        '^([^?#]*)', 1) AS path,
         instr(regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', ''), '?') > 0
           AS has_params
  FROM u),
segd AS (
  SELECT *,
         list_filter(string_split(path, '/'), s -> s <> '') AS segs
  FROM shaped),
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
         CAST(SUM(CASE WHEN has_params THEN 1 ELSE 0 END) AS BIGINT) AS n_param_urls,
         CAST(MAX(len(segs)) AS BIGINT) AS max_depth,
         CAST(MAX(len(segs) - len(list_distinct(segs))) AS BIGINT) AS max_dup_segments
  FROM segd GROUP BY host)
SELECT host, n_urls, n_paths, n_param_urls, max_depth, max_dup_segments,
       CAST((10000 * n_urls) // n_paths AS BIGINT) AS variant_bp,
       n_urls >= 20 AND ((10000 * n_urls) // n_paths >= 30000
                         OR max_dup_segments >= 2) AS is_trap
FROM agg
"""


_DSIR_B = 256
_DSIR_SCALE = 10**6


def q_importance_scores(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023) with hashed unigram
    features, integer-exact: target = the English slice of the corpus,
    per-bucket smoothed frequency ratios in parts-per-million, per-doc
    score = sum of its words' bucket ratios, keep = mean ratio >= 1. Two
    word-count passes + a broadcast 256-row ratio table + one groupBy(doc).
    See operators/sampling.py:importance_scores."""
    from ..operators.sampling import importance_scores

    d = t(spark, sf_dir, "documents")
    return importance_scores(
        d, d.filter(F.col("lang") == "en"), n_buckets=_DSIR_B, scale=_DSIR_SCALE
    )


SQL_IMPORTANCE_SCORES = rf"""
WITH cwx AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents),
cw AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {_DSIR_B} AS b
  FROM cwx),
twx AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents WHERE lang = 'en'),
tw AS (
  SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {_DSIR_B} AS b
  FROM twx),
allb AS (SELECT unnest(generate_series(0, {_DSIR_B} - 1)) AS b),
tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t_b FROM tw GROUP BY 1),
cc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_b FROM cw GROUP BY 1),
counts AS (
  SELECT allb.b, COALESCE(t_b, 0) AS t_b, COALESCE(c_b, 0) AS c_b
  FROM allb LEFT JOIN tc ON allb.b = tc.b LEFT JOIN cc ON allb.b = cc.b),
tot AS (
  SELECT CAST(SUM(t_b) AS BIGINT) AS t_tot, CAST(SUM(c_b) AS BIGINT) AS c_tot
  FROM counts),
ratios AS (
  SELECT b,
         CAST(({_DSIR_SCALE} * (t_b + 1) * (c_tot + {_DSIR_B}))
              // ((c_b + 1) * (t_tot + {_DSIR_B})) AS BIGINT) AS r_b
  FROM counts, tot),
scored AS (
  SELECT doc_id, CAST(SUM(r_b) AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM cw JOIN ratios USING (b) GROUP BY 1)
SELECT d.doc_id,
       COALESCE(score, 0) AS score,
       COALESCE(n_words, 0) AS n_words,
       COALESCE(n_words, 0) > 0
         AND COALESCE(score, 0) >= {_DSIR_SCALE} * COALESCE(n_words, 0) AS keep
FROM documents d LEFT JOIN scored USING (doc_id)
"""


_SAMPLE_RATES = {"en": 2500, "de": 5000, "fr": 7500, "es": 1000}
_SAMPLE_DEFAULT = 500  # zh and anything unlisted
_SPLIT_WEIGHTS = [("train", 8000), ("val", 1000), ("test", 1000)]
_SPLIT_SALT = 7919  # decorrelates the split hash from the sampling hash


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language corpus balancing: keep-rate per lang in
    basis points, membership a pure function of doc_id (no RNG, no shuffle,
    partitioning-invariant — the 100 TB-safe sampling shape). The bucket is
    materialized so the keep decision is auditable in the output."""
    from ..operators.sampling import stratified_sample

    d = t(spark, sf_dir, "documents")
    return stratified_sample(
        d.select("doc_id", "lang"),
        "lang",
        _SAMPLE_RATES,
        "doc_id",
        default_rate=_SAMPLE_DEFAULT,
        bucket_out="bucket",
    )


def _sample_case_sql() -> str:
    whens = "\n         ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"CASE lang {whens} ELSE {_SAMPLE_DEFAULT} END"


def _bucket_sql_expr(salt: int = 0) -> str:
    from ..operators.sampling import bucket_sql

    return bucket_sql("doc_id", salt=salt)


SQL_STRATIFIED_SAMPLE = f"""
WITH b AS (
  SELECT doc_id, lang, {_bucket_sql_expr()} AS bucket
  FROM documents
)
SELECT doc_id, lang, CAST(bucket AS INTEGER) AS bucket
FROM b
WHERE bucket < {_sample_case_sql()}
"""


def q_hash_split(spark, sf_dir):
    """Disjoint-exhaustive train/val/test assignment by contiguous bucket
    ranges over a salted hash of doc_id — a row can never migrate between
    splits across runs, repartitionings, or cluster sizes."""
    from ..operators.sampling import hash_split

    d = t(spark, sf_dir, "documents")
    return hash_split(
        d.select("doc_id", "lang"), "doc_id", _SPLIT_WEIGHTS, salt=_SPLIT_SALT
    )


SQL_HASH_SPLIT = f"""
WITH b AS (
  SELECT doc_id, lang, {_bucket_sql_expr(_SPLIT_SALT)} AS bucket
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


_MIX_TARGETS = {"en": 4000, "de": 3000, "zh": 3000}  # basis points


def q_corpus_mix(spark, sf_dir):
    """Domain/language mixing: down-sample the observed corpus toward a
    target language distribution (en 40% / de 30% / zh 30%). The rates are
    derived from the observed stratum counts in exact integer arithmetic
    (`mix_rates_bp`: binding stratum kept whole, others down-sampled by
    cross-multiplied ratios — no floats anywhere), then applied with the
    zero-shuffle deterministic sampler. Languages outside the target mix
    (fr, es) get rate 0. The SQL oracle replays the ENTIRE computation,
    argmax included."""
    from ..operators.sampling import mix_rates_bp, stratified_sample

    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    rates = mix_rates_bp(d, "lang", _MIX_TARGETS)
    return stratified_sample(
        d, "lang", rates, "doc_id", default_rate=0, bucket_out="bucket"
    )


def _mix_targets_values() -> str:
    return ", ".join(f"('{s}', {r})" for s, r in sorted(_MIX_TARGETS.items()))


SQL_CORPUS_MIX = f"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
tgt(lang, tbp) AS (VALUES {_mix_targets_values()}),
j AS (SELECT tgt.lang, tgt.tbp, c.n FROM tgt JOIN c USING (lang)),
best AS (
  SELECT a.lang, a.tbp, a.n FROM j a
  WHERE NOT EXISTS (
    SELECT 1 FROM j b
    WHERE b.tbp * a.n > a.tbp * b.n
       OR (b.tbp * a.n = a.tbp * b.n AND b.lang < a.lang))),
rates AS (
  SELECT j.lang,
         LEAST(10000, (10000 * j.tbp * best.n) // (best.tbp * j.n)) AS rate
  FROM j, best),
b AS (
  SELECT d.doc_id, d.lang, {_bucket_sql_expr()} AS bucket, r.rate
  FROM documents d JOIN rates r USING (lang))
SELECT doc_id, lang, CAST(bucket AS INTEGER) AS bucket
FROM b WHERE bucket < rate
"""


def q_corpus_curation(spark, sf_dir):
    """The training-data pipeline end-to-end in one declarative plan:
    language-ID gate (en) → quality-score gate (≥ 0.5) → near-dup pruning
    WITHIN the filtered corpus → per-survivor (doc_id, score, ws_tokens,
    kept_as). Every stage is an operator with its own oracle entry; this
    entry pins their composition."""
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        T.lang_id(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("score"),
        T.ws_token_count(F.col("text")).cast("long").alias("ws_tokens"),
    )
    # persist: kept feeds BOTH the dedup pipeline and the final join — the
    # lang/quality expression chains are the dominant per-row cost and must
    # not be evaluated twice (bounded: the filtered corpus)
    kept = scored.filter(
        (F.col("lang") == "en") & (F.col("score") >= 0.5)
    ).persist()
    survivors = TD.dedup_prune(kept.select("doc_id", "text"), "doc_id", "text")
    return kept.join(survivors, "doc_id").select(
        "doc_id", "score", "ws_tokens", "kept_as"
    )


SQL_CORPUS_CURATION = rf"""
WITH RECURSIVE {_lang_ctes()},
lang AS (SELECT doc_id, {_LANG_CASE_EXPR} AS lang_pred FROM s),
{_quality_f_cte(name="qf")},
qual AS (SELECT doc_id, {_QUALITY_SCORE_EXPR} AS score FROM qf),
wt AS (
  SELECT doc_id, {_WS_TOKENS_SQL} AS ws_tokens
  FROM documents),
filtered AS (
  SELECT d.doc_id, d.text
  FROM documents d
  JOIN lang l USING (doc_id)
  JOIN qual q USING (doc_id)
  WHERE l.lang_pred = 'en' AND q.score >= 0.5),
{_cluster_ctes("filtered")}
SELECT f.doc_id, q.score, w2.ws_tokens,
       CASE WHEN c.doc IS NOT NULL THEN 'representative' ELSE 'unique' END AS kept_as
FROM filtered f
JOIN qual q USING (doc_id)
JOIN wt w2 USING (doc_id)
LEFT JOIN comp c ON c.doc = f.doc_id AND c.doc = c.cluster
WHERE NOT EXISTS (SELECT 1 FROM comp x WHERE x.doc = f.doc_id AND x.doc <> x.cluster)
"""


def q_doc_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (k=8, w=4) as (doc_id, fingerprint) rows, via
    the explode + frame-window form (one md5 per gram position; the array
    expression form re-expands the hash chain under project-collapse)."""
    d = t(spark, sf_dir, "documents")
    return TD.winnow_table(d, "doc_id", "text", k=8, w=4)


SQL_DOC_FINGERPRINTS = f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN length(text) >= 8
              THEN list_transform(generate_series(1, length(text)-7),
                                  i -> {MD5L.format(x='substr(text, i, 8)')})
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM documents),
m AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= 4
              THEN list_transform(generate_series(1, len(hs)-3),
                                  j -> list_aggregate(list_slice(hs, j, j+3), 'min'))
              WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')]
              ELSE hs END AS mins
  FROM g)
SELECT doc_id, unnest(list_distinct(mins)) AS fingerprint FROM m
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: similarity search (embeddings)
# ---------------------------------------------------------------------------

def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-3 for the first 32 query vectors —
    quantized-integer arithmetic makes it engine-exact."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(e, k=3, n_queries=32)


SQL_ANN_COSINE_TOPK = f"""
WITH {_QUANT_CTE},
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql('q.qv', 'c.qv')} AS cosine
  FROM v q JOIN v c ON q.vec_id < 32 AND c.vec_id <> q.vec_id)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, ROUND(cosine, 4) AS cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk
      FROM pairs)
WHERE rnk <= 3
"""


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed approximate top-3 (12 planes) — the scale
    path; the oracle replays the identical bucketing."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.ann_lsh_topk(e, k=3, planes=12, n_queries=32)


_PLANE_SIGN = (
    "CASE WHEN "
    + MD5L.format(x="'hp:' || CAST(pp.p AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR)")
    + " % 2 = 0 THEN 1 ELSE -1 END"
)

SQL_ANN_LSH_TOPK = f"""
WITH {_QUANT_CTE},
planes AS (
  SELECT pp.p AS p, dd.d AS d, {_PLANE_SIGN} AS s
  FROM range(12) pp(p), range(64) dd(d)),
proj AS (
  SELECT v.vec_id, pl.p, SUM(pl.s * v.qv[pl.d + 1]) AS pr
  FROM v, planes pl GROUP BY 1, 2),
buck AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY 1),
vb AS (SELECT v.vec_id, v.qv, b.bucket FROM v JOIN buck b USING (vec_id)),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql('q.qv', 'c.qv')} AS cosine
  FROM vb q JOIN vb c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < 32)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, ROUND(cosine, 4) AS cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk
      FROM pairs)
WHERE rnk <= 3
"""


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat approximate top-3 (8 cells, 2 deterministic k-means rounds,
    nprobe 2) — the partitioned ANN scale path; the oracle replays the
    identical Lloyd iterations + assignment + probe.

    Build/probe split (VERDICT r2 #1): the trained centroids persist in a
    per-sf_dir SnapshotTable; the first call trains + saves, every later
    call (this process or the next) loads and only probes. Training is
    deterministic, so loaded == rebuilt and the oracle is unchanged."""
    import os as _o
    import tempfile as _t

    from ..operators.similarity import IvfIndex
    from ..sources.lake import SnapshotTable

    e = t(spark, sf_dir, "embeddings")
    key = ("ivf_index", sf_dir)
    idx = _FIXTURE_CACHE.get(key)
    if idx is None or idx.corpus.sparkSession is not spark:
        slug = sf_dir.strip("/").replace("/", "-")
        table = SnapshotTable(
            _o.path.join(_t.gettempdir(), f"wcs-ivf-index-{slug}")
        )
        idx = IvfIndex.load_or_build(table, e, n_cells=8, kmeans_iters=2)
        _FIXTURE_CACHE[key] = idx
    return SIM.ann_ivf_topk(e, k=3, nprobe=2, n_queries=32, index=idx)


def _ivf_kmeans_sql(
    n_cells: int = 8, iters: int = 2, dims: int = 64, nprobe: int = 2,
    k: int = 3, n_queries: int = 32,
) -> str:
    """Generate the IVF oracle: seeded init + ``iters`` Lloyd rounds
    (assign by argmax cosine, update = per-dim FLOOR(AVG), empty cells keep
    their centroid), then the assignment/probe/top-k pipeline — the exact
    SQL twin of kmeans_centroids + ann_ivf_topk."""
    ctes = [
        f"vn AS (SELECT vec_id, qv, sqrt({_dot_sql('qv', 'qv')}) AS nrm FROM v)",
        f"c0 AS (SELECT vec_id AS cell, qv AS cv FROM v WHERE vec_id < {n_cells})",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        cn, a, u, g, c = f"cn{it}", f"a{it}", f"u{it}", f"g{it}", f"c{it}"
        ctes.append(
            f"{cn} AS (SELECT cell, cv, sqrt({_dot_sql('cv', 'cv')}) AS cn FROM {prev})"
        )
        ctes.append(
            f"""{a} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT vn.vec_id, vn.qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
             ORDER BY ({_dot_sql('vn.qv', 'c.cv')} / vn.nrm / c.cn) DESC, c.cell ASC) AS r
    FROM vn, {cn} c)
  WHERE r = 1)"""
        )
        ctes.append(
            f"""{u} AS (
  SELECT cell, d.d AS d, CAST(FLOOR(AVG(qv[d.d])) AS BIGINT) AS cd
  FROM {a}, range(1, {dims + 1}) d(d) GROUP BY cell, d.d)"""
        )
        ctes.append(f"{g} AS (SELECT cell, list(cd ORDER BY d) AS cv FROM {u} GROUP BY cell)")
        ctes.append(
            f"{c} AS (SELECT p.cell, COALESCE(g.cv, p.cv) AS cv FROM {prev} p LEFT JOIN {g} g USING (cell))"
        )
        prev = c
    ctes.append(
        f"cents AS (SELECT cell, cv, sqrt({_dot_sql('cv', 'cv')}) AS cn FROM {prev})"
    )
    ctes.append(
        f"""assign AS (
  SELECT vec_id, qv, nrm, cell FROM (
    SELECT vn.vec_id, vn.qv, vn.nrm, c.cell,
           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
             ORDER BY ({_dot_sql('vn.qv', 'c.cv')} / vn.nrm / c.cn) DESC, c.cell ASC) AS r
    FROM vn, cents c)
  WHERE r = 1)"""
    )
    ctes.append(
        f"""probe AS (
  SELECT query_id, qv, nrm, cell FROM (
    SELECT vn.vec_id AS query_id, vn.qv, vn.nrm, c.cell,
           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
             ORDER BY ({_dot_sql('vn.qv', 'c.cv')} / vn.nrm / c.cn) DESC, c.cell ASC) AS r
    FROM vn, cents c WHERE vn.vec_id < {n_queries})
  WHERE r <= {nprobe})"""
    )
    ctes.append(
        f"""cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_dot_sql('p.qv', 'a.qv')} / p.nrm / a.nrm AS cosine
  FROM probe p JOIN assign a USING (cell)
  WHERE a.vec_id <> p.query_id)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {_QUANT_CTE.strip()},
{body}
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, ROUND(cosine, 4) AS cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk
      FROM cand)
WHERE rnk <= {k}
"""


SQL_ANN_IVF_TOPK = _ivf_kmeans_sql()


def q_embedding_neardup(spark, sf_dir):
    """Embedding near-dup pairs: cosine ≥ 0.4 within coarse 4-plane LSH
    buckets (corpus max pairwise cosine is ~0.51, so 0.4 exercises the
    filter against real candidates)."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.neardup_pairs(e, threshold=0.4, planes=4)


_PLANE_SIGN4 = _PLANE_SIGN

# shared CTE chain for the embedding near-dup family (pairs + clusters)
_NEARDUP_CTES = f"""{_QUANT_CTE.strip()},
planes AS (
  SELECT pp.p AS p, dd.d AS d, {_PLANE_SIGN4} AS s
  FROM range(4) pp(p), range(64) dd(d)),
proj AS (
  SELECT v.vec_id, pl.p, SUM(pl.s * v.qv[pl.d + 1]) AS pr
  FROM v, planes pl GROUP BY 1, 2),
buck AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY 1),
vb AS (SELECT v.vec_id, v.qv, b.bucket FROM v JOIN buck b USING (vec_id)),
ndpairs AS (
  -- threshold on the EXACT cosine (round is display-only), matching
  -- similarity.neardup_pairs
  SELECT id_a, id_b, ROUND(cos_exact, 4) AS cosine FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.qv', 'b.qv')} AS cos_exact
    FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
  WHERE cos_exact >= 0.4)"""

SQL_EMBEDDING_NEARDUP = f"""
WITH {_NEARDUP_CTES}
SELECT id_a, id_b, cosine FROM ndpairs
"""


def q_embedding_neardup_clusters(spark, sf_dir):
    """Embedding near-dup cluster assignment: components over the same
    bucketed pairs, min-id representative (the prunable form of
    embedding_neardup)."""
    e = t(spark, sf_dir, "embeddings")
    return SIM.neardup_clusters(e, threshold=0.4, planes=4)


SQL_EMBEDDING_NEARDUP_CLUSTERS = f"""
WITH RECURSIVE {_NEARDUP_CTES},
ndedges AS (
  SELECT id_a AS src, id_b AS dst FROM ndpairs
  UNION
  SELECT id_b, id_a FROM ndpairs),
ndreach(doc, l) AS (
  SELECT src, src FROM ndedges
  UNION
  SELECT e.src, r.l FROM ndedges e JOIN ndreach r ON r.doc = e.dst)
SELECT doc AS vec_id, CAST(MIN(l) AS BIGINT) AS cluster_id
FROM ndreach GROUP BY doc
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: multimodal metadata (binary plumbing)
# ---------------------------------------------------------------------------

def q_media_meta(spark, sf_dir):
    """Multimodal metadata plumbing over a binary column (documents.text
    encoded as UTF-8 bytes stands in for media blobs): exact byte length and
    content digest, computed entirely JVM-side."""
    d = t(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha256"),
    )


SQL_MEDIA_META = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


def q_combined_concat(spark, sf_dir):
    """K5 (api/tasks.py:611-694): per-URL outputs concatenated in input
    order with NO separator — the reference's combined-results contract."""
    from ..operators.sinks import combine_results

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return combine_results(d, "doc_id", "text")


SQL_COMBINED_CONCAT = """
SELECT string_agg(text, '' ORDER BY doc_id ASC) AS combined
FROM documents WHERE doc_id < 100
"""


def q_output_naming(spark, sf_dir):
    """U9 (crawler/writer.py:55-99): deterministic output file naming with
    an explicit run timestamp (never wall clock) and zero-padded bulk
    index."""
    p = t(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://img"), (F.col("p_partkey") % 7).cast("string"),
        F.lit(".example.com/p/"), F.col("p_partkey").cast("string"),
    )
    run_ts = F.to_timestamp(F.lit("2026-01-15 10:30:00"))
    return p.select(
        "p_partkey",
        U.output_name(url, run_ts, F.lit("md"), F.col("p_partkey") % 1000).alias(
            "file_name"
        ),
    )


SQL_OUTPUT_NAMING = """
SELECT p_partkey,
       printf('%03d_', p_partkey % 1000)
         || 'img' || CAST(p_partkey % 7 AS VARCHAR) || '_example_com'
         || '_p_' || '20260115_1030.md' AS file_name
FROM part
"""


def q_link_pagerank(spark, sf_dir):
    """Link-graph prioritization: integer-exact PageRank (3 iterations,
    d=85/100 as integer floor-divisions) over the order→part bipartite
    edge list standing in for the URL link graph. Bit-identical across
    engines and cluster sizes — no float summation anywhere.

    Build/probe split (VERDICT r3 #3): ranks persist in a per-sf_dir
    SnapshotTable; the first call trains + saves, every later call (this
    process or the next) is a table scan. PageRank is integer-exact, so
    loaded == rebuilt and the oracle is unchanged."""
    import os as _o
    import tempfile as _t

    from ..operators.graph import RankIndex
    from ..sources.lake import SnapshotTable

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    key = ("rank_index", sf_dir)
    idx = _FIXTURE_CACHE.get(key)
    if idx is None or idx.spark is not spark:
        slug = sf_dir.strip("/").replace("/", "-")
        table = SnapshotTable(
            _o.path.join(_t.gettempdir(), f"wcs-rank-index-{slug}")
        )
        idx = RankIndex.load_or_build(table, edges, iters=3, corpus_key=slug)
        _FIXTURE_CACHE[key] = idx
    return idx.ranks()


def _pagerank_sql(iters: int = 3) -> str:
    ctes = [
        "e AS (SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "od AS (SELECT src, COUNT(*) AS o FROM e GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst, SUM(r.r // od.o) AS s FROM e "
            f"JOIN {prev} r ON r.node = e.src JOIN od ON od.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node)"
        )
        prev = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_int, CAST(r AS DOUBLE) / 1000000 AS rank FROM {prev}"
    )


SQL_LINK_PAGERANK = _pagerank_sql()


# canned robots.txt bodies (shared by the Spark query and the SQL twin):
# star group / named+star groups with comments / multi-UA run / no star
# group at all / empty body
_ROBOTS_BODIES = [
    "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\nCrawl-delay: 2\nCrawl-delay: 1.2345",
    "User-agent: googlebot\nDisallow: /only-google/\n\n"
    "User-agent: *\nDisallow: /admin/ # keep out\nCrawl-delay: 1.5",
    "User-agent: a\nUser-agent: *\nDisallow: /multi/\n\n"
    "User-agent: b\nDisallow: /b-only/",
    "User-agent: onlybot\nDisallow: /x/",
    "",
]


def q_robots_parse(spark, sf_dir):
    """robots.txt parsing (north rule: the robots cache starts as fetched
    robots.txt payloads): raw bodies → per-host policy rows via the pure
    column-expression parser (posexplode → window group resolution), the
    exact table robots_filter/with_host_budget broadcast-join."""
    from ..operators.politeness import parse_robots_txt

    n = t(spark, sf_dir, "nation")
    host = F.concat(F.lit("h"), F.col("n_nationkey").cast("string"), F.lit(".example.com"))
    body = F.lit(_ROBOTS_BODIES[-1])
    for i in range(len(_ROBOTS_BODIES) - 2, -1, -1):
        body = F.when(
            F.col("n_nationkey") % len(_ROBOTS_BODIES) == i, F.lit(_ROBOTS_BODIES[i])
        ).otherwise(body)
    parsed = parse_robots_txt(
        n.select(host.alias("host"), body.alias("robots_txt"))
    )
    return parsed.select(
        "host",
        F.concat_ws("|", "disallow_prefixes").alias("disallow"),
        "crawl_delay_ms",
    )


def _robots_body_sql() -> str:
    cases = []
    for i, b in enumerate(_ROBOTS_BODIES):
        lines = b.split("\n")
        expr = " || chr(10) || ".join("'" + ln.replace("'", "''") + "'" for ln in lines)
        cases.append(f"WHEN {i} THEN {expr}")
    return "CASE n_nationkey % " + str(len(_ROBOTS_BODIES)) + " " + " ".join(cases) + " END"


SQL_ROBOTS_PARSE = f"""
WITH bodies AS (
  SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.example.com' AS host,
         {_robots_body_sql()} AS body
  FROM nation),
l0 AS (
  SELECT host,
         unnest(list_transform(
           generate_series(1, len(regexp_split_to_array(body, '\\r?\\n'))),
           i -> struct_pack(pos := i, raw := regexp_split_to_array(body, '\\r?\\n')[i]))) AS u
  FROM bodies),
l AS (SELECT host, u.pos AS pos,
             regexp_replace(regexp_replace(u.raw, '(?s)#.*', ''), '^\\s+|\\s+$', '', 'g') AS ln
      FROM l0),
d AS (
  SELECT host, pos, ln, lower(ln) AS low,
         regexp_replace(regexp_extract(ln, '^[^:]*:(.*)$', 1), '^\\s+|\\s+$', '', 'g') AS val,
         lower(ln) LIKE 'user-agent:%' AS is_ua
  FROM l),
g0 AS (SELECT *, COALESCE(LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), FALSE) AS prev_ua FROM d),
g AS (SELECT *, SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
               OVER (PARTITION BY host ORDER BY pos) AS grp
      FROM g0),
star AS (SELECT DISTINCT host, grp FROM g WHERE is_ua AND val = '*'),
rules AS (SELECT g.* FROM g JOIN star USING (host, grp)),
dis AS (SELECT host, array_to_string(list_sort(list_distinct(list(val))), '|') AS disallow
        FROM rules WHERE low LIKE 'disallow:%' AND val <> '' GROUP BY host),
dl AS (SELECT host, CAST(TRUNC(MIN(TRY_CAST(val AS DOUBLE)) * 1000) AS BIGINT) AS crawl_delay_ms
       FROM rules WHERE low LIKE 'crawl-delay:%' GROUP BY host)
SELECT b.host, COALESCE(di.disallow, '') AS disallow, dl.crawl_delay_ms
FROM (SELECT DISTINCT host FROM bodies) b
LEFT JOIN dis di USING (host)
LEFT JOIN dl USING (host)
"""


_SITEMAP_BODIES = [
    "User-agent: *\nDisallow: /private/\n"
    "Sitemap: https://cdn.example/map-a.xml\n"
    "sitemap: https://cdn.example/map-b.xml.gz  # mirror",
    "User-agent: bot\nDisallow: /x/\n\n"
    "SITEMAP: https://other.example/s.xml\n"
    "Sitemap: https://other.example/s.xml",  # duplicate directive → one row
    "Sitemap: ftp://bad.example/not-http.xml\nSitemap:\nDisallow: /",
    "",
]


def q_robots_sitemaps(spark, sf_dir):
    """Sitemap discovery from robots.txt bodies (RFC 9309 §2.3 /
    sitemaps.org): group-independent ``Sitemap:`` line scan — posexplode →
    filter → distinct, zero UDFs — with non-http(s) values kept as
    error-as-data (is_valid=false). The frontier admits discovered sitemap
    URLs like any other link. See operators/politeness.py:extract_sitemaps."""
    from ..operators.politeness import extract_sitemaps

    n = t(spark, sf_dir, "nation")
    host = F.concat(F.lit("h"), F.col("n_nationkey").cast("string"), F.lit(".example.com"))
    body = F.lit(_SITEMAP_BODIES[-1])
    for i in range(len(_SITEMAP_BODIES) - 2, -1, -1):
        body = F.when(
            F.col("n_nationkey") % len(_SITEMAP_BODIES) == i, F.lit(_SITEMAP_BODIES[i])
        ).otherwise(body)
    return extract_sitemaps(n.select(host.alias("host"), body.alias("robots_txt")))


def _sitemap_body_sql() -> str:
    cases = []
    for i, b in enumerate(_SITEMAP_BODIES):
        lines = b.split("\n")
        expr = " || chr(10) || ".join("'" + ln.replace("'", "''") + "'" for ln in lines)
        cases.append(f"WHEN {i} THEN {expr}")
    return (
        "CASE n_nationkey % " + str(len(_SITEMAP_BODIES)) + " " + " ".join(cases) + " END"
    )


SQL_ROBOTS_SITEMAPS_TMPL = r"""
WITH bodies AS (
  SELECT 'h' || CAST(n_nationkey AS VARCHAR) || '.example.com' AS host,
         {body_case} AS body
  FROM nation),
l AS (
  SELECT host,
         regexp_replace(regexp_replace(unnest(regexp_split_to_array(body, '\r?\n')),
                                       '(?s)#.*', ''),
                        '^\s+|\s+$', '', 'g') AS ln
  FROM bodies),
v AS (
  SELECT host, ln,
         regexp_replace(regexp_extract(ln, '^[^:]*:(.*)$', 1),
                        '^\s+|\s+$', '', 'g') AS sitemap_url
  FROM l)
SELECT DISTINCT host, sitemap_url,
       regexp_matches(sitemap_url, '^https?://') AS is_valid
FROM v
WHERE lower(ln) LIKE 'sitemap:%' AND sitemap_url <> ''
"""

SQL_ROBOTS_SITEMAPS = SQL_ROBOTS_SITEMAPS_TMPL.format(body_case=_sitemap_body_sql())


def q_scoped_extract(spark, sf_dir):
    """Scoped-element extraction (reference parser.py:19-112; VERDICT r1 #8):
    id-first / class-membership resolution over a synthesized elements
    table, full-page concat when unscoped, and the reference's sorted-20
    class-sample diagnostic as error-as-data on a miss."""
    from ..operators.scoped import scoped_extract

    p = t(spark, sf_dir, "part")
    page = F.col("p_partkey") % 40
    elements = p.select(
        F.concat(F.lit("https://shop.example/pg/"), page.cast("string")).alias("page_url"),
        F.col("p_partkey").cast("long").alias("elem_seq"),
        F.concat(F.lit("el"), F.col("p_partkey").cast("string")).alias("elem_id"),
        F.split(F.lower(F.col("p_type")), " ").alias("classes"),
        F.col("p_name").alias("text"),
    )
    pnum = F.element_at(F.split(F.col("page_url"), "/"), -1).cast("int")
    scopes = (
        elements.groupBy("page_url")
        .agg(F.min("elem_seq").alias("first_seq"))
        .select(
            "page_url",
            F.when(pnum % 4 == 0, F.lit("promo"))
            .when(pnum % 4 == 1, F.lit("no-such-class"))
            .otherwise(F.lit(None).cast("string"))
            .alias("scope_class"),
            F.when(
                pnum % 4 == 2, F.concat(F.lit("el"), F.col("first_seq").cast("string"))
            )
            .otherwise(F.lit(None).cast("string"))
            .alias("scope_id"),
        )
    )
    return scoped_extract(elements, scopes)


SQL_SCOPED_EXTRACT = """
WITH el AS (
  SELECT 'https://shop.example/pg/' || CAST(p_partkey % 40 AS VARCHAR) AS page_url,
         CAST(p_partkey AS BIGINT) AS elem_seq,
         'el' || CAST(p_partkey AS VARCHAR) AS elem_id,
         string_split(lower(p_type), ' ') AS classes,
         p_name AS text,
         p_partkey % 40 AS page_num
  FROM part),
pg AS (SELECT page_url, MIN(page_num) AS page_num, MIN(elem_seq) AS first_seq
       FROM el GROUP BY page_url),
scopes AS (
  SELECT page_url,
         CASE WHEN page_num % 4 = 0 THEN 'promo'
              WHEN page_num % 4 = 1 THEN 'no-such-class' END AS scope_class,
         CASE WHEN page_num % 4 = 2 THEN 'el' || CAST(first_seq AS VARCHAR) END AS scope_id
  FROM pg),
hits AS (
  SELECT s.page_url, s.scope_class, s.scope_id, e.elem_seq, e.text,
         CASE WHEN s.scope_id IS NOT NULL AND e.elem_id = s.scope_id
              THEN 'id' ELSE 'class' END AS matched_by
  FROM scopes s JOIN el e ON e.page_url = s.page_url
  WHERE (s.scope_id IS NOT NULL AND e.elem_id = s.scope_id)
     OR (s.scope_class IS NOT NULL AND list_contains(e.classes, s.scope_class))),
ok AS (
  SELECT page_url, scope_class, scope_id, 'ok' AS status, matched_by,
         elem_seq, text, CAST(NULL AS VARCHAR) AS available_classes
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY page_url, scope_class, scope_id
          ORDER BY CASE WHEN matched_by = 'id' THEN 0 ELSE 1 END, elem_seq) AS rn
        FROM hits)
  WHERE rn = 1),
fullpage AS (
  SELECT s.page_url, s.scope_class, s.scope_id, 'ok' AS status,
         'page' AS matched_by, CAST(NULL AS BIGINT) AS elem_seq,
         COALESCE(string_agg(e.text, chr(10) ORDER BY e.elem_seq), '') AS text,
         CAST(NULL AS VARCHAR) AS available_classes
  FROM scopes s LEFT JOIN el e USING (page_url)
  WHERE s.scope_class IS NULL AND s.scope_id IS NULL
  GROUP BY s.page_url, s.scope_class, s.scope_id),
diag AS (
  SELECT page_url,
         array_to_string(
           list_slice(list_sort(list_distinct(flatten(list(classes)))), 1, 20),
           ', ') AS ac
  FROM el GROUP BY page_url),
miss AS (
  SELECT s.page_url, s.scope_class, s.scope_id, 'scope_miss' AS status,
         CAST(NULL AS VARCHAR) AS matched_by, CAST(NULL AS BIGINT) AS elem_seq,
         CAST(NULL AS VARCHAR) AS text, COALESCE(d.ac, '') AS available_classes
  FROM scopes s LEFT JOIN diag d USING (page_url)
  WHERE (s.scope_class IS NOT NULL OR s.scope_id IS NOT NULL)
    AND NOT EXISTS (SELECT 1 FROM ok o WHERE o.page_url = s.page_url
                    AND o.scope_class IS NOT DISTINCT FROM s.scope_class
                    AND o.scope_id IS NOT DISTINCT FROM s.scope_id))
SELECT * FROM ok UNION ALL SELECT * FROM fullpage UNION ALL SELECT * FROM miss
"""


def q_title_fallback(spark, sf_dir):
    """U14/U4 (crawler/parser.py:180-191, link_extractor.py:60-79):
    title → h1 → 'Untitled' coalescing over synthesized presence patterns."""
    p = t(spark, sf_dir, "part")
    title = F.when(F.col("p_partkey") % 3 == 0, F.col("p_name")).otherwise(F.lit(" "))
    h1 = F.when(F.col("p_partkey") % 3 == 1, F.col("p_brand")).otherwise(F.lit(""))
    return p.select(
        "p_partkey", T.title_or_fallback(title, h1).alias("title")
    )


SQL_TITLE_FALLBACK = """
SELECT p_partkey,
       CASE WHEN p_partkey % 3 = 0 THEN p_name
            WHEN p_partkey % 3 = 1 THEN p_brand
            ELSE 'Untitled' END AS title
FROM part
"""


# ---------------------------------------------------------------------------
# Crawl-engine entries with an independently-computed oracle (VERDICT r1 #3):
# the pure-Python oracle crawler (tests/oracle/crawler.py — no Spark) replays
# the crawl on the same deterministic fixture; its output is written as
# parquet that the DuckDB side SELECTs via read_parquet. The check is
# therefore the full driver gate (rows + schema + value hash), with the
# oracle side produced by a genuinely independent single-process dataflow.
# ---------------------------------------------------------------------------

_FIXTURE_CACHE: dict[str, object] = {}

import os as _os
import tempfile as _tempfile

def _fixture_salt() -> str:
    """Content-version tag for every on-disk expected/fixture cache dir.

    The cache rule ("contents are a pure function of the path, so
    existence == freshness") only holds if the path also keys the CONTENT
    GENERATORS. This probes the actual image-render function — any change
    to render_pixels/phash64 (e.g. the r4 multi-octave entropy fix)
    changes the probe hash and self-invalidates every cached expected
    table and demo fixture, instead of silently comparing a fresh engine
    run against stale oracle parquet."""
    from ..functions.images import phash64, render_pixels

    return f"{phash64(render_pixels('cache-key-probe', 32, 32)) & 0xFFFFFFFF:08x}"


_SALT = _fixture_salt()
ORACLE_EXPECTED_DIR = _os.path.join(
    _tempfile.gettempdir(), f"wcs-oracle-expected-{_SALT}"
)
_DEMO_FIXTURE_DIR = _os.path.join(
    _tempfile.gettempdir(), f"wcs-demo-fixture-{_SALT}"
)
_DEMO_SPEC = dict(n_pages=120, n_hosts=8, n_seeds=6, neardup_rate=0.1)
_DEMO_BUDGET = 3
_DEMO_ROUNDS = 4

EXPECTED_FETCH_LOG = _os.path.join(ORACLE_EXPECTED_DIR, "crawl_fetch_log.parquet")
EXPECTED_METRICS = _os.path.join(ORACLE_EXPECTED_DIR, "crawl_metrics.parquet")
EXPECTED_LINEAGE = _os.path.join(ORACLE_EXPECTED_DIR, "crawl_lineage.parquet")

# The driver's oracle-vs-Spark compare runs at this scale (TESTDATA.md);
# static SQL strings must bake in a concrete expected-file path, so they
# bake in this one. Bench/test runs at OTHER sf_dirs get their own files.
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _expected_bloom_path(sf_dir: str) -> str:
    """Bloom expected-output path KEYED BY sf_dir (ADVICE r2 #4): the file's
    contents derive from ``{sf_dir}/orders.parquet``, so a shared fixed path
    could leave a stale file from another scale on disk (bench at sf0.1 vs
    the driver gate at sf0.01) and make the parity compare spuriously pass
    or fail. One deterministic file per sf_dir removes the aliasing; the
    contents are a pure function of the path, so existence == freshness.
    The hash-family tag keys the file the same way: a family change (e.g.
    the KM→xor-rotate move for the ANSI-safe JVM probe) flips the exact
    false-positive split, so stale-family fixtures must self-invalidate."""
    from ..functions.hashing import BLOOM_FAMILY

    slug = sf_dir.strip("/").replace("/", "-")
    return _os.path.join(
        ORACLE_EXPECTED_DIR, f"bloom_prefilter_stats-{BLOOM_FAMILY}-{slug}.parquet"
    )


EXPECTED_BLOOM = _expected_bloom_path(ORACLE_SF_DIR)


def _demo_fixture_dir() -> str:
    """Deterministic on-disk fixture shared by the Spark engine and the
    Python oracle (generate_site is seeded — same bytes every run)."""
    from ..sources.fixtures import generate_site

    marker = _os.path.join(_DEMO_FIXTURE_DIR, "_COMPLETE")
    if not _os.path.exists(marker):
        generate_site(_DEMO_FIXTURE_DIR, **_DEMO_SPEC)
        with open(marker, "w") as f:
            f.write("ok")
    return _DEMO_FIXTURE_DIR


def _import_oracle_crawler():
    """The in-repo single-process oracle lives under tests/ (it is test
    infrastructure, not engine code); make it importable from the library
    side for expected-output generation."""
    import sys

    root = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    if root not in sys.path:
        sys.path.insert(0, root)
    from tests.oracle.crawler import OracleCrawler

    return OracleCrawler


def _write_expected(path: str, pdf, schema) -> None:
    """Atomic parquet write with explicit arrow types (the driver compares
    schemas, so the oracle side must carry the exact dtypes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    tmp = path + f".tmp-{_os.getpid()}"
    pq.write_table(table, tmp)
    _os.replace(tmp, path)


def _ensure_crawl_expected() -> None:
    """Run the pure-Python oracle crawler (same fixture, same budget/rounds
    as the Spark demo crawl) and persist its fetch log / metrics / lineage
    as the DuckDB-readable expected outputs. Pure Python — no Spark."""
    if _FIXTURE_CACHE.get("crawl_expected"):
        return
    import pandas as pd
    import pyarrow as pa

    OracleCrawler = _import_oracle_crawler()
    fdir = _demo_fixture_dir()
    seeds = pd.read_csv(f"{fdir}/seeds.csv")
    oc = OracleCrawler.from_fixture(fdir, default_budget=_DEMO_BUDGET)
    oc.start(list(seeds.url))
    metrics = oc.run(max_rounds=_DEMO_ROUNDS)

    log = pd.DataFrame(
        [
            {
                "round": r["round"],
                "fetch_seq": r["fetch_seq"],
                "url": r["url"],
                "status": r["status"],
                "error_type": r["error_type"],
                "psnr_db": r["psnr_db"],
            }
            for r in oc.fetch_log
        ]
    )
    _write_expected(
        EXPECTED_FETCH_LOG,
        log,
        pa.schema(
            [
                ("round", pa.int64()),
                ("fetch_seq", pa.int64()),
                ("url", pa.string()),
                ("status", pa.string()),
                ("error_type", pa.string()),
                ("psnr_db", pa.float64()),
            ]
        ),
    )
    mcols = [
        "round", "rows_in", "rows_deduped", "rows_robots_blocked",
        "rows_selected", "rows_fetched_ok", "rows_failed", "rows_retried",
        "rows_discovered",
    ]
    _write_expected(
        EXPECTED_METRICS,
        pd.DataFrame([{c: m[c] for c in mcols} for m in metrics]),
        pa.schema([(c, pa.int64()) for c in mcols]),
    )
    lcols = ["round", "pkey", "rows_in", "rows_selected", "rows_fetched_ok", "rows_failed"]
    _write_expected(
        EXPECTED_LINEAGE,
        pd.DataFrame([{c: r[c] for c in lcols} for r in oc.lineage]),
        pa.schema([(c, pa.int64()) for c in lcols]),
    )
    _FIXTURE_CACHE["crawl_expected"] = True


def _ensure_bloom_expected(sf_dir: str) -> None:
    """Driver-side twin of the distributed Bloom build/probe: same hashes
    (xxh64 of the 8-byte LE key — bit-exact with Spark's xxhash64 on
    LongType), same blob math, same counts. Pure Python — no Spark."""
    import struct

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import xxh64
    from ..operators.bloom import PartitionedBloom

    out_path = _expected_bloom_path(sf_dir)
    # per-sf_dir file, deterministic contents: on-disk presence is the
    # cross-process freshness stamp; the dict is just a same-process shortcut
    if _FIXTURE_CACHE.get("bloom_expected_for") == sf_dir and _os.path.exists(
        out_path
    ):
        return
    if _os.path.exists(out_path):
        _FIXTURE_CACHE["bloom_expected_for"] = sf_dir
        return
    if not _os.path.exists(f"{sf_dir}/orders.parquet"):
        return  # pre-materialization with a guessed sf_dir: the query
        # callable re-ensures with its real sf_dir before the SQL runs
    keys = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])[
        "o_orderkey"
    ]
    hashes = np.fromiter(
        (xxh64(struct.pack("<q", int(v))) for v in keys), dtype=np.int64, count=len(keys)
    )
    bloom = PartitionedBloom.sized_for(
        expected_keys=max(len(hashes), 1), n_partitions=16
    )
    bloom.add_hashes(hashes)
    probe = np.fromiter(
        (xxh64(struct.pack("<q", i)) for i in range(30000)), dtype=np.int64, count=30000
    )
    hits = bloom.might_contain(probe)
    pdf = pd.DataFrame(
        {"maybe_seen": [False, True], "n": [int((~hits).sum()), int(hits.sum())]}
    )
    _write_expected(
        out_path,
        pdf[pdf["n"] > 0].reset_index(drop=True),
        pa.schema([("maybe_seen", pa.bool_()), ("n", pa.int64())]),
    )
    _FIXTURE_CACHE["bloom_expected_for"] = sf_dir


def ensure_expected_outputs(sf_dir: str = ORACLE_SF_DIR) -> None:
    """Materialize every oracle-side expected parquet (pure Python). Called
    from ``__spark_entry__.oracle_sql()`` so the DuckDB SQL can run no
    matter whether the driver executes SQL before or after the Spark side."""
    _ensure_crawl_expected()
    _ensure_bloom_expected(sf_dir)
    _ensure_render_expected(sf_dir)
    _ensure_zip_expected(sf_dir)
    _ensure_phash_expected(sf_dir)
    _ensure_resize_expected(sf_dir)
    _ensure_frames_expected(sf_dir)
    _ensure_features_expected(sf_dir)
    _ensure_pair_profile_expected(sf_dir)


def _crawl_demo(spark, sf_dir: str):
    """Run the real CrawlRun end-to-end on the shared deterministic site
    fixture and return the tables. Cached per-process."""
    import tempfile

    from ..plans.round import CrawlConfig, CrawlRun
    from ..sources.fixtures import load_fixture
    from ..sources.seeds import read_seeds

    if "run" in _FIXTURE_CACHE:
        return _FIXTURE_CACHE["run"]
    fdir = _demo_fixture_dir()
    run_dir = tempfile.mkdtemp(prefix="wcs-demo-run-")
    run = CrawlRun(
        spark,
        run_dir,
        urls=load_fixture(spark, fdir, "urls"),
        links=load_fixture(spark, fdir, "links"),
        pages=load_fixture(spark, fdir, "pages"),
        robots=load_fixture(spark, fdir, "robots"),
        config=CrawlConfig(default_host_budget=_DEMO_BUDGET, max_rounds=_DEMO_ROUNDS),
    )
    run.start(read_seeds(spark, f"{fdir}/seeds.csv"))
    run.run(until_empty=True)
    _FIXTURE_CACHE["run"] = run
    return run


def q_crawl_fetch_log(spark, sf_dir):
    """The flagship engine end-to-end: deterministic fetch log of a 4-round
    crawl over the seeded fixture. Oracle: the single-process Python
    crawler's log for the identical seed list + politeness budget (the
    north-rule round-trip check, now driver-visible)."""
    from ..schemas import FETCH_LOG

    _ensure_crawl_expected()
    run = _crawl_demo(spark, sf_dir)
    return run.fetch_log_t.read(spark, schema=FETCH_LOG).select(
        F.col("round").cast("long").alias("round"),
        "fetch_seq",
        "url",
        "status",
        "error_type",
        "psnr_db",
    )


SQL_CRAWL_FETCH_LOG = f"""
SELECT round, fetch_seq, url, status, error_type, psnr_db
FROM read_parquet('{EXPECTED_FETCH_LOG}')
"""


def q_crawl_metrics(spark, sf_dir):
    """Per-round counters of the same crawl; oracle = the Python crawler's
    per-round metrics."""
    from ..schemas import METRICS

    _ensure_crawl_expected()
    run = _crawl_demo(spark, sf_dir)
    m = run.metrics_t.read(spark, schema=METRICS)
    return m.select(
        *[F.col(f.name).cast("long").alias(f.name) for f in METRICS.fields]
    )


SQL_CRAWL_METRICS = f"""
SELECT * FROM read_parquet('{EXPECTED_METRICS}')
"""


def q_crawl_lineage(spark, sf_dir):
    """Per-round, per-hash-partition lineage counters (north rule resume
    artifact); oracle = the Python crawler's strata over the same pmod-16
    hash partitioning."""
    from ..schemas import LINEAGE

    _ensure_crawl_expected()
    run = _crawl_demo(spark, sf_dir)
    lin = run.lineage_t.read(spark, schema=LINEAGE)
    return lin.select(
        *[F.col(f.name).cast("long").alias(f.name) for f in LINEAGE.fields]
    )


SQL_CRAWL_LINEAGE = f"""
SELECT * FROM read_parquet('{EXPECTED_LINEAGE}')
"""


_JOBSTORE_DIR = _os.path.join(_tempfile.gettempdir(), "wcs-jobstore-fixture-r3")


def _jobstore_fixture(spark):
    """Deterministic SavedJobStore CRUD history (fixed ids + logical
    timestamps → byte-identical log every build). Built in a scratch dir
    and atomically renamed into place, so concurrent builders cannot
    interleave appends into one log."""
    import shutil
    import uuid as _uuid

    from ..sources.jobstore import SavedJobStore

    if not _os.path.exists(_JOBSTORE_DIR):
        scratch = _JOBSTORE_DIR + f".build-{_uuid.uuid4().hex}"
        s = SavedJobStore(spark, _os.path.join(scratch, "jobs"))
        s.create(
            name="Shop crawl",
            config={"mode": "content", "formats": ["txt", "md"]},
            description="catalog",
            saved_job_id="job-a",
            now_ms=1000,
        )
        s.create(
            name="News crawl", config={"mode": "links"},
            saved_job_id="job-b", now_ms=2000,
        )
        s.create(name="Temp", config={}, saved_job_id="job-c", now_ms=3000)
        s.update(
            "job-a",
            {"config": {"mode": "content", "formats": ["txt"]},
             "description": "catalog v2"},
            now_ms=4000,
        )
        s.rename("job-b", "News crawl v2", now_ms=5000)
        s.delete("job-c", now_ms=6000)
        try:
            _os.rename(scratch, _JOBSTORE_DIR)
        except OSError:
            shutil.rmtree(scratch, ignore_errors=True)  # lost the race: reuse
    return SavedJobStore(spark, _os.path.join(_JOBSTORE_DIR, "jobs"))


def q_saved_jobs_crud(spark, sf_dir):
    """SavedJobStore resolved view after a create/update/rename/delete
    history (reference models.py:304-390 — J2's named-config surface):
    latest version per id wins, tombstones drop. Oracle: DuckDB replays the
    latest-wins window over the same mutation log parquet."""
    s = _jobstore_fixture(spark)
    return s.current().select(
        "saved_job_id", "name", "description", "config_json",
        "created_at_ms", "updated_at_ms", "version",
    )


SQL_SAVED_JOBS_CRUD = f"""
WITH log AS (
  SELECT * FROM read_parquet('{_JOBSTORE_DIR}/jobs/data/*/*.parquet')
),
latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY saved_job_id
                               ORDER BY version DESC) AS rn
  FROM log
)
SELECT saved_job_id, name, description, config_json,
       created_at_ms, updated_at_ms, version
FROM latest WHERE rn = 1 AND NOT deleted
"""


def q_bloom_prefilter_stats(spark, sf_dir):
    """D4 scale tier: partitioned-Bloom membership prefilter. Build over the
    orders keyspace (distributed applyInPandas blob build), probe a
    half-overlapping key range. Oracle: a pure-numpy twin of the same blob
    math — the counts (including the exact false-positive split) must
    match bit-for-bit because the hash family and sizing are shared."""
    from ..operators.bloom import PartitionedBloom

    _ensure_bloom_expected(sf_dir)
    o = t(spark, sf_dir, "orders").select(
        F.xxhash64(F.col("o_orderkey").cast("long")).alias("url_hash")
    )
    n_keys = o.count()
    bloom = PartitionedBloom.sized_for(expected_keys=max(n_keys, 1), n_partitions=16)
    bloom.build_from(o)
    probe = spark.range(0, 30000).select(
        F.col("id").alias("key"), F.xxhash64(F.col("id")).alias("url_hash")
    )
    probed = bloom.probe(probe)
    return (
        probed.groupBy(F.col("might_contain").alias("maybe_seen"))
        .agg(F.count("*").alias("n"))
        .orderBy("maybe_seen")
    )


SQL_BLOOM_PREFILTER_STATS = f"""
SELECT maybe_seen, n FROM read_parquet('{EXPECTED_BLOOM}')
"""


# ---------------------------------------------------------------------------
# U16 block/inline render + K6 zip archives (read_parquet oracles: the
# renderer is a recursive DOM walk and the archive a byte-format packing —
# neither is SQL-expressible, so the DuckDB side reads expected outputs
# materialized by independent pure-Python twins, the crawl-oracle pattern).
# ---------------------------------------------------------------------------


def _expected_keyed_path(name: str, sf_dir: str) -> str:
    """Expected-output path keyed by sf_dir (ADVICE r2 #4 rule: contents
    are a pure function of the path, so existence == freshness)."""
    slug = sf_dir.strip("/").replace("/", "-")
    return _os.path.join(ORACLE_EXPECTED_DIR, f"{name}-{slug}.parquet")


EXPECTED_RENDER = _expected_keyed_path("block_inline_render", ORACLE_SF_DIR)
EXPECTED_ZIP = _expected_keyed_path("zip_archives", ORACLE_SF_DIR)

# One template, two consumers: the Spark side concats (literal, column)
# pieces, the oracle twin formats the same pieces — the fixture HTML cannot
# drift between engine and oracle. Exercises every branch of the reference
# walk (parser.py:113-178): dropped style/script, entity decoding, block
# nesting (newline only when in_block), span inside vs outside <p>, the
# top-level-block no-newline quirk, inline space-joining.
_RENDER_HTML_PIECES: list[tuple[str, str | None]] = [
    ("<html><head><title>Part ", "pk"),
    ('</title><style>.m{color:red}</style></head><body><div class="m"><h1>', "nm"),
    ("</h1><p>Brand <b>", "br"),
    ("</b> &amp; type <span>", "ty"),
    ("</span>.</p><span>badge ", "sz"),
    ("</span><div><p>inner ", "nm"),
    ("</p><p>size ", "sz"),
    ("</p></div><script>var a=1;</script><ul><li>first ", "br"),
    ("</li><li>second</li></ul></div><p>tail note ", "pk"),
    ("</p><span>coda</span></body></html>", None),
]


def q_block_inline_render(spark, sf_dir):
    """U16 (crawler/parser.py:113-178): block/inline DOM-walk text render
    over deterministic per-part HTML documents. One Arrow-batched pandas
    UDF — no shuffle; embarrassingly parallel at any corpus size."""
    from ..operators.render import render_block_inline

    p = t(spark, sf_dir, "part")
    cols = {
        "pk": F.col("p_partkey").cast("string"),
        "nm": F.col("p_name"),
        "br": F.col("p_brand"),
        "ty": F.col("p_type"),
        "sz": F.col("p_size").cast("string"),
    }
    pieces: list = []
    for lit, col in _RENDER_HTML_PIECES:
        pieces.append(F.lit(lit))
        if col is not None:
            pieces.append(cols[col])
    df = p.select(
        F.col("p_partkey").cast("long").alias("doc_id"),
        F.concat(*pieces).alias("html"),
    )
    return render_block_inline(df, content_col="html", out_col="text").select(
        "doc_id", "text"
    )


def _import_oracle_render():
    """Import the independent renderer twin from tests/oracle (regex
    tokenizer + iterative walk vs the engine's html.parser tree + recursive
    walk — two implementations of the reference spec)."""
    import sys

    root = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    if root not in sys.path:
        sys.path.insert(0, root)
    from tests.oracle.render import render_text_oracle

    return render_text_oracle


def _render_fixture_html(row: dict) -> str:
    """Python-side construction of the SAME fixture HTML (shared pieces)."""
    out = []
    for lit, col in _RENDER_HTML_PIECES:
        out.append(lit)
        if col is not None:
            out.append(row[col])
    return "".join(out)


def _ensure_render_expected(sf_dir: str) -> None:
    import pandas as pd
    import pyarrow as pa

    out_path = _expected_keyed_path("block_inline_render", sf_dir)
    if _FIXTURE_CACHE.get("render_expected_for") == sf_dir and _os.path.exists(
        out_path
    ):
        return
    if _os.path.exists(out_path):
        _FIXTURE_CACHE["render_expected_for"] = sf_dir
        return
    src = f"{sf_dir}/part.parquet"
    if not _os.path.exists(src):
        return
    render = _import_oracle_render()
    p = pd.read_parquet(
        src, columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size"]
    )
    texts = [
        render(
            _render_fixture_html(
                {
                    "pk": str(int(r.p_partkey)),
                    "nm": r.p_name,
                    "br": r.p_brand,
                    "ty": r.p_type,
                    "sz": str(int(r.p_size)),
                }
            )
        )
        for r in p.itertuples()
    ]
    _write_expected(
        out_path,
        pd.DataFrame({"doc_id": p["p_partkey"].astype("int64"), "text": texts}),
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    _FIXTURE_CACHE["render_expected_for"] = sf_dir


SQL_BLOCK_INLINE_RENDER = f"""
SELECT doc_id, text FROM read_parquet('{EXPECTED_RENDER}')
"""


def q_zip_archives(spark, sf_dir):
    """K6 (api/routes.py:442-517): per-folder and per-job zip archives over
    a files table derived from part. One shuffle on the archive key, then
    embarrassingly parallel packing via applyInPandas."""
    from ..operators.archive import zip_archives

    p = t(spark, sf_dir, "part")
    files = p.select(
        (F.col("p_partkey") % 3).cast("long").alias("job_id"),
        F.concat(F.lit("page_"), (F.col("p_partkey") % 24).cast("string")).alias(
            "folder"
        ),
        F.concat(
            F.lit("part_"), F.col("p_partkey").cast("string"), F.lit(".md")
        ).alias("file_name"),
        F.encode(
            F.concat(F.col("p_name"), F.lit("\n"), F.col("p_type")), "UTF-8"
        ).alias("content"),
    )
    return zip_archives(files, level="folder").unionByName(
        zip_archives(files, level="job")
    )


def _ensure_zip_expected(sf_dir: str) -> None:
    import pandas as pd
    import pyarrow as pa

    from ..operators.archive import zip_oracle_rows

    out_path = _expected_keyed_path("zip_archives", sf_dir)
    if _FIXTURE_CACHE.get("zip_expected_for") == sf_dir and _os.path.exists(out_path):
        return
    if _os.path.exists(out_path):
        _FIXTURE_CACHE["zip_expected_for"] = sf_dir
        return
    src = f"{sf_dir}/part.parquet"
    if not _os.path.exists(src):
        return
    p = pd.read_parquet(src, columns=["p_partkey", "p_name", "p_type"])
    rows = (
        {
            "job_id": int(r.p_partkey) % 3,
            "folder": f"page_{int(r.p_partkey) % 24}",
            "file_name": f"part_{int(r.p_partkey)}.md",
            "content": (r.p_name + "\n" + r.p_type).encode("utf-8"),
        }
        for r in p.itertuples()
    )
    out = pd.DataFrame(zip_oracle_rows(rows))
    _write_expected(
        out_path,
        out,
        pa.schema(
            [
                ("level", pa.string()),
                ("job_id", pa.int64()),
                ("folder", pa.string()),
                ("zip_name", pa.string()),
                ("n_files", pa.int64()),
                ("total_bytes", pa.int64()),
                ("zip_size", pa.int64()),
                ("zip_sha256", pa.string()),
            ]
        ),
    )
    _FIXTURE_CACHE["zip_expected_for"] = sf_dir


SQL_ZIP_ARCHIVES = f"""
SELECT "level", job_id, folder, zip_name, n_files, total_bytes, zip_size, zip_sha256
FROM read_parquet('{EXPECTED_ZIP}')
"""


EXPECTED_PHASH = _expected_keyed_path("image_phash", ORACLE_SF_DIR)


def _phash_image_id(pk: int) -> str:
    """Deterministic corpus: every 8th part is a ``~d1`` noise variant of
    the base seven rows earlier (functions/images.py near-dup convention) —
    pairs the operator must find; all other images are mutually distant."""
    return f"img_{pk - 7}~d1" if pk % 8 == 7 else f"img_{pk}"


_CORPUS_VERSION_CACHE: list[str] = []


def _corpus_version() -> str:
    """Content hash over the corpus GENERATORS, baked into the cache key:
    unlike oracle expected files (outputs pinned by reference semantics),
    the corpora are synthetic INPUTS whose generators this repo iterates
    on — existence==freshness alone would silently serve stale blobs
    after a generator edit. Hashing the generator sources makes any such
    edit a new cache key automatically."""
    if not _CORPUS_VERSION_CACHE:
        import hashlib as _hashlib
        import inspect as _inspect

        from ..functions import images as _I

        parts = [
            _inspect.getsource(f)
            for f in (
                _I.render_pixels,
                _I.encode_image,
                _phash_image_id,
                _gen_phash_corpus,
                _gen_pair_corpus,
                _pair_side,
            )
        ]
        parts.append(str(_PAIR_DOC_MOD))
        h = _hashlib.md5("\n".join(parts).encode()).hexdigest()[:10]
        _CORPUS_VERSION_CACHE.append(h)
    return _CORPUS_VERSION_CACHE[0]


def _materialized_corpus(spark, sf_dir: str, name: str, builder) -> DataFrame:
    """Generate-once media corpus: production media tables arrive STORED
    (the crawl wrote the blobs); re-encoding a synthetic corpus inside
    every timed query invocation charges fixture construction to the
    operator under test. First call materializes the deterministic corpus
    to a parquet keyed by (sf_dir, generator-source hash) — a pure
    function of the path, and a generator edit rolls the key (see
    ``_corpus_version``); later calls scan it. The post-read repartition
    keeps the downstream Python decode stage honest about parallelism
    (the small files would otherwise coalesce into a couple of scan
    splits)."""
    import shutil as _shutil
    import uuid as _uuid

    path = _expected_keyed_path(f"{name}-{_corpus_version()}", sf_dir)
    if not _os.path.exists(path):
        tmp = f"{path}.tmp-{_uuid.uuid4().hex}"
        builder().write.mode("overwrite").parquet(tmp)
        try:
            _os.rename(tmp, path)
        except OSError:  # lost a concurrent-materialization race: theirs
            _shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism
    )


def _phash_corpus(spark, sf_dir, corrupt_mod: int | None = None):
    """Deterministic 32×32 WCSI image corpus derived from part — shared by
    the phash pair/cluster/resize/curation queries, materialized once per
    (sf_dir, corrupt_mod) via ``_materialized_corpus``. The decode/phash
    path stays fully in the timed queries; only blob SYNTHESIS (which a
    real media table never does at read time) is cached. With
    ``corrupt_mod``, every pk ≡ 0 (mod corrupt_mod) row carries an
    undecodable blob — the decode gate's planted failures
    (error-as-data, E1)."""
    return _materialized_corpus(
        spark,
        sf_dir,
        f"img_corpus_c{corrupt_mod or 0}",
        lambda: _gen_phash_corpus(spark, sf_dir, corrupt_mod),
    )


def _gen_phash_corpus(spark, sf_dir, corrupt_mod: int | None = None):
    import pandas as _pd

    # Small-SF part is a single parquet split; without a repartition the
    # whole generate→encode pipeline would run on one core.
    p = (
        t(spark, sf_dir, "part")
        .select(F.col("p_partkey").cast("long").alias("pk"))
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches):
        from ..functions.images import encode_image, render_pixels

        for pdf in batches:
            ids, blobs = [], []
            for v in pdf["pk"]:
                pk = int(v)
                ids.append(_phash_image_id(pk))
                if corrupt_mod is not None and pk % corrupt_mod == 0:
                    blobs.append(f"corrupt-{pk}".encode())
                else:
                    blobs.append(
                        encode_image(render_pixels(ids[-1], 32, 32), "png")
                    )
            yield _pd.DataFrame({"media_id": ids, "bytes": blobs})

    return p.mapInPandas(gen, "media_id string, bytes binary")


def q_image_phash_neardup(spark, sf_dir):
    """Image-axis near-dup: 64-bit perceptual hash + pigeonhole band join
    (operators/multimodal.py:phash_neardup_pairs). Bands are equi-joins
    only — no all-pairs stage."""
    from ..operators.multimodal import phash_neardup_pairs

    # hamming ≤ 2 recovers every planted ~d1 variant (measured recall
    # 250/250 at sf0.01) while bounding the avg-hash's accidental
    # collisions between structurally-similar synthetic gradients.
    return phash_neardup_pairs(_phash_corpus(spark, sf_dir), max_hamming=2, bands=4)


def q_image_phash_clusters(spark, sf_dir):
    """Image near-dup cluster assignment: connected components over the
    same banded phash pairs, min-id representative — the prunable form of
    image_phash_neardup, same label-propagation operator as the text and
    embedding suites."""
    from ..operators.multimodal import phash_neardup_clusters

    return phash_neardup_clusters(
        _phash_corpus(spark, sf_dir), max_hamming=2, bands=4
    )


def _ensure_phash_expected(sf_dir: str) -> None:
    """Pure-Python twin: (media_id, phash) for the same corpus; the SQL
    side replays the banding + join + hamming filter in DuckDB, so the
    candidate-generation logic (not just the hash) is oracle-checked."""
    import pandas as pd
    import pyarrow as pa

    from ..functions.images import decode_image, encode_image, phash64, render_pixels

    out_path = _expected_keyed_path("image_phash", sf_dir)
    if _FIXTURE_CACHE.get("phash_expected_for") == sf_dir and _os.path.exists(
        out_path
    ):
        return
    if _os.path.exists(out_path):
        _FIXTURE_CACHE["phash_expected_for"] = sf_dir
        return
    src = f"{sf_dir}/part.parquet"
    if not _os.path.exists(src):
        return
    p = pd.read_parquet(src, columns=["p_partkey"])
    ids = [_phash_image_id(int(v)) for v in p["p_partkey"]]
    hashes = [
        phash64(decode_image(encode_image(render_pixels(i, 32, 32), "png")))
        for i in ids
    ]
    _write_expected(
        out_path,
        pd.DataFrame({"media_id": ids, "phash": pd.array(hashes, dtype="int64")}),
        pa.schema([("media_id", pa.string()), ("phash", pa.int64())]),
    )
    _FIXTURE_CACHE["phash_expected_for"] = sf_dir


# Band extraction must match Spark's shiftrightunsigned on SIGNED 64-bit
# hashes: lift to the unsigned HUGEINT value first, then exact integer
# div/mod per 16-bit chunk. Shared CTE chain for the phash family
# (pairs + clusters + curation), ending at the qualifying pair set;
# ``where`` narrows the hash table (the curation oracle excludes the
# planted-corrupt ids there, mirroring the engine's NULL-phash gate).
def _phash_pair_ctes(where: str = "") -> str:
    return f"""ph AS (
  SELECT media_id, phash,
         CAST(phash AS HUGEINT)
           + CASE WHEN phash < 0 THEN CAST('18446744073709551616' AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END AS u
  FROM read_parquet('{EXPECTED_PHASH}') {where}),
bands AS (
  SELECT media_id, phash, v.band_idx,
         CAST((u // v.d) % 65536 AS BIGINT) AS band_val
  FROM ph, (VALUES (0, CAST(1 AS HUGEINT)),
                   (1, CAST(65536 AS HUGEINT)),
                   (2, CAST(4294967296 AS HUGEINT)),
                   (3, CAST(281474976710656 AS HUGEINT))) AS v(band_idx, d)),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                  a.phash AS ph_a, b.phash AS ph_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.media_id < b.media_id),
phpairs AS (
  SELECT media_a, media_b,
         CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
  FROM cand
  WHERE bit_count(xor(ph_a, ph_b)) <= 2)"""


_PHASH_PAIR_CTES = _phash_pair_ctes()

SQL_IMAGE_PHASH_NEARDUP = f"""
WITH {_PHASH_PAIR_CTES}
SELECT media_a, media_b, hamming FROM phpairs
"""

# Components replayed as a recursive min-reachable CTE; MIN over VARCHAR is
# lexicographic in both engines, matching connected_components' F.min on
# string media ids.
SQL_IMAGE_PHASH_CLUSTERS = f"""
WITH RECURSIVE {_PHASH_PAIR_CTES},
phedges AS (
  SELECT media_a AS src, media_b AS dst FROM phpairs
  UNION
  SELECT media_b, media_a FROM phpairs),
phreach(m, l) AS (
  SELECT src, src FROM phedges
  UNION
  SELECT e.src, r.l FROM phedges e JOIN phreach r ON r.m = e.dst)
SELECT m AS media_id, MIN(l) AS cluster_id
FROM phreach GROUP BY m
"""


def q_image_curation(spark, sf_dir):
    """The image-axis curation pipeline end-to-end (the image twin of
    corpus_curation): decode gate (planted-corrupt blobs at pk ≡ 0 mod 97
    drop as NULL-phash error rows) → phash near-dup prune within the
    decodable corpus → one row per surviving image (media_id, kept_as).
    One decode pass, banded equi-joins only — linear composition."""
    from ..operators.multimodal import phash_prune

    corpus = _phash_corpus(spark, sf_dir, corrupt_mod=97)
    return phash_prune(corpus, max_hamming=2, bands=4)


# The oracle rebuilds the corrupt-id set from part with the same id mapping
# (_phash_image_id) and excludes it from the hash table — replaying the
# engine's decode gate — then replays prune over components.
_CORRUPT_IDS_SQL = """corrupt AS (
  SELECT CASE WHEN p_partkey % 8 = 7
              THEN 'img_' || CAST(p_partkey - 7 AS VARCHAR) || '~d1'
              ELSE 'img_' || CAST(p_partkey AS VARCHAR) END AS media_id
  FROM part WHERE p_partkey % 97 = 0)"""

SQL_IMAGE_CURATION = f"""
WITH RECURSIVE {_CORRUPT_IDS_SQL},
{_phash_pair_ctes("WHERE media_id NOT IN (SELECT media_id FROM corrupt)")},
phedges AS (
  SELECT media_a AS src, media_b AS dst FROM phpairs
  UNION
  SELECT media_b, media_a FROM phpairs),
phreach(m, l) AS (
  SELECT src, src FROM phedges
  UNION
  SELECT e.src, r.l FROM phedges e JOIN phreach r ON r.m = e.dst),
phclusters AS (
  SELECT m AS media_id, MIN(l) AS cluster_id FROM phreach GROUP BY m)
SELECT v.media_id,
       CASE WHEN c.cluster_id = v.media_id THEN 'representative'
            ELSE 'unique' END AS kept_as
FROM ph v LEFT JOIN phclusters c USING (media_id)
WHERE c.cluster_id IS NULL OR c.cluster_id = v.media_id
"""


EXPECTED_RESIZE = _expected_keyed_path("media_resize", ORACLE_SF_DIR)
EXPECTED_FRAMES = _expected_keyed_path("video_frames", ORACLE_SF_DIR)
EXPECTED_FEATURES = _expected_keyed_path("media_features", ORACLE_SF_DIR)


def q_media_features(spark, sf_dir):
    """Decode + feature extraction as a contract query: per-channel means
    and perceptual hash over the phash corpus WITH planted-corrupt blobs,
    so both the decoded=true path and the error-as-data decoded=false rows
    are pinned against the pure-Python twin (floats compare exactly — both
    sides run the identical numpy expression)."""
    from ..operators.multimodal import extract_features

    return extract_features(_phash_corpus(spark, sf_dir, corrupt_mod=97))


def _ensure_features_expected(sf_dir: str) -> None:
    """Pure-Python twin of q_media_features — same numpy mean expression,
    same phash, zero Spark."""
    import numpy as _np
    import pandas as pd
    import pyarrow as pa

    from ..functions.images import decode_image, encode_image, phash64, render_pixels

    out_path = _expected_keyed_path("media_features", sf_dir)
    if _os.path.exists(out_path):
        return
    src = f"{sf_dir}/part.parquet"
    if not _os.path.exists(src):
        return
    p = pd.read_parquet(src, columns=["p_partkey"])
    rows = []
    for v in p["p_partkey"]:
        pk = int(v)
        mid = _phash_image_id(pk)
        if pk % 97 == 0:
            rows.append(
                {
                    "media_id": mid, "decoded": False, "w": None, "h": None,
                    "mean_r": None, "mean_g": None, "mean_b": None,
                    "phash": None,
                }
            )
            continue
        px = decode_image(encode_image(render_pixels(mid, 32, 32), "png"))
        means = px.astype(_np.float64).mean(axis=(0, 1))
        rows.append(
            {
                "media_id": mid, "decoded": True,
                "w": int(px.shape[1]), "h": int(px.shape[0]),
                "mean_r": float(means[0]), "mean_g": float(means[1]),
                "mean_b": float(means[2]), "phash": phash64(px),
            }
        )
    # explicit nullable dtypes (same rule as extract_features): float64
    # inference on int+None columns destroys the low bits of 64-bit phashes
    pdf = pd.DataFrame(
        {
            "media_id": [r["media_id"] for r in rows],
            "decoded": [r["decoded"] for r in rows],
            "w": pd.array([r["w"] for r in rows], dtype="Int32"),
            "h": pd.array([r["h"] for r in rows], dtype="Int32"),
            "mean_r": pd.array([r["mean_r"] for r in rows], dtype="Float64"),
            "mean_g": pd.array([r["mean_g"] for r in rows], dtype="Float64"),
            "mean_b": pd.array([r["mean_b"] for r in rows], dtype="Float64"),
            "phash": pd.array([r["phash"] for r in rows], dtype="Int64"),
        }
    )
    _write_expected(
        out_path,
        pdf,
        pa.schema(
            [
                ("media_id", pa.string()),
                ("decoded", pa.bool_()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("mean_r", pa.float64()),
                ("mean_g", pa.float64()),
                ("mean_b", pa.float64()),
                ("phash", pa.int64()),
            ]
        ),
    )


SQL_MEDIA_FEATURES = f"""
SELECT media_id, decoded, w, h, mean_r, mean_g, mean_b, phash
FROM read_parquet('{EXPECTED_FEATURES}')
"""


# ---------------------------------------------------------------------------
# pair_curation — joint image+caption curation (the graft cell's pair table:
# BASELINE.json input_hint (image_id, bytes, …, caption, phash)). Images from
# part, captions LEFT-joined from documents; the gates compose the image
# suite (decode, resolution, phash near-dup) with the text suite (lang,
# quality, token count) over ONE pair frame.
# ---------------------------------------------------------------------------

_PAIR_DOC_MOD = 512    # caption pairing: doc_id = pk % 512 — slots past the
                       # document count stay unpaired (missing_caption gate)
_PAIR_MIN_DIM = 28     # resolution gate: drops the 24-px families


def _pair_side(pk: int) -> int:
    """Render side per near-dup FAMILY (pk // 8): {24, 32, 40} — varied so
    the resolution gate has real work to do, constant within a family so
    the planted ``~d1`` near-dup stays phash-close to its base."""
    return 24 + 8 * ((pk // 8) % 3)


def _pair_corpus(spark, sf_dir):
    """(doc_id, pair_id, bytes) pair rows from part: deterministic WCSI
    blobs at family-keyed sizes, corrupt at pk ≡ 0 (mod 97), near-dup
    variants every 8th row (the _phash_image_id convention). Materialized
    once per sf_dir (see ``_materialized_corpus``); decode and every gate
    stay in the timed path."""
    return _materialized_corpus(
        spark, sf_dir, "pair_corpus", lambda: _gen_pair_corpus(spark, sf_dir)
    )


def _gen_pair_corpus(spark, sf_dir):
    import pandas as _pd

    p = (
        t(spark, sf_dir, "part")
        .select(F.col("p_partkey").cast("long").alias("pk"))
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches):
        from ..functions.images import encode_image, render_pixels

        for pdf in batches:
            ids, docs, blobs = [], [], []
            for v in pdf["pk"]:
                pk = int(v)
                mid = _phash_image_id(pk)
                ids.append(mid)
                docs.append(pk % _PAIR_DOC_MOD)
                if pk % 97 == 0:
                    blobs.append(f"corrupt-{pk}".encode())
                else:
                    s = _pair_side(pk)
                    blobs.append(encode_image(render_pixels(mid, s, s), "png"))
            yield _pd.DataFrame({"doc_id": docs, "pair_id": ids, "bytes": blobs})

    return p.mapInPandas(gen, "doc_id long, pair_id string, bytes binary")


def q_pair_curation(spark, sf_dir):
    """The multimodal flagship: joint image+caption pair curation — decode
    gate, resolution gate, caption language/quality/length gates, phash
    near-dup prune within the survivors — one row per pair with its verdict
    (error-as-data: every dropped pair carries its drop reason). Captions
    broadcast-joined from documents (dimension side); every downstream
    stage is a column expression, banded equi-join, or component round."""
    from ..operators.multimodal import curate_pairs

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    pairs = _pair_corpus(spark, sf_dir).join(F.broadcast(docs), "doc_id", "left")
    return curate_pairs(
        pairs,
        id_col="pair_id",
        bytes_col="bytes",
        caption_col="text",
        lang="en",
        min_dim=_PAIR_MIN_DIM,
        min_quality=0.5,
        min_tokens=3,
        max_hamming=2,
        bands=4,
    )


EXPECTED_PAIR_PROFILE = _expected_keyed_path("pair_profile", ORACLE_SF_DIR)


def _ensure_pair_profile_expected(sf_dir: str) -> None:
    """Pure-Python twin of the pair corpus' decode pass: (pair_id, phash,
    w, h) per part row — same render/encode/decode/phash chain, zero
    Spark. The SQL replay joins this table for the image-side gates."""
    import pandas as pd
    import pyarrow as pa

    from ..functions.images import decode_image, encode_image, phash64, render_pixels

    out_path = _expected_keyed_path("pair_profile", sf_dir)
    if _os.path.exists(out_path):
        return
    src = f"{sf_dir}/part.parquet"
    if not _os.path.exists(src):
        return
    p = pd.read_parquet(src, columns=["p_partkey"])
    rows = []
    for v in p["p_partkey"]:
        pk = int(v)
        mid = _phash_image_id(pk)
        if pk % 97 == 0:
            rows.append({"pair_id": mid, "phash": None, "w": None, "h": None})
            continue
        s = _pair_side(pk)
        px = decode_image(encode_image(render_pixels(mid, s, s), "png"))
        rows.append(
            {
                "pair_id": mid,
                "phash": phash64(px),
                "w": int(px.shape[1]),
                "h": int(px.shape[0]),
            }
        )
    # build int columns with explicit nullable dtypes — a list-of-dicts
    # DataFrame infers float64 for int+None columns, and float64's 53-bit
    # mantissa silently zeroes the low ~11 bits of 64-bit phashes
    pdf = pd.DataFrame(
        {
            "pair_id": [r["pair_id"] for r in rows],
            "phash": pd.array([r["phash"] for r in rows], dtype="Int64"),
            "w": pd.array([r["w"] for r in rows], dtype="Int32"),
            "h": pd.array([r["h"] for r in rows], dtype="Int32"),
        }
    )
    _write_expected(
        out_path,
        pdf,
        pa.schema(
            [
                ("pair_id", pa.string()),
                ("phash", pa.int64()),
                ("w", pa.int32()),
                ("h", pa.int32()),
            ]
        ),
    )


SQL_PAIR_CURATION = f"""
WITH RECURSIVE
corpus AS (
  SELECT CASE WHEN p_partkey % 8 = 7
              THEN 'img_' || CAST(p_partkey - 7 AS VARCHAR) || '~d1'
              ELSE 'img_' || CAST(p_partkey AS VARCHAR) END AS pair_id,
         p_partkey % {_PAIR_DOC_MOD} AS doc_id
  FROM part),
prof AS (SELECT * FROM read_parquet('{EXPECTED_PAIR_PROFILE}')),
{_lang_ctes()},
plang AS (SELECT doc_id, {_LANG_CASE_EXPR} AS lang_pred FROM s),
{_quality_f_cte(name="pqf")},
pqual AS (SELECT doc_id, {_QUALITY_SCORE_EXPR} AS score FROM pqf),
pwt AS (
  SELECT doc_id, {_WS_TOKENS_SQL} AS ws_tokens
  FROM documents),
pbase AS (
  SELECT c.pair_id, pr.phash, pr.w, pr.h,
         l.lang_pred AS lang, q.score, w2.ws_tokens,
         CASE WHEN d.doc_id IS NULL THEN 'missing_caption'
              WHEN pr.phash IS NULL THEN 'undecodable'
              WHEN LEAST(pr.w, pr.h) < {_PAIR_MIN_DIM} THEN 'too_small'
              WHEN l.lang_pred <> 'en' THEN 'lang'
              WHEN q.score < 0.5 THEN 'low_quality'
              WHEN w2.ws_tokens < 3 THEN 'caption_short'
              END AS fail
  FROM corpus c
  JOIN prof pr ON pr.pair_id = c.pair_id
  LEFT JOIN documents d ON d.doc_id = c.doc_id
  LEFT JOIN plang l ON l.doc_id = c.doc_id
  LEFT JOIN pqual q ON q.doc_id = c.doc_id
  LEFT JOIN pwt w2 ON w2.doc_id = c.doc_id),
psurv AS (
  SELECT pair_id, phash,
         CAST(phash AS HUGEINT)
           + CASE WHEN phash < 0 THEN CAST('18446744073709551616' AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END AS u
  FROM pbase WHERE fail IS NULL),
pbands AS (
  SELECT pair_id, phash, v.band_idx,
         CAST((u // v.d) % 65536 AS BIGINT) AS band_val
  FROM psurv, (VALUES (0, CAST(1 AS HUGEINT)),
                      (1, CAST(65536 AS HUGEINT)),
                      (2, CAST(4294967296 AS HUGEINT)),
                      (3, CAST(281474976710656 AS HUGEINT))) AS v(band_idx, d)),
pcand AS (
  SELECT DISTINCT a.pair_id AS pa, b.pair_id AS pb,
                  a.phash AS ph_a, b.phash AS ph_b
  FROM pbands a JOIN pbands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.pair_id < b.pair_id),
ppairs AS (
  SELECT pa, pb FROM pcand WHERE bit_count(xor(ph_a, ph_b)) <= 2),
pedges AS (
  SELECT pa AS src, pb AS dst FROM ppairs
  UNION
  SELECT pb, pa FROM ppairs),
preach(m, l) AS (
  SELECT src, src FROM pedges
  UNION
  SELECT e.src, r.l FROM pedges e JOIN preach r ON r.m = e.dst),
pclusters AS (
  SELECT m AS pair_id, MIN(l) AS cluster_id FROM preach GROUP BY m)
SELECT b.pair_id, b.w, b.h, b.lang, b.score, b.ws_tokens,
       COALESCE(b.fail,
                CASE WHEN c.cluster_id IS NULL THEN 'kept_unique'
                     WHEN c.cluster_id = b.pair_id THEN 'kept_representative'
                     ELSE 'near_dup' END) AS verdict
FROM pbase b LEFT JOIN pclusters c ON c.pair_id = b.pair_id
"""


def q_media_resize(spark, sf_dir):
    """Image resize as a contract query: the phash corpus resized 32×32 →
    16×16 (decode → shared nearest-neighbor kernel → re-encode, one
    mapInPandas pass, no shuffle), summarized as (media_id, n_bytes,
    sha256) so the resized BYTES — not just shapes — are pinned against
    the pure-Python twin across partitionings."""
    from ..operators.multimodal import resize_images

    resized = resize_images(_phash_corpus(spark, sf_dir), out_w=16, out_h=16)
    return resized.select(
        "media_id",
        F.octet_length("bytes").cast("long").alias("n_bytes"),
        F.sha2(F.col("bytes"), 256).alias("sha256"),
    )


def _video_id(pk: int) -> str:
    return f"vid_{pk}"


_VIDEO_FRAMES = 4  # frames packed per synthetic video
_VIDEO_EVERY = 2   # sampling stride under test


def q_video_frame_sample(spark, sf_dir):
    """Video frame sampling as a contract query: pack 4 deterministic 8×8
    WCSI frames per part row into the length-prefixed stream format, sample
    every 2nd frame (byte slicing only — no decode), and pin each sampled
    frame's exact bytes via (media_id, frame_idx, n_bytes, sha256)."""
    import pandas as _pd

    from ..operators.multimodal import sample_frames

    p = (
        t(spark, sf_dir, "part")
        .select(F.col("p_partkey").cast("long").alias("pk"))
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches):
        from ..functions.images import encode_image, render_pixels
        from ..operators.multimodal import pack_frames

        for pdf in batches:
            ids, blobs = [], []
            for v in pdf["pk"]:
                mid = _video_id(int(v))
                ids.append(mid)
                blobs.append(
                    pack_frames(
                        [
                            encode_image(render_pixels(f"{mid}/f{j}", 8, 8), "png")
                            for j in range(_VIDEO_FRAMES)
                        ]
                    )
                )
            yield _pd.DataFrame({"media_id": ids, "bytes": blobs})

    vids = p.mapInPandas(gen, "media_id string, bytes binary")
    sampled = sample_frames(vids, every=_VIDEO_EVERY)
    return sampled.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length("frame_bytes").cast("long").alias("n_bytes"),
        F.sha2(F.col("frame_bytes"), 256).alias("sha256"),
    )


def _ensure_resize_expected(sf_dir: str) -> None:
    """Pure-Python twin of q_media_resize: same corpus, same shared
    ``nn_resize`` kernel, zero Spark."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    from ..functions.images import decode_image, encode_image, render_pixels
    from ..operators.multimodal import nn_resize

    out_path = _expected_keyed_path("media_resize", sf_dir)
    if _os.path.exists(out_path):
        return
    src = f"{sf_dir}/part.parquet"
    if not _os.path.exists(src):
        return
    p = pd.read_parquet(src, columns=["p_partkey"])
    rows = []
    for v in p["p_partkey"]:
        mid = _phash_image_id(int(v))
        px = decode_image(encode_image(render_pixels(mid, 32, 32), "png"))
        blob = encode_image(nn_resize(px, 16, 16), "png")
        rows.append(
            {
                "media_id": mid,
                "n_bytes": len(blob),
                "sha256": hashlib.sha256(blob).hexdigest(),
            }
        )
    _write_expected(
        out_path,
        pd.DataFrame(rows),
        pa.schema(
            [("media_id", pa.string()), ("n_bytes", pa.int64()), ("sha256", pa.string())]
        ),
    )


def _ensure_frames_expected(sf_dir: str) -> None:
    """Pure-Python twin of q_video_frame_sample: shares only the byte
    format (pack_frames) with the engine, replays the sampling stride
    itself."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    from ..functions.images import encode_image, render_pixels
    from ..operators.multimodal import pack_frames, unpack_frames

    out_path = _expected_keyed_path("video_frames", sf_dir)
    if _os.path.exists(out_path):
        return
    src = f"{sf_dir}/part.parquet"
    if not _os.path.exists(src):
        return
    p = pd.read_parquet(src, columns=["p_partkey"])
    rows = []
    for v in p["p_partkey"]:
        mid = _video_id(int(v))
        packed = pack_frames(
            [
                encode_image(render_pixels(f"{mid}/f{j}", 8, 8), "png")
                for j in range(_VIDEO_FRAMES)
            ]
        )
        for j, fr in enumerate(unpack_frames(packed)):
            if j % _VIDEO_EVERY == 0:
                rows.append(
                    {
                        "media_id": mid,
                        "frame_idx": j,
                        "n_bytes": len(fr),
                        "sha256": hashlib.sha256(fr).hexdigest(),
                    }
                )
    _write_expected(
        out_path,
        pd.DataFrame(rows),
        pa.schema(
            [
                ("media_id", pa.string()),
                ("frame_idx", pa.int64()),
                ("n_bytes", pa.int64()),
                ("sha256", pa.string()),
            ]
        ),
    )


SQL_MEDIA_RESIZE = f"""
SELECT media_id, n_bytes, sha256 FROM read_parquet('{EXPECTED_RESIZE}')
"""

SQL_VIDEO_FRAME_SAMPLE = f"""
SELECT media_id, frame_idx, n_bytes, sha256 FROM read_parquet('{EXPECTED_FRAMES}')
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ORDERING POLICY (least-recently-driver-verified rotation): the driver's
# per-round CORRECTNESS check covers the FIRST 50 entries of this dict, so
# entries are ordered by verification debt, not by topic:
#   1. entries with no driver-green row yet (or the stalest one) come FIRST;
#   2. entries green in the single most recent round follow;
#   3. entries green in the last TWO consecutive driver rounds rotate to the
#      back (positions 51+), where they ride on accumulated evidence.
# When adding an entry, insert it at the TOP. After each round, re-rotate
# against the new CORRECTNESS_r{N}.json so nothing silently ages out.
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # --- tier 1 (r5 rotation): absent from CORRECTNESS_r04's 50-entry
    # window — last driver-green in r3, the stalest evidence in the
    # registry (r4 VERDICT "Next round" #4 names exactly these 15) -------
    "agg_link_stats": (q_agg_link_stats, SQL_AGG_LINK_STATS),
    "agg_success_rate": (q_agg_success_rate, SQL_AGG_SUCCESS_RATE),
    "topk_freq": (q_topk_freq, SQL_TOPK_FREQ),
    "recent_first": (q_recent_first, SQL_RECENT_FIRST),
    "first_wins_dedupe": (q_first_wins, SQL_FIRST_WINS),
    "collision_suffix": (q_collision_suffix, SQL_COLLISION_SUFFIX),
    "anti_join_unseen": (q_anti_join_unseen, SQL_ANTI_JOIN_UNSEEN),
    "broadcast_dim_join": (q_broadcast_dim_join, SQL_BROADCAST_DIM_JOIN),
    "url_normalize": (q_url_normalize, SQL_URL_NORMALIZE),
    "url_canonicalize": (q_url_canonicalize, SQL_URL_CANONICALIZE),
    "url_valid_partition": (q_url_valid_partition, SQL_URL_VALID_PARTITION),
    "error_taxonomy": (q_error_taxonomy, SQL_ERROR_TAXONOMY),
    "content_stats": (q_content_stats, SQL_CONTENT_STATS),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    # --- tier 2: green in r4 only (first driver check last round) -------
    "crawl_fetch_log": (q_crawl_fetch_log, SQL_CRAWL_FETCH_LOG),
    "crawl_metrics": (q_crawl_metrics, SQL_CRAWL_METRICS),
    "crawl_lineage": (q_crawl_lineage, SQL_CRAWL_LINEAGE),
    "bloom_prefilter_stats": (q_bloom_prefilter_stats, SQL_BLOOM_PREFILTER_STATS),
    "pair_curation": (q_pair_curation, SQL_PAIR_CURATION),
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "zip_archives": (q_zip_archives, SQL_ZIP_ARCHIVES),
    "saved_jobs_crud": (q_saved_jobs_crud, SQL_SAVED_JOBS_CRUD),
    "block_inline_render": (q_block_inline_render, SQL_BLOCK_INLINE_RENDER),
    "combined_concat": (q_combined_concat, SQL_COMBINED_CONCAT),
    "output_naming": (q_output_naming, SQL_OUTPUT_NAMING),
    "title_fallback": (q_title_fallback, SQL_TITLE_FALLBACK),
    "scoped_extract": (q_scoped_extract, SQL_SCOPED_EXTRACT),
    "robots_parse": (q_robots_parse, SQL_ROBOTS_PARSE),
    "link_pagerank": (q_link_pagerank, SQL_LINK_PAGERANK),
    # --- tier 3: double-green (r3 AND r4) — ride on accumulated evidence;
    # the last 15 of these fall outside the 50-entry window this round ---
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "decontamination": (q_decontamination, SQL_DECONTAMINATION),
    "line_dedupe": (q_line_dedupe, SQL_LINE_DEDUPE),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "url_traps": (q_url_traps, SQL_URL_TRAPS),
    "exact_substring": (q_exact_substring, SQL_EXACT_SUBSTRING),
    "importance_scores": (q_importance_scores, SQL_IMPORTANCE_SCORES),
    "robots_sitemaps": (q_robots_sitemaps, SQL_ROBOTS_SITEMAPS),
    "corpus_mix": (q_corpus_mix, SQL_CORPUS_MIX),
    "image_phash_neardup": (q_image_phash_neardup, SQL_IMAGE_PHASH_NEARDUP),
    "image_phash_clusters": (q_image_phash_clusters, SQL_IMAGE_PHASH_CLUSTERS),
    "media_resize": (q_media_resize, SQL_MEDIA_RESIZE),
    "video_frame_sample": (q_video_frame_sample, SQL_VIDEO_FRAME_SAMPLE),
    "image_curation": (q_image_curation, SQL_IMAGE_CURATION),
    "per_key_budget": (q_per_key_budget, SQL_PER_KEY_BUDGET),
    "frontier_schedule": (q_frontier_schedule, SQL_FRONTIER_SCHEDULE),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM_JACCARD),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH_LSH),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_prune": (q_dedup_prune, SQL_DEDUP_PRUNE),
    "corpus_curation": (q_corpus_curation, SQL_CORPUS_CURATION),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "text_lang_id": (q_text_lang_id, SQL_TEXT_LANG_ID),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "doc_fingerprints": (q_doc_fingerprints, SQL_DOC_FINGERPRINTS),
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "ann_lsh_topk": (q_ann_lsh_topk, SQL_ANN_LSH_TOPK),
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF_TOPK),
    "embedding_neardup": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    "embedding_neardup_clusters": (
        q_embedding_neardup_clusters,
        SQL_EMBEDDING_NEARDUP_CLUSTERS,
    ),
    "media_meta": (q_media_meta, SQL_MEDIA_META),
}

