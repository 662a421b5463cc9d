"""URL column functions — canonicalization, hashing, classification, filenames.

Re-expresses the reference's per-row URL helpers as vectorized column logic:

- normalize_url         reference: crawler/link_extractor.py:15-37
- remove_anchors        reference: crawler/link_extractor.py:39-42
- is_internal_link      reference: crawler/link_extractor.py:44-58 (www NOT stripped)
- href skip-list        reference: crawler/link_extractor.py:100-101
- URL validity          reference: crawler/fetcher.py:36-50, utils/validators.py:10-23
- sanitize_filename     reference: crawler/image_downloader.py:24-51
- get_image_extension   reference: crawler/image_downloader.py:53-79
- resolve_image_url     reference: crawler/image_downloader.py:81-99 (same canonicalizer)
- extract_domain_and_path  reference: crawler/writer.py:25-53

Everything that pure column expressions can express stays JVM-side
(whole-stage codegen); only ``urljoin`` relative-resolution needs Python, and
that is a scalar *pandas* UDF over Arrow batches (never row-at-a-time Python —
BASELINE.json input_hint).

The frontier key everywhere is ``url_hash = xxhash64(canonical_url)`` —
Spark's built-in XXH64 with seed 42, vectorized and deterministic (U20).
A bit-exact pure-Python implementation lives in tests/oracle/xxh64.py so the
single-process oracle crawler can reproduce identical hashes and tie-breaks.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# hrefs dropped *before* normalization (ordering matters for dedupe counts —
# reference applies the skip-list first: crawler/link_extractor.py:100-105).
SKIP_PREFIXES = ("#", "mailto:", "tel:", "javascript:")
_SKIP_RE = r"^(#|mailto:|tel:|javascript:)"

VALID_IMAGE_EXTENSIONS = [
    ".jpg", ".jpeg", ".png", ".gif", ".svg", ".webp", ".bmp", ".ico",
]

# content-type → extension fallback (reference: image_downloader.py:62-79 uses
# mimetypes.guess_extension; pinned here as an explicit literal map).
_MIME_EXT = {
    "image/jpeg": ".jpg",
    "image/png": ".png",
    "image/gif": ".gif",
    "image/svg+xml": ".svg",
    "image/webp": ".webp",
    "image/bmp": ".bmp",
    "image/x-icon": ".ico",
}


# ---------------------------------------------------------------------------
# Canonicalization (U1 + U2 + U7 + U20)
# ---------------------------------------------------------------------------

def _canonicalize_pair(href: str | None, base: str | None) -> str | None:
    """Single-pair canonicalization; shared by the pandas UDF and the oracle.

    Semantics pinned to the reference (link_extractor.py:15-37):
      //host/p         -> base_scheme + '://host/p'
      absolute URL     -> passthrough
      anything else    -> urljoin(base, href)
    (urljoin natively implements all three; the explicit branches in the
    reference are redundant with urljoin's RFC 3986 behavior, verified by the
    reference's own truth table tests/test_link_extractor.py:7-21.)
    """
    if href is None:
        return None
    if base is None:
        return href
    try:
        return urljoin(base, href)
    except ValueError:
        return None


# NOTE: return type passed as a DataType object (not a DDL string) so the UDF
# can be defined at import time, before any SparkSession exists.
@pandas_udf(StringType())
def canonicalize_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    """Vectorized urljoin over Arrow batches (the one Python hop we allow)."""
    return pd.Series(
        [_canonicalize_pair(h, b) for h, b in zip(href, base)], dtype="object"
    )


def canonicalize(href: Column, base: Column, *, strip_fragment: bool = True) -> Column:
    """Full canonical form: resolve against base, optionally drop #fragment."""
    resolved = canonicalize_udf(href, base)
    if strip_fragment:
        resolved = remove_anchors(resolved)
    return resolved


def remove_anchors(url: Column) -> Column:
    """Strip everything from the first '#', keep the rest verbatim
    (link_extractor.py:39-42). (?s) so an embedded newline after the '#'
    (hostile href) is stripped too — the Python twin is split('#', 1)[0],
    and without DOTALL the Java/RE2 '.' stops at the newline and the hash
    survives, forking url_hash between engine and oracle."""
    return F.regexp_replace(url, r"(?s)#.*", "")


def url_hash(url: Column) -> Column:
    """The 64-bit frontier key: built-in XXH64 (seed 42) of the canonical URL."""
    return F.xxhash64(url)


def url_host(url: Column) -> Column:
    """netloc host, JVM-side. try_parse_url: invalid URIs yield NULL instead of
    raising under Spark 4 ANSI mode (error-as-data, never exceptions — E1)."""
    return F.try_parse_url(url, F.lit("HOST"))


def url_path(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("PATH"))


# ---------------------------------------------------------------------------
# Predicates (F1/F2) and classification (U3)
# ---------------------------------------------------------------------------

def is_valid_url(url: Column) -> Column:
    """F1: non-empty, http(s) scheme, has a host (fetcher.py:36-50)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    return (
        url.isNotNull()
        & (F.length(F.trim(url)) > 0)
        & scheme.isin("http", "https")
        & url_host(url).isNotNull()
        & (F.length(url_host(url)) > 0)
    )


def is_skippable_href(href: Column) -> Column:
    """F2: empty or #/mailto:/tel:/javascript: prefixed, pre-normalization."""
    return href.isNull() | (F.length(href) == 0) | href.rlike(_SKIP_RE)


def is_internal(url: Column, base: Column) -> Column:
    """U3: exact netloc equality — www. deliberately NOT stripped
    (link_extractor.py:44-58 and its truth table)."""
    return url_host(url) == url_host(base)


def link_type(url: Column, base: Column) -> Column:
    """'internal' | 'external' classification column (link_extractor.py:116)."""
    return F.when(is_internal(url, base), F.lit("internal")).otherwise(
        F.lit("external")
    )


# ---------------------------------------------------------------------------
# Filenames / paths (U5/U6/U8) — pure column expressions
# ---------------------------------------------------------------------------

def sanitize_filename(url: Column) -> Column:
    """U5 (image_downloader.py:24-51): basename of the path, forbidden chars →
    '_', empty → 'image', stem clipped to 100 chars (extension preserved).

    Path extraction is regex-based (not try_parse_url) because the reference's
    urlparse is lenient about characters like <> that make java.net.URI reject
    the whole URL. The scheme+authority prefix is stripped FIRST so a
    path-less URL ('https://example.com') yields the reference's 'image'
    default, not the hostname."""
    path = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_replace(path, r"[?#].*$", "")
    base = F.element_at(F.split(path, "/"), -1)
    cleaned = F.regexp_replace(base, r'[<>:"/\\|?*]', "_")
    stem = F.regexp_replace(cleaned, r"\.[^.]*$", "")
    ext = F.regexp_extract(cleaned, r"(\.[^.]*)$", 1)
    clipped = F.concat(F.substring(stem, 1, 100), ext)
    return F.when(
        cleaned.isNull() | (F.length(cleaned) == 0), F.lit("image")
    ).otherwise(clipped)


def image_extension(url: Column, content_type: Column) -> Column:
    """U6 (image_downloader.py:53-79): extension from the URL path when valid,
    else mapped from content-type, default '.jpg'."""
    path_ext = F.lower(F.regexp_extract(url_path(url), r"(\.[A-Za-z0-9]+)$", 1))
    mime_map = F.create_map(
        *[F.lit(x) for kv in _MIME_EXT.items() for x in kv]
    )
    return F.coalesce(
        F.when(path_ext.isin(VALID_IMAGE_EXTENSIONS), path_ext),
        mime_map[F.lower(F.trim(content_type))],
        F.lit(".jpg"),
    )


def domain_and_path_slug(url: Column) -> Column:
    """U8 (writer.py:25-53): host minus leading www., dots → '_', plus first
    path segment sanitized ([^\\w\\-] → '_') clipped to 50 chars."""
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    host_slug = F.regexp_replace(host, r"\.", "_")
    seg = F.element_at(F.split(F.regexp_replace(url_path(url), "^/", ""), "/"), 1)
    seg_slug = F.substring(F.regexp_replace(seg, r"[^\w\-]", "_"), 1, 50)
    return F.when(
        seg.isNull() | (F.length(seg) == 0), host_slug
    ).otherwise(F.concat(host_slug, F.lit("_"), seg_slug))


def output_name(
    url: Column, run_ts: Column, fmt: Column, bulk_index: Column | None = None
) -> Column:
    """U9 (writer.py:55-99): `{NNN_}{slug}_{yyyyMMdd_HHmm}.{fmt}`.

    ``run_ts`` is an explicit run parameter, never wall clock — the
    reference stamps `datetime.now()` (writer.py:16-23) which would make
    outputs irreproducible across retries and cluster re-runs."""
    stamp = F.date_format(run_ts, "yyyyMMdd_HHmm")
    base = F.concat(domain_and_path_slug(url), F.lit("_"), stamp, F.lit("."), fmt)
    if bulk_index is None:
        return base
    return F.concat(F.format_string("%03d_", bulk_index), base)


def parse_cookie_string(s: Column) -> Column:
    """U10 (api/tasks.py:586-608): `{"k": "v"}` JSON or `k1=v1; k2=v2`
    pairs → map<string,string>. Malformed JSON falls back to the pair
    parser (the reference's try/except shape — error-as-data, never an
    exception); pair separators tolerate any whitespace after ';'."""
    from pyspark.sql.types import MapType, StringType

    trimmed = F.trim(s)
    as_json = F.from_json(trimmed, MapType(StringType(), StringType()))
    as_pairs = F.str_to_map(
        F.regexp_replace(trimmed, r";\s*", ";"), F.lit(";"), F.lit("=")
    )
    return F.coalesce(as_json, as_pairs)


# ---------------------------------------------------------------------------
# Oracle-side single-value helpers (shared semantics, no Spark)
# ---------------------------------------------------------------------------

def py_canonicalize(href: str | None, base: str | None, *, strip_fragment: bool = True) -> str | None:
    """The exact same canonicalization for the pure-Python oracle crawler."""
    out = _canonicalize_pair(href, base)
    if out is not None and strip_fragment:
        out = out.split("#", 1)[0]
    return out


def py_is_skippable(href: str | None) -> bool:
    return href is None or href == "" or href.startswith(SKIP_PREFIXES)


def py_host(url: str) -> str | None:
    try:
        netloc = urlparse(url).netloc
        # Spark's parse_url(HOST) returns the hostname without port/userinfo.
        host = netloc.rsplit("@", 1)[-1].split(":", 1)[0]
        return host or None
    except ValueError:
        return None


# Characters java.net.URI rejects outright (RFC 3986 excluded set); Python's
# urlparse is lenient about them, so the oracle must exclude them explicitly
# to keep engine/oracle validity parity (Spark's try_parse_url → NULL host).
_URI_FORBIDDEN = set(' <>"{}|\\^`')


def py_is_valid_url(url: str | None) -> bool:
    if not url or not url.strip():
        return False
    if any(c in _URI_FORBIDDEN or ord(c) < 0x21 for c in url):
        return False  # java.net.URI (engine side) rejects these outright
    try:
        p = urlparse(url)
        host = p.hostname
    except ValueError:
        return False
    return p.scheme in ("http", "https") and bool(host)
