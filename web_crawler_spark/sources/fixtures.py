"""Deterministic synthetic site-graph + image/caption fixture generator.

Implements FIXTURES.md §1–§4: a crawlable universe of `pages` (image+caption
rows, BASELINE.json input_hint shape), `urls` (1:1 page addresses, Zipfian
host skew), `links` (raw pre-normalization anchors with skip-list hrefs,
duplicates, fragment variants — per reference semantics
crawler/link_extractor.py:100-113), `robots` (politeness policy), and a
`seeds.csv` in the reference's bulk-CSV schema (utils/csv_processor.py:10-16).

Everything is keyed on (seed=42, index) — regenerating any subset yields
identical bytes. Generation is driver-side pandas/pyarrow at test scale
(≤10^5 rows); the 10^10-row bench frontier is *virtual* (spark.range — see
bench.py) and never materialized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import xxh64_str
from ..functions.images import encode_image, phash64, render_pixels

SEED = 42
FMTS = ["png", "jpeg", "webp"]
DIMS = [32, 64, 128]
THAI_SAMPLE = "ตัวอย่างคำบรรยายภาษาไทย"


def _host_pool(n_hosts: int) -> list[str]:
    hosts = []
    for i in range(n_hosts):
        base = f"site{i:03d}.example.com"
        hosts.append(f"www.{base}" if i % 5 == 3 else base)
    return hosts


def _zipf_host_index(rng: np.random.RandomState, n_hosts: int, n: int) -> np.ndarray:
    """Zipf(1.1)-distributed host assignment — the skew fixture (SURVEY §7)."""
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = 1.0 / ranks**1.1
    p /= p.sum()
    return rng.choice(n_hosts, size=n, p=p)


def generate_site(
    out_dir: str,
    n_pages: int = 1000,
    n_hosts: int = 50,
    links_per_page: int = 8,
    neardup_rate: float = 0.02,
    n_seeds: int = 10,
    corrupt_rate: float = 0.0,
) -> dict[str, str]:
    """Generate all fixture tables under out_dir; returns {name: path}."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(SEED)
    hosts = _host_pool(n_hosts)
    host_idx = _zipf_host_index(rng, n_hosts, n_pages)

    # ---- image ids, with ~neardup_rate near-dup variants of earlier images
    image_ids: list[str] = []
    for j in range(n_pages):
        if j > 0 and rng.rand() < neardup_rate:
            base = rng.randint(0, j)
            # follow a picked variant to its base id: "img_X~dN" renders
            # img_X's pixels, so a variant-of-variant keyed on the INDEX
            # ("img_{base}~dj" when image_ids[base] is itself "img_X~dN")
            # would render pixels that exist nowhere in the corpus and be
            # phash-close to nothing — silently undershooting neardup_rate
            base_id = image_ids[base].partition("~d")[0]
            image_ids.append(f"{base_id}~d{j}")
        else:
            image_ids.append(f"img_{j:08d}")

    # ---- urls (FIXTURES §2); ~3% under /private/ to exercise robots
    urls, url_hosts = [], []
    for j in range(n_pages):
        host = hosts[host_idx[j]]
        section = "private" if (xxh64_str(f"sec{j}") % 33 == 0) else "p"
        urls.append(f"https://{host}/{section}/{j:06d}")
        url_hosts.append(host)
    urls_df = pd.DataFrame(
        {
            "url": urls,
            "host": url_hosts,
            "image_id": image_ids,
            "html_title": [
                f"Page {j} — {url_hosts[j]}" if j % 11 else "" for j in range(n_pages)
            ],
        }
    )

    # ---- pages (input_hint shape)
    recs = []
    for j, iid in enumerate(image_ids):
        h64 = xxh64_str(iid)
        w = DIMS[h64 % 3]
        h = DIMS[(h64 >> 8) % 3]
        fmt = FMTS[(h64 >> 16) % 3]
        px = render_pixels(iid, w, h)
        blob = encode_image(px, fmt)
        caption = f"Caption for {iid}: a synthetic gradient ({w}x{h} {fmt})."
        if j % 7 == 0:
            caption += " " + THAI_SAMPLE
        if corrupt_rate and rng.rand() < corrupt_rate:
            # three failure-path flavors (E1 taxonomy exercise): truncated
            # payload (DECODE_FAILED), missing caption (CAPTION_MISMATCH),
            # empty bytes (EMPTY_CONTENT)
            flavor = int(rng.randint(0, 3))
            if flavor == 0:
                blob = blob[: max(12, len(blob) // 2)]
            elif flavor == 1:
                caption = None
            else:
                blob = None
        recs.append((iid, blob, w, h, fmt, caption, phash64(px)))
    pages_df = pd.DataFrame(
        recs, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )

    # ---- links: raw anchors per page (reference truth-table shapes)
    lrecs = []
    for j in range(n_pages):
        src = urls[j]
        pos = 0
        page_hrefs: list[str] = []
        n_links = max(2, int(rng.poisson(links_per_page)))
        for _ in range(n_links):
            r = rng.rand()
            tgt = int(rng.randint(0, n_pages))
            if r < 0.55:
                # same-host relative href (resolves via canonicalize)
                sec = urls[tgt].rsplit("/", 2)[-2]
                href = f"/{sec}/{tgt:06d}" if rng.rand() < 0.7 else f"../{sec}/{tgt:06d}"
                # only meaningful when target is actually on this host; retarget
                if url_hosts[tgt] != url_hosts[j]:
                    href = urls[tgt]  # cross-host → absolute
            elif r < 0.8:
                href = urls[tgt]  # absolute
            elif r < 0.85:
                href = "//" + urls[tgt].split("://", 1)[1]  # protocol-relative
            elif r < 0.9:
                href = urls[tgt] + "#section-2"  # fragment variant
            elif r < 0.95 and page_hrefs:
                href = page_hrefs[int(rng.randint(0, len(page_hrefs)))]  # in-page dup
            else:
                href = ["#top", "mailto:a@b.c", "tel:+123", "javascript:void(0)", ""][
                    int(rng.randint(0, 5))
                ]
            page_hrefs.append(href)
            pos += 1
            lrecs.append(
                (
                    src,
                    href,
                    pos,
                    f"link {pos}" if rng.rand() < 0.8 else "",
                    "" if rng.rand() < 0.7 else f"title {pos}",
                    ["nofollow"] if rng.rand() < 0.1 else [],
                    "#" in href,
                )
            )
        # ~30% of pages carry one dangling link (404/retry path exercise)
        if rng.rand() < 0.3:
            pos += 1
            lrecs.append(
                (src, f"https://{url_hosts[j]}/missing/{j:06d}", pos, "dead", "", [], False)
            )
    links_df = pd.DataFrame(
        lrecs, columns=["src_url", "href", "pos", "text", "title", "rel", "has_fragment"]
    )

    # ---- robots (FIXTURES §4)
    robots_df = pd.DataFrame(
        {
            "host": hosts,
            "disallow_prefixes": [
                ["/private/"] if xxh64_str(f"rb{h}") % 10 < 4 else [] for h in hosts
            ],
            "crawl_delay_ms": [100 + (xxh64_str(f"cd{h}") % 10) * 50 for h in hosts],
            "max_per_round": [2 + xxh64_str(f"mp{h}") % 7 for h in hosts],
        }
    )

    # ---- seeds.csv (reference bulk-CSV schema, incl. invalid + dup rows)
    seed_urls = [urls[int(i * n_pages / n_seeds)] for i in range(n_seeds)]
    seed_rows = [
        {
            "url": u,
            "mode": "content" if i % 2 == 0 else "link",
            "scope_class": "",
            "scope_id": "",
            "format": "txt,md" if i % 3 == 0 else "txt",
            "download_images": ["true", "yes", "1", "y", "false"][i % 5],
            "link_type": ["all", "internal", "external"][i % 3],
            "exclude_anchors": "true",
        }
        for i, u in enumerate(seed_urls)
    ]
    seed_rows.append({**seed_rows[0]})  # duplicate seed
    seed_rows.append({**seed_rows[0], "url": "ftp://invalid.example.com/x"})
    seed_rows.append({**seed_rows[0], "url": "not-a-url"})
    seeds_df = pd.DataFrame(seed_rows)

    paths = {}
    for name, df in [
        ("pages", pages_df),
        ("urls", urls_df),
        ("links", links_df),
        ("robots", robots_df),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
        paths[name] = p
    seeds_path = os.path.join(out_dir, "seeds.csv")
    seeds_df.to_csv(seeds_path, index=False)
    paths["seeds"] = seeds_path
    return paths


def load_fixture(spark, out_dir: str, name: str):
    return spark.read.parquet(os.path.join(out_dir, f"{name}.parquet"))
