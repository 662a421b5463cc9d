"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "frontier_urls_per_sec": ...,
   "frontier_rows": ...}

The headline set covers every operator family: the flagship scheduling
round, skew-safe windowed selection, aggregations, joins, the dedup suite
(exact / jaccard / minhash-LSH / simhash), text analysis, similarity search
(brute force + LSH), and multimodal metadata. A synthetic-frontier
throughput figure (the north metric: URLs scheduled+deduped per second,
frontier generated via spark.range — storage-free at any scale) rides
along; scripts/bench_scaling.py reports it at two parallelism levels for
the N→4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from web_crawler_spark.plans.analytics import REGISTRY  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "frontier_schedule",
    "per_key_budget",
    "agg_success_rate",
    "broadcast_dim_join",
    "anti_join_unseen",
    "first_wins_dedupe",
    "topk_freq",
    "events_hourly",
    "url_normalize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_prune",
    "corpus_curation",
    "dedup_simhash",
    "doc_fingerprints",
    "scoped_extract",
    "robots_parse",
    "link_pagerank",
    "text_lang_id",
    "text_quality",
    "token_counts",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup",
    "embedding_neardup_clusters",
    "media_meta",
]


def materialize(df) -> None:
    """Execute the full plan without driver-side collection; the noop sink
    defeats column pruning that a bare count() would allow."""
    df.write.format("noop").mode("overwrite").save()


def frontier_throughput(spark, n_rows: int = 5_000_000) -> tuple[float, int]:
    """North-metric microbench: one scheduling round over a generated
    frontier (no storage — the 10^10 design point is reached by raising
    n_rows; per-row cost is what's being measured).

    range → url/host/priority synthesis → xxhash64 key → first-wins dedupe
    → anti-join a generated seen-set → skew-safe per-host top-k. Zipfian-ish
    host skew via pmod(id^2) so the salted two-phase window earns its keep.
    """
    from web_crawler_spark.operators.dedupe import anti_join_seen, first_wins
    from web_crawler_spark.operators.politeness import two_phase_topk

    base = spark.range(n_rows)
    # ~20% duplicate url ids; host distribution skewed (low ids frequent)
    url_id = (F.col("id") * 809) % (n_rows * 4 // 5)
    host_id = F.pmod(F.pmod(url_id, 997) * F.pmod(url_id, 997), F.lit(9973))
    frontier = base.select(
        F.concat(
            F.lit("https://h"), host_id.cast("string"), F.lit(".example.com/p/"),
            url_id.cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), host_id.cast("string"), F.lit(".example.com")).alias("host"),
        (url_id % 100000).cast("double").alias("priority"),
        F.col("id").alias("discovered_pos"),
    ).withColumn("url_hash", F.xxhash64("url"))
    seen = (
        spark.range(n_rows // 10)
        .select(((F.col("id") * 31) % (n_rows * 4 // 5)).alias("uid"))
        .select(
            F.xxhash64(
                F.concat(
                    F.lit("https://h"),
                    F.pmod(F.pmod(F.col("uid"), 997) * F.pmod(F.col("uid"), 997), F.lit(9973)).cast("string"),
                    F.lit(".example.com/p/"), F.col("uid").cast("string"),
                )
            ).alias("url_hash")
        )
    )
    t0 = time.time()
    deduped = first_wins(frontier, "url_hash", [F.col("discovered_pos").asc()])
    unseen = anti_join_seen(deduped, seen)
    selected = two_phase_topk(
        unseen,
        ["host"],
        [F.col("priority").desc(), F.col("url_hash").asc()],
        8,
        F.col("url_hash"),
        16,
    )
    n_sel = selected.count()
    dt = time.time() - t0
    return n_rows / dt, n_sel


def crawl_engine_bench(spark, n_pages: int = 1500, rounds: int = 3) -> dict:
    """Macro-bench of the REAL engine: CrawlRun with the distributed
    membership tiers over a larger cached fixture. What this measures is
    the per-round FIXED orchestration cost (plan/commit/checkpoint) — the
    per-row cost is the frontier microbench above; at production scale a
    round carries millions of rows against the same fixed cost."""
    import tempfile

    from web_crawler_spark.plans.round import CrawlConfig, CrawlRun
    from web_crawler_spark.sources.fixtures import generate_site, load_fixture
    from web_crawler_spark.sources.seeds import read_seeds

    fdir = os.path.join(tempfile.gettempdir(), f"wcs-bench-fixture-{n_pages}")
    marker = os.path.join(fdir, "_COMPLETE")
    if not os.path.exists(marker):
        generate_site(fdir, n_pages=n_pages, n_hosts=100, n_seeds=20)
        with open(marker, "w") as f:
            f.write("ok")
    run = CrawlRun(
        spark,
        tempfile.mkdtemp(prefix="wcs-bench-run-"),
        urls=load_fixture(spark, fdir, "urls"),
        links=load_fixture(spark, fdir, "links"),
        pages=load_fixture(spark, fdir, "pages"),
        robots=load_fixture(spark, fdir, "robots"),
        config=CrawlConfig(
            default_host_budget=16, max_rounds=rounds + 1, use_bloom=True
        ),
    )
    run.start(read_seeds(spark, f"{fdir}/seeds.csv"))
    t0 = time.time()
    fetched = 0
    for _ in range(rounds):
        m = run.run_round()
        fetched += m["rows_selected"]
    dt = time.time() - t0
    return {
        "crawl_rounds": rounds,
        "crawl_sec_per_round": round(dt / rounds, 2),
        "crawl_rows_fetched": fetched,
        "crawl_fixture_pages": n_pages,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import re

    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench", parallelism=cpus)
    # warm up codegen/JIT and the file index so the first timed query isn't
    # charged session startup costs
    spark.range(1_000_000).select(F.xxhash64("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = REGISTRY[name]
        t0 = time.time()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    urls_per_sec, n_sel = frontier_throughput(spark)
    crawl = crawl_engine_bench(spark)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"headline operator suite wall time ({len(HEADLINE)} queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "frontier_urls_per_sec": round(urls_per_sec),
                "frontier_rows": 5_000_000,
                "frontier_selected": n_sel,
                "cpus": cpus,
                **crawl,
            }
        )
    )


if __name__ == "__main__":
    main()
