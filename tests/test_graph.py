"""Integer-exact PageRank: structural sanity, exact determinism across
partitionings, and the feed into frontier priority."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.operators.graph import RANK_SCALE, pagerank


def test_hub_ranks_highest(spark):
    # star graph: everyone links to node 0; 0 links to 1
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = {r["node"]: r["rank_int"] for r in pagerank(df, iters=5).collect()}
    assert max(ranks, key=ranks.get) == 0
    assert ranks[1] > ranks[2]  # 1 inherits the hub's mass
    assert ranks[2] == ranks[7]  # leaves are symmetric → exactly equal


def test_pagerank_exact_across_partitionings(spark):
    edges = [(i, (i * 7) % 50) for i in range(400) if i != (i * 7) % 50]
    a = spark.createDataFrame(edges, ["src", "dst"]).repartition(32)
    b = spark.createDataFrame(edges, ["src", "dst"]).coalesce(1)
    ra = sorted(map(tuple, pagerank(a, iters=3).select("node", "rank_int").collect()))
    rb = sorted(map(tuple, pagerank(b, iters=3).select("node", "rank_int").collect()))
    assert ra == rb  # bit-identical: integer arithmetic only


def test_rank_feeds_frontier_priority(spark):
    """The rank column composes directly with the frontier's priority band
    (the crawl-prioritization use the operator exists for)."""
    edges = [(1, 2), (3, 2), (4, 2), (2, 5)]
    ranks = pagerank(spark.createDataFrame(edges, ["src", "dst"]), iters=3)
    frontier = spark.createDataFrame(
        [(f"https://x/{n}", n) for n in [2, 5, 4]], ["url", "node"]
    )
    prioritized = frontier.join(ranks, "node", "left").select(
        "url", F.coalesce(F.col("rank"), F.lit(0.0)).alias("priority")
    )
    got = {r["url"]: r["priority"] for r in prioritized.collect()}
    # both linked-to nodes outrank the leaf; all priorities are positive
    assert got["https://x/2"] > got["https://x/4"] > 0
    assert got["https://x/5"] > got["https://x/4"]
    # scale contract: rank 1.0 == RANK_SCALE units
    base = ranks.filter(F.col("node") == 4).collect()[0]
    assert base["rank"] == base["rank_int"] / RANK_SCALE
