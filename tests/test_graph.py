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


def test_rank_index_builds_once_and_loads(spark, tmp_path):
    """Build/probe split (VERDICT r3 #3): load_or_build trains once per
    (params, corpus_key); later calls — same process or a fresh index
    object — load the SnapshotTable. PageRank is integer-exact, so loaded
    ranks are bit-identical to rebuilt ones."""
    import web_crawler_spark.operators.graph as G
    from web_crawler_spark.sources.lake import SnapshotTable

    edges = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(400) if i != (i * 7) % 50],
        ["src", "dst"],
    )
    table = SnapshotTable(str(tmp_path / "ranks"))
    before = G.RANK_BUILDS
    idx = G.RankIndex.load_or_build(table, edges, iters=3, corpus_key="fix")
    built = sorted(map(tuple, idx.ranks().select("node", "rank_int").collect()))
    assert G.RANK_BUILDS == before + 1
    # second load_or_build: no retrain, identical ranks
    idx2 = G.RankIndex.load_or_build(table, edges, iters=3, corpus_key="fix")
    loaded = sorted(map(tuple, idx2.ranks().select("node", "rank_int").collect()))
    assert G.RANK_BUILDS == before + 1
    assert loaded == built == sorted(
        map(tuple, G.pagerank(edges, iters=3).select("node", "rank_int").collect())
    )
    # params or corpus key mismatch → rebuild (a refreshed links snapshot
    # must invalidate the index, never serve stale ranks)
    G.RankIndex.load_or_build(table, edges, iters=2, corpus_key="fix")
    assert G.RANK_BUILDS == before + 2
    G.RankIndex.load_or_build(table, edges, iters=2, corpus_key="other")
    assert G.RANK_BUILDS == before + 3


def test_crawl_resume_loads_persisted_ranks(spark, tmp_path):
    """A pagerank-prioritized CrawlRun persists ranks under run_dir: a
    second run over the same run_dir + fixture LOADS them (no rank pass),
    and its fetch log is identical — the crawl-side build/probe split."""
    import pandas as pd

    import web_crawler_spark.operators.graph as G
    from web_crawler_spark.plans.round import CrawlConfig, CrawlRun
    from web_crawler_spark.sources.fixtures import generate_site, load_fixture

    fdir = str(tmp_path / "site")
    generate_site(fdir, n_pages=60, n_hosts=6, n_seeds=3)

    def mk(run_dir):
        return CrawlRun(
            spark,
            run_dir,
            urls=load_fixture(spark, fdir, "urls"),
            links=load_fixture(spark, fdir, "links"),
            pages=load_fixture(spark, fdir, "pages"),
            robots=load_fixture(spark, fdir, "robots"),
            config=CrawlConfig(max_rounds=2, priority_source="pagerank"),
        )

    seeds_pd = pd.read_csv(f"{fdir}/seeds.csv")
    seeds = spark.createDataFrame(
        [(i, u) for i, u in enumerate(seeds_pd.url)], ["row_index", "url"]
    )

    rdir = str(tmp_path / "run")
    before = G.RANK_BUILDS
    first = mk(rdir)
    first.start(seeds)
    first.run()
    assert G.RANK_BUILDS == before + 1
    log1 = sorted(
        (r.round, r.fetch_seq, r.url) for r in first.fetch_log_t.read(spark).collect()
    )
    first.close()

    # fresh object (a resume), same run_dir + fixture: ranks load
    second = mk(rdir)
    second.resume()
    scores = second._pagerank_scores()
    assert G.RANK_BUILDS == before + 1  # loaded, not rebuilt
    assert scores.count() > 0
    second.close()

    # a different fixture through the same run_dir must NOT serve stale
    # ranks: the links fingerprint mismatch forces a rebuild
    fdir2 = str(tmp_path / "site2")
    generate_site(fdir2, n_pages=40, n_hosts=4, n_seeds=2)
    third = CrawlRun(
        spark,
        rdir,
        urls=load_fixture(spark, fdir2, "urls"),
        links=load_fixture(spark, fdir2, "links"),
        pages=load_fixture(spark, fdir2, "pages"),
        robots=load_fixture(spark, fdir2, "robots"),
        config=CrawlConfig(max_rounds=2, priority_source="pagerank"),
    )
    third._pagerank_scores()
    assert G.RANK_BUILDS == before + 2
    third.close()
    assert len(log1) > 0
