"""North-rule resume gate: kill after round k, resume from checkpoint +
snapshots, final state identical to the uninterrupted run — including
rollback of partial post-checkpoint commits (crash mid-round)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_crawler_spark.plans.round import CrawlConfig, CrawlRun
from web_crawler_spark.schemas import SEEN
from web_crawler_spark.sources.fixtures import generate_site, load_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("site"))
    generate_site(d, n_pages=120, n_hosts=10, n_seeds=6)
    return d


def _mk_run(spark, fixture_dir, run_dir, max_rounds=4):
    return CrawlRun(
        spark,
        run_dir,
        urls=load_fixture(spark, fixture_dir, "urls"),
        links=load_fixture(spark, fixture_dir, "links"),
        pages=load_fixture(spark, fixture_dir, "pages"),
        robots=load_fixture(spark, fixture_dir, "robots"),
        config=CrawlConfig(max_rounds=max_rounds),
    )


def _seeds_df(spark, fixture_dir):
    seeds = pd.read_csv(f"{fixture_dir}/seeds.csv")
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(seeds.url)], ["row_index", "url"]
    )


def _log_tuples(spark, run):
    rows = run.fetch_log_t.read(spark).collect()
    return sorted(
        (r.round, r.fetch_seq, r.url, r.status, r.error_code, r.attempts)
        for r in rows
    )


def test_kill_and_resume_identical(spark, fixture_dir, tmp_path_factory):
    # uninterrupted reference run
    ref = _mk_run(spark, fixture_dir, str(tmp_path_factory.mktemp("ref")))
    ref.start(_seeds_df(spark, fixture_dir))
    ref.run()

    # interrupted run: 2 rounds, then the process "dies"
    rdir = str(tmp_path_factory.mktemp("resumed"))
    first = _mk_run(spark, fixture_dir, rdir)
    first.start(_seeds_df(spark, fixture_dir))
    first.run_round()
    first.run_round()
    del first  # crash

    # simulate a partial post-checkpoint commit (crash mid-round-3: seen got
    # an extra append that never made it into a checkpoint)
    fresh = _mk_run(spark, fixture_dir, rdir)
    fresh.seen_t.append(
        spark.createDataFrame([(999999, "https://junk.example.com/x", 99)], SEEN)
    )

    # restart: rollback + continue
    resumed_from = fresh.resume()
    assert resumed_from == 2
    junk = fresh.seen_t.read(spark).filter(F.col("url_hash") == 999999).count()
    assert junk == 0, "partial commit must be rolled back"
    fresh.run()

    assert _log_tuples(spark, fresh) == _log_tuples(spark, ref)
    ref_seen = {r.url_hash for r in ref.seen_t.read(spark).collect()}
    res_seen = {r.url_hash for r in fresh.seen_t.read(spark).collect()}
    assert ref_seen == res_seen


def test_snapshot_time_travel(spark, fixture_dir, tmp_path_factory):
    run = _mk_run(spark, fixture_dir, str(tmp_path_factory.mktemp("tt")))
    run.start(_seeds_df(spark, fixture_dir))
    run.run_round()
    sid_after_r1 = run.fetch_log_t.current_snapshot_id()
    n_r1 = run.fetch_log_t.read(spark).count()
    run.run_round()
    assert run.fetch_log_t.read(spark).count() > n_r1
    # time travel back to the round-1 snapshot
    assert run.fetch_log_t.read(spark, snapshot_id=sid_after_r1).count() == n_r1
