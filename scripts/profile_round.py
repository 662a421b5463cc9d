"""Phase-level profile of one crawl round (VERDICT r3 #4 diagnostics).

Wraps the expensive primitives (SnapshotTable commits, localCheckpoint,
collect) with timers and prints a per-phase breakdown of
``crawl_engine_bench``'s fixture round, so fixed-cost work targets the
right 80%.

Usage: python scripts/profile_round.py [rounds]
"""

from __future__ import annotations

import collections
import functools
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMES: dict[str, float] = collections.defaultdict(float)
COUNTS: dict[str, int] = collections.defaultdict(int)


def timed(name: str, fn):
    @functools.wraps(fn)
    def wrap(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            TIMES[name] += time.time() - t0
            COUNTS[name] += 1

    return wrap


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # Spark 4: pyspark.sql.DataFrame is the abstract umbrella; instances
    # are classic.dataframe.DataFrame — patch the concrete class
    from pyspark.sql.classic.dataframe import DataFrame

    from web_crawler_spark.session import get_spark
    from web_crawler_spark.sources import lake
    from web_crawler_spark.plans.round import CrawlConfig, CrawlRun
    from web_crawler_spark.sources.fixtures import generate_site, load_fixture
    from web_crawler_spark.sources.seeds import read_seeds

    lake.SnapshotTable.append = timed("table.append", lake.SnapshotTable.append)
    lake.SnapshotTable.overwrite = timed(
        "table.overwrite", lake.SnapshotTable.overwrite
    )
    lake.SnapshotTable.append_local = timed(
        "table.append_local", lake.SnapshotTable.append_local
    )
    lake.SnapshotTable.read = timed("table.read", lake.SnapshotTable.read)
    DataFrame.localCheckpoint = timed(
        "localCheckpoint", DataFrame.localCheckpoint
    )
    DataFrame.collect = timed("collect", DataFrame.collect)

    spark = get_spark("profile-round", parallelism=32)
    from web_crawler_spark.plans.analytics import _SALT

    fdir = os.path.join(tempfile.gettempdir(), f"wcs-bench-fixture-1500-{_SALT}")
    marker = os.path.join(fdir, "_COMPLETE")
    if not os.path.exists(marker):
        generate_site(fdir, n_pages=1500, n_hosts=100, n_seeds=20)
        with open(marker, "w") as f:
            f.write("ok")
    run = CrawlRun(
        spark,
        tempfile.mkdtemp(prefix="wcs-profile-run-"),
        urls=load_fixture(spark, fdir, "urls"),
        links=load_fixture(spark, fdir, "links"),
        pages=load_fixture(spark, fdir, "pages"),
        robots=load_fixture(spark, fdir, "robots"),
        config=CrawlConfig(default_host_budget=16, max_rounds=rounds + 1, use_bloom=True),
    )
    run.start(read_seeds(spark, f"{fdir}/seeds.csv"))
    TIMES.clear()
    COUNTS.clear()
    t0 = time.time()
    for _ in range(rounds):
        run.run_round()
    total = time.time() - t0
    print(f"\ntotal {total:.2f}s over {rounds} rounds = {total / rounds:.2f}s/round")
    acc = 0.0
    for k in sorted(TIMES, key=TIMES.get, reverse=True):
        acc += TIMES[k]
        print(
            f"  {k:<20} {TIMES[k]:7.2f}s  ({TIMES[k] / rounds:5.2f}s/round, "
            f"{COUNTS[k] / rounds:4.1f} calls/round)"
        )
    print(f"  {'(unattributed)':<20} {total - acc:7.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
