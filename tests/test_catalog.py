"""Catalog: named-table registry over SnapshotTable (the Iceberg-catalog
stand-in — create/load/list/drop with per-table configuration ownership)."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.sources.catalog import Catalog


def _mk(spark, lo, hi, rnd=1):
    return spark.range(lo, hi).select(
        F.col("id").alias("url_hash"), F.lit(rnd).cast("int").alias("settled_round")
    )


def test_create_load_roundtrip_preserves_config(spark, tmp_path):
    """A table created with stats_cols must come back configured the same
    way through load_table — otherwise later commits silently stop
    recording stats and pruned scans degrade to full scans."""
    cat = Catalog(str(tmp_path / "cat"))
    t = cat.create_table("seen", stats_cols=["settled_round"])
    t.overwrite(_mk(spark, 0, 10, rnd=1))

    t2 = cat.load_table("seen")
    assert t2.stats_cols == ["settled_round"]
    t2.append(_mk(spark, 10, 20, rnd=2))
    # both commits carry stats → pruning skips the non-matching one
    assert len(t2.data_dirs(prune={"settled_round": (2, 2)})) == 1
    assert t2.read(spark, prune={"settled_round": (2, 2)}).count() == 10


def test_create_conflicts_and_if_not_exists(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    t = cat.create_table("jobs")
    t.overwrite(_mk(spark, 0, 3))
    with pytest.raises(FileExistsError):
        cat.create_table("jobs")
    # if_not_exists returns the EXISTING table (same data, registry config)
    t2 = cat.create_table("jobs", stats_cols=["settled_round"], if_not_exists=True)
    assert t2.read(spark).count() == 3
    assert t2.stats_cols == []  # registry owns the config, not the caller
    with pytest.raises(ValueError):
        cat.create_table("../escape")
    with pytest.raises(KeyError):
        cat.load_table("nope")


def test_drop_table_and_purge(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    t = cat.create_table("tmp")
    t.overwrite(_mk(spark, 0, 3))
    data_path = t.path
    assert cat.table_names() == ["tmp"]
    assert cat.drop_table("tmp") is True
    assert cat.table_names() == []
    assert os.path.isdir(data_path)  # no purge: data retained
    assert cat.drop_table("tmp") is False  # idempotent
    t2 = cat.create_table("tmp")  # name reusable; fresh dir, fresh table
    assert t2.path != data_path
    assert cat.drop_table("tmp", purge=True) is True
    assert not os.path.isdir(t2.path)


def test_concurrent_creates_one_winner(tmp_path):
    """Racing creates of one name must yield exactly one registered table;
    losers get FileExistsError (or the existing handle with if_not_exists)."""
    cat = Catalog(str(tmp_path / "cat"))
    outcomes: list[str] = []

    def creator():
        try:
            cat.create_table("frontier")
            outcomes.append("won")
        except FileExistsError:
            outcomes.append("lost")

    threads = [threading.Thread(target=creator) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert outcomes.count("won") == 1 and outcomes.count("lost") == 7
    assert cat.table_names() == ["frontier"]
    # if_not_exists converges on the single registered dir
    paths = {cat.create_table("frontier", if_not_exists=True).path for _ in range(4)}
    assert len(paths) == 1
