"""Driver-gate parity for the crawl-engine entries (VERDICT r1 #3): the
Spark crawl demo vs the independent pure-Python oracle crawler, compared the
way the driver does it — row count, schema, order-insensitive values —
through the actual read_parquet DuckDB oracles."""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
ENTRIES = ["crawl_fetch_log", "crawl_metrics", "crawl_lineage", "bloom_prefilter_stats"]


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — both sides share the numpy computation
    return a == b


@pytest.mark.parametrize("name", ENTRIES)
def test_crawl_entry_matches_python_oracle(spark, name):
    import __spark_entry__ as E

    sqls = E.oracle_sql()  # also materializes the expected parquet
    assert name in sqls, f"{name} must now carry a DuckDB oracle"
    sdf = E.queries()[name](spark, SF_DIR).toPandas()
    ddf = duckdb.sql(sqls[name]).df()

    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    for i in range(len(s)):
        for c in cols:
            sv, dv = s[c].iloc[i], d[c].iloc[i]
            import pandas as pd

            sv = None if pd.isna(sv) else sv
            dv = None if pd.isna(dv) else dv
            assert _values_equal(sv, dv), f"{name} row {i} col {c}: {sv!r} != {dv!r}"


def test_oracle_lineage_strata_shape():
    """The Python oracle's lineage rows carry the engine's exact columns and
    pmod-16 partitioning, and sum to its own metrics."""
    from web_crawler_spark.plans.analytics import (
        _DEMO_BUDGET,
        _DEMO_ROUNDS,
        _demo_fixture_dir,
        _import_oracle_crawler,
    )
    import pandas as pd

    fdir = _demo_fixture_dir()
    oc = _import_oracle_crawler().from_fixture(fdir, default_budget=_DEMO_BUDGET)
    oc.start(list(pd.read_csv(f"{fdir}/seeds.csv").url))
    metrics = oc.run(max_rounds=_DEMO_ROUNDS)
    assert oc.lineage
    assert all(0 <= r["pkey"] < 16 for r in oc.lineage)
    by_round: dict[int, dict[str, int]] = {}
    for r in oc.lineage:
        d = by_round.setdefault(r["round"], {"rows_in": 0, "rows_selected": 0, "rows_fetched_ok": 0})
        for c in d:
            d[c] += r[c]
    for m in metrics:
        got = by_round.get(m["round"], {"rows_in": 0, "rows_selected": 0, "rows_fetched_ok": 0})
        assert got["rows_in"] == m["rows_in"]
        assert got["rows_selected"] == m["rows_selected"]
        assert got["rows_fetched_ok"] == m["rows_fetched_ok"]
