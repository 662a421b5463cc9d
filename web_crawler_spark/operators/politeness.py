"""Per-host politeness: robots filtering + budgeted priority selection (W4/J4).

The reference only aspires to robots/rate limiting (docs/dev-spec.md:1708-1712);
the north rule makes them first-class:

- ``robots_filter``: broadcast join of the small per-host policy table against
  the frontier; rows under a disallowed path prefix are dropped (counted).
- ``select_per_host``: pick ≤ budget URLs per host per round by
  (priority DESC, url_hash ASC). Skew-safe two-phase plan: Zipfian hosts mean
  one host can own 30% of the frontier, so a naive Window.partitionBy(host)
  sends that host's entire frontier through one task. Phase 1 ranks within
  (host, salt) — pmod(url_hash, S) spreads a mega-host over S tasks — and
  prunes each bucket to the budget; phase 2 ranks the ≤ S*budget survivors
  per host exactly. Per-host top-k ⊆ union of per-(host,salt) top-k, so the
  two-phase result is identical to the naive one (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import urls as U

DEFAULT_HOST_BUDGET = 4
DEFAULT_SALT_BUCKETS = 16


def robots_filter(
    frontier: DataFrame, robots: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, blocked) under per-host disallow prefixes.

    The robots table is a small dim (one row per host) → broadcast hash join,
    no shuffle of the frontier.
    """
    path = F.coalesce(U.url_path(F.col("url")), F.lit("/"))
    joined = frontier.join(
        F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
    ).withColumn(
        "__blocked",
        F.exists(
            F.coalesce(F.col("disallow_prefixes"), F.array()),
            lambda p: path.startswith(p),
        ),
    )
    allowed = joined.filter(~F.col("__blocked")).drop("__blocked", "disallow_prefixes")
    blocked = joined.filter(F.col("__blocked")).drop("__blocked", "disallow_prefixes")
    return allowed, blocked


DEFAULT_ROUND_WINDOW_MS = 60_000


def with_host_budget(
    frontier: DataFrame,
    robots: DataFrame,
    default_budget: int = DEFAULT_HOST_BUDGET,
    round_window_ms: int = DEFAULT_ROUND_WINDOW_MS,
) -> DataFrame:
    """Attach the per-host round budget.

    budget = min(max_per_round (else default), ⌊round_window / crawl_delay⌋):
    a host demanding a crawl delay can receive at most window/delay fetches
    per scheduling round, the batch-dataflow expression of per-host rate
    limiting (the reference only aspires to it — docs/dev-spec.md:1708).
    """
    base = F.coalesce(F.col("max_per_round"), F.lit(default_budget))
    delay_cap = F.when(
        F.col("crawl_delay_ms").isNotNull() & (F.col("crawl_delay_ms") > 0),
        F.greatest(
            (F.lit(round_window_ms) / F.col("crawl_delay_ms")).cast("int"), F.lit(1)
        ),
    )
    return (
        frontier.join(
            F.broadcast(robots.select("host", "max_per_round", "crawl_delay_ms")),
            "host",
            "left",
        )
        .withColumn("host_budget", F.least(base, F.coalesce(delay_cap, base)))
        .drop("max_per_round", "crawl_delay_ms")
    )


def two_phase_topk(
    df: DataFrame,
    key_cols: list[str],
    order: list,
    budget,
    salt_col,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Generic skew-safe per-key top-k (the W4 pattern, reusable).

    Phase 1 ranks within (key, salt) so a mega-key spreads over
    ``salt_buckets`` tasks; phase 2 ranks the ≤ buckets·budget survivors per
    key exactly. Per-key top-k ⊆ union of per-(key,salt) top-k, so the
    result is identical to the naive single window (verified in tests).
    ``budget`` may be an int or a Column; ``salt_col`` any deterministic
    integer Column (e.g. a hash of the row key).
    """
    budget_col = F.lit(budget) if isinstance(budget, int) else budget
    salt = F.pmod(salt_col, F.lit(salt_buckets))
    w1 = Window.partitionBy(*[F.col(c) for c in key_cols], salt).orderBy(*order)
    pruned = (
        df.withColumn("__budget", budget_col)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("__budget"))
        .drop("__r1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        pruned.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= F.col("__budget"))
        .drop("__r2", "__budget")
    )


def select_per_host(
    frontier: DataFrame,
    robots: DataFrame,
    default_budget: int = DEFAULT_HOST_BUDGET,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    round_window_ms: int = DEFAULT_ROUND_WINDOW_MS,
) -> DataFrame:
    """W4: ≤ budget rows per host, by (priority DESC, url_hash ASC), two-phase."""
    budgeted = with_host_budget(frontier, robots, default_budget, round_window_ms)
    order = [F.col("priority").desc(), F.col("url_hash").asc()]
    return two_phase_topk(
        budgeted,
        ["host"],
        order,
        F.col("host_budget"),
        F.col("url_hash"),
        salt_buckets,
    ).drop("host_budget")


def assign_fetch_seq(batch: DataFrame) -> DataFrame:
    """Deterministic total order within the round: fetch_seq by
    (priority DESC, url_hash ASC).

    This is a single-partition window — acceptable because the *selected
    batch* is bounded by Σ host budgets (politeness caps it), not by frontier
    size; the frontier-sized stages above stay fully parallel. The total
    order is what makes N- and 4N-core runs byte-identical (north rule).
    """
    w = Window.orderBy(F.col("priority").desc(), F.col("url_hash").asc())
    return batch.withColumn("fetch_seq", F.row_number().over(w).cast("long"))
