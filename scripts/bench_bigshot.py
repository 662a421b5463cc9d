"""Single-shot large-scale run of one bench job, recorded for BENCH.md.

Usage: python scripts/bench_bigshot.py <job> <rows> [cpus] [shuffle_partitions]

Runs ONE timed pass of the named bench job (after a small warmup) and appends
the result to scripts/recorded_shots.json; `bench_scaling.py` renders every
recorded shot into BENCH.md's "Large-scale single-shot" section, so the
evidence survives BENCH.md rewrites. Jobs: frontier | frontier_tiered | image.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402

# ---- quiet-window gate: the same criterion bench_scaling's CHILD applies
# to every scaling run (< 0.5 foreign busy cores over a 5 s probe; the
# post-run record carries the foreign CPU measured DURING the run).

HZ = os.sysconf("SC_CLK_TCK")


def total_busy_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals) - vals[3] - vals[4]  # everything except idle+iowait


def own_tree_jiffies() -> int:
    """utime+stime+cutime+cstime of this process and every live
    descendant (cutime/cstime catch reaped pyspark workers)."""
    me = os.getpid()
    kids: dict[int, list[int]] = {}
    own: dict[int, int] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                st = f.read().rsplit(")", 1)[1].split()
        except OSError:
            continue
        ppid = int(st[1])
        own[int(pid)] = int(st[11]) + int(st[12]) + int(st[13]) + int(st[14])
        kids.setdefault(ppid, []).append(int(pid))
    total, stack = 0, [me]
    while stack:
        p = stack.pop()
        total += own.get(p, 0)
        stack.extend(kids.get(p, []))
    return total


def wait_quiet(threshold: float = 0.5, probe_s: float = 5, max_wait: float = 600):
    t0 = time.time()
    while True:
        b0, o0 = total_busy_jiffies(), own_tree_jiffies()
        time.sleep(probe_s)
        foreign = max(
            0.0, (total_busy_jiffies() - b0) - (own_tree_jiffies() - o0)
        ) / HZ / probe_s
        if foreign < threshold or time.time() - t0 > max_wait:
            return round(os.getloadavg()[0], 2)

SHOTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "recorded_shots.json")

JOBS = {
    "frontier": (bench.frontier_throughput, 1_000_000),
    "frontier_tiered": (bench.frontier_tiered_throughput, 1_000_000),
    "image": (bench.image_pipeline_throughput, 2_000),
}


def main() -> None:
    job = sys.argv[1]
    rows = int(sys.argv[2])
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    # shuffle partitions default: ONE task wave. Measured both ways on the
    # round-5 code under the quiet gate: the single-shot regime ran ~8-10%
    # faster at one wave (frontier 10^8: 17.8s vs 19.7s; tiered: 21.4s vs
    # 23.1s), while bench_scaling's best-of-3-per-JVM level protocol
    # measured the opposite (two waves pipeline stragglers there). Each
    # harness keeps the default its own regime measures faster; every
    # recorded shot notes its partition count.
    shuf = int(sys.argv[4]) if len(sys.argv) > 4 else cpus
    job_fn, warm_floor = JOBS[job]
    spark = get_spark(f"bigshot-{job}-{cpus}", parallelism=cpus,
                      shuffle_partitions=shuf,
                      # zstd shuffle blocks are ~35% smaller than lz4 on
                      # the URL-heavy frontier rows; at 10^9 rows the map
                      # outputs of the dedupe exchange otherwise exceed
                      # the sandbox disk (both warmup and timed pass hold
                      # their files until job end)
                      extra_conf={"spark.io.compression.codec": "zstd"})
    # JIT + Python-worker + JVM-heap warmup: a small pass first (codegen),
    # then one FULL-SIZE untimed pass — the first full-scale job in a
    # fresh JVM pays 3-8× for heap growth + GC ergonomics settling
    # (measured: 90s → 29.7s → 28.0s for the same 10^8-row tiered round in
    # one JVM), and a rows//20 warmup does not grow the heap anywhere near
    # the full shuffle's footprint. The recorded number is the steady
    # state a long-lived cluster actually runs at.
    # ... except at 10^9+: two full-size passes hold ~2× the shuffle
    # footprint on disk at once (the warmup's shuffle files outlive it
    # until the context cleaner GCs) and blew the sandbox disk. A 10^8
    # warmup grows the heap/JIT to effectively steady state; the timed
    # pass is then conservative by the residual heap-growth delta only.
    job_fn(spark, max(rows // 10, warm_floor))
    if rows > 400_000_000:
        # free the warmup's shuffle files before the timed pass: they are
        # GC'd with their ShuffleDependency, and at 10^9 rows the timed
        # shuffle plus lingering warmup files exceed the sandbox disk
        import gc
        import time as _t

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        _t.sleep(5)
    else:
        job_fn(spark, min(rows, 200_000_000))
    # same quiet-window gate as bench_scaling (BENCH.md's mandate for
    # scaling evidence, VERDICT r4 Missing #2): wait for < 0.5 foreign
    # busy cores over a 5 s probe, and measure the foreign load DURING
    # the run so the record carries its own conditions
    load0 = wait_quiet()
    b0, o0 = total_busy_jiffies(), own_tree_jiffies()
    t0 = time.time()
    tput, n_sel = job_fn(spark, rows)
    dt = time.time() - t0
    foreign_cores = round(
        max(0.0, (total_busy_jiffies() - b0) - (own_tree_jiffies() - o0))
        / HZ
        / dt,
        2,
    )
    warm_note = (
        f"warm protocol: rows//10 JIT pass + "
        f"{'10^8-row' if rows > 400_000_000 else 'full-size (<=2e8)'} "
        f"untimed warmup pass, timed pass is warm steady-state"
    )
    rec = {
        "job": job, "rows": rows, "sec": round(dt, 2),
        "urls_per_sec": round(tput), "selected": n_sel,
        "foreign_busy_cores_during_run": foreign_cores,
        "note": f"local[{cpus}], {shuf} shuffle partitions, quiet-window "
                f"gated (<0.5 foreign busy cores / 5s probe), "
                f"{foreign_cores} foreign busy cores during run, 1-min "
                f"load {load0} at start; {warm_note}",
    }
    try:
        with open(SHOTS_PATH) as f:
            shots = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        shots = []
    # latest shot per (job, rows) wins
    shots = [s for s in shots if (s["job"], s["rows"]) != (job, rows)]
    shots.append(rec)
    with open(SHOTS_PATH, "w") as f:
        json.dump(shots, f, indent=1)
        f.write("\n")  # keep the file POSIX-text (ADVICE r4 #5)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
