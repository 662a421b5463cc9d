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
    shuf = int(sys.argv[4]) if len(sys.argv) > 4 else 2 * cpus
    job_fn, warm_floor = JOBS[job]
    spark = get_spark(f"bigshot-{job}-{cpus}", parallelism=cpus,
                      shuffle_partitions=shuf)
    # JIT + Python-worker + JVM-heap warmup (same rows//20 protocol as
    # bench_scaling.py): the first heavy job in a fresh JVM pays ~4× for
    # heap growth + codegen JIT (measured: 85s first vs 18.5s steady for
    # the same 10^8-row window job), so a too-small warmup pass leaves the
    # single timed shot partly cold
    job_fn(spark, max(rows // 20, warm_floor))
    load0 = round(os.getloadavg()[0], 2)
    t0 = time.time()
    tput, n_sel = job_fn(spark, rows)
    dt = time.time() - t0
    rec = {
        "job": job, "rows": rows, "sec": round(dt, 2),
        "urls_per_sec": round(tput), "selected": n_sel,
        "note": f"local[{cpus}], {shuf} shuffle partitions, 1-min load "
                f"{load0} at start",
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
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
