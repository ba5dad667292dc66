"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver's bench — bench.py is frozen for measurement. This file
exists so individual queries can be timed with the same methodology
(noop sink forces every column; per-query median of 3 COLD runs with the
frame memo purged) without paying the full bench, and so
.explain("formatted") output can be captured for plans/r07/.

Usage:
  python bench_extra.py [sf_dir] [query ...]          # time queries
  python bench_extra.py --plans out_dir [sf_dir] [query ...]  # dump plans
  python bench_extra.py --runs N ...                  # override run count

Env: SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _probe_gbs(size_mb: int = 512, reps: int = 3) -> float:
    """Same memcpy probe as bench.py — labels each timed run with the
    host's momentary bandwidth so contended windows are identifiable."""
    import numpy as np

    a = np.ones(size_mb * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    np.copyto(b, a)
    t0 = time.time()
    for _ in range(reps):
        np.copyto(b, a)
    dt = time.time() - t0
    return round(2 * reps * size_mb / 1024 / dt, 2)


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    runs = 3
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from poc_parquet_aggregator_spark.operators import QUERIES
    from poc_parquet_aggregator_spark.operators.dedup import purge_frame_memo
    from poc_parquet_aggregator_spark.plans import get_spark, stop_spark

    if not names:
        names = list(QUERIES)

    spark = get_spark("bench_extra", cores=cpus)
    # same warmup as bench.py's query section
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for wq in ("a1_daily_rollup", "star_join_revenue"):
        _force(QUERIES[wq](spark, warm_dir))

    out = {}
    for name in names:
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote plan for {name}")
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls, probes = [], []
        for _ in range(runs):
            probes.append(_probe_gbs())
            purge_frame_memo()
            t0 = time.time()
            _force(QUERIES[name](spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        out[name] = {
            "median": round(statistics.median(walls), 3),
            "runs": walls,
            "probes_gbs": probes,
        }
        print(name, json.dumps(out[name]), flush=True)
    if out:
        print(json.dumps({k: v["median"] for k, v in out.items()}))
    stop_spark()


if __name__ == "__main__":
    main()
