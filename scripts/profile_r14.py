#!/usr/bin/env python
"""Round-14 optimization profiler.

For each named catalog query: warm-up noop run, then N timed noop runs;
captures wall seconds, `.explain('formatted')`, and per-stage metrics
(run time, CPU time, shuffle read/write bytes, fetch wait, task count)
from the live UI REST API so the dominant cost of each query is a
measured fact, not a guess.

Usage:
  python scripts/profile_r14.py [--sf-dir DIR] [--reps N] [--plans-dir D]
                                [--suffix before|after] name1 name2 ...
Writes:
  <plans-dir>/<name>_<suffix>.txt   explain formatted (if --plans-dir)
  stdout: one JSON line per query with wall + stage breakdown
"""

from __future__ import annotations

import argparse
import json
import os
import time
import urllib.request

from flink_ms_spark.plans.catalog import QUERIES
from flink_ms_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_spark("r14-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui = sc.uiWebUrl  # e.g. http://host:4040
    app_id = sc.applicationId

    # warm the session like bench.py does (codegen, file listing, fleet)
    _force(QUERIES["distinct_segments"](spark, args.sf_dir))

    def _noop_batches(it):
        for b in it:
            yield b

    spark.range(0, sc.defaultParallelism * 4, 1, sc.defaultParallelism
                ).mapInPandas(_noop_batches, "id long").write.format(
                    "noop").mode("overwrite").save()

    names = []
    for n in args.names:
        names.extend(x for x in n.split(",") if x)

    for name in names:
        fn = QUERIES[name]
        sc.setJobDescription(f"r14-profile: {name}")
        df = fn(spark, args.sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        _force(df)  # warm-up (not timed)
        walls = []
        best_stages = None
        for _ in range(args.reps):
            before = set(s["stageId"] for s in _rest(
                f"{ui}/api/v1/applications/{app_id}/stages"))
            t0 = time.perf_counter()
            _force(fn(spark, args.sf_dir))
            wall = time.perf_counter() - t0
            walls.append(wall)
            if wall == min(walls):
                stages = [s for s in _rest(
                    f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
                    if s["stageId"] not in before]
                best_stages = [
                    {
                        "id": s["stageId"],
                        "name": s["name"].split("\n")[0][:60],
                        "tasks": s["numCompleteTasks"],
                        "run_ms": s["executorRunTime"],
                        "cpu_ms": round(s["executorCpuTime"] / 1e6),
                        "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                        "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                        "fetch_wait_ms": s["shuffleFetchWaitTime"],
                        "in_mb": round(s["inputBytes"] / 1e6, 2),
                    }
                    for s in sorted(stages, key=lambda s: -s["executorRunTime"])
                ]
        out = {
            "query": name,
            "wall_min_s": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "n_stages": len(best_stages or []),
            "sum_run_ms": sum(s["run_ms"] for s in best_stages or []),
            "stages": (best_stages or [])[:12],
        }
        print("PROFILE " + json.dumps(out), flush=True)
        sc.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
