"""Per-query measurement harness for the optimization round (guide §1.1/§1.4).

NOT the driver bench — bench.py is frozen. This isolates individual declared
queries with the same force_count evaluation bench.py uses, labels jobs, and
dumps .explain("formatted") to plans/r06/.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [--reps 2] [--plans SUFFIX] query [query ...]

Prints one JSON line: {"queries": {name: best_sec}, "sf": ..., "reps": N}.
With --plans SUFFIX, writes plans/r06/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="suffix for plans/r06/<q>_<suffix>.txt dumps")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip timed reps")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from solarpos_spark.plans.session import build_session

    spark = build_session(app_name="solarpos-bench-extra", cores=cpus,
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def force_count(df):
        r = df.select(F.xxhash64(*df.columns).alias("h")) \
              .agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h")).collect()[0]
        return r["n"]

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    # warm JVM + all python workers (bench.py discipline)
    spark.sparkContext.setJobDescription("warmup: position_spa")
    force_count(qs["position_spa"](spark, sf_dir))

    out: dict[str, float] = {}
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            df = qs[name](spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"),
                      "w") as fh:
                fh.write(plan)
        if args.no_time:
            continue
        best = None
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            force_count(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]} s", file=sys.stderr)
    print(json.dumps({"queries": out,
                      "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                      "reps": args.reps,
                      "load": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
