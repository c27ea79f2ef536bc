"""Extra measurement harness for the optimization round (bench.py is frozen).

Times each declared query with the noop sink (guide §1.4), N iterations,
reports per-iteration walls + median + Spark job counts, and dumps
explain("formatted") for each query to plans/r06/.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [--iters 3] \
      [--queries q1,q2,...] [--plans-dir plans/r06] [--tag before]

Prints one JSON line with {"queries": {name: {"runs": [...], "median": s,
"jobs": n}}, ...} and writes the same to BENCH/extra_<tag>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument("--plans-dir", type=str, default="")
    ap.add_argument("--tag", type=str, default="before")
    args = ap.parse_args()

    from wage_etl_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    from wage_etl_spark.operators.caching import release_operator_caches

    qs = em.queries()
    only = [q.strip() for q in args.queries.split(",") if q.strip()]
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    # warmup (same as bench.py)
    em.queries()["cdc_validate_split"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    release_operator_caches()

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def n_jobs() -> int:
        try:
            return int(jsc.dagScheduler().nextJobId())
        except Exception:
            return -1

    def n_tasks_since(job_lo: int) -> int:
        try:
            store = jsc.statusStore()
            jobs = store.jobsList(None)
            total = 0
            for i in range(jobs.size()):
                j = jobs.apply(i)
                if j.jobId() >= job_lo:
                    total += j.numTasks()
            return total
        except Exception:
            return -1

    out: dict = {}
    for name, fn in qs.items():
        sc.setJobDescription(f"extra:{name}")
        runs = []
        jobs_used = tasks_used = -1
        for i in range(args.iters):
            release_operator_caches()
            j0 = n_jobs()
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
            j1 = n_jobs()
            if j0 >= 0 and j1 >= 0:
                jobs_used = j1 - j0
                tasks_used = n_tasks_since(j0)
        release_operator_caches()
        out[name] = {
            "runs": runs,
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
            "jobs": jobs_used,
            "tasks": tasks_used,
        }
        if args.plans_dir:
            os.makedirs(os.path.join(REPO, args.plans_dir), exist_ok=True)
            df = fn(spark, SF_DIR)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
            with open(
                os.path.join(REPO, args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
            release_operator_caches()
        sc.setJobDescription(None)
        print(f"{name}: median={out[name]['median']} runs={runs} jobs={jobs_used}",
              file=sys.stderr)

    result = {"sf_dir": SF_DIR, "iters": args.iters, "queries": out,
              "total_median": round(sum(v["median"] for v in out.values()), 3),
              "total_min": round(sum(v["min"] for v in out.values()), 3)}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", f"extra_{args.tag}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
