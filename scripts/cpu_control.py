"""Pure-CPU scaling control for the BENCH/BASELINE.md host-ceiling claim.

The scaling section attributes the 4->16 efficiency collapse to THIS VM's
effective-core ceiling (~8-10), not to the engine. This control removes the
engine entirely: a codegen-only sha256+md5 pipeline over spark.range — no
input files, no shuffle, no Python workers, no disk — run at local[1/4/16/32]
in fresh JVMs, interleaved rounds. If T(local[16]) ~= T(local[4]) here too,
the ceiling is the host's, and the engine's 4->16 number measures the host.

Usage:
  python scripts/cpu_control.py            # parent: runs all levels/rounds
  python scripts/cpu_control.py --child N OUT   # one warmup + one timed iter

Writes BENCH/cpu_control.json (raw walls per level per round + derived
pairwise efficiencies).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

LEVELS = [1, 4, 16, 32]
ROUNDS = int(os.environ.get("CPU_CONTROL_ROUNDS", "3"))
ROWS = int(os.environ.get("CPU_CONTROL_ROWS", "3000000"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _workload(spark) -> float:
    """One timed iteration: sha256+md5 chain over range(ROWS), max(hash).
    Pure whole-stage-codegen CPU. The aggregate must CONSUME the hash —
    a count() lets Catalyst prune the sha2/md5 away entirely (measured:
    100M 'rows' in 0.2 s, i.e. nothing ran) — so we take max(h), which
    forces every row's hash and still reduces map-side to one row."""
    import time

    from pyspark.sql import functions as F

    df = spark.range(ROWS).select(
        F.sha2(F.concat_ws("|", F.col("id"), F.md5(F.col("id").cast("string"))), 256).alias("h")
    )
    out = df.agg(F.max("h").alias("m"))
    t0 = time.monotonic()
    out.collect()
    return time.monotonic() - t0


def child(cpus: int, out_path: str) -> None:
    sys.path.insert(0, REPO)
    from wage_etl_spark.session import get_spark

    spark = get_spark(
        app_name=f"cpu-control-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    _workload(spark)  # warmup: codegen compile + JIT
    wall = _workload(spark)
    with open(out_path + ".tmp", "w") as f:
        json.dump({"cpus": cpus, "rows": ROWS, "elapsed_s": round(wall, 3)}, f)
    os.rename(out_path + ".tmp", out_path)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return

    tmp = tempfile.mkdtemp(prefix="cpu_control_")
    walls: dict[int, list[float]] = {c: [] for c in LEVELS}
    for rnd in range(ROUNDS):
        order = LEVELS if rnd % 2 == 0 else list(reversed(LEVELS))
        for cpus in order:
            out = os.path.join(tmp, f"t_{cpus}_{rnd}.json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(cpus), out],
                check=True, cwd=REPO,
            )
            with open(out) as f:
                walls[cpus].append(json.load(f)["elapsed_s"])
            print(f"round {rnd} local[{cpus}]: {walls[cpus][-1]} s", flush=True)

    levels = {
        str(c): {
            "iterations_s": walls[c],
            "median_s": round(statistics.median(walls[c]), 3),
            "rows_per_sec_median": round(ROWS / statistics.median(walls[c]), 1),
        }
        for c in LEVELS
    }
    pairs = {}
    for lo, hi in zip(LEVELS, LEVELS[1:]):
        eff = [
            round((tl / th) / (hi / lo), 3)
            for tl, th in zip(walls[lo], walls[hi])
        ]
        pairs[f"{lo}->{hi}"] = {
            "efficiency_per_round": eff,
            "efficiency_median": round(statistics.median(eff), 3),
        }
    result = {
        "workload": "sha2(concat(id, md5(id))) over range(rows), count — "
        "codegen only, no input, no shuffle, no Python",
        "rows": ROWS,
        "rounds": ROUNDS,
        "levels": levels,
        "pairs": pairs,
        "note": "fresh JVM per (level, round); one warmup iteration before "
        "the timed one, so codegen/JIT compile is excluded",
    }
    dest = os.path.join(REPO, "BENCH", "cpu_control.json")
    with open(dest, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"pairs": pairs}, indent=1))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
