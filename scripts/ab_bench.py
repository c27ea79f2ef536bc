"""Paired A/B bench harness for the optimization round.

Host CPU-steal noise on this box is low-frequency (minutes-long episodes,
up to ~5x — see BENCH/BASELINE.md): two bench runs half an hour apart are
not comparable, which round 5's verdict documented the hard way. This
harness therefore snapshots a git ref (default HEAD) to a temp dir and
ALTERNATES full bench_extra child runs A,B,A,B,... in one session window,
then reports per-query paired deltas (median of per-round B-A differences)
— each pair shares its noise episode, so the sign of the delta is robust
even when absolute seconds move 2x between rounds.

Usage:
  python scripts/ab_bench.py --queries q1,q2 --iters 2 --rounds 3 \
      [--ref HEAD] [--tag exp1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_side(repo_dir: str, queries: str, iters: int, tag: str) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.join(repo_dir, "bench_extra.py"),
         "--iters", str(iters), "--queries", queries, "--tag", tag],
        cwd=repo_dir, env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
        raise RuntimeError(f"bench_extra failed in {repo_dir}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--tag", default="ab")
    args = ap.parse_args()

    snap = tempfile.mkdtemp(prefix="ab_head_")
    subprocess.run(
        f"git -C {REPO} archive {args.ref} | tar -x -C {snap}",
        shell=True, check=True,
    )
    # the harness itself must be identical on both sides (the snapshot may
    # carry an older bench_extra)
    subprocess.run(
        ["cp", os.path.join(REPO, "bench_extra.py"), snap], check=True
    )
    print(f"A = {args.ref} snapshot at {snap}; B = working tree {REPO}",
          file=sys.stderr)

    a_runs, b_runs = [], []
    for r in range(args.rounds):
        a = run_side(snap, args.queries, args.iters, f"{args.tag}_a{r}")
        b = run_side(REPO, args.queries, args.iters, f"{args.tag}_b{r}")
        a_runs.append(a)
        b_runs.append(b)
        for q in a["queries"]:
            am, bm = a["queries"][q]["min"], b["queries"][q]["min"]
            print(f"round {r}: {q}: A={am} B={bm} delta={round(bm-am,3)}",
                  file=sys.stderr)

    report = {}
    for q in a_runs[0]["queries"]:
        deltas = [
            b["queries"][q]["min"] - a["queries"][q]["min"]
            for a, b in zip(a_runs, b_runs)
        ]
        report[q] = {
            "a_min": min(a["queries"][q]["min"] for a in a_runs),
            "b_min": min(b["queries"][q]["min"] for b in b_runs),
            "paired_delta_median": round(statistics.median(deltas), 3),
            "deltas": [round(d, 3) for d in deltas],
            "a_jobs": a_runs[-1]["queries"][q].get("jobs"),
            "b_jobs": b_runs[-1]["queries"][q].get("jobs"),
            "a_tasks": a_runs[-1]["queries"][q].get("tasks"),
            "b_tasks": b_runs[-1]["queries"][q].get("tasks"),
        }
    total = round(sum(v["paired_delta_median"] for v in report.values()), 3)
    result = {"ref": args.ref, "rounds": args.rounds, "iters": args.iters,
              "queries": report, "total_paired_delta": total}
    path = os.path.join(REPO, "BENCH", f"ab_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
