"""sf1 scale-evidence run (one decade above the driver's sf0.1 bench).

The 10^10 design claims otherwise rest on sf0.1 measurements plus plan
arguments; this script adds the one-decade-up data point that tests the
curves:

1. CDC replay at 10x the bench stream (default 100M events, same synthetic
   profile as bench.py's headline stream), sha256-verified against the
   independent window-based reference replay — does merge-apply throughput
   hold at 10x volume / 10x keys?
2. The most expensive training-data queries (LSH dedup family + embedding
   join family) at a 10x corpus (50k docs / 20k vectors, synthesized by
   sources/synth_corpus.py with the driver tables' measured statistical
   shape — near-dup PAIR density per doc is scale-invariant, so pair
   counts must grow ~linearly, not quadratically). Reference walls for the
   same queries at sf0.1 are measured in the SAME session so the ratio is
   host-comparable. Reported per query: wall at both scales, output rows
   at both scales, wall ratio, rows ratio — plus the dedupe diagnostics
   that the round-4 verdict called out (dedup_clusters round count:
   O(log diameter) predicts it should NOT grow with n; the
   lsh_jaccard_verified broadcast byte-gate decision at each scale).

Writes BENCH/sf1_scale.json; bench.py's write_bench_md folds it into
BENCH/BASELINE.md so the evidence survives driver re-benches.

Env knobs: SF1_EVENTS (default 100_000_000), SF1_REF_EVENTS (10_000_000),
SF1_DOCS (50_000), SF1_VECS (20_000), SPARK_GRAFT_CPUS.

Run: python scripts/sf1_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 100M-event synthesis runs 32 concurrent parquet writer tasks (dynamic
# partition writer + row-group buffers); the engine default 8g heap OOMs —
# this run sizes the single local JVM like the multi-executor cluster it
# stands in for (the box has 125 GiB; data on tmpfs peaks ~25 GiB).
os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

import bench  # noqa: E402  (reuses synth/replay/verify harness + tmpfs config)

SF1_EVENTS = int(os.environ.get("SF1_EVENTS", "100000000"))
SF1_REF_EVENTS = int(os.environ.get("SF1_REF_EVENTS", "10000000"))
SF1_DOCS = int(os.environ.get("SF1_DOCS", "50000"))
SF1_VECS = int(os.environ.get("SF1_VECS", "20000"))
SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the expensive scale-sensitive queries (round-4 bench top of table), all
# reading only documents/embeddings — the two tables synth_corpus scales
QUERY_NAMES = [
    "dedup_exact",
    "minhash_lsh_pairs",
    "lsh_jaccard_verified",
    "simhash_near_dups",
    "dedup_clusters",
    "hyperplane_lsh_buckets",
    "embedding_cosine_dups",
    "embedding_cosine_dups_scaled",
    "embedding_ann_ivf",
]


def build_sf1_dir(spark, root: str) -> dict:
    """Copy the sf0.1 star tables, then overwrite documents/embeddings with
    the 10x synthesized versions. Returns build walls."""
    from wage_etl_spark.sources.synth_corpus import (
        synthesize_documents,
        synthesize_embeddings,
    )

    os.makedirs(root, exist_ok=True)
    for f in os.listdir(SF01_DIR):
        if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet"):
            shutil.copy(os.path.join(SF01_DIR, f), os.path.join(root, f))
    t0 = time.monotonic()
    synthesize_documents(spark, SF1_DOCS, partitions=bench.CPUS).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "documents.parquet"))
    t1 = time.monotonic()
    synthesize_embeddings(spark, SF1_VECS, partitions=bench.CPUS).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "embeddings.parquet"))
    return {
        "docs": SF1_DOCS,
        "vecs": SF1_VECS,
        "synth_docs_s": round(t1 - t0, 2),
        "synth_vecs_s": round(time.monotonic() - t1, 2),
    }


def _cosine_dups_scaled(spark, sf_dir):
    """Scale-sized IVF partition (cosine_near_dups_scaled): the remedy
    measurement paired with the fixed-10-label embedding_cosine_dups."""
    from wage_etl_spark.operators.similarity import cosine_near_dups_scaled

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_near_dups_scaled(emb, min_cosine=0.35, target_bucket_rows=256)


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as em
    from wage_etl_spark.operators import dedupe
    from wage_etl_spark.operators.caching import release_operator_caches

    qs = dict(em.queries())
    qs["embedding_cosine_dups_scaled"] = _cosine_dups_scaled
    out = {}
    for name in QUERY_NAMES:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.monotonic() - t0, 3)
        stats = {
            k: v
            for k, v in dedupe.LAST_RUN_STATS.items()
            if k in ("lsh_jaccard_verified", "dedup_clusters")
        } if name in ("lsh_jaccard_verified", "dedup_clusters") else None
        # rows via a second action (re-executes; cost not charged to wall)
        rows = qs[name](spark, sf_dir).count()
        release_operator_caches()
        dedupe.LAST_RUN_STATS.clear()
        out[name] = {"wall_s": wall, "rows": rows}
        if stats:
            out[name]["diagnostics"] = stats
        print(f"  {name}: {wall}s, {rows} rows", flush=True)
    return out


def _buckets_for(n_events: int) -> int:
    """Size the bucket count to the DATA, not the cores (the BASELINE.md
    partition-sizing rule): ~400k events per bucket keeps reducer memory
    flat as volume grows. A fixed bucket count at 10x volume makes each
    reducer 10x larger — measured: 100M events at 64 buckets ran at ~0.5x
    the warm 10M throughput purely from oversized reducers."""
    return max(2 * bench.CPUS, n_events // 400_000)


def run_cdc(spark, tmp: str, n_events: int, tag: str, n_runs: int = 1) -> dict:
    """Synthesize once, replay ``n_runs`` times (fresh warehouse each),
    sha256-verify the last, report the MEDIAN events/s with every raw
    number kept. Host CPU-steal noise on this VM is multiplicative and
    bursty (measured 5x spread across back-to-back identical 10M
    replays), and a dataset's FIRST replay ramps (JIT + shuffle
    machinery), so a single-run leg under-reads; both scale legs use the
    same repeated-replay methodology so the 10x/1x ratio is fair."""
    import statistics

    events_path = os.path.join(tmp, f"events_{tag}")
    t0 = time.monotonic()
    bench.synth_events_parquet(spark, events_path, n_events)
    synth_s = round(time.monotonic() - t0, 2)
    runs = []
    r: dict = {}
    try:
        for i in range(n_runs):
            wh = os.path.join(tmp, f"wh_{tag}{i}")
            try:
                r = bench.run_cdc_replay(
                    spark, events_path, wh,
                    num_buckets=_buckets_for(n_events),
                    verify=(i == n_runs - 1),
                )
            finally:
                shutil.rmtree(wh, ignore_errors=True)
            runs.append(r["events_per_sec"])
    finally:
        shutil.rmtree(events_path, ignore_errors=True)
    r["synth_s"] = synth_s
    r["num_buckets"] = _buckets_for(n_events)
    r["runs_events_per_sec"] = runs
    r["events_per_sec"] = round(statistics.median(runs), 1)
    print(f"  cdc {tag}: {r['events']:,} events, median {r['events_per_sec']:,} ev/s "
          f"over {runs}, verify_equal={r.get('verify_equal')} in {r.get('verify_s')}s",
          flush=True)
    return r


def main() -> None:
    from wage_etl_spark.session import get_spark

    spark = get_spark(
        app_name="sf1_scale",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=2 * bench.CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = bench._mkdtemp("sf1_scale_")
    result: dict = {
        "sf1_events": SF1_EVENTS,
        "ref_events": SF1_REF_EVENTS,
        "cpus": bench.CPUS,
        "content_max": bench.CONTENT_MAX,
    }
    # SF1_PHASE=cdc re-runs only the CDC legs and keeps the prior artifact's
    # query section (and vice versa for =queries) — each phase is an
    # independent measurement, so either can be refreshed alone
    phase = os.environ.get("SF1_PHASE", "all")
    prior_path = os.path.join(REPO, "BENCH", "sf1_scale.json")
    prior = {}
    if phase != "all" and os.path.exists(prior_path):
        with open(prior_path) as f:
            prior = json.load(f)
    try:
        if phase in ("all", "queries"):
            sf1_dir = os.path.join(tmp, "sf1")
            print("building sf1 corpus ...", flush=True)
            result["corpus"] = build_sf1_dir(spark, sf1_dir)

            # warmup (python workers / JIT) so sf0.1's first query isn't cold
            import __spark_entry__ as em

            em.queries()["dedup_exact"](spark, SF01_DIR).write.format("noop").mode(
                "overwrite"
            ).save()

            print("queries @ sf0.1 (same-session reference) ...", flush=True)
            q01 = run_queries(spark, SF01_DIR)
            print("queries @ sf1 (10x corpus) ...", flush=True)
            q1 = run_queries(spark, sf1_dir)
            result["queries"] = {
                name: {
                    "sf0.1": q01[name],
                    "sf1": q1[name],
                    "wall_ratio": round(q1[name]["wall_s"] / max(q01[name]["wall_s"], 1e-9), 2),
                    "rows_ratio": round(q1[name]["rows"] / max(q01[name]["rows"], 1), 2),
                }
                for name in QUERY_NAMES
            }
        else:
            # omit (rather than write null) when the prior artifact lacks the
            # section: bench.py's _sf1_section iterates s.get("queries", {})
            # and a present-but-null key would crash every BASELINE.md rebuild
            if prior.get("corpus") is not None:
                result["corpus"] = prior["corpus"]
            if prior.get("queries") is not None:
                result["queries"] = prior["queries"]
        if phase == "queries":
            for k in ("cdc_ref", "cdc_sf1", "cdc_throughput_ratio"):
                if k in prior:
                    result[k] = prior[k]

        if phase in ("all", "cdc"):
            # warm the replay path (JIT, python workers, shuffle machinery)
            # before the timed reference leg: the first replay in a session
            # runs ~3x slower than steady state (215k cold vs 719k warm on
            # the same 10M stream), which would overstate the 10x/1x ratio
            print("cdc warmup (1M events, untimed) ...", flush=True)
            run_cdc(spark, tmp, 1_000_000, "warm")
            print(f"cdc replay @ {SF1_REF_EVENTS:,} (same-session reference, "
                  f"median of 5) ...", flush=True)
            result["cdc_ref"] = run_cdc(spark, tmp, SF1_REF_EVENTS, "ref", n_runs=5)
            print(f"cdc replay @ {SF1_EVENTS:,} (median of 3) ...", flush=True)
            result["cdc_sf1"] = run_cdc(spark, tmp, SF1_EVENTS, "sf1", n_runs=3)
            result["cdc_throughput_ratio"] = round(
                result["cdc_sf1"]["events_per_sec"] / result["cdc_ref"]["events_per_sec"], 3
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "sf1_scale.json"), "w") as f:
        json.dump(result, f, indent=1)
    # the artifact is already on disk; keep the summary robust to partial
    # artifacts (e.g. SF1_PHASE=queries with no prior cdc section)
    print(json.dumps({
        "cdc_sf1_events_per_sec": (result.get("cdc_sf1") or {}).get("events_per_sec"),
        "cdc_ref_events_per_sec": (result.get("cdc_ref") or {}).get("events_per_sec"),
        "cdc_throughput_ratio": result.get("cdc_throughput_ratio"),
        "verify_equal": (result.get("cdc_sf1") or {}).get("verify_equal"),
        "detail": "BENCH/sf1_scale.json",
    }))


if __name__ == "__main__":
    main()
