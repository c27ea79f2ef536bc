"""spark-submit entry point.

Ship:
    python scripts/build_pyfiles.py              # -> dist/wage_etl_spark.zip
    spark-submit --py-files dist/wage_etl_spark.zip \
        $(python -c 'import wage_etl_spark, os; print(os.path.join(os.path.dirname(wage_etl_spark.__file__), "__main__.py"))') \
        --events /data/events --warehouse /lake/wh --num-buckets 4096

Or locally:
    python -m wage_etl_spark --events <parquet dir> --warehouse <dir>

Config precedence mirrors the reference's pydantic-settings layering
(/root/reference/config/settings.py:14-83): CLI flag > environment variable
(WAGE_ETL_*) > default.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def _env(name: str, default):
    return os.environ.get(f"WAGE_ETL_{name.upper()}", default)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wage_etl_spark", description="CDC replay into lake tables")
    p.add_argument("--events", default=_env("events", None), help="event-log parquet dir (with epoch column)")
    p.add_argument("--warehouse", default=_env("warehouse", None), help="lake warehouse dir")
    p.add_argument("--num-buckets", type=int, default=int(_env("num_buckets", 32)))
    p.add_argument("--salt-buckets", type=int, default=int(_env("salt_buckets", 0)))
    p.add_argument("--max-epochs", type=int, default=None, help="stop after N epochs (resume later)")
    p.add_argument("--dedup-strategy", choices=["auto", "broadcast", "shuffle"], default=_env("dedup_strategy", "auto"))
    p.add_argument("--master", default=_env("master", None), help="override master (default: env/spark-submit)")
    p.add_argument("--synth-events", type=int, default=None, help="generate a synthetic stream of N events instead of --events")
    p.add_argument("--verify", action="store_true", help="print per-key sha256 sample of final state")
    args = p.parse_args(argv)

    if not args.warehouse:
        p.error("--warehouse is required")
    if not args.events and not args.synth_events:
        p.error("one of --events / --synth-events is required")

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from wage_etl_spark.session import get_spark
    from wage_etl_spark.sources.events import EpochSource
    from wage_etl_spark.streaming.replay import ReplayConfig, open_tables, replay

    spark = get_spark(app_name="wage-etl-spark", master=args.master)
    if args.synth_events:
        from wage_etl_spark.sources.synth import synthesize_events

        src = EpochSource(synthesize_events(spark, n_events=args.synth_events))
    else:
        src = EpochSource.from_parquet(spark, args.events)

    cfg = ReplayConfig(
        warehouse=args.warehouse,
        num_buckets=args.num_buckets,
        salt_buckets=args.salt_buckets,
        max_epochs=args.max_epochs,
        dedup_strategy=args.dedup_strategy,
    )
    results = replay(spark, cfg, src)
    for r in results:
        print(json.dumps(r))

    if args.verify:
        target, dlq, manifest = open_tables(spark, cfg)
        for row in target.read().select("repo", "path", "content_sha256").limit(5).collect():
            print(json.dumps(row.asDict()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
