"""SparkSession factory tuned for the CDC merge-apply workload.

Scale rationale (designed for a 1000-executor cluster, tested on local[N]):

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting —
  hot-repo event bursts (see sources/synth.py) produce skewed shuffle
  partitions that AQE re-splits.
- shuffle.partitions defaults to 2x cores locally; on a real cluster this is
  set per-job from input size (events_per_epoch / target_partition_rows).
- Arrow enabled: every Python-side stage is an Arrow-batched pandas UDF,
  never per-row Python (north-rule requirement; the reference's known scalar
  bottleneck was its per-row Pydantic loop, pandas_ops.py:108-121).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wage-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to 2x the local core count so the LWW
    argmax aggregation and the merge join both get map-side partials without
    tiny-partition overhead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] / local[*] -> N partitions-per-core heuristic
        inner = master[master.find("[") + 1 : master.rfind("]")] if "[" in master else str(cpus)
        cores = cpus if inner == "*" else int(inner)
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions by ADVISORY BYTES, not up to the
        # core count (guide §2.2: size partitions 100 MB-1 GB and let AQE
        # coalesce): with parallelismFirst (the Spark default) a KB-sized
        # shuffle still fans out to ~defaultParallelism reducers, so every
        # AQE stage of a small query pays ~64 task launches for microseconds
        # of work each. Advisory sizing is the scale policy, not a local
        # tune: big shuffles still get bytes/advisory reducers.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # let AQE re-optimize (and coalesce) INSIDE persisted plans too: the
        # LSH/ANN operators persist small intermediates, and with this off
        # every cache-build shuffle keeps all spark.sql.shuffle.partitions
        # reducers no matter how few bytes it carries
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # prefer shuffled-hash over sort-merge when a side's per-partition
        # build fits (optimization guide §3.1/§9): drops the two Sorts every
        # equi-join otherwise pays; join RESULTS are identical. The AQE
        # threshold additionally converts planned SMJs at runtime only when
        # every post-shuffle partition is small enough to hash-build, so the
        # choice is sized by the data, not by local-mode assumptions.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(128 * 1024 * 1024),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # deterministic parquet output (no task-attempt suffixed duplicates)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
