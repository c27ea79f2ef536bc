"""Epoch-replay orchestrator: exactly-once CDC apply with resume.

The top-level `replay()` is the analog of the reference's per-state pipeline
(/root/reference/main.py:32-135): for each commit epoch it validates, routes
rejects to the DLQ, LWW-dedups, MERGE-applies into the target LakeTable, and
finalizes the checkpoint manifest — in that order, because the manifest append
is the commit point.

Exactly-once protocol (SURVEY.md §7.2 step 6):
  - every snapshot a given epoch produces (DLQ append, target merge, manifest
    append) is tagged with properties={"epoch": e} (WAP-style).
  - resume: last committed epoch L = newest manifest summary row. Any DLQ /
    target snapshots tagged with epoch > L are orphans of a crashed epoch:
    roll both tables back to their newest snapshot with epoch <= L, then
    re-run from L+1. Re-running an epoch is deterministic (same winners, same
    bytes) so the observable final state equals an uninterrupted run.
"""

from __future__ import annotations

import datetime as _dt
import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from wage_etl_spark.lake.manifest import (
    commit_epoch, commit_epochs, create_manifest, epoch_status,
    last_committed_epoch, next_run_id,
)
from wage_etl_spark.lake.table import LakeTable, bucket_expr
from wage_etl_spark.operators.dedup_lww import dedup_lww
from wage_etl_spark.operators.merge import merge_apply
from wage_etl_spark.operators.validate import validate_events

log = logging.getLogger("wage_etl_spark.replay")

KEY_COLS = ["repo", "path"]
ORDERING_COLS = ["commit", "event_seq"]

TARGET_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("event_seq", LongType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
        StructField("content_sha256", StringType()),
        StructField("epoch", LongType()),
        StructField("run_id", LongType()),
        StructField("load_timestamp", TimestampType()),
    ]
)

DLQ_SCHEMA = StructType(
    [
        StructField("run_id", LongType()),
        StructField("raw_data", StringType()),
        StructField("rejection_reason", StringType()),
        StructField("reject_timestamp", TimestampType()),
        StructField("epoch", LongType()),
    ]
)


@dataclass
class ReplayConfig:
    warehouse: str
    num_buckets: int = 32
    salt_buckets: int = 0  # >0 enables two-phase salted LWW for hot keys
    max_epochs: int | None = None
    # winner-version sets up to this many keys are broadcast (slim-shuffle
    # dedup, no full-width shuffle); bigger epochs fall back to argmax
    broadcast_key_limit: int = 1_000_000
    # keep delete tombstones in the target (required when epochs/micro-
    # batches may arrive out of version order — a late lower-version event
    # must not resurrect a deleted key); readers filter is_deleted
    keep_tombstones: bool = False
    # "auto": count winner versions, broadcast if under the limit.
    # "broadcast": skip the decision count entirely — the version aggregate
    #   becomes a broadcast subquery inside the routing job (use when the
    #   per-epoch key cardinality is known to be small).
    # "shuffle": always use the argmax shuffle (the 10^10-key default).
    # "defer": do NOT dedup in the route job at all — stage every valid
    #   event and let MERGE's single-shuffle bucket-local sort resolve LWW
    #   (it dedups per key anyway). The route job becomes a pure
    #   scan+validate+write with zero shuffles, so each event moves through
    #   exactly ONE shuffle per epoch (the merge's). Best for low-duplicate
    #   streams; duplicate-heavy/hot-key epochs should prefer the argmax
    #   strategies, which collapse duplicates map-side before shuffling.
    # "fused": DENSE-epoch mode — ONE Spark job per epoch: current target
    #   state ∪ tagged events, one bucket repartition, bucket-local sorted
    #   LWW, one write partitioned by (route, bucket); DLQ adopts its files
    #   and the target adopts the stage files as a full copy-on-write state
    #   replacement. Halves the per-epoch fixed cost; every epoch rewrites
    #   the whole table, so use when epochs touch most buckets anyway.
    dedup_strategy: str = "auto"
    # auto bucket-spec evolution: after an epoch commits, if the largest
    # rewritten bucket exceeds this row count, the target is rebucketed to
    # 4x its current bucket count (LakeTable.rebucket) before the next
    # epoch — the layout grows with the table instead of being fixed at
    # bootstrap. None disables. Crash-safe: the rebucket snapshot carries
    # the already-committed epoch's tag, so rollback never drops it, and
    # replay() additionally checks the CURRENT snapshot's per-bucket row
    # counts at start-of-run (parquet footers, no Spark job), so a crash
    # between the manifest commit and the rebucket re-triggers it on resume
    # even if later epochs never rewrite the oversized bucket.
    rebucket_above_rows: int | None = None
    # fused-mode shuffle width: each bucket is sub-split into this many
    # key-pure salt partitions (salt = hash of the key, so LWW resolution
    # stays partition-local), widening the single fused stage from
    # num_buckets tasks to num_buckets*multiplier — a small-bucket-count
    # table no longer caps the job at num_buckets cores. The write stays
    # bucket-pure (multiplier files per bucket, adopted verbatim). None =
    # auto: fill the session's cores (defaultParallelism/num_buckets, <=8).
    fused_shuffle_multiplier: int | None = None
    # catch-up coalescing (fused strategy only): when the replay is more
    # than one epoch behind, apply up to this many consecutive pending
    # epochs in ONE fused job. Sound because the fused apply is monotone
    # max-version LWW — iterating it over epochs a..b equals one global
    # argmax over state ∪ all of a..b's events — so the chunk produces the
    # byte-identical final state; per-epoch events_in/quarantined metrics
    # are still recorded (source footers + a column-only read of the chunk's
    # DLQ output). The whole chunk commits atomically (one manifest append),
    # so the durability/resume granularity while catching up is the chunk,
    # not the epoch — live tailing (never behind) is unaffected. This is the
    # scale answer to the fixed ~0.5-1 s/job floor: a 10^4-epoch backlog is
    # 10^4/k jobs, not 10^4.
    catch_up_epochs: int = 1
    extra: dict = field(default_factory=dict)


def open_tables(spark: SparkSession, cfg: ReplayConfig) -> tuple[LakeTable, LakeTable, LakeTable]:
    target = LakeTable(spark, os.path.join(cfg.warehouse, "repo_code"))
    dlq = LakeTable(spark, os.path.join(cfg.warehouse, "dlq"))
    manifest = LakeTable(spark, os.path.join(cfg.warehouse, "manifest"))
    if not target.exists():
        target = LakeTable.create(
            spark, target.root, TARGET_SCHEMA, key_cols=KEY_COLS, num_buckets=cfg.num_buckets
        )
    if not dlq.exists():
        dlq = LakeTable.create(spark, dlq.root, DLQ_SCHEMA, key_cols=["epoch"], num_buckets=1)
    if not manifest.exists():
        manifest = create_manifest(spark, manifest.root)
    return target, dlq, manifest


def _rollback_orphans(table: LakeTable, last_epoch: int) -> None:
    """Drop snapshots from crashed (uncommitted) epochs."""
    cur = table.snapshot()
    cur_epoch = int(cur.properties.get("epoch", -1))
    if cur_epoch <= last_epoch:
        return
    good = table.latest_version_where(
        lambda p: int(p.get("epoch", -1)) <= last_epoch
    )
    if good is not None and good != cur.version:
        log.warning("rolling back %s to v%s (orphan epoch %s)", table.root, good, cur_epoch)
        table.rollback_to(good, properties={"epoch": str(last_epoch)})


def apply_epoch(
    spark: SparkSession,
    cfg: ReplayConfig,
    target: LakeTable,
    dlq: LakeTable,
    manifest: LakeTable,
    events: DataFrame,
    epoch: int,
    run_id: int,
    events_in: int | None = None,
) -> dict:
    """Validate -> route (DLQ | LWW winners) -> MERGE -> manifest, one epoch.

    ``events_in``: caller-known row count of ``events`` (e.g. from the epoch
    source's parquet footers). Only the fused path needs it — the routed
    path counts via a free Observation on its own scan.

    Physical strategy (scale rationale):

    1. A slim pre-pass aggregates ONLY ``(repo, path) -> max(commit,
       event_seq)`` over valid rows — the shuffle carries ~100 B/row instead
       of the full event (content is ~KB/row), so the only all-data shuffle
       of the naive plan disappears.
    2. If the winner-version set fits a broadcast
       (``cfg.broadcast_key_limit``), the routing pass is ONE full scan with
       a broadcast hash join and ZERO full-width shuffle: every row is either
       quarantined (-> DLQ route), the winner of its key (-> stage route), or
       dropped. Epochs touching more keys than the limit fall back to the
       argmax shuffle (``dedup_lww``), which is the 10^10-scale default.
    3. One parquet write, partitioned by route. The DLQ *adopts* its files
       (zero rewrite); the MERGE consumes the staged winners (tiny).
       Duplicate identical winners (idempotency fixture) are collapsed by the
       merge's own argmax, so no extra dedup pass is needed.

    Counters come from an ``Observation`` on the scan and from parquet
    footers — counting never re-scans, and nothing is ever read back from
    the DLQ (which grows with every epoch)."""
    if cfg.dedup_strategy == "fused":
        return _apply_epoch_fused(
            spark, cfg, target, dlq, manifest, events, epoch, run_id, events_in
        )
    import shutil
    import uuid as _uuid

    from pyspark.sql import Observation
    from pyspark.sql.functions import broadcast

    from wage_etl_spark.operators.validate import REASON_MAX_LEN, tag_events

    import time as _time

    spark_ = events.sparkSession
    start_ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    _t0 = _time.monotonic()
    _phase = {}

    def _mark(name):
        nonlocal _t0
        _phase[name] = round(_time.monotonic() - _t0, 3)
        _t0 = _time.monotonic()

    tagged = tag_events(events)
    is_bad = F.size("_violations") > 0
    obs = Observation()
    tagged = tagged.observe(
        obs,
        F.count(F.lit(1)).alias("events_in"),
        F.sum(is_bad.cast("long")).alias("n_q"),
    )

    # --- slim winner-version pre-pass (no content in the shuffle) ---------
    versions = (
        tagged.filter(~is_bad)
        .select(*KEY_COLS, F.struct(*[F.col(c) for c in ORDERING_COLS]).alias("_v"))
        .groupBy(*KEY_COLS)
        .agg(F.max("_v").alias("_v"))
        .select(
            *[F.col(k).alias(f"_k_{k}") for k in KEY_COLS],
            *[F.col(f"_v.{c}").alias(f"_w_{c}") for c in ORDERING_COLS],
        )
    )
    if cfg.dedup_strategy == "broadcast":
        use_broadcast = True
    elif cfg.dedup_strategy in ("shuffle", "defer"):
        use_broadcast = False
    else:  # auto: pay one slim counting pass to pick the physical strategy
        versions = versions.persist()
        use_broadcast = versions.count() <= cfg.broadcast_key_limit

    raw_json = F.to_json(
        F.struct(*[F.col(c) for c in events.columns]), {"ignoreNullFields": "false"}
    )
    if use_broadcast:
        # winner iff its (commit, event_seq) equals the key's max version
        join_cond = None
        for k in KEY_COLS:
            c = F.col(k) == F.col(f"_k_{k}")
            join_cond = c if join_cond is None else (join_cond & c)
        for oc in ORDERING_COLS:
            join_cond = join_cond & (F.col(oc) == F.col(f"_w_{oc}"))
        joined = tagged.join(broadcast(versions), on=join_cond, how="left")
        is_winner = ~is_bad & F.col(f"_k_{KEY_COLS[0]}").isNotNull()
        routed_src = joined.withColumn(
            "_route",
            F.when(is_bad, F.lit("dlq")).when(is_winner, F.lit("stage")),
        ).filter(F.col("_route").isNotNull())
    elif cfg.dedup_strategy == "defer":
        # no route-side dedup: stage every valid event; MERGE's bucket-local
        # sort resolves LWW per key. Route job = scan+validate+write, ZERO
        # shuffles — each event crosses exactly one shuffle (the merge's).
        routed_src = tagged.withColumn(
            "_route", F.when(is_bad, F.lit("dlq")).otherwise(F.lit("stage"))
        )
    else:
        # 10^10-scale fallback: full argmax shuffle; quarantined rows ride
        # through under a unique synthetic key
        keyed = tagged.withColumn(
            "_qid", F.when(is_bad, F.monotonically_increasing_id())
        )
        winners = dedup_lww(
            keyed, [*KEY_COLS, "_qid"], ORDERING_COLS, salt_buckets=cfg.salt_buckets
        )
        routed_src = winners.withColumn(
            "_route",
            F.when(F.size("_violations") > 0, F.lit("dlq")).otherwise(F.lit("stage")),
        )

    payload_cols = [c for c in events.columns if c != "epoch"]
    routed = routed_src.select(
        "_route",
        *[F.col(c) for c in payload_cols],
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.lit(epoch).cast("long").alias("epoch"),
        F.lit(run_id).cast("long").alias("run_id"),
        F.current_timestamp().alias("load_timestamp"),
        F.when(is_bad, raw_json).alias("raw_data"),
        F.substring(F.concat_ws(";", "_violations"), 1, REASON_MAX_LEN).alias("rejection_reason"),
        F.current_timestamp().alias("reject_timestamp"),
    )
    # the merge learns the winners' touched-bucket set from an Observation
    # on this same write job — no per-epoch probe job over the staged files
    tsnap = target.snapshot()
    obs_buckets = Observation()
    routed = routed.observe(
        obs_buckets,
        F.collect_set(
            F.when(
                F.col("_route") == "stage",
                bucket_expr(tsnap.key_cols, tsnap.num_buckets),
            )
        ).alias("touched"),
    )
    epoch_tmp = os.path.join(cfg.warehouse, "_epoch_tmp", _uuid.uuid4().hex)
    try:
        _mark("plan")
        routed.write.mode("overwrite").partitionBy("_route").parquet(epoch_tmp)
        _mark("route_write")
        if cfg.dedup_strategy == "auto":
            versions.unpersist()
        events_in = int(obs.get["events_in"])
        n_quarantined = int(obs.get["n_q"] or 0)
        n_valid = events_in - n_quarantined

        # DLQ: adopt the route=dlq files verbatim (they carry a superset of
        # the DLQ schema; reads project the table schema)
        dlq_dir = os.path.join(epoch_tmp, "_route=dlq")
        dlq_files = (
            [os.path.join(dlq_dir, f) for f in sorted(os.listdir(dlq_dir)) if f.endswith(".parquet")]
            if os.path.isdir(dlq_dir)
            else []
        )
        dlq.adopt_files(dlq_files, properties={"epoch": str(epoch)}) if dlq_files else dlq._commit(
            dlq.snapshot().files, dlq.snapshot().schema, "append-noop", {"epoch": str(epoch)}
        )
        _mark("dlq")

        # MERGE: consume the staged winners (already deduped and tiny);
        # touched buckets come from the route job's Observation
        stage_dir = os.path.join(epoch_tmp, "_route=stage")
        merge_cols = [*payload_cols, "content_sha256", "epoch", "run_id", "load_timestamp"]
        touched = sorted(int(b) for b in (obs_buckets.get["touched"] or []))
        if touched:
            import pyarrow.parquet as _pq

            # epoch-sourced row count from footers (no extra Spark job)
            rows_loaded = sum(
                _pq.ParquetFile(os.path.join(stage_dir, f)).metadata.num_rows
                for f in os.listdir(stage_dir)
                if f.endswith(".parquet")
            )
            staged = spark_.read.parquet(stage_dir).select(*merge_cols)
        else:
            rows_loaded = 0
            staged = spark_.createDataFrame([], tagged.select(*payload_cols).schema).selectExpr(
                "*", "cast(null as string) content_sha256",
                "cast(null as long) epoch", "cast(null as long) run_id",
                "cast(null as timestamp) load_timestamp",
            )
        snap, rows_written, bucket_counts = merge_apply(
            target, staged, ordering_cols=ORDERING_COLS, op_col="op",
            properties={"epoch": str(epoch)}, stage_source=False,
            tombstones=cfg.keep_tombstones, touched_buckets=touched,
        )
        _mark("merge")
    finally:
        shutil.rmtree(epoch_tmp, ignore_errors=True)
        _mark("cleanup")

    status = epoch_status(events_in, n_valid, n_quarantined)
    end_ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    commit_epoch(
        manifest,
        epoch=epoch, run_id=run_id, status=status, events_in=events_in,
        rows_merged=rows_written, rows_loaded=rows_loaded, rows_quarantined=n_quarantined,
        snapshot_id=snap.version, start_ts=start_ts, end_ts=end_ts,
        partition_counts={int(b): c for b, c in bucket_counts.items()},
    )
    _mark("manifest")
    log.debug("epoch %s phases: %s", epoch, _phase)
    return {
        "epoch": epoch, "status": status, "events_in": events_in,
        "valid": n_valid, "quarantined": n_quarantined,
        "rows_written": rows_written, "snapshot": snap.version,
        "max_bucket_rows": max(bucket_counts.values(), default=0),
        "phases": _phase,
    }


def _fused_plan_pieces(
    cfg: ReplayConfig,
    target: LakeTable,
    events: DataFrame,
    snap,
    mult: int,
) -> dict:
    """Build every epoch-invariant plan piece for the fused apply ONCE.

    Column / WindowSpec construction is Py4J-chatty: profiling showed
    ~0.4-0.5 s PER EPOCH of pure driver-side expression building (40+
    cast/alias columns x several selects), a fixed floor that dominates
    small epochs. Everything here depends only on (events schema, table
    schema, bucket spec, tombstone mode) — the cache key in
    ``_apply_epoch_fused`` — so a 16-epoch replay builds it once. Column
    objects are unresolved expression trees bound to names, not to a
    DataFrame, so reuse across epochs is sound."""
    from pyspark.sql.window import Window

    from wage_etl_spark.operators.validate import REASON_MAX_LEN, violation_rules
    from wage_etl_spark.plans.partitioning import exact_partition_column

    key_cols = snap.key_cols
    P: dict = {}
    has_content = "content" in events.columns
    P["violations"] = F.array_compact(
        F.array(
            *[
                F.when(~passes, F.lit(reason))
                for reason, passes in violation_rules(has_content=has_content)
            ]
        )
    )
    is_bad = F.size("_violations") > 0

    payload_cols = [c for c in events.columns if c != "epoch"]
    stage_payload_cols = [c for c in payload_cols if c != "op"]
    raw_json = F.to_json(
        F.struct(*[F.col(c) for c in events.columns]), {"ignoreNullFields": "false"}
    )
    probe = events.select(*stage_payload_cols).selectExpr(
        "*",
        "cast(null as string) content_sha256",
        "cast(null as long) epoch",
        "cast(null as long) run_id",
        "cast(null as timestamp) load_timestamp",
    )
    align_schema, _, _ = target._merged_schema(probe)

    DLQ_EXTRAS = ["raw_data", "rejection_reason", "reject_timestamp"]
    P["dlq_extras"] = DLQ_EXTRAS

    # events side: both routes; quarantined rows get a unique synthetic key
    ev_head = [
        F.when(is_bad, F.lit("dlq")).otherwise(F.lit("stage")).alias("_route"),
        *[F.col(c) for c in stage_payload_cols],
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    ]
    ev_tail = [
        F.current_timestamp().alias("load_timestamp"),
        F.when(is_bad, raw_json).alias("raw_data"),
        F.substring(F.concat_ws(";", "_violations"), 1, REASON_MAX_LEN).alias(
            "rejection_reason"
        ),
        F.current_timestamp().alias("reject_timestamp"),
        F.when(is_bad, F.monotonically_increasing_id()).alias("_qid"),
        F.lit(1).alias("_is_source"),
        (F.col("op") if "op" in events.columns else F.lit("U")).alias("_op"),
    ]

    # per-event epoch attribution: when the events carry an epoch column
    # (replay sources; always equal to the applied epoch in single-epoch
    # mode) the output rows keep THEIR event's epoch — required for chunked
    # catch-up, a no-op otherwise. Streaming micro-batches drop the column
    # and fall back to the literal batch id.
    has_epoch_col = "epoch" in events.columns

    def ev_cols(epoch: int, run_id: int) -> list:
        epoch_col = F.col("epoch") if has_epoch_col else F.lit(epoch)
        return [
            *ev_head,
            epoch_col.cast("long").alias("epoch"),
            F.lit(run_id).cast("long").alias("run_id"),
            *ev_tail,
        ]

    P["ev_cols"] = ev_cols

    # target side: current state re-enters the LWW resolution as is_source=0
    t_names = [f.name for f in snap.schema.fields]
    target_op = (
        F.when(F.coalesce(F.col("is_deleted"), F.lit(False)), F.lit("D")).otherwise(
            F.lit("U")
        )
        if "is_deleted" in t_names
        else F.lit("U")
    )
    P["t_cols"] = [
        F.lit("stage").alias("_route"),
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in t_names
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in align_schema.fields
        ],
        *[F.lit(None).cast("string").alias(c) for c in ("raw_data", "rejection_reason")],
        F.lit(None).cast("timestamp").alias("reject_timestamp"),
        F.lit(None).cast("long").alias("_qid"),
        F.lit(0).alias("_is_source"),
        target_op.alias("_op"),
    ]
    # align events side to the evolved schema column order
    ev_names = {"_route", *stage_payload_cols, "content_sha256", "epoch", "run_id",
                "load_timestamp", *DLQ_EXTRAS, "_qid", "_is_source", "_op"}
    P["ev_align_cols"] = [
        "_route",
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in ev_names
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in align_schema.fields
        ],
        *DLQ_EXTRAS, "_qid", "_is_source", "_op",
    ]

    # THE shuffle: one collision-free bucket repartition; winners via
    # bucket-local sort+lag (same tie order as the merge)
    ordering_ext = [*ORDERING_COLS, "_is_source"]
    tail = [
        f.name for f in align_schema.fields
        if f.name not in key_cols and f.name not in ordering_ext
    ]
    P["bucket_col"] = bucket_expr(key_cols, snap.num_buckets)
    combo = F.col("_b")
    if mult > 1:
        P["salt_col"] = F.pmod(
            F.xxhash64(*[F.col(c) for c in key_cols], F.lit(0x5417)), F.lit(mult)
        ).cast("int")
        combo = F.col("_b") * mult + F.col("_salt")
    P["pt_col"] = exact_partition_column(combo, snap.num_buckets * mult)
    w = Window.partitionBy("_pt").orderBy(
        *[F.col(c).asc() for c in key_cols],
        F.col("_qid").asc(),
        *[F.col(c).desc() for c in ordering_ext],
        *[F.col(c).desc() for c in tail],
    )
    group = F.struct(*[F.col(c) for c in key_cols], F.col("_qid"))
    P["keep_col"] = ~F.lag(group).over(w).eqNullSafe(group)

    schema = align_schema
    if cfg.keep_tombstones and "is_deleted" not in [f.name for f in schema.fields]:
        from pyspark.sql.types import BooleanType, StructField, StructType

        schema = StructType(list(schema.fields) + [StructField("is_deleted", BooleanType())])
    P["schema"] = schema
    P["tombstone_col"] = F.when(F.col("_route") == "stage", F.col("_op") == "D")
    return P


def _apply_epoch_fused(
    spark: SparkSession,
    cfg: ReplayConfig,
    target: LakeTable,
    dlq: LakeTable,
    manifest: LakeTable,
    events: DataFrame,
    epoch: int,
    run_id: int,
    events_in: int | None = None,
    chunk: list[int] | None = None,
    events_in_by_epoch: dict[int, int] | None = None,
) -> dict:
    """DENSE-epoch apply: ONE Spark job per epoch.

    When an epoch touches most buckets anyway (high key cardinality vs
    bucket count — true for frequent small commit epochs over a hot
    keyspace), bucket pruning buys nothing and the two-job shape (route
    write + merge) pays its fixed cost twice. This mode unions the CURRENT
    target state with the epoch's tagged events, repartitions ONCE on the
    bucket id, resolves LWW winners with the same bucket-local sort the
    merge uses, and writes a single output partitioned by (route, bucket):
    the DLQ adopts its files, the target adopts the stage files as a full
    copy-on-write state replacement (``overwrite_with_files``). Identical
    snapshot/manifest exactly-once protocol — old files stay on disk, so
    rollback and resume are unchanged.

    Trade-off vs the default two-job shape: every epoch rewrites the whole
    table, so this is for dense epochs (bench multi-epoch profile, small
    hot tables); sparse epochs over huge tables want the pruned merge.

    Catch-up chunks: with ``chunk=[a..b]`` the SAME plan applies all of the
    range's events at once (``events`` = the range scan, rows keeping their
    own epoch). Equivalence: this apply is monotone max-version LWW, so
    iterating it per epoch and running it once over the union both yield the
    per-key global argmax — identical final bytes. Per-epoch metrics come
    from ``events_in_by_epoch`` (source footers) and a column-only pyarrow
    read of the chunk's DLQ files; the manifest records every epoch in ONE
    atomic append (commit_epochs)."""
    import shutil
    import time as _time
    import uuid as _uuid

    spark_ = events.sparkSession
    start_ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    _t0 = _time.monotonic()
    _phase = {}

    def _mark(name):
        nonlocal _t0
        _phase[name] = round(_time.monotonic() - _t0, 3)
        _t0 = _time.monotonic()

    snap = target.snapshot()
    if snap.renames:
        raise ValueError("fused apply does not support renamed columns")

    # shuffle width: sub-split each bucket into key-pure salt partitions so
    # the single fused stage runs num_buckets*mult tasks instead of being
    # capped at num_buckets — the salt is a hash OF THE KEY (decorrelated
    # from the bucket hash by a constant), so every key's rows still land in
    # exactly one partition and the bucket-local LWW sort stays correct; the
    # write stays bucket-pure with mult files per bucket.
    mult = cfg.fused_shuffle_multiplier
    if mult is None:
        mult = max(1, min(8, spark.sparkContext.defaultParallelism // snap.num_buckets))

    # Plan-piece cache (see _fused_plan_pieces): every expression below
    # depends only on this key, so a multi-epoch replay pays the Py4J-heavy
    # Column construction once, not per epoch. Schema evolution (a later
    # epoch adding columns, or the first fused commit widening the target)
    # changes the key and rebuilds.
    cache_key = (
        tuple((f.name, str(f.dataType)) for f in events.schema.fields),
        tuple((f.name, str(f.dataType)) for f in snap.schema.fields),
        tuple(snap.key_cols),
        snap.num_buckets,
        bool(cfg.keep_tombstones),
        mult,
    )
    if cfg.extra.get("_fused_plan_key") != cache_key:
        cfg.extra["_fused_plan"] = _fused_plan_pieces(cfg, target, events, snap, mult)
        cfg.extra["_fused_plan_key"] = cache_key
    P = cfg.extra["_fused_plan"]
    schema = P["schema"]

    tagged = events.withColumn("_violations", P["violations"])
    # counters WITHOUT an Observation: Observation.get deadlocks inside a
    # foreachBatch micro-batch (the listener event for the nested batch
    # action never fires), and fused runs under the streaming front-end
    # too. events_in comes from the caller when the epoch source knows it
    # from parquet footers (EpochSource.epoch_rows — zero jobs), else from
    # a metadata-only count (row-group footers, no data read); quarantined
    # comes from the DLQ output files' footers.
    if chunk is not None and events_in_by_epoch is None:
        # one slim agg job (epoch column only) when the source can't provide
        # footer counts for the range
        events_in_by_epoch = {
            int(r["epoch"]): int(r["n"])
            for r in events.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for e in chunk:
            events_in_by_epoch.setdefault(e, 0)
    if events_in is None:
        events_in = (
            sum(events_in_by_epoch.values()) if chunk is not None else events.count()
        )

    # events side (both routes) aligned to the evolved schema column order;
    # target side: current state re-enters the LWW resolution as is_source=0
    ev_side = tagged.select(*P["ev_cols"](epoch, run_id)).select(*P["ev_align_cols"])
    t_side = target.read().select(*P["t_cols"])
    unioned = t_side.unionByName(ev_side)

    # THE shuffle: one collision-free bucket repartition (combo i -> reducer
    # i exactly, plans/partitioning.py — a raw repartition on the combo hash
    # leaves ~1/e of the reducers empty); winners via bucket-local sort+lag
    # (same tie order as the merge: ordering desc, is_source desc, tail
    # desc). The window partitions by the token (a bijection of the combo),
    # so no second exchange is added.
    bucketed = unioned.withColumn("_b", P["bucket_col"])
    if mult > 1:
        bucketed = bucketed.withColumn("_salt", P["salt_col"])
    bucketed = bucketed.withColumn("_pt", P["pt_col"]).repartition(
        snap.num_buckets * mult, "_pt"
    )
    merged = (
        bucketed.withColumn("_keep", P["keep_col"])
        .filter(F.col("_keep"))
        .drop("_keep")
    )
    if cfg.keep_tombstones:
        merged = merged.withColumn("is_deleted", P["tombstone_col"])
    else:
        merged = merged.filter((F.col("_route") == "dlq") | (F.col("_op") != "D"))
    result = merged.drop("_qid", "_is_source", "_op", "_salt", "_pt")

    epoch_tmp = os.path.join(cfg.warehouse, "_epoch_tmp", _uuid.uuid4().hex)
    try:
        _mark("plan")
        result.write.mode("overwrite").partitionBy("_route", "_b").parquet(epoch_tmp)
        _mark("fused_write")

        def _bucket_files(route: str) -> dict[str, list[str]]:
            rdir = os.path.join(epoch_tmp, f"_route={route}")
            out: dict[str, list[str]] = {}
            if os.path.isdir(rdir):
                for bdir in sorted(os.listdir(rdir)):
                    if not bdir.startswith("_b="):
                        continue
                    b = str(int(bdir.split("=")[1]))
                    out[b] = [
                        os.path.join(rdir, bdir, f)
                        for f in sorted(os.listdir(os.path.join(rdir, bdir)))
                        if f.endswith(".parquet")
                    ]
            return out

        dlq_files = [p for fs in _bucket_files("dlq").values() for p in fs]
        # quarantine count from the DLQ files' parquet footers (no job)
        import pyarrow.parquet as _pq

        n_quarantined = sum(_pq.ParquetFile(p).metadata.num_rows for p in dlq_files)
        n_valid = events_in - n_quarantined
        q_by_epoch: dict[int, int] = {}
        if chunk is not None:
            # per-epoch DLQ attribution: a column-only read of the chunk's
            # DLQ output (8 B x quarantined rows, never the payload)
            import pyarrow.compute as _pc

            q_by_epoch = {e: 0 for e in chunk}
            for p in dlq_files:
                vc = _pc.value_counts(
                    _pq.read_table(p, columns=["epoch"]).column("epoch")
                )
                for item in vc:
                    e = int(item["values"].as_py())
                    q_by_epoch[e] = q_by_epoch.get(e, 0) + int(item["counts"].as_py())
        if dlq_files:
            dlq.adopt_files(dlq_files, properties={"epoch": str(epoch)})
        else:
            dlq._commit(
                dlq.snapshot().files, dlq.snapshot().schema, "append-noop",
                {"epoch": str(epoch)},
            )
        _mark("dlq")

        stage_by_bucket = _bucket_files("stage")
        new_snap = target.overwrite_with_files(
            stage_by_bucket, schema=schema, properties={"epoch": str(epoch)}
        )
        bucket_counts = target.file_row_counts(new_snap.files)
        rows_written = sum(bucket_counts.values())
        _mark("adopt")
    finally:
        shutil.rmtree(epoch_tmp, ignore_errors=True)

    end_ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    if chunk is not None:
        per_epoch = []
        for e in chunk:
            ein = int(events_in_by_epoch.get(e, 0))
            q = int(q_by_epoch.get(e, 0))
            per_epoch.append(
                dict(
                    epoch=e, status=epoch_status(ein, ein - q, q), events_in=ein,
                    rows_merged=rows_written if e == chunk[-1] else None,
                    rows_loaded=ein - q, rows_quarantined=q,
                )
            )
        commit_epochs(
            manifest, per_epoch=per_epoch, run_id=run_id,
            snapshot_id=new_snap.version, start_ts=start_ts, end_ts=end_ts,
            partition_counts={int(b): c for b, c in bucket_counts.items()},
        )
        _mark("manifest")
        log.debug("epochs %s fused-chunk phases: %s", chunk, _phase)
        return {
            "epoch": epoch, "epochs": list(chunk), "per_epoch": per_epoch,
            "status": per_epoch[-1]["status"], "events_in": events_in,
            "valid": n_valid, "quarantined": n_quarantined,
            "rows_written": rows_written, "snapshot": new_snap.version,
            "max_bucket_rows": max(bucket_counts.values(), default=0),
            "phases": _phase,
        }
    status = epoch_status(events_in, n_valid, n_quarantined)
    commit_epoch(
        manifest,
        epoch=epoch, run_id=run_id, status=status, events_in=events_in,
        rows_merged=rows_written, rows_loaded=n_valid, rows_quarantined=n_quarantined,
        snapshot_id=new_snap.version, start_ts=start_ts, end_ts=end_ts,
        partition_counts={int(b): c for b, c in bucket_counts.items()},
    )
    _mark("manifest")
    log.debug("epoch %s fused phases: %s", epoch, _phase)
    return {
        "epoch": epoch, "status": status, "events_in": events_in,
        "valid": n_valid, "quarantined": n_quarantined,
        "rows_written": rows_written, "snapshot": new_snap.version,
        "max_bucket_rows": max(bucket_counts.values(), default=0),
        "phases": _phase,
    }


def replay(spark: SparkSession, cfg: ReplayConfig, source) -> list[dict]:
    """Replay all epochs from the source, resuming after the last committed
    epoch. ``source`` is a sources.events.EpochSource (or anything with
    ``max_epoch()`` and ``epoch(e)``)."""
    target, dlq, manifest = open_tables(spark, cfg)
    last = last_committed_epoch(manifest)
    _rollback_orphans(target, last)
    _rollback_orphans(dlq, last)
    run_id = next_run_id(manifest)

    # Start-of-run rebucket check (round-3 ADVICE): the per-epoch trigger
    # below only sees the buckets the epoch just rewrote, so a crash between
    # the manifest commit and the rebucket — or an oversized UNTOUCHED bucket
    # — would otherwise never re-trigger. One driver-side footer read over
    # the current snapshot (no Spark job) closes both gaps.
    if cfg.rebucket_above_rows and target.snapshot().files:
        counts = target.file_row_counts(target.snapshot().files)
        if counts and max(counts.values()) > cfg.rebucket_above_rows:
            nb = target.snapshot().num_buckets * 4
            log.info(
                "resume: bucket over %s rows in current snapshot — "
                "rebucketing to %s before replay", cfg.rebucket_above_rows, nb,
            )
            target.rebucket(nb, properties={"epoch": str(last)})

    results = []
    stop = source.max_epoch()
    if cfg.max_epochs is not None:
        stop = min(stop, last + cfg.max_epochs)
    import time as _time

    known_rows = getattr(source, "epoch_rows", None)
    chunk_size = max(1, int(cfg.catch_up_epochs or 1))
    e = last + 1
    while e <= stop:
        _t0 = _time.monotonic()
        b = min(e + chunk_size - 1, stop)
        if b > e and cfg.dedup_strategy == "fused" and hasattr(source, "epochs"):
            chunk = list(range(e, b + 1))
            counts: dict[int, int] | None = {}
            for ce in chunk:
                c = known_rows(ce) if known_rows else None
                if c is None:
                    counts = None
                    break
                counts[ce] = c
            res = _apply_epoch_fused(
                spark, cfg, target, dlq, manifest, source.epochs(e, b),
                chunk[-1], run_id, events_in=None, chunk=chunk,
                events_in_by_epoch=counts,
            )
        else:
            res = apply_epoch(
                spark, cfg, target, dlq, manifest, source.epoch(e), e, run_id,
                events_in=known_rows(e) if known_rows else None,
            )
        res["epoch_wall_s"] = round(_time.monotonic() - _t0, 3)
        log.info("epoch %s: %s", res.get("epochs", e), res)
        results.append(res)
        committed = res["epochs"][-1] if "epochs" in res else e
        if (
            cfg.rebucket_above_rows
            and res.get("max_bucket_rows", 0) > cfg.rebucket_above_rows
        ):
            nb = target.snapshot().num_buckets * 4
            log.info(
                "epoch %s: bucket grew past %s rows — rebucketing to %s",
                committed, cfg.rebucket_above_rows, nb,
            )
            target.rebucket(nb, properties={"epoch": str(committed)})
            res["rebucketed_to"] = nb
        e = committed + 1
    return results


def reference_state(events: DataFrame) -> DataFrame:
    """Independent Spark-side reference replay for large-scale verification:
    global LWW via the *window* implementation (a different code path from
    the argmax + copy-on-write merge the engine uses), valid events only,
    final op D means the key is absent. Returns (repo, path, content_sha256).

    Semantics note: global LWW equals epoch-by-epoch replay whenever versions
    are non-decreasing across epochs or tombstones are kept — both hold for
    the bench stream (one epoch) and the keep_tombstones mode."""
    from wage_etl_spark.operators.dedup_lww import dedup_lww_window
    from wage_etl_spark.operators.validate import tag_events

    valid = tag_events(events).filter(F.size("_violations") == 0).drop("_violations")
    winners = dedup_lww_window(valid, KEY_COLS, ORDERING_COLS)
    return winners.filter(F.col("op") != "D").select(
        *KEY_COLS, F.sha2(F.col("content"), 256).alias("content_sha256")
    )


def verify_state(
    spark: SparkSession,
    target: LakeTable,
    oracle,
    max_diff: int = 1000,
) -> dict:
    """Per-row sha256(content) equality vs an oracle replay (BASELINE.json
    invariant). ``oracle`` is either a DataFrame (repo, path, content_sha256)
    — the scale path, e.g. ``reference_state(events)`` — or a small dict
    mapping (repo, path) -> sha256 hex (test convenience; materialized into a
    DataFrame).

    The comparison is DISTRIBUTED: a null-safe full-outer join on the key,
    one aggregate for the counts, and a bounded ``limit(max_diff)`` collect
    of the differing keys only. The driver never holds the table — at the
    10^10-key design scale the old collect-both-sides approach is a driver
    OOM; this plan shuffles (key, 32-byte sha) pairs only."""
    df = target.read()
    if "is_deleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("is_deleted"), F.lit(False)))
    eng = df.select(
        *KEY_COLS, F.col("content_sha256").alias("_e_sha"), F.lit(True).alias("_in_e")
    )
    if isinstance(oracle, DataFrame):
        odf = oracle.select(
            *KEY_COLS, F.col("content_sha256").alias("_o_sha"), F.lit(True).alias("_in_o")
        )
    else:
        odf = spark.createDataFrame(
            [(k[0], k[1], v) for k, v in oracle.items()],
            "repo string, path string, _o_sha string",
        ).withColumn("_in_o", F.lit(True))

    # eqNullSafe per key column (a plain equality join would report a
    # null-keyed row as one missing + one extra instead of matched); the
    # key columns are coalesced back to single output columns afterwards
    eng = eng.alias("e")
    odf = odf.alias("o")
    cond = None
    for k in KEY_COLS:
        c = F.col(f"e.{k}").eqNullSafe(F.col(f"o.{k}"))
        cond = c if cond is None else (cond & c)
    joined = eng.join(odf, cond, "full_outer").select(
        *[F.coalesce(F.col(f"e.{k}"), F.col(f"o.{k}")).alias(k) for k in KEY_COLS],
        "_e_sha", "_in_e", "_o_sha", "_in_o",
    )
    is_missing = F.col("_in_e").isNull()
    is_extra = F.col("_in_o").isNull()
    is_mismatch = (
        F.col("_in_e").isNotNull()
        & F.col("_in_o").isNotNull()
        & ~F.col("_e_sha").eqNullSafe(F.col("_o_sha"))
    )
    joined = joined.persist()
    try:
        agg = joined.agg(
            F.count("_in_e").alias("engine_rows"),
            F.count("_in_o").alias("oracle_rows"),
            F.sum(is_missing.cast("long")).alias("n_missing"),
            F.sum(is_extra.cast("long")).alias("n_extra"),
            F.sum(is_mismatch.cast("long")).alias("n_mismatched"),
        ).collect()[0]
        n_missing = int(agg["n_missing"] or 0)
        n_extra = int(agg["n_extra"] or 0)
        n_mismatched = int(agg["n_mismatched"] or 0)
        engine_rows = int(agg["engine_rows"] or 0)
        oracle_rows = int(agg["oracle_rows"] or 0)
        missing: dict = {}
        extra: dict = {}
        mismatched: dict = {}
        if n_missing or n_extra or n_mismatched:
            diffs = (
                joined.filter(is_missing | is_extra | is_mismatch)
                .select(*KEY_COLS, "_e_sha", "_o_sha", "_in_e", "_in_o")
                .limit(max_diff)
                .collect()
            )
            for r in diffs:
                key = tuple(r[k] for k in KEY_COLS)
                if r["_in_e"] is None:
                    missing[key] = r["_o_sha"]
                elif r["_in_o"] is None:
                    extra[key] = r["_e_sha"]
                else:
                    mismatched[key] = (r["_o_sha"], r["_e_sha"])
    finally:
        joined.unpersist()
    return {
        # engine_rows == oracle_rows also guards duplicate engine keys (a
        # dup with an equal sha matches row-by-row but inflates the count)
        "equal": not (n_missing or n_extra or n_mismatched) and engine_rows == oracle_rows,
        "engine_rows": engine_rows,
        "oracle_rows": oracle_rows,
        "n_missing": n_missing,
        "n_extra": n_extra,
        "n_mismatched": n_mismatched,
        "missing": missing,
        "extra": extra,
        "mismatched": mismatched,
    }
