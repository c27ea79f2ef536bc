"""Last-writer-wins dedup — the engine's central operator.

Reimplements the reference's ``INSERT ... ON CONFLICT (natural key) DO UPDATE``
semantics (/root/reference/src/load/staging.py:50-59): among all change events
for one key, only the one with the greatest ``(commit, event_seq)`` survives.

Two physical strategies:

1. ``dedup_lww`` (default) — **argmax aggregation**:
   ``max(struct(ordering..., payload...))`` per key. Catalyst plans this as
   partial (map-side) + final HashAggregate, so duplicate-heavy keys collapse
   *before* the shuffle — at 10^10 events with hot-key bursts this moves a
   tiny fraction of the data a window sort would. Associativity also makes
   two-phase salting trivially correct for single-key hot spots.

2. ``dedup_lww_window`` — the textbook ``row_number() over (partition by key
   order by version desc) = 1``. Kept for parity testing and because it also
   returns losers (useful for audit); it full-sorts every key group, so it is
   the fallback, not the default.

Ordering contract: higher ``(commit, event_seq)`` wins; ties broken by
``tie_breaker`` (the merge stage passes is_source so re-applied epochs are
idempotent — equal versions resolve to the incoming row, matching the
reference's DO UPDATE last-writer behavior on re-runs, README.md:59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_lww(
    df: DataFrame,
    key_cols: list[str],
    ordering_cols: list[str],
    salt_buckets: int = 0,
    count_col: str | None = None,
) -> DataFrame:
    """Keep exactly the max-(ordering) row per key. Output columns == input
    columns (order preserved), plus ``count_col`` if requested.

    ``count_col`` adds the per-key event count to the same aggregate — one
    scan answers "winner + how many events", where a separate
    ``groupBy().count()`` would re-scan the input (a full extra pass at
    10^10 events). Counts are sum-combined in the salted second phase, so
    the option composes with skew salting.

    ``salt_buckets > 0`` adds a two-phase aggregation: phase 1 groups by
    (key, salt) where salt = hash of *all* ordering cols mod S — correct
    because argmax is associative — so a single pathological key (one file
    updated 10^7 times in an epoch) spreads across S reducers before the
    final per-key argmax. With salt_buckets=0 Catalyst's partial aggregation
    already handles garden-variety skew.

    When to salt (measured guidance, BENCH/BASELINE.md skew section): at
    sf0.1 with one key carrying 50% of 10M events, plain argmax beat
    salt_buckets=64 (3.10 s vs 4.71 s) — the map-side partial aggregate
    already collapses the hot key per input partition, and the extra
    shuffle round costs more than it saves. Salting only pays when a single
    key's POST-partial-aggregate volume still overwhelms one reducer, i.e.
    hot-key rows spread over more input partitions than a reducer can
    drain: as an order of magnitude, reach for salt_buckets only when one
    key exceeds ~10^8 events AND the job runs on hundreds of partitions;
    below that, leave it 0 and let AQE's skew-join/partial-agg path work.
    """
    payload = [c for c in df.columns if c not in key_cols]
    tail = [c for c in payload if c not in ordering_cols]
    ordered = F.struct(*[F.col(c) for c in ordering_cols], *[F.col(c) for c in tail])
    out_cols = list(df.columns) + ([count_col] if count_col else [])

    if salt_buckets > 0:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in ordering_cols]), F.lit(salt_buckets))
        partial_aggs = [F.max(ordered).alias("_w")]
        final_aggs = [F.max("_w").alias("_w")]
        if count_col:
            partial_aggs.append(F.count(F.lit(1)).alias("_n"))
            final_aggs.append(F.sum("_n").cast("long").alias(count_col))
        partial = (
            df.groupBy(*key_cols, salt.alias("_salt"))
            .agg(*partial_aggs)
            .drop("_salt")
        )
        winners = partial.groupBy(*key_cols).agg(*final_aggs)
    else:
        aggs = [F.max(ordered).alias("_w")]
        if count_col:
            aggs.append(F.count(F.lit(1)).cast("long").alias(count_col))
        winners = df.groupBy(*key_cols).agg(*aggs)

    return winners.select(
        *key_cols,
        *[F.col(f"_w.{c}").alias(c) for c in payload],
        *([count_col] if count_col else []),
    ).select(*out_cols)


def dedup_lww_window(
    df: DataFrame,
    key_cols: list[str],
    ordering_cols: list[str],
) -> DataFrame:
    """Window-based LWW (row_number == 1). Same result as ``dedup_lww`` when
    the ordering is a total order per key; used in tests as a cross-check."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in ordering_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
