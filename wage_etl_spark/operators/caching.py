"""Operator-cache lifetime tracking.

Some operators persist an intermediate (the LSH candidate set, the IVF
assignment) because it is consumed by more than one downstream join and by a
planning count. The persist must OUTLIVE the returned lazy DataFrame — the
caller decides when the result has been consumed — so the operators cannot
unpersist eagerly. In a long-lived session running many queries (the bench
loop, the streaming front-end) those caches would otherwise accumulate and
rely solely on LRU eviction (round-3 ADVICE).

Contract: operators register every persist here; a session owner calls
``release_operator_caches()`` between logical queries (bench.py does, after
each timed query). Unpersisting is always SAFE — a dropped cache recomputes
from lineage — so callers may release at any point.

Single-owner assumption: the registry is module-global and NOT thread-safe.
It is meant for the session owner (the bench loop / the replay driver) to
call between queries it runs itself; releasing while another thread's query
is mid-flight would drop that query's caches (they recompute — correct but
slow). Concurrent multi-query sessions should scope persists themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Track a persisted DataFrame for later bulk release. Returns ``df``."""
    _LIVE.append(df)
    return df


def release_operator_caches(blocking: bool = False) -> int:
    """Unpersist every registered operator cache; returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception as exc:
            # Only a stopped/cancelled session is an expected no-op; anything
            # else is a real unpersist failure and must not vanish silently.
            msg = str(exc).lower()
            if not ("stopped" in msg or "cancelled" in msg or "closed" in msg):
                raise
    return n
