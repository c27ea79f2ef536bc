"""Single-threaded pure-Python replay oracle (FIXTURES.md §5).

Independent implementation of the engine's contract: validation rules ->
quarantine, per-epoch LWW winner per key, apply I/U as upsert and D as
delete. Used to assert per-key sha256(content) equality of the engine's
final table state.
"""

from __future__ import annotations

import hashlib
import re

COMMIT_RE = re.compile(r"^[0-9a-f]{40}$")
OPS = {"I", "U", "D"}


def validate(ev: dict) -> list[str]:
    """Mirror of wage_etl_spark.operators.validate.violation_rules."""
    reasons = []
    if ev.get("repo") is None or str(ev["repo"]).strip() == "":
        reasons.append("null_or_empty_repo")
    if ev.get("path") is None or str(ev["path"]).strip() == "":
        reasons.append("null_or_empty_path")
    if ev.get("commit") is None or not COMMIT_RE.match(str(ev["commit"])):
        reasons.append("bad_commit_hex")
    if ev.get("event_seq") is None:
        reasons.append("null_event_seq")
    elif ev["event_seq"] < 0:
        reasons.append("negative_event_seq")
    if ev.get("op") not in OPS:
        reasons.append("bad_op")
    if ev.get("op") == "D" and ev.get("content") is not None:
        reasons.append("delete_with_content")
    if ev.get("op") in ("I", "U") and ev.get("content") is None:
        reasons.append("upsert_without_content")
    c = ev.get("content")
    if c is not None:
        if len(c.strip()) == 0 or "\x00" in c:
            reasons.append("malformed_content")
    return reasons


def replay_oracle(events: list[dict]) -> tuple[dict, int, int]:
    """Replay epoch by epoch (exactly the engine's unit of application).

    Returns (state, n_valid, n_quarantined) where state maps
    (repo, path) -> {"sha256", "commit", "event_seq", "lang", ...}.
    """
    n_valid = 0
    n_quarantined = 0
    state: dict = {}
    by_epoch: dict[int, list[dict]] = {}
    for ev in events:
        by_epoch.setdefault(int(ev["epoch"]), []).append(ev)

    for e in sorted(by_epoch):
        winners: dict = {}
        for ev in by_epoch[e]:
            if validate(ev):
                n_quarantined += 1
                continue
            n_valid += 1
            key = (ev["repo"], ev["path"])
            ver = (ev["commit"], ev["event_seq"])
            if key not in winners or ver >= (winners[key]["commit"], winners[key]["event_seq"]):
                winners[key] = ev
        for key, ev in winners.items():
            ver = (ev["commit"], ev["event_seq"])
            cur = state.get(key)
            if cur is not None and ver < (cur["commit"], cur["event_seq"]):
                continue  # target is newer: stale event loses
            if ev["op"] == "D":
                state.pop(key, None)
            else:
                state[key] = {
                    "commit": ev["commit"],
                    "event_seq": ev["event_seq"],
                    "lang": ev.get("lang"),
                    "lang_version": ev.get("lang_version"),
                    "sha256": hashlib.sha256(ev["content"].encode("utf-8")).hexdigest(),
                }
    return state, n_valid, n_quarantined


def replay_oracle_global(events: list[dict]) -> tuple[dict, int, int]:
    """Order-independent oracle (tombstone semantics): per key the single
    globally-max-version valid event decides the final state, regardless of
    epoch/micro-batch boundaries. Matches the engine with keep_tombstones."""
    n_valid = 0
    n_quarantined = 0
    winners: dict = {}
    for ev in events:
        if validate(ev):
            n_quarantined += 1
            continue
        n_valid += 1
        key = (ev["repo"], ev["path"])
        ver = (ev["commit"], ev["event_seq"])
        if key not in winners or ver >= (winners[key]["commit"], winners[key]["event_seq"]):
            winners[key] = ev
    state = {
        key: {
            "commit": ev["commit"],
            "event_seq": ev["event_seq"],
            "lang": ev.get("lang"),
            "lang_version": ev.get("lang_version"),
            "sha256": hashlib.sha256(ev["content"].encode("utf-8")).hexdigest(),
        }
        for key, ev in winners.items()
        if ev["op"] != "D"
    }
    return state, n_valid, n_quarantined


def sha_map(state: dict) -> dict:
    return {k: v["sha256"] for k, v in state.items()}
