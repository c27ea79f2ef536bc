"""Deterministic synthetic data: repos table + CDC change-event stream.

Shapes follow FIXTURES.md / BASELINE.json input_hint exactly:
  repos (repo, path, commit, lang, content)
  events(op, repo, path, commit, event_seq, lang, content, epoch [, lang_version])

All randomness is *arithmetic* — every value derives from xxhash64/md5 of
(seed, id) Column expressions, so generation is distributed (spark.range),
order-independent, and bit-reproducible at any scale. No driver-side RNG, no
collected data. This is what lets bench.py synthesize 10^7+ events without
the generator itself becoming the bottleneck.

Fixture scenarios covered (FIXTURES.md §2):
  - hot repos: repo 0 owns ~30% of keys; hot-key bursts: ~8% of events hit
    the 16 hottest keys (skew for the salted dedup path)
  - multiple updates per key per epoch, delete-then-reinsert, update to
    never-inserted keys: all emerge from hashed op/key assignment
  - out-of-order within epoch: events carry no physical ordering; commit /
    event_seq are the only order (and the engine never sorts the input)
  - duplicate identical events: every 37th event is emitted twice
  - invalid events (quarantine fixtures): ~`invalid_frac` of events get one
    of 6 corruption modes mirroring the reference's validation rules
  - schema evolution: epochs >= `evolve_from_epoch` carry `lang_version`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["python", "java", "go", "rust", "js", "sql", "md"]
EXT = {"python": "py", "java": "java", "go": "go", "rust": "rs", "js": "js", "sql": "sql", "md": "md"}


def _h(seed: int, salt: str, *cols) -> F.Column:
    """Non-negative deterministic 63-bit hash of (seed, salt, *cols)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(salt), *cols))


def _key_cols(seed: int, key_id: F.Column, n_keys: int, n_repos: int):
    """(repo, path, lang) for a key id. Repo 0 is hot (~30% of keys)."""
    hot_cut = max(1, int(n_keys * 0.3))
    repo_id = F.when(key_id < hot_cut, F.lit(0)).otherwise(
        (_h(seed, "repo", key_id) % F.lit(max(n_repos - 1, 1))) + 1
    )
    lang_idx = (_h(seed, "lang", key_id) % F.lit(len(LANGS))).cast("int")
    lang = F.element_at(F.array(*[F.lit(l) for l in LANGS]), lang_idx + 1)
    ext = F.element_at(F.array(*[F.lit(EXT[l]) for l in LANGS]), lang_idx + 1)
    repo = F.concat(F.lit("org"), (repo_id % 97).cast("string"), F.lit("/repo"), repo_id.cast("string"))
    path = F.concat(
        F.lit("src/mod"), (_h(seed, "dir", key_id) % 1000).cast("string"),
        F.lit("/file"), key_id.cast("string"), F.lit("."), ext,
    )
    return repo, path, lang


def synthesize_repos(
    spark: SparkSession, n_keys: int = 1000, n_repos: int = 20, seed: int = 42
) -> DataFrame:
    """The primary input table (repo, path, commit, lang, content)."""
    ids = spark.range(n_keys).withColumnRenamed("id", "key_id")
    repo, path, lang = _key_cols(seed, F.col("key_id"), n_keys, n_repos)
    commit = F.concat(
        F.lpad(F.lower(F.conv(F.col("key_id").cast("string"), 10, 16)), 12, "0"),
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col("key_id"))), 1, 28),
    )
    block = F.concat(
        F.md5(F.concat_ws("|", F.lit(seed), F.col("key_id"), F.lit(0), F.lit("a"))), F.lit(" "),
        F.md5(F.concat_ws("|", F.lit(seed), F.col("key_id"), F.lit(0), F.lit("b"))), F.lit("\n"),
    )
    length = (50 + (_h(seed, "len", F.col("key_id"), F.lit(0)) % 1951)).cast("int")
    content = F.substring(F.repeat(block, 31), F.lit(1), length)
    return ids.select(
        repo.alias("repo"), path.alias("path"), commit.alias("commit"),
        lang.alias("lang"), content.alias("content"),
    )


def synthesize_events(
    spark: SparkSession,
    n_events: int = 10_000,
    n_keys: int = 1000,
    n_repos: int = 20,
    n_epochs: int = 4,
    seed: int = 42,
    invalid_frac: float = 0.02,
    evolve_from_epoch: int | None = None,
) -> DataFrame:
    """The CDC stream. LWW order is (commit, event_seq); both are monotone in
    the generating step id, so the expected winner per key is simply its
    greatest step — which the pure-Python oracle recomputes independently.

    ``evolve_from_epoch``: epochs >= it carry a non-null ``lang_version``
    column (earlier epochs: column entirely null — the per-epoch source
    (sources/events.py) drops all-null evolution columns so the engine really
    sees the column *appear* mid-stream)."""
    events_per_epoch = max(1, n_events // n_epochs)
    e = spark.range(n_events).withColumnRenamed("id", "step")
    step = F.col("step")

    # hot-key bursts: ~8% of events hit the 16 hottest keys
    burst = _h(seed, "burst", step) % 100 < 8
    key_id = F.when(burst, _h(seed, "hotkey", step) % F.lit(min(16, n_keys))).otherwise(
        _h(seed, "key", step) % F.lit(n_keys)
    )
    repo, path, lang = _key_cols(seed, key_id, n_keys, n_repos)

    # one commit covers ~5 consecutive steps; hex prefix keeps it
    # lexicographically monotone (FIXTURES.md §1 commit contract)
    commit_id = (step / 5).cast("long")
    commit = F.concat(
        F.lpad(F.lower(F.conv(commit_id.cast("string"), 10, 16)), 12, "0"),
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), commit_id)), 1, 28),
    )
    opsel = _h(seed, "op", step) % 10
    op = F.when(opsel < 5, F.lit("I")).when(opsel < 8, F.lit("U")).otherwise(F.lit("D"))

    block = F.concat(
        F.md5(F.concat_ws("|", F.lit(seed), key_id, step, F.lit("a"))), F.lit(" "),
        F.md5(F.concat_ws("|", F.lit(seed), key_id, step, F.lit("b"))), F.lit("\n"),
    )
    length = (50 + (_h(seed, "len", key_id, step) % 1951)).cast("int")
    content = F.when(op == "D", F.lit(None).cast("string")).otherwise(
        F.substring(F.repeat(block, 31), F.lit(1), length)
    )

    df = e.select(
        op.alias("op"), repo.alias("repo"), path.alias("path"), commit.alias("commit"),
        step.alias("event_seq"), lang.alias("lang"), content.alias("content"),
        (step / events_per_epoch).cast("long").alias("epoch"),
        step.alias("_step"),
    ).withColumn("epoch", F.least(F.col("epoch"), F.lit(n_epochs - 1)))

    # duplicate identical events (idempotency fixture): every 37th event twice
    df = df.withColumn(
        "_copies",
        F.when(_h(seed, "dup", F.col("_step")) % 37 == 0, F.array(F.lit(1), F.lit(2))).otherwise(
            F.array(F.lit(1))
        ),
    ).withColumn("_copy", F.explode("_copies")).drop("_copies")

    # corruption modes (quarantine fixtures, FIXTURES.md §2)
    if invalid_frac > 0:
        denom = max(2, int(round(1.0 / invalid_frac)))
        sick = _h(seed, "sick", F.col("_step")) % denom == 0
        mode = (_h(seed, "mode", F.col("_step")) % 6).cast("int")
        df = (
            df.withColumn("repo", F.when(sick & (mode == 0), F.lit(None)).otherwise(F.col("repo")))
            .withColumn("path", F.when(sick & (mode == 1), F.lit("")).otherwise(F.col("path")))
            .withColumn(
                "commit",
                F.when(sick & (mode == 2), F.substring(F.col("commit"), 1, 10)).otherwise(F.col("commit")),
            )
            .withColumn("op", F.when(sick & (mode == 3), F.lit("X")).otherwise(F.col("op")))
            .withColumn(
                "content",
                F.when(sick & (mode == 4) & (F.col("op") != "D"), F.lit(None))
                .when(sick & (mode == 5) & (F.col("op") == "D"), F.lit("ghost content on delete"))
                .otherwise(F.col("content")),
            )
        )

    if evolve_from_epoch is not None:
        df = df.withColumn(
            "lang_version",
            F.when(
                F.col("epoch") >= evolve_from_epoch,
                F.concat(F.col("lang"), F.lit("-"), (_h(seed, "lv", F.col("_step")) % 3 + 1).cast("string")),
            ),
        )
    return df.drop("_step", "_copy")
