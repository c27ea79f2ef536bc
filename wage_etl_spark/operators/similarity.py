"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; an IVF-style
centroid-partitioned variant as the scale path (probe only the nearest
centroid's partition instead of the full corpus); plus an LSH-bucketed
variant via random-hyperplane signs (SimHash over floats).

All vector math runs JVM-side via zip_with/aggregate higher-order functions —
no Python in the loop. At 100 TB the brute-force path is a broadcast of the
(small) query set against the (huge) corpus: corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from wage_etl_spark.plans.partitioning import widen_if_narrow


def as_double(vec: F.Column | str) -> F.Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query. queries is broadcast (small
    side); ranking window is per-query (bounded state). Excludes self-match.

    Ties broken by neighbor id so results are deterministic across engines."""
    # norms are per-vector, not per-pair: computing them once per row before
    # the join (instead of inside cosine() per joined pair) drops 2 of the 3
    # interpreted array folds per candidate — dot/(qn*cn) multiplies the
    # same doubles in the same order, so results are bit-identical.
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = widen_if_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def label_centroids(
    corpus: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Element-wise mean vector per label (IVF coarse quantizer stand-in —
    in production the centroids come from k-means; here the labeled corpus
    provides them directly). posexplode -> avg per (label, pos) -> rebuild
    ordered array. The shuffle is (labels x dims) rows — tiny."""
    exploded = corpus.select(
        F.col(label_col).alias("label"), F.posexplode(as_double(vec_col))
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(F.avg("col").alias("v"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
            ).alias("centroid")
        )
    )


def assign_nearest_centroid(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
    keep_vector: bool = False,
) -> DataFrame:
    """IVF partition assignment: nearest centroid(s) by cosine (broadcast
    the centroid table; corpus scanned once, never shuffled).

    ``nprobe > 1`` assigns each vector its ``nprobe`` nearest centroids
    (one output row per probe, ``probe_rank`` 1..nprobe) — the multi-probe
    remedy for the single-probe boundary miss: a pair/query straddling a
    centroid boundary is caught because both sides now share at least one
    probed cluster, at the cost of ``nprobe``x candidate volume.

    ``keep_vector=True`` additionally returns the double-cast vector (``v``)
    and its norm (``nv``) alongside each assignment. The ranking window
    already shuffles both (they ride the candidate rows), so passing them
    through is free — and it saves callers that need (vector, norm,
    assignment) a full corpus re-join + norm recompute (one exchange + one
    broadcast fewer per consumer; guide §2.4)."""
    # per-row norms precomputed before the centroid cross product (same
    # arithmetic order as cosine(): dot/(norm(v)*norm(centroid)) — see
    # brute_force_topk): one norm fold per vector + one per centroid instead
    # of two per (vector, centroid) candidate.
    c = corpus.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("_nv", norm(F.col("v")))
    cents = centroids.withColumn("_nc", norm(F.col("centroid")))
    x = c.crossJoin(broadcast(cents))
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("sim"), 6).desc(), F.col("label").asc()
    )
    extra = [F.col("v"), F.col("_nv").alias("nv")] if keep_vector else []
    return (
        x.withColumn("sim", dot(F.col("v"), F.col("centroid")) / (F.col("_nv") * F.col("_nc")))
        .withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(
            F.col(id_col),
            F.col("label").alias("assigned_label"),
            "probe_rank",
            F.round("sim", 4).alias("sim"),
            *extra,
        )
    )


def cosine_near_dups(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    min_cosine: float = 0.9,
    nprobe: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed: candidate pairs
    share a nearest-centroid partition (equi-join on the assigned label —
    never an all-pairs product), then exact cosine filters candidates to
    ``cosine >= min_cosine``. The pair join shuffles on the label key only;
    at corpus scale each partition is ~N/n_labels vectors, so the candidate
    volume is ~1/n_labels of brute force.

    ``nprobe=1`` has the standard single-probe IVF trade-off: a near-dup
    pair straddling a centroid boundary is missed. ``nprobe > 1`` assigns
    each vector its ``nprobe`` nearest centroids — a straddling pair then
    shares at least one probed cluster, so recall strictly improves
    (tests/test_training_ops.py measures it vs brute force) at ``nprobe``x
    candidate volume; duplicate candidates from shared multi-probe labels
    are collapsed by a final per-pair aggregate.

    Deterministic across engines (centroids rounded, cosine rounded before
    the threshold), so the DuckDB oracle replicates it exactly."""
    corpus = widen_if_narrow(corpus)
    cents = label_centroids(corpus, vec_col, label_col).select(
        "label", F.transform("centroid", lambda x: F.round(x, 8)).alias("centroid")
    )
    # per-row norm cached alongside the vector: the pair stage then computes
    # ONE dot per candidate instead of dot + 2 norms (same doubles multiplied
    # in the same order as cosine(), so the rounded result is bit-identical).
    # keep_vector=True carries (v, nv) through the assignment window —
    # replacing the corpus ⋈ assignment re-join the index build used to pay.
    c = assign_nearest_centroid(
        corpus, cents, vec_col, id_col, nprobe=nprobe, keep_vector=True
    ).select(F.col(id_col).alias("id"), F.col("v"), "assigned_label", F.col("nv"))
    # materialize the assignment once: the self-join would otherwise
    # recompute the centroid build + nearest-centroid window on BOTH sides
    # (this is the ANN index-build step — at corpus scale you persist it to
    # the lake, here MEMORY_AND_DISK). Registered with operators.caching so
    # long-lived sessions can release it between queries (round-3 ADVICE).
    # Hash-partition the index on the join key with an EXPLICIT count before
    # persisting (guide §2.4): both sides of the self-join read the same
    # cached partitioning, so the pair join plans with zero exchanges — and
    # because an explicit repartition is never AQE-coalesced, the pair
    # EXPANSION keeps its parallelism even though its input bytes are tiny
    # (exploding join, guide §3.3: post-shuffle sizing by input bytes
    # serializes a stage whose output is quadratic in its input).
    from pyspark import StorageLevel

    from wage_etl_spark.operators.caching import register_cache

    n_part = int(corpus.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    c = register_cache(
        c.repartition(n_part, "assigned_label").persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.assigned_label") == F.col("b.assigned_label"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv")), 4
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
    if nprobe > 1:
        # a pair sharing several probed labels appears once per shared label
        # — collapse after the threshold filter (cosine is identical across
        # duplicates, so filtering first shrinks the dedup shuffle)
        pairs = pairs.groupBy("id_a", "id_b").agg(F.first("cosine").alias("cosine"))
    return pairs


def cosine_near_dups_scaled(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_cosine: float = 0.9,
    target_bucket_rows: int = 512,
    nprobe: int = 1,
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """``cosine_near_dups`` with a coarse partition SIZED TO THE CORPUS.

    The base operator trusts an existing label column; with its cardinality
    fixed by the data (e.g. the driver table's 10 labels), within-bucket
    candidate volume is n^2/k — QUADRATIC in corpus size (measured: 2x
    vectors -> ~4x candidates -> ~8x wall in BENCH/sf1_scale.json). The
    standard IVF remedy is to grow the bucket count with n. Here the coarse
    partition is derived from deterministic hyperplane LSH with
    ``n_planes = ceil(log2(n / target_bucket_rows))``, so expected bucket
    size stays ~``target_bucket_rows`` and candidate volume is
    ~n * target_bucket_rows — LINEAR in n at fixed target. Bucket centroids
    then seed the same nearest-centroid assignment as the base operator
    (``nprobe > 1`` available for the boundary-miss remedy; single-probe
    has the usual recall trade-off, which grows with bucket count).

    ``n_rows``: pass the known corpus size to skip the sizing ``count()``
    (at lake scale it comes from table stats / parquet footers for free).
    Precision is exact either way (candidates face the exact rounded-cosine
    filter), so every returned pair is a true pair; only recall depends on
    the partition."""
    import math

    corpus = widen_if_narrow(corpus)
    if n_rows is None:
        n_rows = corpus.count()
    n_planes = max(2, math.ceil(math.log2(max(n_rows / target_bucket_rows, 2.0))))
    b = hyperplane_lsh_buckets(corpus, vec_col, id_col, n_planes=n_planes, seed=seed)
    labeled = corpus.join(b, id_col)
    return cosine_near_dups(
        labeled,
        vec_col=vec_col,
        id_col=id_col,
        label_col="lsh_bucket",
        min_cosine=min_cosine,
        nprobe=nprobe,
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Two-stage IVF ANN (the 100 TB scale path): coarse-quantize the corpus
    to its nearest label-centroid (index build — single assignment, the
    lake-persisted step at scale), then probe each query's ``nprobe``
    nearest clusters with exact cosine and rank top-k per query.

    Queries (small side, with their probe assignments) are broadcast; the
    corpus is scanned once and NEVER shuffles — the label equi-join reaches
    ~nprobe/n_labels of the brute-force candidate volume. ``nprobe > 1`` is
    the boundary-miss remedy: a true neighbor in an adjacent cluster is
    found when the query also probes that cluster, so recall vs brute force
    strictly improves with nprobe (measured in tests/test_training_ops.py).
    A (query, neighbor) pair can match at most once — the index assigns each
    corpus vector ONE cluster — so no dedup stage is needed.

    Deterministic: centroids rounded 8dp, ranking on cosine rounded 6dp with
    neighbor-id tie-break (same contract as brute_force_topk)."""
    cents = (
        centroids
        if centroids is not None
        else label_centroids(corpus, vec_col, label_col).select(
            "label", F.transform("centroid", lambda x: F.round(x, 8)).alias("centroid")
        )
    )
    # per-row norms before the probe join (same arithmetic order as
    # cosine(): dot/(norm(qv)*norm(cv)) — one norm per vector, not per
    # candidate). keep_vector=True rides (vector, norm) through each
    # assignment window, replacing the corpus ⋈ index and queries ⋈ probes
    # re-joins (one exchange + broadcast fewer per side).
    c = assign_nearest_centroid(
        corpus, cents, vec_col, id_col, keep_vector=True
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("cv"),
        "assigned_label",
        F.col("nv").alias("cn"),
    )
    q = assign_nearest_centroid(
        queries, cents, vec_col, id_col, nprobe=nprobe, keep_vector=True
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("assigned_label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qn"),
    )
    scored = c.join(
        broadcast(q),
        (F.col("assigned_label") == F.col("q_label"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cosine"))
    )


# hyperplane components are a pure function of (seed, plane, dim) — they can
# be computed ONCE driver-side and embedded as literal arrays instead of
# re-deriving 1 md5+conv per (row, plane, dim) inside an interpreted
# higher-order transform (measured: the md5 build dominated the whole bucket
# projection). Literals cover dims <= _PLANE_LIT_MAX_DIM; wider vectors fall
# back to the original per-row construction, so semantics are unchanged at
# any dimensionality.
_PLANE_LIT_MAX_DIM = 128


def _plane_signs(n_planes: int, seed: int, max_dim: int = _PLANE_LIT_MAX_DIM):
    """±1.0 plane components, bit-identical to the in-plan md5 construction:
    hashlib.md5 of the same 'seed|plane|dim' string Spark's
    md5(concat_ws('|', ...)) hashes."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:2], 16) % 2 == 0
            else -1.0
            for d in range(max_dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_lsh_buckets(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit i = sign(dot(v, r_i))
    where r_i components are deterministic +/-1 from md5 of (seed, plane,
    dim). Cosine-similar vectors collide with prob 1 - theta/pi per bit.
    ANN then probes only the query's bucket (and neighbors at scale).

    The planes are precomputed driver-side as literal arrays (see
    _plane_signs) — same values as the md5-in-plan construction, which is
    kept as the fallback branch for vectors wider than _PLANE_LIT_MAX_DIM."""
    v = as_double(vec_col)
    dims = F.size(v)
    signs = _plane_signs(n_planes, seed)

    def _plane_bit(p: int) -> F.Column:
        # r_p[d] = +1/-1 from md5(seed|p|d): deterministic pseudo-hyperplane.
        # Single-parameter lambdas only (2-arg transform lambdas mean
        # (element, index) in PySpark and would shadow the closure).
        fallback = F.transform(
            F.sequence(F.lit(0), dims - 1),
            lambda d: F.when(
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.lit(p), d)), 1, 2),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        lit_plane = F.array(*[F.lit(x) for x in signs[p]])
        plane = F.when(
            dims <= _PLANE_LIT_MAX_DIM, F.slice(lit_plane, 1, dims)
        ).otherwise(fallback)
        proj = F.aggregate(
            F.zip_with(v, plane, lambda x, r: x * r), F.lit(0.0), lambda s, x: s + x
        )
        return F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))

    bits = [_plane_bit(p) for p in range(n_planes)]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return widen_if_narrow(corpus).select(F.col(id_col), bucket.alias("lsh_bucket"))
