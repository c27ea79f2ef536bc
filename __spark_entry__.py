"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship CDC last-writer-wins query at
sf0.001; `queries()` exposes each implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; `oracle_sql()` gives the DuckDB-equivalent SQL.
Every queries() entry has an oracle_sql() entry (all hash-verifiable;
35 queries as of round 5 — 32/32 green in CORRECTNESS_r04, plus the two
multimodal queries and the scale-sized cosine-dup variant added since).

Parity rules used throughout (so the driver's value-hash matches):
- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded (sums 2dp, ratios/sims 4-6dp);
- any hash-derived value uses md5 (identical in Spark and DuckDB), never
  engine-specific hashes;
- rankings order by rounded keys with explicit id tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from wage_etl_spark.functions import text as T
from wage_etl_spark.operators import reshape as R
from wage_etl_spark.functions.cleaning import clean_currency, normalize_category_key, slugify, zfill
from wage_etl_spark.functions.hashing import rolling_fingerprint
from wage_etl_spark.operators.dedup_lww import dedup_lww
from wage_etl_spark.sources.fixtures import fixture_df
from wage_etl_spark.operators.dedupe import exact_dedup, minhash_signatures
from wage_etl_spark.operators.similarity import (
    as_double, assign_nearest_centroid, brute_force_topk, cosine, label_centroids,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- CDC

EVENT_TYPES = ["signup", "click", "view", "purchase"]  # 'error' is the bad enum


def q_cdc_lww_state(spark: SparkSession, sf: str) -> DataFrame:
    """LWW final state per key (A5/S7 analog on the generic events table):
    the engine's central dedup operator, keyed by user_id, ordered by
    (ts, event_id). count_col folds n_events into the same argmax aggregate,
    so the plan is ONE scan of events (no separate groupBy().count() pass)."""
    ev = _t(spark, sf, "events")
    last = dedup_lww(ev, ["user_id"], ["ts", "event_id"], count_col="n_events")
    return last.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
        "n_events",
    )


def q_cdc_validate_split(spark: SparkSession, sf: str) -> DataFrame:
    """Validation split (V1-V9 analog): violations array -> reason counts;
    valid rows show up as reason '(valid)'."""
    ev = _t(spark, sf, "events")
    rules = [
        ("bad_event_type", F.col("event_type").isin(*EVENT_TYPES)),
        ("null_user", F.col("user_id").isNotNull()),
        ("value_out_of_range", F.col("value").isNotNull() & (F.col("value") >= 0) & (F.col("value") <= 300)),
    ]
    viol = F.array_compact(F.array(*[F.when(~ok, F.lit(r)) for r, ok in rules]))
    reason = F.when(F.size(viol) == 0, F.lit("(valid)")).otherwise(F.concat_ws(";", viol))
    return (
        ev.select(reason.alias("rejection_reason"))
        .groupBy("rejection_reason")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization via lag window: gap > 30 min starts a new session."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # whole-second epochs from timestamp FIELDS (timezone-free: ts is NTZ and
    # the oracle's floor(epoch(ts)) treats it as UTC wall time — field
    # arithmetic matches regardless of the session timezone)
    sec = (
        F.unix_date(F.col("ts").cast("date")).cast("long") * 86400
        + F.hour("ts") * 3600
        + F.minute("ts") * 60
        + F.second("ts")
    )
    gap = sec - F.lag(sec).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def q_latest_event_top1(spark: SparkSession, sf: str) -> DataFrame:
    """Top-1 latest (reference get_latest_run, run_tracker.py:79-96):
    Catalyst plans orderBy+limit as TakeOrderedAndProject."""
    ev = _t(spark, sf, "events")
    return ev.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(1).select(
        "event_id", "user_id", "event_type", "ts"
    )


# ------------------------------------------------------------------- TPC-H

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    cu = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    re = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    na = _t(spark, sf, "nation")
    cu = _t(spark, sf, "customer")
    od = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf, "lineitem")
    su = _t(spark, sf, "supplier")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(cu, (od.o_custkey == cu.c_custkey) & (cu.c_nationkey == su.s_nationkey))
        .join(broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q_broadcast_enum_join(spark: SparkSession, sf: str) -> DataFrame:
    """J1/J2 analog: broadcast join against a literal dimension with slug
    fallback for unknown members (normalizers.py:62-72 semantics)."""
    dim = fixture_df(
        spark,
        [("signup", "acquisition"), ("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue")],
        "event_type string, category string",
    )
    ev = _t(spark, sf, "events")
    return (
        ev.join(broadcast(dim), "event_type", "left")
        .withColumn("category", F.coalesce("category", slugify(F.col("event_type"))))
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_unpivot_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """U2 melt: wide measures -> long, then aggregate per measure."""
    li = _t(spark, sf, "lineitem")
    long = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.round(F.sum("value"), 2).alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# --------------------------------------------------------------- functions

MONEY_FIXTURE = [
    (1, "$18.71"), (2, "$1,000"), (3, "invalid"), (4, None), (5, "  $2,500.50 "),
    (6, "$0.00"), (7, "42"), (8, "$1,234,567.89"), (9, ""), (10, "$ 12.34"),
]


def q_currency_clean(spark: SparkSession, sf: str) -> DataFrame:
    """F1: currency cleaning on the reference's own fixture shapes
    (tests/unit/test_transform_pandas_ops.py:73-98)."""
    df = fixture_df(spark, MONEY_FIXTURE, "id int, raw string")
    return df.select("id", "raw", clean_currency("raw").alias("amount"))


def q_fips_key_functions(spark: SparkSession, sf: str) -> DataFrame:
    """F5/F7/F8/F13: zfill, concat keys, substring split, case."""
    na = _t(spark, sf, "nation")
    return na.select(
        "n_nationkey",
        zfill("n_nationkey", 5).alias("nation_fips"),
        F.concat(zfill("n_regionkey", 2), zfill("n_nationkey", 3)).alias("full_fips"),
        F.substring(F.col("n_name"), 1, 3).alias("name_prefix"),
        F.upper(F.col("n_name")).alias("name_upper"),
    )


def q_header_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """F2/F3/F4: canonicalization chain + slug on part type strings."""
    pt = _t(spark, sf, "part")
    return (
        pt.select(
            normalize_category_key("p_type").alias("type_key"),
            slugify(F.col("p_type")).alias("type_slug"),
        )
        .groupBy("type_key", "type_slug")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ------------------------------------------------------- training-data ops

def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").cast("long").alias("n_tokens"),
        T.bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.round(T.avg_token_len("text"), 4).alias("avg_token_len"),
        F.round(T.punct_ratio("text"), 6).alias("punct_ratio"),
        T.quality_score("text").alias("quality"),
    )


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    scores = T.lang_scores("text")
    g = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    # fixed CASE order = deterministic tie-break, mirrored in the oracle SQL
    expr = None
    for lang in T.LANG_MARKERS:
        cond = scores[lang] == g
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    d2 = d.select("doc_id", "lang", expr.alias("predicted_lang"))
    return d2.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def q_token_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    return d.select("doc_id", rolling_fingerprint(T.ws_tokens("text")).alias("fingerprint"))


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup(_t(spark, sf, "documents"), "text", "doc_id").select(
        "text_md5", F.col("keeper_id").cast("long").alias("keeper_id"), F.col("n_docs").cast("long").alias("n_docs")
    )


def q_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash signatures (8 hashes, 3-token shingles), exploded to scalar
    rows so the value-hash comparison is array-free."""
    sigs = minhash_signatures(_t(spark, sf, "documents"), "text", "doc_id", num_hashes=8, k=3)
    return sigs.select("doc_id", F.posexplode("signature").alias("h_idx", "minhash")).select(
        "doc_id", F.col("h_idx").cast("long").alias("h_idx"), "minhash"
    )


def q_embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    out = brute_force_topk(emb, queries, "embedding", "vec_id", k=3)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "cosine",
    )


def q_embedding_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style assignment: nearest label-centroid per vector (centroid
    components rounded to 8dp on both sides so engine-order FP noise in the
    avg cannot flip rankings)."""
    emb = _t(spark, sf, "embeddings")
    cents = label_centroids(emb, "embedding", "label").select(
        "label", F.transform("centroid", lambda x: F.round(x, 8)).alias("centroid")
    )
    out = assign_nearest_centroid(emb, cents, "embedding", "vec_id")
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("assigned_label").cast("long").alias("assigned_label"),
        "sim",
    )


WAGE_WIDE_FIXTURE = [
    ("Living Wage", "$18.71", "$38.87"),
    ("Poverty Wage", "$6.19", "$10.56"),
    ("Minimum Wage", "$15.13", "$15.13"),
    ("Typical Expenses", "$3,442", "invalid"),  # unknown category -> slug
]
WAGE_HEADERS = ["1 Adult", "2 Adults (1 Working) 1 Child"]


def q_wage_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's own transform (normalize_wages, pandas_ops.py:135-171)
    end-to-end: melt -> header normalize -> family broadcast join -> category
    canonicalize w/ slug fallback -> currency clean -> constants."""
    from wage_etl_spark.operators.reshape import normalize_wages_wide

    wide = fixture_df(
        spark, WAGE_WIDE_FIXTURE,
        f"`Category` string, `{WAGE_HEADERS[0]}` string, `{WAGE_HEADERS[1]}` string",
    )
    out = normalize_wages_wide(wide, "34001", "2025-01-15")
    return out.select(
        "county_fips", "page_updated_at",
        F.col("adults").cast("int").alias("adults"),
        F.col("working_adults").cast("int").alias("working_adults"),
        F.col("children").cast("int").alias("children"),
        "wage_type", F.round("hourly_wage", 2).alias("hourly_wage"),
    )


def q_events_hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Time-bucketed rollup (date_trunc) — epoch/rate metrics at hour grain."""
    ev = _t(spark, sf, "events")
    # hour bucket as a wall-clock string: NTZ -> string is timezone-free,
    # while date_trunc would round-trip through the session timezone
    hour = F.concat(F.substring(F.col("ts").cast("string"), 1, 13), F.lit(":00:00"))
    return (
        ev.groupBy(
            hour.alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_top2_customers_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Window rank per group: top-2 customers by order spend per nation."""
    cu = _t(spark, sf, "customer")
    od = _t(spark, sf, "orders")
    na = _t(spark, sf, "nation")
    spend = (
        od.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    joined = (
        cu.join(spend, cu.c_custkey == spend.o_custkey)
        .join(broadcast(na), cu.c_nationkey == na.n_nationkey)
    )
    w = Window.partitionBy("n_name").orderBy(F.col("spend").desc(), F.col("c_custkey").asc())
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("n_name", F.col("c_custkey").cast("long").alias("c_custkey"),
                "spend", F.col("rnk").cast("long").alias("rnk"))
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Banded-LSH candidate pairs. Oracle: the same shape in DuckDB —
    signature per doc, unnest to (band_id, band_hash), self-join, max
    jaccard estimate per pair."""
    from wage_etl_spark.operators.dedupe import minhash_lsh_pairs

    d = _t(spark, sf, "documents")
    out = minhash_lsh_pairs(d, "text", "doc_id", num_hashes=16, bands=8, k=3)
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.round("jaccard_est", 4).alias("jaccard_est"),
    )


def q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs on the DEFAULT (recall-complete) multi-table
    Manku plan at the SCALE-SANE radius ``max_hamming=3``: n_tables = 4
    contiguous 15-bit blocks (32k buckets/table), whose output is EXACTLY
    the set of pairs within hamming <= 3 — so the oracle is the stronger
    brute-force all-pairs hamming join (feasible in DuckDB at oracle scale;
    the Spark plan never goes all-pairs). Round-3 verdict: the previous
    ``max_hamming=12`` forced 13 tables of 4-5-bit blocks (<=32 buckets),
    degenerating toward all-pairs at corpus scale — the Manku construction
    needs block width >= ~log2(N); see simhash_near_dups's docstring."""
    from wage_etl_spark.operators.dedupe import simhash_near_dups

    d = _t(spark, sf, "documents")
    return simhash_near_dups(d, "text", "doc_id", max_hamming=3).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_lsh_jaccard_verified(spark: SparkSession, sf: str) -> DataFrame:
    """The full near-dup pipeline: banded-LSH candidate generation -> exact
    k-token-shingle Jaccard verification (never all-pairs; the verify stage
    touches candidates only). The candidate broadcast is SIZE-GATED
    (operators/dedupe.lsh_jaccard_verified): pairs are persisted + counted
    once, broadcast only under the cap, shuffle-join fallback above it."""
    from wage_etl_spark.operators.dedupe import lsh_jaccard_verified

    d = _t(spark, sf, "documents")
    out = lsh_jaccard_verified(
        d, "text", "doc_id", num_hashes=16, bands=8, k=3, min_jaccard=0.5
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 4).alias("jaccard"),
    )


def q_embedding_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage ANN (the 100 TB scale path): IVF coarse quantization
    (nearest label-centroid, broadcast) then exact cosine top-k probing ONLY
    the query's cluster — ~1/n_labels of the brute-force work, corpus still
    never shuffles. Deterministic (rounded sims, id tie-breaks), so recall
    vs brute force is itself oracle-checkable. Hash-verified here at
    nprobe=1; operators/similarity.py::ivf_ann_topk's nprobe>1 multi-probe
    recall gain is measured in tests/test_training_ops.py."""
    from wage_etl_spark.operators.similarity import ivf_ann_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    out = ivf_ann_topk(
        emb, queries, "embedding", "vec_id", "label", k=3, nprobe=1
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "cosine",
    )


def q_embedding_cosine_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (the brief's 5th dedup modality):
    IVF-bucketed candidates (equi-join on nearest-centroid label, never
    all-pairs) -> exact cosine >= threshold. The 0.35 threshold is tuned to
    the synthetic corpus (max within-label cosine ~0.47); production uses
    0.9+. operators/similarity.py::cosine_near_dups."""
    from wage_etl_spark.operators.similarity import cosine_near_dups

    emb = _t(spark, sf, "embeddings")
    return cosine_near_dups(emb, "embedding", "vec_id", "label", min_cosine=0.35).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )


def q_embedding_cosine_dups_scaled(spark: SparkSession, sf: str) -> DataFrame:
    """Scale-sized cosine near-dup pairs: the coarse IVF partition is
    derived from hyperplane LSH with n_planes = ceil(log2(n/target)) so
    bucket count grows with the corpus (the grow-k-with-n IVF sizing rule —
    the fixed-10-label variant's candidate volume is n^2/10, quadratic;
    this one is ~n*target, linear). Deterministic end-to-end: md5
    hyperplanes, rounded bucket centroids, rounded cosine — the DuckDB
    oracle replays buckets, centroids, assignment, and pair filter exactly,
    including the count(*)-driven plane-count sizing rule.
    operators/similarity.py::cosine_near_dups_scaled."""
    from wage_etl_spark.operators.similarity import cosine_near_dups_scaled

    emb = _t(spark, sf, "embeddings")
    return cosine_near_dups_scaled(
        emb, "embedding", "vec_id", min_cosine=0.35, target_bucket_rows=32
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTER assignment — the step a dedup pipeline actually
    ships: connected components over the verified LSH near-dup pairs, every
    doc labeled with the min doc id of its component (singletons label
    themselves), keep-one = filter cluster_id == doc_id. Spark side is
    pointer-jumping min-label propagation (operators/dedupe.dedup_clusters,
    O(log diameter) rounds, ids only — text never enters the loop); oracle
    is a DuckDB RECURSIVE transitive closure over the same pairs — a
    completely different algorithm, so agreement checks the semantics."""
    from wage_etl_spark.operators.dedupe import dedup_clusters, lsh_jaccard_verified

    d = _t(spark, sf, "documents")
    pairs = lsh_jaccard_verified(
        d, "text", "doc_id", num_hashes=16, bands=8, k=3, min_jaccard=0.5
    )
    out = dedup_clusters(pairs, nodes=d.select("doc_id"))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def q_embedding_ann_multiprobe(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN with QUERY-SIDE MULTI-PROBE (nprobe=2): each query probes its
    two nearest centroids, recovering true neighbors that sit in an adjacent
    cluster (the single-probe boundary miss) at 2x probe volume — corpus
    index stays single-assigned, so a (query, neighbor) pair still matches
    at most once and needs no dedup. Hash-verified against a DuckDB oracle
    that replays both probe ranks. operators/similarity.py::ivf_ann_topk."""
    from wage_etl_spark.operators.similarity import ivf_ann_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    out = ivf_ann_topk(emb, queries, "embedding", "vec_id", "label", k=3, nprobe=2)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "cosine",
    )


def q_hyperplane_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH bucket per embedding vector (the ANN bucketing
    primitive: cosine-similar vectors collide per-bit with prob 1-theta/pi).
    Hyperplane components are deterministic +/-1 from md5(seed|plane|dim),
    so the construction is engine-portable and the DuckDB oracle replays it
    bit-for-bit — including the projection's sequential left-fold sum.
    operators/similarity.py::hyperplane_lsh_buckets."""
    from wage_etl_spark.operators.similarity import hyperplane_lsh_buckets

    emb = _t(spark, sf, "embeddings")
    out = hyperplane_lsh_buckets(emb, "embedding", "vec_id", n_planes=8, seed=42)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("lsh_bucket").cast("long").alias("lsh_bucket"),
    )


HTML_PAGE_1 = """
<html><body>
<p>County data. Last updated on January 15, 2025.</p>
<table class="results_table">
<thead>
<tr><th></th><th>1 Adult</th><th colspan="2">2 Adults (1 Working)</th></tr>
<tr><th>Category</th><th></th><th>1 Child</th><th>2 Children</th></tr>
</thead>
<tbody>
<tr><td>Living Wage</td><td>$18.71</td><td>$38.87</td><td>$45.10</td></tr>
<tr><td>Poverty Wage</td><td>$6.19</td><td>$10.56</td><td>$13.30</td></tr>
<tr><td>Minimum Wage</td><td>$15.13</td><td>$15.13</td></tr>
<tr><td>Typical Expenses</td><td>$3,442</td><td>invalid</td><td></td></tr>
</tbody></table></body></html>
"""
HTML_PAGE_2 = """
<html><body><div>Last updated on March 3, 2024</div>
<table class="decoy_table"><tbody><tr><td>ignore me</td></tr></tbody></table>
<table class="results_table">
<thead><tr><th>Category</th><th>2 Adults</th><th>3 Adults (All Working)</th></tr></thead>
<tbody>
<tr><td>Living Wage</td><td>$20.00</td><td>$25.00</td></tr>
<tr><td>Poverty Wage</td><td>$8.00</td><td>$9.00</td></tr>
</tbody></table></body></html>
"""


# Two-table pages (the reference's real page contract: tables[0] = wages,
# tables[1] = expenses — wage_scraper.py:60-73 raises below 2 tables).
HTML_PAGE_EXP_A = """
<html><body>
<p>County data. Last updated on February 2, 2025.</p>
<table class="results_table">
<thead><tr><th>Category</th><th>1 Adult</th></tr></thead>
<tbody><tr><td>Living Wage</td><td>$25.00</td></tr></tbody>
</table>
<table class="results_table">
<thead>
<tr><th></th><th>1 Adult</th><th colspan="2">2 Adults (1 Working)</th></tr>
<tr><th>Category</th><th></th><th>1 Child</th><th>2 Children</th></tr>
</thead>
<tbody>
<tr><td>Food</td><td>$4,686</td><td>$10,345</td><td>$13,999</td></tr>
<tr><td>Child Care</td><td>$0</td><td>$8,000</td><td>$16,000</td></tr>
<tr><td>Housing</td><td>$17,000</td><td>$20,000</td><td>$22,000</td></tr>
<tr><td>Transportation</td><td>$5,316</td><td>$10,000</td><td>$11,000</td></tr>
<tr><td>Medical</td><td>$2,522</td><td>$7,000</td><td>$7,500</td></tr>
<tr><td>Internet &amp; Mobile</td><td>$1,004</td><td>$1,100</td><td>$1,200</td></tr>
<tr><td>Civic</td><td>$2,500</td><td>$4,000</td><td>$4,600</td></tr>
<tr><td>Other</td><td>$4,000</td><td>$6,000</td><td>$7,000</td></tr>
<tr><td>Required annual income after taxes</td><td>$45,000</td><td>$70,000</td><td>$85,000</td></tr>
<tr><td>Annual Taxes</td><td>$8,000</td><td>$12,000</td><td>$15,000</td></tr>
<tr><td>Required annual income before taxes</td><td>$53,000</td><td>$82,000</td><td>$100,000</td></tr>
<tr><td>Broadband</td><td>$10</td><td>$20</td></tr>
</tbody></table></body></html>
"""
HTML_PAGE_EXP_B = """
<html><body><div>Last updated on March 3, 2024</div>
<table class="results_table">
<thead><tr><th>Category</th><th>2 Adults</th></tr></thead>
<tbody><tr><td>Poverty Wage</td><td>$8.00</td></tr></tbody>
</table>
<table class="results_table">
<thead><tr><th>Category</th><th>2 Adults</th><th>3 Adults (All Working)</th></tr></thead>
<tbody>
<tr><td>Health Care</td><td>$3,000</td><td>$4,000</td></tr>
<tr><td>Food</td><td>$5,000</td><td>bad</td></tr>
</tbody></table></body></html>
"""

# expected parse of the SECOND results_table of each fixture page:
# (page_id, updated_raw, category, adults, working_adults, children, raw)
EXPENSE_EXPECTED_PARSE = [
    ("6075", "February 2, 2025", "Food", 1, 1, 0, "$4,686"),
    ("6075", "February 2, 2025", "Food", 2, 1, 1, "$10,345"),
    ("6075", "February 2, 2025", "Food", 2, 1, 2, "$13,999"),
    ("6075", "February 2, 2025", "Child Care", 1, 1, 0, "$0"),
    ("6075", "February 2, 2025", "Child Care", 2, 1, 1, "$8,000"),
    ("6075", "February 2, 2025", "Child Care", 2, 1, 2, "$16,000"),
    ("6075", "February 2, 2025", "Housing", 1, 1, 0, "$17,000"),
    ("6075", "February 2, 2025", "Housing", 2, 1, 1, "$20,000"),
    ("6075", "February 2, 2025", "Housing", 2, 1, 2, "$22,000"),
    ("6075", "February 2, 2025", "Transportation", 1, 1, 0, "$5,316"),
    ("6075", "February 2, 2025", "Transportation", 2, 1, 1, "$10,000"),
    ("6075", "February 2, 2025", "Transportation", 2, 1, 2, "$11,000"),
    ("6075", "February 2, 2025", "Medical", 1, 1, 0, "$2,522"),
    ("6075", "February 2, 2025", "Medical", 2, 1, 1, "$7,000"),
    ("6075", "February 2, 2025", "Medical", 2, 1, 2, "$7,500"),
    ("6075", "February 2, 2025", "Internet & Mobile", 1, 1, 0, "$1,004"),
    ("6075", "February 2, 2025", "Internet & Mobile", 2, 1, 1, "$1,100"),
    ("6075", "February 2, 2025", "Internet & Mobile", 2, 1, 2, "$1,200"),
    ("6075", "February 2, 2025", "Civic", 1, 1, 0, "$2,500"),
    ("6075", "February 2, 2025", "Civic", 2, 1, 1, "$4,000"),
    ("6075", "February 2, 2025", "Civic", 2, 1, 2, "$4,600"),
    ("6075", "February 2, 2025", "Other", 1, 1, 0, "$4,000"),
    ("6075", "February 2, 2025", "Other", 2, 1, 1, "$6,000"),
    ("6075", "February 2, 2025", "Other", 2, 1, 2, "$7,000"),
    ("6075", "February 2, 2025", "Required annual income after taxes", 1, 1, 0, "$45,000"),
    ("6075", "February 2, 2025", "Required annual income after taxes", 2, 1, 1, "$70,000"),
    ("6075", "February 2, 2025", "Required annual income after taxes", 2, 1, 2, "$85,000"),
    ("6075", "February 2, 2025", "Annual Taxes", 1, 1, 0, "$8,000"),
    ("6075", "February 2, 2025", "Annual Taxes", 2, 1, 1, "$12,000"),
    ("6075", "February 2, 2025", "Annual Taxes", 2, 1, 2, "$15,000"),
    ("6075", "February 2, 2025", "Required annual income before taxes", 1, 1, 0, "$53,000"),
    ("6075", "February 2, 2025", "Required annual income before taxes", 2, 1, 1, "$82,000"),
    ("6075", "February 2, 2025", "Required annual income before taxes", 2, 1, 2, "$100,000"),
    ("6075", "February 2, 2025", "Broadband", 1, 1, 0, "$10"),
    ("6075", "February 2, 2025", "Broadband", 2, 1, 1, "$20"),
    ("6075", "February 2, 2025", "Broadband", 2, 1, 2, ""),  # ragged row pad
    ("7", "March 3, 2024", "Health Care", 2, 2, 0, "$3,000"),
    ("7", "March 3, 2024", "Health Care", None, None, None, "$4,000"),  # unknown family
    ("7", "March 3, 2024", "Food", 2, 2, 0, "$5,000"),
    ("7", "March 3, 2024", "Food", None, None, None, "bad"),  # unparseable -> 0.0
]


def q_expense_extract_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """The EXPENSES half of the reference's page (wage_scraper.py:60-73
    requires >=2 results_tables; tables[1] -> normalize_expenses,
    pandas_ops.py:174-212): multi-table HTML scan with table_idx -> melt ->
    family broadcast join -> 17-entry CATEGORY_MAP canonicalize incl.
    aliases (Medical/Health Care -> healthcare, Internet & Mobile ->
    internet_mobile, derived-income categories) -> currency clean ->
    annual_amount -> the 11-enum ExpenseRecord gate (models.py:65-87).
    The oracle encodes the EXPECTED parse of the SECOND table as VALUES and
    replays the same transform in SQL."""
    from wage_etl_spark.operators.reshape import normalize_expense_pages
    from wage_etl_spark.sources.html_table import scan_html_tables

    pages = fixture_df(
        spark,
        [("6075", HTML_PAGE_EXP_A), ("7", HTML_PAGE_EXP_B)],
        "page_id string, html string",
    )  # 2 fixture rows: one Arrow batch / one python worker, not 32 near-empty tasks
    out = normalize_expense_pages(scan_html_tables(pages, min_tables=2))
    return out.select(
        "county_fips", "page_updated_at",
        F.col("adults").cast("int").alias("adults"),
        F.col("working_adults").cast("int").alias("working_adults"),
        F.col("children").cast("int").alias("children"),
        "expense_category", F.round("annual_amount", 2).alias("annual_amount"), "valid",
    )


def q_html_extract_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's whole extract lifecycle (main.py:32-135) as one plan:
    HTML results-table scan (S3: colspan composite headers, ragged-row
    repair, decoy-table skip, updated-stamp extraction) -> melt (U2) ->
    family broadcast join (J1) -> category canonicalize + slug (J2/F3/F4)
    -> currency clean (F1) -> zfill key + date parse (F5/F6) -> model gate.
    The oracle encodes the EXPECTED parse as VALUES and replays the same
    transform in SQL, so a parser/normalizer divergence breaks the hash."""
    from wage_etl_spark.operators.reshape import normalize_scanned_pages
    from wage_etl_spark.sources.html_table import scan_html_tables

    pages = fixture_df(
        spark, [("34001", HTML_PAGE_1), ("7", HTML_PAGE_2)], "page_id string, html string"
    )  # see q_expense_extract_lifecycle: fixture-sized input, single task
    out = normalize_scanned_pages(scan_html_tables(pages))
    return out.select(
        "county_fips", "page_updated_at",
        F.col("adults").cast("int").alias("adults"),
        F.col("working_adults").cast("int").alias("working_adults"),
        F.col("children").cast("int").alias("children"),
        "wage_type", F.round("hourly_wage", 2).alias("hourly_wage"), "valid",
    )


# expected parse of the two HTML fixtures: (page_id, updated_raw, category,
# adults, working_adults, children, raw_cell) — one row per (category,
# family-header) pair, family-join results pre-resolved
HTML_EXPECTED_PARSE = [
    ("34001", "January 15, 2025", "Living Wage", 1, 1, 0, "$18.71"),
    ("34001", "January 15, 2025", "Living Wage", 2, 1, 1, "$38.87"),
    ("34001", "January 15, 2025", "Living Wage", 2, 1, 2, "$45.10"),
    ("34001", "January 15, 2025", "Poverty Wage", 1, 1, 0, "$6.19"),
    ("34001", "January 15, 2025", "Poverty Wage", 2, 1, 1, "$10.56"),
    ("34001", "January 15, 2025", "Poverty Wage", 2, 1, 2, "$13.30"),
    ("34001", "January 15, 2025", "Minimum Wage", 1, 1, 0, "$15.13"),
    ("34001", "January 15, 2025", "Minimum Wage", 2, 1, 1, "$15.13"),
    ("34001", "January 15, 2025", "Minimum Wage", 2, 1, 2, ""),  # ragged row pad
    ("34001", "January 15, 2025", "Typical Expenses", 1, 1, 0, "$3,442"),
    ("34001", "January 15, 2025", "Typical Expenses", 2, 1, 1, "invalid"),
    ("34001", "January 15, 2025", "Typical Expenses", 2, 1, 2, ""),
    ("7", "March 3, 2024", "Living Wage", 2, 2, 0, "$20.00"),
    ("7", "March 3, 2024", "Living Wage", None, None, None, "$25.00"),  # unknown family
    ("7", "March 3, 2024", "Poverty Wage", 2, 2, 0, "$8.00"),
    ("7", "March 3, 2024", "Poverty Wage", None, None, None, "$9.00"),
]


# ---------------------------------------------------------- multimodal

def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal decode/feature-extract through the REAL engine path:
    genuine PNG/WAV bytes (pure-stdlib synthesized, deterministic) in a
    binary column, decoded by mapInPandas Arrow-batched pure-stdlib
    decoders (sources/multimodal.py: PNG IHDR/IDAT/unfilter pixel mean,
    WAV RIFF-walk int16 PCM RMS). The oracle is the SAME decode run
    directly in Python at oracle-build time (no Spark, no Arrow) emitted as
    literal rows — so the hash check verifies the distributed plumbing:
    binary-column round-trip through Arrow batches, mapInPandas schema,
    null handling per mime."""
    from wage_etl_spark.sources.multimodal import extract_features, synthesize_real_media

    media = synthesize_real_media(spark, n=30, seed=7)
    return extract_features(media, decoder="real").select(
        "media_id", "mime", "n_bytes", "sha256", "feat_mean",
        "dec_width", "dec_height", "dec_bit_depth", "dec_channels",
        "dec_sample_rate", "dec_n_samples", "dec_mean",
    )


def q_multimodal_frame_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling PLUMBING (the decode itself is the documented
    NotImplementedError seam): each video row explodes JVM-side into its
    sampled frame timestamps via sequence()+explode — only sampled offsets
    would ever reach a decoder. Media metadata is pure arithmetic so the
    DuckDB oracle regenerates it independently (generate_series+unnest)."""
    from wage_etl_spark.sources.multimodal import frame_sample_plan

    media = spark.range(60).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("mime"),
        (F.lit(100) + (F.col("id") * 37) % 60000).cast("int").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", F.col("frame_ts_ms").cast("int").alias("frame_ts_ms"), "mime"
    )


def _multimodal_oracle_values() -> str:
    """Literal oracle rows for q_multimodal_features: the same pure-stdlib
    synth + decode run driver-side (plain Python, no Spark/Arrow)."""
    import hashlib

    from wage_etl_spark.sources.multimodal import (
        decode_png, decode_wav, make_png, make_wav,
    )

    dec_cols = [
        "dec_width", "dec_height", "dec_bit_depth", "dec_channels",
        "dec_sample_rate", "dec_n_samples", "dec_mean",
    ]
    rows = []
    for i in range(30):  # mirrors synthesize_real_media(n=30, seed=7)
        if i % 2 == 0:
            w, h = 8 + (i % 5), 6 + (i % 4)
            mime, blob = "image/png", make_png(w, h, 7 + i)
            d = decode_png(blob)
        else:
            ns = 500 + 37 * i
            mime, blob = "audio/wav", make_wav(ns, seed=7 + i)
            d = decode_wav(blob)
        vals = [
            str(i), f"'{mime}'", str(len(blob)),
            f"'{hashlib.sha256(blob).hexdigest()}'",
            f"'{hashlib.md5(blob[:256]).hexdigest()}'",
        ]
        for c in dec_cols:
            v = d.get(c)
            if v is None:
                vals.append("NULL")
            elif isinstance(v, str):
                vals.append(f"'{v}'")
            else:
                vals.append(str(v))
        rows.append("(" + ", ".join(vals) + ")")
    return ", ".join(rows)


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC last-writer-wins state on sf0.001."""
    return q_cdc_lww_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_state": q_cdc_lww_state,
        "cdc_validate_split": q_cdc_validate_split,
        "events_sessionize": q_events_sessionize,
        "latest_event_top1": q_latest_event_top1,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_local_supplier": q5_local_supplier,
        "broadcast_enum_join": q_broadcast_enum_join,
        "unpivot_lineitem": q_unpivot_lineitem,
        "currency_clean": q_currency_clean,
        "fips_key_functions": q_fips_key_functions,
        "header_normalize": q_header_normalize,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "token_fingerprint": q_token_fingerprint,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "embedding_topk": q_embedding_topk,
        "embedding_centroids": q_embedding_centroids,
        "wage_normalize": q_wage_normalize,
        "events_hourly_rollup": q_events_hourly_rollup,
        "top2_customers_per_nation": q_top2_customers_per_nation,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_near_dups": q_simhash_near_dups,
        "html_extract_lifecycle": q_html_extract_lifecycle,
        "expense_extract_lifecycle": q_expense_extract_lifecycle,
        "lsh_jaccard_verified": q_lsh_jaccard_verified,
        "embedding_ann_ivf": q_embedding_ann_ivf,
        "embedding_cosine_dups": q_embedding_cosine_dups,
        "embedding_ann_multiprobe": q_embedding_ann_multiprobe,
        "hyperplane_lsh_buckets": q_hyperplane_lsh_buckets,
        "embedding_cosine_dups_scaled": q_embedding_cosine_dups_scaled,
        "dedup_clusters": q_dedup_clusters,
        "multimodal_features": q_multimodal_features,
        "multimodal_frame_plan": q_multimodal_frame_plan,
    }


_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(generate_series(1, len({a})), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
    "(s, x) -> s + x)"
)
_NORM = (
    "sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(generate_series(1, len({a})), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)), "
    "(s, x) -> s + x))"
)


def _cos(a: str, b: str) -> str:
    return f"({_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)}))"


_TOKENS = "regexp_split_to_array(trim({c}), '\\s+')"


def _shingles_of(col: str) -> str:
    # blank/whitespace-only docs yield [] (no shingles), mirroring the Spark
    # side's ws_tokens -> token_shingles behavior (dedupe.py), so blank docs
    # get no minhash signature rows in EITHER engine
    t = _TOKENS.format(c=col)
    return (
        f"CASE WHEN trim({col}) = '' THEN []::VARCHAR[] ELSE "
        f"list_distinct(list_transform(generate_series(1, greatest(len({t}) - 2, 1)), "
        f"i -> array_to_string(({t})[i:i+2], ' '))) END"
    )


def oracle_sql() -> dict[str, str]:
    toks = _TOKENS.format(c="text")
    shingles = _shingles_of("text")
    lang_score = {
        lang: " + ".join(
            f"((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '{m}', ''))) // {len(m)})"
            for m in ms
        )
        for lang, ms in T.LANG_MARKERS.items()
    }
    lang_case = " ".join(
        f"WHEN s_{lang} = g THEN '{lang}'" for lang in T.LANG_MARKERS
    )
    money_values = ", ".join(
        f"({i}, {repr(s) if s is not None else 'NULL'})" for i, s in MONEY_FIXTURE
    ).replace("'NULL'", "NULL")
    wage_values = ", ".join(f"({repr(c)}, {repr(a)}, {repr(b)})" for c, a, b in WAGE_WIDE_FIXTURE)

    def _sqlv(v):
        return "NULL" if v is None else (repr(v) if isinstance(v, str) else str(v))

    html_parse_values = ", ".join(
        "(" + ", ".join(_sqlv(v) for v in row) + ")" for row in HTML_EXPECTED_PARSE
    )
    expense_parse_values = ", ".join(
        "(" + ", ".join(_sqlv(v) for v in row) + ")" for row in EXPENSE_EXPECTED_PARSE
    )
    # the 17-entry CATEGORY_MAP as a SQL CASE over the normalized key
    # (reference constants.py:20-44 + normalizers.py:50-72)
    category_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in R.CATEGORY_MAP.items()
    )
    expense_enum = ", ".join(f"'{c}'" for c in R.EXPENSE_CATEGORIES)

    return {
        "cdc_lww_state": """
            WITH ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
              FROM events
            ), counts AS (
              SELECT user_id, count(*)::BIGINT n_events FROM events GROUP BY user_id
            )
            SELECT r.user_id, r.event_type AS last_event_type,
                   round(r.value, 2) AS last_value, r.ts AS last_ts, c.n_events
            FROM ranked r JOIN counts c USING (user_id) WHERE r.rn = 1
        """,
        "cdc_validate_split": """
            SELECT CASE WHEN reasons = '' THEN '(valid)' ELSE reasons END AS rejection_reason,
                   count(*)::BIGINT AS n
            FROM (
              SELECT concat_ws(';',
                CASE WHEN event_type NOT IN ('signup','click','view','purchase') THEN 'bad_event_type' END,
                CASE WHEN user_id IS NULL THEN 'null_user' END,
                CASE WHEN NOT (value IS NOT NULL AND value >= 0 AND value <= 300) THEN 'value_out_of_range' END
              ) AS reasons FROM events
            ) GROUP BY 1
        """,
        "events_sessionize": """
            SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
            FROM (
              SELECT user_id,
                     CASE WHEN floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                          WHEN floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 THEN 1
                          ELSE 0 END AS new_sess
              FROM events
            ) GROUP BY user_id
        """,
        "latest_event_top1": """
            SELECT event_id, user_id, event_type, ts FROM events
            ORDER BY ts DESC, event_id DESC LIMIT 1
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*)::BIGINT AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "q5_local_supplier": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
        """,
        "broadcast_enum_join": """
            WITH dim(event_type, category) AS (VALUES
              ('signup','acquisition'), ('click','engagement'),
              ('view','engagement'), ('purchase','revenue'))
            SELECT coalesce(d.category,
                     replace(trim(regexp_replace(lower(e.event_type), '[^\\w]+', ' ', 'g')), ' ', '_')
                   ) AS category,
                   count(*)::BIGINT AS n, round(sum(e.value), 2) AS total_value
            FROM events e LEFT JOIN dim d USING (event_type)
            GROUP BY 1
        """,
        "unpivot_lineitem": """
            SELECT measure, round(sum(value), 2) AS total, count(*)::BIGINT AS n
            FROM (
              SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
              UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
              UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
              UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
            ) GROUP BY measure
        """,
        "currency_clean": f"""
            SELECT id, raw,
                   coalesce(try_cast(trim(regexp_replace(raw, '[\\$,]', '', 'g')) AS DOUBLE), 0.0) AS amount
            FROM (VALUES {money_values}) AS t(id, raw)
        """,
        "fips_key_functions": """
            SELECT n_nationkey,
                   lpad(n_nationkey::VARCHAR, 5, '0') AS nation_fips,
                   lpad(n_regionkey::VARCHAR, 2, '0') || lpad(n_nationkey::VARCHAR, 3, '0') AS full_fips,
                   substr(n_name, 1, 3) AS name_prefix,
                   upper(n_name) AS name_upper
            FROM nation
        """,
        "header_normalize": """
            SELECT trim(regexp_replace(lower(p_type), '[^\\w]+', ' ', 'g')) AS type_key,
                   replace(trim(regexp_replace(lower(p_type), '[^\\w]+', ' ', 'g')), ' ', '_') AS type_slug,
                   count(*)::BIGINT AS n
            FROM part GROUP BY 1, 2
        """,
        "text_quality": f"""
            SELECT doc_id,
                   len({toks})::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe_tokens,
                   round(list_reduce(list_prepend(0::BIGINT, list_transform({toks}, t -> length(t)::BIGINT)), (a,b) -> a+b)
                         / greatest(len({toks}), 1), 4) AS avg_token_len,
                   round(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(least(len({toks}) / 100.0, 1.0) * 0.4
                         + (CASE WHEN (list_reduce(list_prepend(0::BIGINT, list_transform({toks}, t -> length(t)::BIGINT)), (a,b) -> a+b)
                                       / greatest(len({toks}), 1)) BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END) * 0.4
                         + greatest(0.0, 1.0 - (length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                                                / greatest(length(text), 1)) * 5) * 0.2, 6) AS quality
            FROM documents
        """,
        "lang_id": f"""
            WITH scored AS (
              SELECT doc_id, lang,
                     {', '.join(f'({expr}) AS s_{lang}' for lang, expr in lang_score.items())}
              FROM documents
            ), g AS (
              SELECT *, greatest({', '.join('s_' + l for l in T.LANG_MARKERS)}) AS g FROM scored
            )
            SELECT lang, CASE {lang_case} END AS predicted_lang, count(*)::BIGINT AS n
            FROM g GROUP BY 1, 2
        """,
        "token_fingerprint": f"""
            SELECT doc_id,
                   list_reduce(list_prepend(0::BIGINT,
                     list_transform({toks}, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
                     (h, t) -> (h * 1000003 + t) % 1000000007) AS fingerprint
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id)::BIGINT AS keeper_id, count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1
        """,
        "minhash_signatures": f"""
            SELECT doc_id, j::BIGINT AS h_idx,
                   list_min(list_transform({shingles},
                     s -> ('0x' || substr(md5(s || '#' || (j // 4)), (j % 4) * 8 + 1, 8))::BIGINT)) AS minhash
            FROM documents, generate_series(0, 7) AS t(j)
        """,
        "embedding_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 97 = 0),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     {_cos('q.qv', 'e.embedding')} AS cos_exact
              FROM embeddings e JOIN q ON e.vec_id <> q.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY round(cos_exact, 6) DESC, neighbor_id ASC) AS rank,
                     cos_exact
              FROM scored
            )
            SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos_exact, 4) AS cosine
            FROM ranked WHERE rank <= 3
        """,
        "wage_normalize": f"""
            WITH wide(category, h1, h2) AS (VALUES {wage_values}),
            melted AS (
              SELECT category, 1 AS adults, 1 AS working_adults, 0 AS children, h1 AS raw FROM wide
              UNION ALL
              SELECT category, 2, 1, 1, h2 FROM wide
            )
            SELECT '34001' AS county_fips, DATE '2025-01-15' AS page_updated_at,
                   adults::INT AS adults, working_adults::INT AS working_adults,
                   children::INT AS children,
                   CASE lower(category)
                     WHEN 'living wage' THEN 'living'
                     WHEN 'poverty wage' THEN 'poverty'
                     WHEN 'minimum wage' THEN 'minimum'
                     ELSE replace(trim(regexp_replace(lower(category), '[^\\w]+', ' ', 'g')), ' ', '_')
                   END AS wage_type,
                   round(coalesce(try_cast(trim(regexp_replace(raw, '[\\$,]', '', 'g')) AS DOUBLE), 0.0), 2) AS hourly_wage
            FROM melted
        """,
        "events_hourly_rollup": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
                   event_type,
                   count(*)::BIGINT AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "top2_customers_per_nation": """
            WITH spend AS (
              SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
              FROM orders GROUP BY o_custkey
            ), ranked AS (
              SELECT n.n_name, c.c_custkey, s.spend,
                     row_number() OVER (PARTITION BY n.n_name
                                        ORDER BY s.spend DESC, c.c_custkey ASC) AS rnk
              FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
            )
            SELECT n_name, c_custkey::BIGINT AS c_custkey, spend, rnk::BIGINT AS rnk
            FROM ranked WHERE rnk <= 2
        """,
        "expense_extract_lifecycle": f"""
            WITH parsed(page_id, updated_raw, category, adults, working_adults, children, raw)
              AS (VALUES {expense_parse_values}),
            typed AS (
              SELECT *,
                     CASE trim(regexp_replace(lower(category), '[^\\w]+', ' ', 'g'))
                       {category_case}
                       ELSE replace(trim(regexp_replace(lower(category), '[^\\w]+', ' ', 'g')), ' ', '_')
                     END AS expense_category,
                     round(coalesce(try_cast(trim(regexp_replace(raw, '[\\$,]', '', 'g')) AS DOUBLE), 0.0), 2) AS annual_amount
              FROM parsed
            )
            SELECT lpad(page_id, 5, '0') AS county_fips,
                   strptime(updated_raw, '%B %d, %Y')::DATE AS page_updated_at,
                   adults::INT AS adults, working_adults::INT AS working_adults,
                   children::INT AS children, expense_category, annual_amount,
                   coalesce(adults IN (1, 2) AND working_adults >= 1
                            AND working_adults <= adults AND children BETWEEN 0 AND 3
                            AND expense_category IN ({expense_enum})
                            AND annual_amount >= 0, false) AS valid
            FROM typed
        """,
        "html_extract_lifecycle": f"""
            WITH parsed(page_id, updated_raw, category, adults, working_adults, children, raw)
              AS (VALUES {html_parse_values}),
            typed AS (
              SELECT *,
                     CASE lower(category)
                       WHEN 'living wage' THEN 'living'
                       WHEN 'poverty wage' THEN 'poverty'
                       WHEN 'minimum wage' THEN 'minimum'
                       ELSE replace(trim(regexp_replace(lower(category), '[^\\w]+', ' ', 'g')), ' ', '_')
                     END AS wage_type
              FROM parsed
            )
            SELECT lpad(page_id, 5, '0') AS county_fips,
                   strptime(updated_raw, '%B %d, %Y')::DATE AS page_updated_at,
                   adults::INT AS adults, working_adults::INT AS working_adults,
                   children::INT AS children, wage_type,
                   round(coalesce(try_cast(trim(regexp_replace(raw, '[\\$,]', '', 'g')) AS DOUBLE), 0.0), 2) AS hourly_wage,
                   (adults IS NOT NULL AND wage_type IN ('living', 'poverty', 'minimum')) AS valid
            FROM typed
        """,
        # Mirrors operators/dedupe.py:minhash_lsh_pairs (num_hashes=16,
        # bands=8 -> r=2, k=3): signature -> (band_id, band_hash) rows ->
        # self-join -> max fraction-of-equal-positions per pair.
        "minhash_lsh_pairs": f"""
            WITH sig AS (
              SELECT doc_id,
                     list_transform(generate_series(0, 15),
                       j -> list_min(list_transform({shingles},
                              s -> ('0x' || substr(md5(s || '#' || (j // 4)), (j % 4) * 8 + 1, 8))::BIGINT))) AS signature
              FROM documents
            ), banded AS (
              SELECT doc_id, signature, b AS band_id,
                     md5(array_to_string(signature[b*2+1:b*2+2], ',')) AS band_hash
              FROM sig, generate_series(0, 7) AS t(b)
            ), pairs AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                     len(list_filter(list_transform(generate_series(1, 16),
                           i -> l.signature[i] = r.signature[i]), x -> x)) / 16.0 AS jaccard_est
              FROM banded l JOIN banded r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
            )
            SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
                   round(max(jaccard_est), 4) AS jaccard_est
            FROM pairs GROUP BY 1, 2
        """,
        # Oracle for operators/dedupe.py:simhash_near_dups on the DEFAULT
        # multi-table plan (n_tables = max_hamming + 1 = 4, 15-bit blocks):
        # by pigeonhole its output is EXACTLY all pairs with hamming <= 3,
        # so the oracle is brute-force all-pairs — strictly stronger than
        # replaying the bucketing (it would catch a recall bug in the block
        # scheme).
        "simhash_near_dups": f"""
            WITH h AS (
              SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
              FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)
            ), votes AS (
              SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM h, generate_series(0, 59) AS g(b)
              GROUP BY doc_id, b
            ), sim AS (
              SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
              FROM votes GROUP BY doc_id
            )
            SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # LSH candidates (same CTEs as minhash_lsh_pairs) -> exact shingle
        # Jaccard on candidates only (mirrors dedupe.ngram_jaccard)
        "lsh_jaccard_verified": f"""
            WITH sig AS (
              SELECT doc_id,
                     list_transform(generate_series(0, 15),
                       j -> list_min(list_transform({shingles},
                              s -> ('0x' || substr(md5(s || '#' || (j // 4)), (j % 4) * 8 + 1, 8))::BIGINT))) AS signature
              FROM documents
            ), banded AS (
              SELECT doc_id, b AS band_id,
                     md5(array_to_string(signature[b*2+1:b*2+2], ',')) AS band_hash
              FROM sig, generate_series(0, 7) AS t(b)
            ), cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
              FROM banded l JOIN banded r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
            ), verified AS (
              SELECT id_a, id_b,
                     len(list_distinct(list_intersect(sa, sb)))::DOUBLE
                       / greatest(len(list_distinct(list_concat(sa, sb))), 1) AS jaccard
              FROM (
                SELECT c.id_a, c.id_b,
                       {_shingles_of('d1.text')} AS sa,
                       {_shingles_of('d2.text')} AS sb
                FROM cand c
                JOIN documents d1 ON d1.doc_id = c.id_a
                JOIN documents d2 ON d2.doc_id = c.id_b
              )
            )
            SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, round(jaccard, 4) AS jaccard
            FROM verified WHERE jaccard >= 0.5
        """,
        # Oracle for operators/dedupe.py:dedup_clusters — the SAME verified
        # LSH pair pipeline, then a RECURSIVE transitive closure (a totally
        # different algorithm from the Spark side's pointer-jumping
        # propagation): reach(n, m) = m reachable from n, cluster = min(m).
        "dedup_clusters": f"""
            WITH RECURSIVE sig AS (
              SELECT doc_id,
                     list_transform(generate_series(0, 15),
                       j -> list_min(list_transform({shingles},
                              s -> ('0x' || substr(md5(s || '#' || (j // 4)), (j % 4) * 8 + 1, 8))::BIGINT))) AS signature
              FROM documents
            ), banded AS (
              SELECT doc_id, b AS band_id,
                     md5(array_to_string(signature[b*2+1:b*2+2], ',')) AS band_hash
              FROM sig, generate_series(0, 7) AS t(b)
            ), cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
              FROM banded l JOIN banded r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
            ), verified AS (
              SELECT id_a, id_b,
                     len(list_distinct(list_intersect(sa, sb)))::DOUBLE
                       / greatest(len(list_distinct(list_concat(sa, sb))), 1) AS jaccard
              FROM (
                SELECT c.id_a, c.id_b,
                       {_shingles_of('d1.text')} AS sa,
                       {_shingles_of('d2.text')} AS sb
                FROM cand c
                JOIN documents d1 ON d1.doc_id = c.id_a
                JOIN documents d2 ON d2.doc_id = c.id_b
              )
            ), near AS (
              SELECT id_a, id_b FROM verified WHERE jaccard >= 0.5
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM near
              UNION
              SELECT id_b, id_a FROM near
            ), reach(n, m) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.a, r.m FROM edges e JOIN reach r ON r.n = e.b
            )
            SELECT n::BIGINT AS doc_id, min(m)::BIGINT AS cluster_id
            FROM reach GROUP BY n
        """,
        # IVF two-stage ANN: centroid assignment (as embedding_centroids),
        # then exact cosine top-3 probing only the query's cluster
        # Mirrors operators/similarity.py::cosine_near_dups: same rounded
        # centroids + nearest-label assignment as embedding_ann_ivf, then
        # within-label pairs with round(cosine,4) >= 0.35.
        "embedding_cosine_dups": f"""
            WITH comp AS (
              SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 8) AS v
              FROM embeddings, generate_series(1, 64) AS t(i)
              GROUP BY label, i
            ), cents AS (
              SELECT label, list(v ORDER BY pos) AS centroid FROM comp GROUP BY label
            ), scored0 AS (
              SELECT e.vec_id, c.label, {_cos('e.embedding', 'c.centroid')} AS sim_exact
              FROM embeddings e CROSS JOIN cents c
            ), assigned AS (
              SELECT vec_id, label AS assigned_label FROM (
                SELECT vec_id, label,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY round(sim_exact, 6) DESC, label ASC) AS rn
                FROM scored0
              ) WHERE rn = 1
            ), corpus AS (
              SELECT e.vec_id, e.embedding, a.assigned_label
              FROM embeddings e JOIN assigned a USING (vec_id)
            )
            SELECT a.vec_id::BIGINT AS id_a, b.vec_id::BIGINT AS id_b,
                   round({_cos('a.embedding', 'b.embedding')}, 4) AS cosine
            FROM corpus a JOIN corpus b
              ON a.assigned_label = b.assigned_label AND a.vec_id < b.vec_id
            WHERE round({_cos('a.embedding', 'b.embedding')}, 4) >= 0.35
        """,
        "embedding_ann_ivf": f"""
            WITH comp AS (
              SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 8) AS v
              FROM embeddings, generate_series(1, 64) AS t(i)
              GROUP BY label, i
            ), cents AS (
              SELECT label, list(v ORDER BY pos) AS centroid FROM comp GROUP BY label
            ), scored0 AS (
              SELECT e.vec_id, c.label, {_cos('e.embedding', 'c.centroid')} AS sim_exact
              FROM embeddings e CROSS JOIN cents c
            ), assigned AS (
              SELECT vec_id, label AS assigned_label FROM (
                SELECT vec_id, label,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY round(sim_exact, 6) DESC, label ASC) AS rn
                FROM scored0
              ) WHERE rn = 1
            ), corpus AS (
              SELECT e.vec_id, e.embedding, a.assigned_label
              FROM embeddings e JOIN assigned a USING (vec_id)
            ), q AS (
              SELECT vec_id AS query_id, embedding AS qv, assigned_label AS q_label
              FROM corpus WHERE vec_id % 97 = 0
            ), scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     {_cos('q.qv', 'c.embedding')} AS cos_exact
              FROM corpus c JOIN q ON c.assigned_label = q.q_label AND c.vec_id <> q.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY round(cos_exact, 6) DESC, neighbor_id ASC) AS rank,
                     cos_exact
              FROM scored
            )
            SELECT query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id,
                   rank::BIGINT AS rank, round(cos_exact, 4) AS cosine
            FROM ranked WHERE rank <= 3
        """,
        # ivf_ann_topk at nprobe=2: same construction, but each query joins
        # through BOTH of its top-2 centroid labels (probe ranks rn <= 2);
        # the corpus index stays single-assigned so no pair dedup is needed.
        "embedding_ann_multiprobe": f"""
            WITH comp AS (
              SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 8) AS v
              FROM embeddings, generate_series(1, 64) AS t(i)
              GROUP BY label, i
            ), cents AS (
              SELECT label, list(v ORDER BY pos) AS centroid FROM comp GROUP BY label
            ), scored0 AS (
              SELECT e.vec_id, c.label, {_cos('e.embedding', 'c.centroid')} AS sim_exact
              FROM embeddings e CROSS JOIN cents c
            ), assigned AS (
              SELECT vec_id, label AS assigned_label FROM (
                SELECT vec_id, label,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY round(sim_exact, 6) DESC, label ASC) AS rn
                FROM scored0
              ) WHERE rn = 1
            ), corpus AS (
              SELECT e.vec_id, e.embedding, a.assigned_label
              FROM embeddings e JOIN assigned a USING (vec_id)
            ), qprobe AS (
              SELECT vec_id AS query_id, label AS q_label FROM (
                SELECT vec_id, label,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY round(sim_exact, 6) DESC, label ASC) AS rn
                FROM scored0 WHERE vec_id % 97 = 0
              ) WHERE rn <= 2
            ), q AS (
              SELECT p.query_id, e.embedding AS qv, p.q_label
              FROM qprobe p JOIN embeddings e ON e.vec_id = p.query_id
            ), scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     {_cos('q.qv', 'c.embedding')} AS cos_exact
              FROM corpus c JOIN q ON c.assigned_label = q.q_label AND c.vec_id <> q.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY round(cos_exact, 6) DESC, neighbor_id ASC) AS rank,
                     cos_exact
              FROM scored
            )
            SELECT query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id,
                   rank::BIGINT AS rank, round(cos_exact, 4) AS cosine
            FROM ranked WHERE rank <= 3
        """,
        "embedding_centroids": f"""
            WITH comp AS (
              SELECT label, i AS pos, round(avg(embedding[i]::DOUBLE), 8) AS v
              FROM embeddings, generate_series(1, 64) AS t(i)
              GROUP BY label, i
            ), cents AS (
              SELECT label, list(v ORDER BY pos) AS centroid FROM comp GROUP BY label
            ), scored AS (
              SELECT e.vec_id, c.label, {_cos('e.embedding', 'c.centroid')} AS sim_exact
              FROM embeddings e CROSS JOIN cents c
            ), ranked AS (
              SELECT vec_id, label, sim_exact,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY round(sim_exact, 6) DESC, label ASC) AS rn
              FROM scored
            )
            SELECT vec_id, label::BIGINT AS assigned_label, round(sim_exact, 4) AS sim
            FROM ranked WHERE rn = 1
        """,
        # Oracle for operators/similarity.py:hyperplane_lsh_buckets — replays
        # the md5-derived +/-1 hyperplanes and the projection's SEQUENTIAL
        # left-fold sum (list_reduce over list_prepend mirrors Spark's
        # F.aggregate element order, so the FP result is identical), then
        # packs bit p = (proj_p > 0) into the bucket id.
        "hyperplane_lsh_buckets": """
            WITH proj AS (
              SELECT e.vec_id, gp.p,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, len(e.embedding)),
                         i -> e.embedding[i]::DOUBLE *
                              (CASE WHEN ('0x' || substr(md5(concat(42, '|', gp.p, '|', i - 1)), 1, 2))::BIGINT % 2 = 0
                                    THEN 1.0 ELSE -1.0 END))),
                       (s, x) -> s + x) AS proj
              FROM embeddings e, generate_series(0, 7) AS gp(p)
            )
            SELECT vec_id,
                   sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS lsh_bucket
            FROM proj GROUP BY vec_id
        """,
        # Oracle for similarity.py:cosine_near_dups_scaled: the sizing rule
        # n_planes = max(2, ceil(log2(max(n/32, 2)))) is computed from
        # count(*) exactly as the operator does, buckets replayed as in
        # hyperplane_lsh_buckets, then the embedding_cosine_dups pattern
        # with bucket centroids instead of the data's 10 labels.
        "embedding_cosine_dups_scaled": f"""
            WITH sz AS (
              SELECT greatest(2, CAST(ceil(log2(greatest(count(*) / 32.0, 2.0))) AS INT)) AS np
              FROM embeddings
            ), proj AS (
              SELECT e.vec_id, gp.p,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, len(e.embedding)),
                         i -> e.embedding[i]::DOUBLE *
                              (CASE WHEN ('0x' || substr(md5(concat(42, '|', gp.p, '|', i - 1)), 1, 2))::BIGINT % 2 = 0
                                    THEN 1.0 ELSE -1.0 END))),
                       (s, x) -> s + x) AS proj
              FROM embeddings e, generate_series(0, 15) AS gp(p), sz
              WHERE gp.p < sz.np
            ), buckets AS (
              SELECT vec_id,
                     sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS lsh_bucket
              FROM proj GROUP BY vec_id
            ), lab AS (
              SELECT e.vec_id, e.embedding, b.lsh_bucket FROM embeddings e
              JOIN buckets b USING (vec_id)
            ), comp AS (
              SELECT lsh_bucket, i AS pos, round(avg(embedding[i]::DOUBLE), 8) AS v
              FROM lab, generate_series(1, 64) AS t(i)
              GROUP BY lsh_bucket, i
            ), cents AS (
              SELECT lsh_bucket, list(v ORDER BY pos) AS centroid FROM comp GROUP BY lsh_bucket
            ), scored0 AS (
              SELECT e.vec_id, c.lsh_bucket, {_cos('e.embedding', 'c.centroid')} AS sim_exact
              FROM embeddings e CROSS JOIN cents c
            ), assigned AS (
              SELECT vec_id, lsh_bucket AS assigned_label FROM (
                SELECT vec_id, lsh_bucket,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY round(sim_exact, 6) DESC, lsh_bucket ASC) AS rn
                FROM scored0
              ) WHERE rn = 1
            ), corpus AS (
              SELECT e.vec_id, e.embedding, a.assigned_label
              FROM embeddings e JOIN assigned a USING (vec_id)
            )
            SELECT a.vec_id::BIGINT AS id_a, b.vec_id::BIGINT AS id_b,
                   round({_cos('a.embedding', 'b.embedding')}, 4) AS cosine
            FROM corpus a JOIN corpus b
              ON a.assigned_label = b.assigned_label AND a.vec_id < b.vec_id
            WHERE round({_cos('a.embedding', 'b.embedding')}, 4) >= 0.35
        """,
        # literal rows from the SAME pure-stdlib decode run directly in
        # Python (no Spark/Arrow) — the hash check verifies the engine's
        # distributed binary-column + mapInPandas plumbing
        "multimodal_features": f"""
            SELECT CAST(media_id AS BIGINT) AS media_id, mime,
                   CAST(n_bytes AS BIGINT) AS n_bytes, sha256, feat_mean,
                   CAST(dec_width AS INTEGER) AS dec_width,
                   CAST(dec_height AS INTEGER) AS dec_height,
                   CAST(dec_bit_depth AS INTEGER) AS dec_bit_depth,
                   CAST(dec_channels AS INTEGER) AS dec_channels,
                   CAST(dec_sample_rate AS INTEGER) AS dec_sample_rate,
                   CAST(dec_n_samples AS BIGINT) AS dec_n_samples,
                   dec_mean
            FROM (VALUES {_multimodal_oracle_values()}) AS t(
              media_id, mime, n_bytes, sha256, feat_mean, dec_width,
              dec_height, dec_bit_depth, dec_channels, dec_sample_rate,
              dec_n_samples, dec_mean)
        """,
        "multimodal_frame_plan": """
            SELECT CAST(media_id AS BIGINT) AS media_id,
                   CAST(unnest(generate_series(0, duration_ms, 1000)) AS INTEGER)
                     AS frame_ts_ms,
                   mime
            FROM (
              SELECT media_id, 'video/mp4' AS mime,
                     100 + (media_id * 37) % 60000 AS duration_ms
              FROM range(60) AS t(media_id)
              WHERE media_id % 3 = 2
            )
        """,
    }
