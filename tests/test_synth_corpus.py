"""Tests: the scale-parametric corpus synthesizer (sources/synth_corpus.py)
matches the driver tables' measured statistical shape and is deterministic
across partitioning; the scale-sized cosine_near_dups_scaled variant keeps
exact precision; operator diagnostics (LAST_RUN_STATS) report the LSH
broadcast-gate path and cluster round count."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from wage_etl_spark.sources.synth_corpus import (
    DUP_TOKEN,
    VOCAB,
    synthesize_documents,
    synthesize_embeddings,
)


def test_documents_shape_matches_driver_stats(spark):
    d = synthesize_documents(spark, 2000).toPandas()
    assert len(d) == 2000
    assert d.doc_id.nunique() == 2000  # scatter map is a bijection
    assert set(d.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    # driver sf0.1: n_chars ~uniform [44, 577]; allow slack on a small draw
    assert 30 <= d.n_chars.min() and d.n_chars.max() <= 700
    # lang mix: en ~41%, four others ~15% each
    frac_en = (d.lang == "en").mean()
    assert 0.33 <= frac_en <= 0.49
    assert set(d.lang) == {"en", "zh", "es", "fr", "de"}
    assert d.source.str.match(r"src\d+").all()
    # vocabulary is the driver's (plus the dup marker)
    words = set()
    for t in d.text.head(200):
        words.update(t.split())
    assert words <= set(VOCAB) | {DUP_TOKEN}
    # planted near-dup pairs: ~5% of docs carry the marker, in pairs
    n_dup = d.text.str.contains(rf"\b{DUP_TOKEN}\b").sum()
    assert n_dup == 2 * (int(2000 * 0.05) // 2)


def test_documents_pairs_are_near_dups(spark):
    d = synthesize_documents(spark, 1000).toPandas()
    dd = d[d.text.str.contains(rf"\b{DUP_TOKEN}\b")].text.tolist()

    def shingles(s, w=3):
        t = s.split()
        return {tuple(t[i : i + w]) for i in range(len(t) - w + 1)}

    # every marked doc has a high-Jaccard partner among the marked docs
    for i in range(0, min(10, len(dd))):
        best = max(
            len(shingles(dd[i]) & shingles(dd[j])) / len(shingles(dd[i]) | shingles(dd[j]))
            for j in range(len(dd))
            if j != i
        )
        assert best >= 0.6, f"marked doc {i} has no near-dup partner (best={best})"


def test_documents_deterministic_across_partitioning(spark):
    a = synthesize_documents(spark, 500, partitions=1).toPandas().sort_values("doc_id")
    b = synthesize_documents(spark, 500, partitions=7).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_embeddings_shape(spark):
    e = synthesize_embeddings(spark, 300, dim=16).toPandas()
    assert len(e) == 300
    M = np.stack(e.embedding.values).astype(np.float64)
    assert M.shape == (300, 16)
    np.testing.assert_allclose(np.linalg.norm(M, axis=1), 1.0, atol=1e-5)
    assert set(e.label) <= set(range(10))
    # no accidental planted near-identical vectors (driver table has none)
    S = M @ M.T
    np.fill_diagonal(S, 0)
    assert S.max() < 0.95


def test_cosine_dups_scaled_exact_precision(spark):
    """Every pair the scale-sized variant returns must be a true pair
    (exact cosine filter after bucketing), verified against brute force."""
    from wage_etl_spark.operators.similarity import (
        brute_force_topk,
        cosine_near_dups_scaled,
    )

    emb = synthesize_embeddings(spark, 120, dim=16, seed=3)
    got = cosine_near_dups_scaled(
        emb, min_cosine=0.5, target_bucket_rows=32
    ).select("id_a", "id_b", "cosine").collect()
    truth = {}
    rows = emb.toPandas()
    M = np.stack(rows.embedding.values).astype(np.float64)
    ids = rows.vec_id.to_numpy()
    S = M @ M.T
    for r in got:
        i = np.where(ids == r.id_a)[0][0]
        j = np.where(ids == r.id_b)[0][0]
        assert round(S[i, j], 4) >= 0.5
        assert abs(round(S[i, j], 4) - r.cosine) < 1e-3


def test_last_run_stats_diagnostics(spark):
    from wage_etl_spark.operators import dedupe

    docs = synthesize_documents(spark, 400)
    dedupe.LAST_RUN_STATS.clear()
    pairs = dedupe.lsh_jaccard_verified(docs, "text", "doc_id", min_jaccard=0.5)
    clusters = dedupe.dedup_clusters(pairs, nodes=docs.select("doc_id"))
    clusters.write.format("noop").mode("overwrite").save()
    gate = dedupe.LAST_RUN_STATS["lsh_jaccard_verified"]
    assert gate["path"] in ("broadcast", "planner", "pairs_broadcast_attach_shuffle")
    assert gate["n_pairs"] is not None and gate["n_pairs"] >= 0
    rounds = dedupe.LAST_RUN_STATS["dedup_clusters"]["rounds"]
    assert 1 <= rounds <= 25
    from wage_etl_spark.operators.caching import release_operator_caches

    release_operator_caches()
