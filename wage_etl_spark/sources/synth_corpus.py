"""Deterministic synthetic documents/embeddings at ANY scale factor.

The driver ships `documents.parquet` / `embeddings.parquet` only up to
sf0.1 (5,000 docs / 2,000 vectors). The scale-evidence runs (sf1 = 10x and
beyond) need the SAME statistical shape at larger n, synthesized inside the
sandbox. This module mirrors the driver tables' measured structure:

documents (doc_id, text, lang, source, n_chars):
  - bag-of-words text over the same ~31-word vocabulary, doc length
    uniform ~[9, 104] words (driver sf0.1: n_chars 44-577, uniform)
  - lang: en ~41%, zh/es/fr/de ~14.75% each; source: uniform src0..src19
  - planted near-duplicate PAIRS: ``dup_frac`` of docs (default 5%, the
    driver's rate) form pairs sharing all but ~1 word (Jaccard ~0.95+ on
    3-shingles) and both members carry the literal 'dup' marker token —
    exactly the structure the sf0.1 table shows (250 'dup' docs in pairs
    at ~0.98 Jaccard). Pair density per doc is scale-INVARIANT, so LSH
    pair counts grow linearly with n — the property a scaling run must
    preserve (replicating rows 10x instead would grow pairs 100x).

embeddings (vec_id, embedding: array<float> dim 64, label):
  - i.i.d. unit-normalized Gaussian vectors (driver table shows no planted
    high-cosine pairs and no label cluster structure), label uniform 0..9.

All randomness is counter-based (splitmix64 of row id + salt), evaluated
inside ``mapInPandas`` over ``spark.range`` — generation is distributed,
order-independent, and bit-reproducible at any scale / any partitioning,
same design as sources/synth.py's event stream. Near-dup pair members
derive from a shared pair key, so pairing needs no join or driver state.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
DUP_TOKEN = "dup"
LANGS = ["en", "zh", "es", "fr", "de"]
_SCATTER_PRIME = 2654435761  # Knuth multiplicative hash prime; > any sane n


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (overflow intended)."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _salt_const(salt: str) -> np.uint64:
    # hash() is PYTHONHASHSEED-dependent for str; use a stable fold instead
    acc = np.uint64(1469598103934665603)
    for ch in salt.encode():
        with np.errstate(over="ignore"):
            acc = (acc ^ np.uint64(ch)) * np.uint64(1099511628211)
    return acc


def _hs(seed: int, salt: str, ids: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _mix(
            ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ _salt_const(salt)
            ^ np.uint64(seed)
        )


def synthesize_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 7,
    dup_frac: float = 0.05,
    n_sources: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic documents table; see module docstring."""
    n_pairs = int(n_docs * dup_frac) // 2
    vocab = np.array(VOCAB)
    n_vocab = len(vocab)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                # zero-row batches make np.repeat's offsets math raise
                continue
            r = b["id"].to_numpy(dtype=np.int64)
            # content key: pair members share it; independents use their row
            is_pair = r < 2 * n_pairs
            pair_k = r // 2
            member = (r % 2).astype(np.int64)
            ckey = np.where(is_pair, pair_k, r + np.int64(2) * n_pairs)
            n_words = (9 + (_hs(seed, "len", ckey) % np.uint64(96))).astype(np.int64)
            # flat word-index frame: one hashed vocab pick per (doc, pos)
            total = int(n_words.sum())
            doc_rep = np.repeat(np.arange(len(r)), n_words)
            pos = np.arange(total, dtype=np.uint64) - np.repeat(
                np.concatenate(([0], np.cumsum(n_words)[:-1])).astype(np.uint64), n_words
            )
            with np.errstate(over="ignore"):
                wh = _mix(
                    _hs(seed, "w", ckey)[doc_rep] ^ (pos * np.uint64(0xC2B2AE3D27D4EB4F))
                )
            widx = (wh % np.uint64(n_vocab)).astype(np.int64)
            words = vocab[widx]
            texts = []
            bounds = np.concatenate(([0], np.cumsum(n_words)))
            dpos = (_hs(seed, "dpos", ckey) % n_words.astype(np.uint64)).astype(np.int64)
            mpos = (_hs(seed, "mpos", ckey) % n_words.astype(np.uint64)).astype(np.int64)
            mword = vocab[(_hs(seed, "mw", ckey) % np.uint64(n_vocab)).astype(np.int64)]
            for i in range(len(r)):
                w = words[bounds[i] : bounds[i + 1]]
                if is_pair[i]:
                    w = w.copy()
                    # both members carry the marker at the shared position;
                    # member 1 additionally mutates one other word
                    w[dpos[i]] = DUP_TOKEN
                    if member[i] == 1:
                        mp = mpos[i] if mpos[i] != dpos[i] else (mpos[i] + 1) % len(w)
                        w[mp] = mword[i]
                texts.append(" ".join(w))
            lh = _hs(seed, "lang", r.astype(np.uint64)) % np.uint64(1000)
            lang = np.where(
                lh < 412,
                "en",
                np.array(LANGS[1:])[((lh - 412) % np.uint64(4)).astype(np.int64)],
            )
            src_idx = (_hs(seed, "src", r.astype(np.uint64)) % np.uint64(n_sources)).astype(np.int64)
            with np.errstate(over="ignore"):
                doc_id = (r.astype(np.uint64) * np.uint64(_SCATTER_PRIME)) % np.uint64(n_docs)
            yield pd.DataFrame(
                {
                    "doc_id": doc_id.astype(np.int64),
                    "text": texts,
                    "lang": lang,
                    "source": [f"src{i}" for i in src_idx],
                    "n_chars": [len(t) for t in texts],
                }
            )

    rng = spark.range(n_docs, numPartitions=partitions)
    return rng.mapInPandas(
        gen, "doc_id long, text string, lang string, source string, n_chars long"
    )


def synthesize_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    n_labels: int = 10,
    seed: int = 7,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic unit-norm Gaussian embeddings table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(dim, dtype=np.uint64)
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.uint64)
            base = _hs(seed, "vec", ids)
            with np.errstate(over="ignore"):
                cell = _mix(base[:, None] ^ (j[None, :] * np.uint64(0x9E3779B97F4A7C15)))
                cell2 = _mix(cell ^ np.uint64(0xD6E8FEB86659FD93))
            # Box-Muller from two 53-bit uniforms in (0, 1)
            u1 = ((cell >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0**-53)
            u2 = (cell2 >> np.uint64(11)).astype(np.float64) * (2.0**-53)
            z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
            z /= np.linalg.norm(z, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids.astype(np.int64),
                    "embedding": [row.astype(np.float32) for row in z],
                    "label": (_hs(seed, "lab", ids) % np.uint64(n_labels)).astype(np.int32),
                }
            )

    rng = spark.range(n_vecs, numPartitions=partitions)
    return rng.mapInPandas(gen, "vec_id long, embedding array<float>, label int")
