"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All integer-output (basis points instead of float ratios) so the DuckDB
oracle matches bit-for-bit; all single-pass ``map_batches`` with
vectorized pandas/numpy bodies (no shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array

# marker-word language heuristic: first matching marker wins, priority order
LANG_MARKERS: list[tuple[str, str]] = [
    ("the", "en"),
    ("le", "fr"),
    ("der", "de"),
    ("el", "es"),
]
STOPWORDS = ("the", "a", "of", "to", "and")


def token_counts(docs):
    """(doc_id, n_tokens, n_chars)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok = batch["text"].str.split(" ").str.len().astype("int64")
        n_chars = batch["text"].str.len().astype("int64")
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "n_tokens": n_tok, "n_chars": n_chars}
        )

    return docs.map_batches(fn, batch_format="pandas")


def quality_scores(docs):
    """(doc_id, n_tokens, n_distinct, distinct_bp, stop_bp).

    distinct_bp = floor(10000 * n_distinct / n_tokens) — integer basis
    points, the reference-free quality heuristics a pretraining pipeline
    filters on.
    """

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        n_tok = toks.str.len().astype("int64")
        n_distinct = toks.map(lambda t: len(set(t))).astype("int64")
        n_stop = toks.map(lambda t: sum(1 for w in t if w in STOPWORDS)).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "n_distinct": n_distinct,
                "distinct_bp": (10000 * n_distinct // n_tok).astype("int64"),
                "stop_bp": (10000 * n_stop // n_tok).astype("int64"),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def lang_id(docs):
    """(doc_id, pred_lang) — marker-word heuristic, priority order."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ").map(set)
        pred = pd.Series(["und"] * len(batch), index=batch.index)
        assigned = pd.Series([False] * len(batch), index=batch.index)
        for marker, lang in LANG_MARKERS:
            hit = toks.map(lambda t, m=marker: m in t) & ~assigned
            pred[hit] = lang
            assigned |= hit
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})

    return docs.map_batches(fn, batch_format="pandas")


FP_MOD = 2305843009213693951  # 2^61 - 1


def _modsum(terms: np.ndarray, mod: int = FP_MOD) -> int:
    """Exact sum(terms) % mod without int64 overflow: pairwise tree fold
    with a mod at every level (each addition stays < 2*mod < 2^62)."""
    a = terms % mod
    while len(a) > 1:
        k = (len(a) + 1) // 2
        pad = np.zeros(k * 2, dtype=np.int64)
        pad[: len(a)] = a
        a = (pad[0::2] + pad[1::2]) % mod
    return int(a[0]) if len(a) else 0


def fingerprints(docs):
    """(doc_id, fingerprint) — position-weighted token-hash fingerprint
    ``sum(md5int8(w_i) * i) mod 2^61-1`` (1-based), an order-sensitive
    rolling-hash analog. The modulus makes engine and SQL agree exactly at
    any document length: per-term products stay < 2^49 (md5int8 < 2^32,
    position < 2^17 at sane doc sizes), the engine folds with a modular
    tree, and DuckDB's HUGEINT SUM then ``% mod`` lands on the same value
    instead of a signed-int64 wrap."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.int64)
        for j, txt in enumerate(batch["text"]):
            toks = txt.split(" ")
            h = md5int8_array(toks)
            out[j] = _modsum(h * np.arange(1, len(toks) + 1, dtype=np.int64))
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": out})

    return docs.map_batches(fn, batch_format="pandas")
