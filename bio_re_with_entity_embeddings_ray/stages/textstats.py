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


def exact_quantiles(ds, col: str, qs_bp: list[int], num_buckets: int = 16):
    """Distributed EXACT quantiles of an integer metric column.

    Definition (mirrored bit-for-bit by the SQL oracle): the q-quantile is
    the value at 1-based position ``ceil(q * n)`` in ascending sorted
    order (q in basis points; q=0 maps to position 1). Returns
    (q_bp, value) — one row per requested quantile.

    Scale shape: a per-batch ``value_counts`` combiner collapses each
    block to one row per distinct value, a hash-partitioned merge sums
    counts per value, and only the (distinct value, count) table — small
    for any bounded metric like token counts or bp scores, regardless of
    corpus size — is collected for the cumulative scan. No global sort,
    no row shuffle; exact, not an approximation. For unbounded
    high-cardinality metrics, bound the domain first (round/clip), or the
    value table itself becomes the problem.
    """
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def local_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        return pd.DataFrame(
            {"value": vc.index.astype("int64"), "cnt": vc.to_numpy().astype("int64")}
        )

    partials = ds.map_batches(local_counts, batch_format="pandas", batch_size=None)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("value", as_index=False)["cnt"].sum()

    counts = (
        bucketed_group_apply(partials, "value", merge, num_buckets)
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    n = int(counts["cnt"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "q_bp": pd.Series([], dtype="int64"),
                "value": pd.Series([], dtype="int64"),
            }
        )
    cum = counts["cnt"].cumsum().to_numpy()
    vals = counts["value"].to_numpy()
    out_q, out_v = [], []
    for q in qs_bp:
        pos = max(1, -(-q * n // 10000))  # ceil(q*n/10000), floor at 1
        out_q.append(int(q))
        out_v.append(int(vals[np.searchsorted(cum, pos)]))
    return pd.DataFrame(
        {
            "q_bp": pd.Series(out_q, dtype="int64"),
            "value": pd.Series(out_v, dtype="int64"),
        }
    )


def lang_and_tokens(docs):
    """(doc_id, pred_lang, n_tokens) in ONE narrow map — both are pure
    functions of text, so computing them together avoids the doc_id join
    a lang_id ⋈ token_counts composition would need."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        sets = toks.map(set)
        pred = pd.Series(["und"] * len(batch), index=batch.index)
        assigned = pd.Series([False] * len(batch), index=batch.index)
        for marker, lang in LANG_MARKERS:
            hit = sets.map(lambda t, m=marker: m in t) & ~assigned
            pred[hit] = lang
            assigned |= hit
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pred,
                "n_tokens": toks.str.len().astype("int64"),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def exact_quantiles_by(ds, group_col: str, col: str, qs_bp: list[int], num_buckets: int = 16):
    """Distributed EXACT per-group quantiles of an integer metric:
    (group, q_bp, value) with the same position definition as
    :func:`exact_quantiles` (1-based ceil(q*n/10000), ascending order),
    applied within each group.

    Scale shape: per-block (group, value) count combiner, then ONE hash
    exchange keyed by group — each bucket computes its groups' cumulative
    histograms vectorized. Exchange volume is (groups x distinct values)
    count rows, independent of row count. Fully distributed end to end
    (no driver-side collection, unlike the global exact_quantiles whose
    final table is a single cumsum)."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    qs = sorted(set(int(q) for q in qs_bp))

    def local_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby([group_col, col]).size().reset_index(name="cnt")

    partials = ds.map_batches(local_counts, batch_format="pandas", batch_size=None)

    def per_group(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        c = bucket.groupby([group_col, col], as_index=False)["cnt"].sum()
        for grp, g in c.groupby(group_col, sort=False):
            g = g.sort_values(col)
            cum = g["cnt"].cumsum().to_numpy()
            vals = g[col].to_numpy()
            n = int(cum[-1])
            for q in qs:
                pos = max(1, -(-q * n // 10000))
                rows.append((grp, q, int(vals[np.searchsorted(cum, pos)])))
        out = pd.DataFrame(rows, columns=[group_col, "q_bp", "value"])
        out["q_bp"] = out["q_bp"].astype("int64")
        out["value"] = out["value"].astype("int64")
        return out

    return bucketed_group_apply(partials, group_col, per_group, num_buckets)


def vocab_topk(docs, k: int = 50, num_buckets: int = 16):
    """Global top-k most frequent tokens: (token, cnt, rank), ties broken
    by token. Per-block value_counts combiner -> token-keyed hash merge ->
    per-bucket partial top-k (each bucket ships only k rows) -> tiny
    driver-side final cut. The exchange volume is (distinct tokens x
    blocks) count rows; the driver sees num_buckets * k rows."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "cnt": vc.to_numpy().astype("int64")}
        )

    partials = docs.map_batches(local, batch_format="pandas", batch_size=None)

    def merge_top(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("token", as_index=False)["cnt"].sum()
        g = g.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    per_bucket = bucketed_group_apply(partials, "token", merge_top, num_buckets)
    top = (
        per_bucket.to_pandas()
        .sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["cnt"] = top["cnt"].astype("int64")
    return top
