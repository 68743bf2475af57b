"""Training-data curation pipeline — the composition the training-data
operator families exist for:

    corpus -> quality filter (textstats heuristics)
           -> exact dedup (keep min doc_id per content)
           -> curated corpus + token-budget accounting

Everything stays streaming: the quality scores are computed per batch,
the dedup EXCHANGE ships 16-byte content digests (never document text),
and the deduped corpus is produced by a broadcast keep-set filter over a
second streaming pass of the filtered input. At 100 TB this is the
pipeline that turns a raw crawl into a training mix; each stage's scale
path is documented in its own module (stages/textstats.py,
stages/dedup.py) and SCALE.md.
"""

from __future__ import annotations

import pandas as pd


def quality_filter(docs, min_tokens: int = 5, min_distinct_bp: int = 3000):
    """documents(doc_id, text) -> (doc_id, text, n_tokens) rows passing the
    length + distinct-token-ratio heuristics (narrow per-batch map; the
    shared front stage of curate / curate_neardup)."""

    def score_and_filter(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        n_tok = toks.str.len().astype("int64")
        n_distinct = toks.map(lambda t: len(set(t))).astype("int64")
        keep = (n_tok >= min_tokens) & (
            10000 * n_distinct // n_tok >= min_distinct_bp
        )
        out = batch.loc[keep, ["doc_id", "text"]].copy()
        out["n_tokens"] = n_tok[keep]
        return out

    return docs.map_batches(score_and_filter, batch_format="pandas", batch_size=None)


CACHE_MAX_BYTES = 4 << 30  # cache the filtered stream below this input size


def _maybe_cache(filtered, docs, cache: str):
    """Materialize the two-consumer filtered stream, or keep it a
    recompute-on-demand lineage, per the ``cache`` policy ("auto" decides
    from the measured input size — Parquet metadata, no execution)."""
    if cache == "auto":
        try:
            nbytes = docs.size_bytes()
        except Exception:
            nbytes = None
        cache = (
            "cache" if nbytes is not None and nbytes < CACHE_MAX_BYTES else "recompute"
        )
    if cache == "cache":
        return filtered.materialize()
    if cache != "recompute":
        raise ValueError(f"unknown cache mode {cache!r}")
    return filtered


def curate(
    docs,
    min_tokens: int = 5,
    min_distinct_bp: int = 3000,
    num_buckets: int = 64,
    cache: str = "auto",
):
    """documents(doc_id, text) -> curated (doc_id, text, n_tokens).

    Keep documents with >= ``min_tokens`` tokens and a distinct-token
    ratio >= ``min_distinct_bp`` basis points (drops degenerate repeated-
    token spam), then exact-dedup on content keeping the smallest doc_id.

    Scale shape: the dedup shuffle moves only (md5(text), doc_id) pairs
    (~40 B/doc — dedup.exact_dedup_hashed), never the text; the winning
    doc_ids come back as a broadcast keep-set (8 B/doc, ``ray.put`` once)
    and the curated output is a second streaming pass over the filtered
    input with a vectorized ``isin``. Shuffle volume is therefore
    independent of document size. Content identity is md5 (collision
    odds ~n^2/2^128 — negligible below ~10^18 docs). Beyond ~10^9
    surviving docs the keep-set outgrows broadcast; switch to a
    co-partitioned semi-join on hash(doc_id) (stages/relational.py J3
    hash plan) — same contract, one extra exchange of 8-byte keys.

    ``cache``: the filtered stream has two consumers (keep-set
    derivation + final output pass). "recompute" streams the quality
    filter twice (never pins the corpus — the only sane choice at
    100 TB); "cache" materializes it once (faster when it fits the
    object store); "auto" decides from the MEASURED input size
    (Parquet metadata via ``Dataset.size_bytes()``, cached below
    ``CACHE_MAX_BYTES``, recompute when big or unknown).
    """

    filtered = _maybe_cache(quality_filter(docs, min_tokens, min_distinct_bp), docs, cache)

    import ray

    from bio_re_with_entity_embeddings_ray.stages import dedup

    keep = dedup.exact_dedup_hashed(filtered, num_buckets)
    # an all-filtered-out corpus yields a zero-block dataset with no
    # schema — treat it as an empty keep-set instead of selecting columns
    kdf = keep.to_pandas()
    ref = ray.put(
        set(int(i) for i in kdf["doc_id"]) if "doc_id" in kdf.columns else set()
    )

    # task pool, not actor pool: ray.get of the broadcast keep-set is
    # deserialized once per WORKER PROCESS (Ray caches gets of the same
    # ref), so tasks get actor-init economics with elastic parallelism
    # and no actor ramp-up
    def keep_fn(batch: pd.DataFrame) -> pd.DataFrame:
        keep_set = ray.get(ref)
        return batch[batch["doc_id"].isin(keep_set)]

    return filtered.map_batches(keep_fn, batch_format="pandas", batch_size=None)


def curate_neardup(
    docs,
    min_tokens: int = 5,
    min_distinct_bp: int = 3000,
    num_buckets: int = 64,
    k: int = 3,
    cache: str = "auto",
    cc_method: str = "actors",
):
    """Near-dup curation: quality filter -> MinHash-LSH star pairs ->
    connected components -> keep only each cluster's representative
    (min doc_id). Returns (doc_id, text, n_tokens).

    This is the 100 TB crawl-dedup composition: candidate clusters come
    from LSH banding (docs sharing ANY band bucket are treated as
    equivalent — deliberately aggressive, the standard crawl-dedup
    trade), cluster resolution is the distributed label propagation of
    dedup.connected_components, and the final pass drops the non-
    representative doc_ids via a broadcast drop-set (only near-dup ids,
    typically a small fraction of the corpus). Text moves zero times
    through any exchange. Oracle: oracles.CURATE_NEARDUP (recursive-CTE
    closure over the same banding)."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages import dedup

    filtered = _maybe_cache(quality_filter(docs, min_tokens, min_distinct_bp), docs, cache)
    pairs = dedup.minhash_lsh_pairs(filtered, k=k, num_buckets=num_buckets, star=True)
    # actors by default: measured 6x faster cluster resolution at 640k
    # docs with identical output (see dedup.connected_components)
    cc = dedup.connected_components(pairs, num_buckets, method=cc_method)

    def non_reps(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["doc_id"] != batch["cluster_id"], ["doc_id"]]

    drop_df = cc.map_batches(non_reps, batch_format="pandas", batch_size=None).to_pandas()
    ref = ray.put(set(int(i) for i in drop_df["doc_id"]) if len(drop_df) else set())

    # task pool with per-worker-cached broadcast drop-set (see curate)
    def drop_fn(batch: pd.DataFrame) -> pd.DataFrame:
        drop = ray.get(ref)
        return batch[~batch["doc_id"].isin(drop)]

    return filtered.map_batches(drop_fn, batch_format="pandas", batch_size=None)


def token_budget(curated):
    """One-row accounting of the curated corpus: docs + total tokens (the
    number a pretraining run budgets against)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_docs": [len(batch)],
                "total_tokens": [int(batch["n_tokens"].sum())],
            }
        )

    parts = curated.map_batches(partial, batch_format="pandas", batch_size=None)
    # seed zero row: an empty corpus yields ZERO partial blocks, and a
    # map over zero blocks never runs — the union guarantees one merge
    # call that emits the (0, 0) accounting row
    import ray.data as rd

    # pandas block to match the partials' block type (union of mixed
    # Arrow/pandas block types asserts inside Ray)
    seed = rd.from_pandas(pd.DataFrame({"n_docs": [0], "total_tokens": [0]}))

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_docs": [int(batch["n_docs"].sum())],
                "total_tokens": [int(batch["total_tokens"].sum())],
            }
        )

    return parts.union(seed).repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )
