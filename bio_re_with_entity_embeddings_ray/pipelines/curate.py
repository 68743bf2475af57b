"""Training-data curation pipeline — the composition the training-data
operator families exist for:

    corpus -> quality filter (textstats heuristics)
           -> exact dedup (keep min doc_id per content)
           -> curated corpus + token-budget accounting

Everything stays streaming: the quality scores are computed per batch,
the dedup EXCHANGE ships 16-byte content digests (never document text),
and the deduped corpus is produced by a generic semi/anti join
(stages/relational.key_semi_anti_join) whose physical plan is picked by
MEASURED key count: a broadcast keep-set while it fits the object store,
a co-partitioned hash semi-join past ``broadcast_max_keys`` — so nothing
ever materializes on the driver at any scale. At 100 TB this is the
pipeline that turns a raw crawl into a training mix; each stage's scale
path is documented in its own module (stages/textstats.py,
stages/dedup.py) and SCALE.md.
"""

from __future__ import annotations

import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.relational import key_semi_anti_join
from bio_re_with_entity_embeddings_ray.stages.textstats import token_quality_arrays


def quality_filter(docs, min_tokens: int = 5, min_distinct_bp: int = 3000):
    """documents(doc_id, text) -> (doc_id, text, n_tokens) rows passing the
    length + distinct-token-ratio heuristics (narrow per-batch map; the
    shared front stage of curate / curate_neardup). Token statistics come
    from the flattened-factorize kernel (textstats.token_quality_arrays),
    fed the ARROW text column directly (round-4 memcpy push: the pandas
    variant paid an object-string materialization of every document on
    the hottest full-corpus map just to convert back)."""
    import pyarrow as pa

    def score_and_filter(batch: pa.Table) -> pa.Table:
        n_tok, n_distinct, _ = token_quality_arrays(batch["text"])
        keep = (n_tok >= min_tokens) & (
            10000 * n_distinct // n_tok >= min_distinct_bp
        )
        out = batch.select(["doc_id", "text"]).append_column(
            "n_tokens", pa.array(n_tok, pa.int64())
        )
        return out.filter(pa.array(keep))

    return docs.map_batches(score_and_filter, batch_format="pyarrow", batch_size=None)


CACHE_MAX_BYTES = 4 << 30  # cache the filtered stream below this input size

# keep/drop-set size beyond which the second pass switches from the
# broadcast set to the co-partitioned hash semi/anti join (SCALE.md)
BROADCAST_MAX_KEYS = 50_000_000

# dtype-true dummies for the hash plan's tagged keys side (the curated
# stream's non-key columns; see key_semi_anti_join)
_CURATED_COLS = {"text": "", "n_tokens": 0}


def _is_leaf_read(ds) -> bool:
    """True when ``ds`` is a plain source read (no transforms), i.e. its
    ``size_bytes()`` is a metadata-only probe. Uses the logical plan;
    defensively False on any internals change."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read

        return isinstance(ds._logical_plan.dag, Read)
    except Exception:
        return False


def _maybe_cache(filtered, docs, cache: str):
    """Materialize the two-consumer filtered stream, or keep it a
    recompute-on-demand lineage, per the ``cache`` policy ("auto" decides
    from the measured input size — Parquet metadata, no execution; for a
    DERIVED input, where ``size_bytes()`` would silently execute the
    upstream plan, auto defaults to recompute)."""
    if cache == "auto":
        nbytes = None
        if _is_leaf_read(docs):
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
    join_plan: str = "auto",
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
):
    """documents(doc_id, text) -> curated (doc_id, text, n_tokens).

    Keep documents with >= ``min_tokens`` tokens and a distinct-token
    ratio >= ``min_distinct_bp`` basis points (drops degenerate repeated-
    token spam), then exact-dedup on content keeping the smallest doc_id.

    Scale shape: the dedup shuffle moves only (md5(text), doc_id) pairs
    (~40 B/doc — dedup.exact_dedup_hashed), never the text; the winning
    doc_ids come back through :func:`relational.key_semi_anti_join` with
    a MEASURED plan choice — a ``ray.put`` broadcast keep-set (8 B/doc,
    vectorized ``isin`` over a second streaming pass) below
    ``broadcast_max_keys`` surviving docs, and the co-partitioned hash
    semi-join above it (one exchange of the filtered stream; the driver
    never sees the keys). Content identity is md5 (collision odds
    ~n^2/2^128 — negligible below ~10^18 docs).

    ``cache``: the filtered stream has two consumers (keep-set
    derivation + final output pass). "recompute" streams the quality
    filter twice (never pins the corpus — the only sane choice at
    100 TB); "cache" materializes it once (faster when it fits the
    object store); "auto" decides from the MEASURED input size
    (Parquet metadata via ``Dataset.size_bytes()`` for leaf reads —
    recompute for derived inputs where the probe would execute the
    upstream plan — cached below ``CACHE_MAX_BYTES``).
    """
    from bio_re_with_entity_embeddings_ray.stages import dedup

    filtered = _maybe_cache(quality_filter(docs, min_tokens, min_distinct_bp), docs, cache)
    keep = dedup.exact_dedup_hashed(filtered, num_buckets)
    return key_semi_anti_join(
        filtered,
        keep,
        "doc_id",
        anti=False,
        plan=join_plan,
        num_buckets=num_buckets,
        broadcast_max_keys=broadcast_max_keys,
        other_cols=_CURATED_COLS,
    )


def curate_neardup(
    docs,
    min_tokens: int = 5,
    min_distinct_bp: int = 3000,
    num_buckets: int = 64,
    k: int = 3,
    cache: str = "auto",
    cc_method: str = "actors",
    join_plan: str = "auto",
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
):
    """Near-dup curation: quality filter -> MinHash-LSH star pairs ->
    connected components -> keep only each cluster's representative
    (min doc_id). Returns (doc_id, text, n_tokens).

    This is the 100 TB crawl-dedup composition: candidate clusters come
    from LSH banding (docs sharing ANY band bucket are treated as
    equivalent — deliberately aggressive, the standard crawl-dedup
    trade), cluster resolution is the distributed label propagation of
    dedup.connected_components, and the final pass drops the non-
    representative doc_ids via the same measured broadcast/hash anti-join
    plan as :func:`curate` (the drop set is only the near-dup ids —
    typically a small fraction of the corpus — but past
    ``broadcast_max_keys`` it flows through the co-partitioned hash
    anti-join without ever touching the driver). Text moves zero times
    through any exchange on the broadcast plan, once on the hash plan.
    Oracle: oracles.CURATE_NEARDUP (recursive-CTE closure over the same
    banding)."""
    from bio_re_with_entity_embeddings_ray.stages import dedup

    filtered = _maybe_cache(quality_filter(docs, min_tokens, min_distinct_bp), docs, cache)
    pairs = dedup.minhash_lsh_pairs(filtered, k=k, num_buckets=num_buckets, star=True)
    # actors by default: measured 6x faster cluster resolution at 640k
    # docs with identical output (see dedup.connected_components)
    cc = dedup.connected_components(pairs, num_buckets, method=cc_method)

    def non_reps(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["doc_id"] != batch["cluster_id"], ["doc_id"]]

    drop_keys = cc.map_batches(non_reps, batch_format="pandas", batch_size=None)
    return key_semi_anti_join(
        filtered,
        drop_keys,
        "doc_id",
        anti=True,
        plan=join_plan,
        num_buckets=num_buckets,
        broadcast_max_keys=broadcast_max_keys,
        other_cols=_CURATED_COLS,
    )


def curate_decontam(
    docs,
    bench_docs,
    min_tokens: int = 5,
    min_distinct_bp: int = 3000,
    k: int = 3,
    threshold_bp: int = 1000,
    num_buckets: int = 64,
    cache: str = "auto",
    join_plan: str = "auto",
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
):
    """The full training-prep composition: quality filter -> benchmark
    decontamination -> exact dedup. Returns (doc_id, text, n_tokens) —
    a corpus that is clean (quality heuristics), leak-free (no document
    overlapping the held-out eval suite past ``threshold_bp``), and
    deduplicated (min doc_id per content).

    Scale shape: decontamination is an extra NARROW stage between the
    quality filter and the dedup exchange — the benchmark hash set is
    broadcast once (small by contract; stages/safety.py), membership is
    a sorted searchsorted per batch, so the composition's exchange
    volume is identical to :func:`curate` (digest-only). The final
    keep-set pass uses the same measured broadcast/hash semi-join."""
    from bio_re_with_entity_embeddings_ray.stages import dedup
    from bio_re_with_entity_embeddings_ray.stages.safety import decontaminate_filter

    filtered = _maybe_cache(
        decontaminate_filter(
            quality_filter(docs, min_tokens, min_distinct_bp),
            bench_docs,
            k=k,
            threshold_bp=threshold_bp,
        ),
        docs,
        cache,
    )
    keep = dedup.exact_dedup_hashed(filtered, num_buckets)
    return key_semi_anti_join(
        filtered,
        keep,
        "doc_id",
        anti=False,
        plan=join_plan,
        num_buckets=num_buckets,
        broadcast_max_keys=broadcast_max_keys,
        other_cols=_CURATED_COLS,
    )


def curate_incremental(
    docs,
    prior_digests,
    min_tokens: int = 5,
    min_distinct_bp: int = 3000,
    num_buckets: int = 64,
    cache: str = "auto",
    join_plan: str = "auto",
    broadcast_max_keys: int = BROADCAST_MAX_KEYS,
):
    """Incremental-crawl curation: curate TODAY'S shard against
    YESTERDAY'S accumulated corpus without ever touching yesterday's
    text. ``prior_digests`` is a Dataset with a ``content_md5`` column
    (the digest table `curate`'s dedup pass already produces — persist it
    per increment and feed it back). Returns (doc_id, text, n_tokens):
    quality-filtered, deduped within the increment, and with every doc
    whose content already exists in the prior corpus dropped.

    Scale shape: the prior corpus enters as ~16 B/doc digests (read with
    column pruning from its Parquet manifest), flows through the same
    measured broadcast/hash anti-join as every keep/drop set, and the
    increment's own dedup exchange is digest-only — the accumulated
    corpus is NEVER rescanned. This is the daily-increment shape of a
    continuously-crawled 100 TB corpus."""
    from bio_re_with_entity_embeddings_ray.stages import dedup

    filtered = _maybe_cache(quality_filter(docs, min_tokens, min_distinct_bp), docs, cache)
    keep = dedup.exact_dedup_hashed(filtered, num_buckets)

    def keep_new(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "content_md5"]]

    # drop keep-set entries whose content exists in the prior corpus
    keep_fresh = key_semi_anti_join(
        keep.map_batches(keep_new, batch_format="pandas", batch_size=None),
        prior_digests,
        "content_md5",
        anti=True,
        plan=join_plan,
        num_buckets=num_buckets,
        broadcast_max_keys=broadcast_max_keys,
        other_cols={"doc_id": 0},
    )
    return key_semi_anti_join(
        filtered,
        keep_fresh,
        "doc_id",
        anti=False,
        plan=join_plan,
        num_buckets=num_buckets,
        broadcast_max_keys=broadcast_max_keys,
        other_cols=_CURATED_COLS,
    )


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


def curate_percentile(docs, q_bp: int = 2500, num_buckets: int = 16):
    """Percentile-threshold quality gate: keep documents whose token
    count is >= the corpus-global exact ``q_bp`` quantile (1-based
    position ``ceil(q*n/10000)`` ascending — the
    :func:`~bio_re_with_entity_embeddings_ray.stages.textstats.exact_quantiles`
    position rule). Returns (doc_id, n_tokens) of the survivors.

    Scale shape: two streaming passes, which is inherent to any
    global-percentile gate — pass 1 reduces the corpus to a (distinct
    token count, frequency) histogram via per-block combiners (the
    histogram is bounded by the token-count domain, not corpus size) and
    yields ONE scalar threshold; pass 2 is a pure narrow filter against
    the broadcast scalar. Reference analog: the static min-length
    thresholds in extract_articles.py:49-55; the percentile form makes
    the cut adaptive to the corpus instead of hand-tuned."""
    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        exact_quantiles,
        token_quality_arrays,
    )

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, _, _ = token_quality_arrays(batch["text"])
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "n_tokens": n_tok.astype("int64")}
        )

    with_counts = docs.map_batches(counts, batch_format="pandas")
    thr_df = exact_quantiles(with_counts, "n_tokens", [q_bp], num_buckets)
    thr = int(thr_df["value"].iloc[0])

    return with_counts.filter(expr=f"n_tokens >= {thr}")
