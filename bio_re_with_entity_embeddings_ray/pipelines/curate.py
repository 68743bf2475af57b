"""Training-data curation pipeline — the composition the training-data
operator families exist for:

    corpus -> quality filter (textstats heuristics)
           -> exact dedup (keep min doc_id per content)
           -> curated corpus + token-budget accounting

Everything stays one lazy streaming DAG: the quality scores are computed
per batch, the dedup is the hashed-combiner exact dedup (ships digests,
not text, through the exchange), and the final table carries the fields a
pretraining data loader needs (doc_id, text, n_tokens). At 100 TB this is
the pipeline that turns a raw crawl into a training mix; each stage's
scale path is documented in its own module (stages/textstats.py,
stages/dedup.py) and SCALE.md.
"""

from __future__ import annotations

import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply


def curate(
    docs,
    min_tokens: int = 5,
    min_distinct_bp: int = 3000,
    num_buckets: int = 64,
):
    """documents(doc_id, text) -> curated (doc_id, text, n_tokens).

    Keep documents with >= ``min_tokens`` tokens and a distinct-token
    ratio >= ``min_distinct_bp`` basis points (drops degenerate repeated-
    token spam), then exact-dedup on content keeping the smallest doc_id.
    """

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

    filtered = docs.map_batches(
        score_and_filter, batch_format="pandas", batch_size=None
    )

    # exact dedup keeping min doc_id per content; full rows ride along so
    # no second join is needed (text is needed in the output anyway)
    def local_min(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values("doc_id", kind="mergesort")
        return b.drop_duplicates(subset=["text"], keep="first")

    pre = filtered.map_batches(local_min, batch_format="pandas", batch_size=None)
    return bucketed_group_apply(pre, "text", local_min, num_buckets)


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
