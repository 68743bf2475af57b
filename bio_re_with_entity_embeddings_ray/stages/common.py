"""Shared distributed-execution helpers.

The engine's wide (shuffle) steps all go through
:func:`bucketed_group_apply`: hash-partition rows by a key into a bounded
number of buckets, then apply a *vectorized* pandas function to each whole
bucket (which internally does a C-level ``groupby`` across the many keys
in the bucket). This beats ``groupby().map_groups`` when groups are small
and numerous (one Python call per bucket instead of one per group) — the
common shape for conversations and entity pairs — while keeping the same
partitioning contract a multi-node shuffle needs.

Replaces the reference's driver-resident dict aggregation
(/root/reference/data/pubtator.py:384-409) which holds all wide state in
one process.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import hash_bucket

BUCKET_COL = "__bucket"


def bucketed_group_apply(
    ds,
    key: str | Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
):
    """Shuffle by hash(key) into ``num_buckets`` groups; apply ``fn`` to each
    whole bucket (a pandas DataFrame containing every row of every key that
    hashed there). ``fn`` must be key-complete-safe: it sees ALL rows for
    any key it sees.

    Skew note: bucket granularity bounds the blast radius of a hot key to
    one bucket; callers with giant single keys pre-aggregate inside
    ``map_batches`` first so the shuffled volume is one partial row per
    (key, input block), not one row per record.
    """
    keys = [key] if isinstance(key, str) else list(key)
    join_key = keys[0] if len(keys) == 1 else None

    def _assign(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        batch = batch.copy(deep=False)
        if join_key is not None:
            batch[BUCKET_COL] = hash_bucket(batch[join_key].to_numpy(), num_buckets)
        elif all(pd.api.types.is_numeric_dtype(batch[c]) for c in keys):
            # numeric composite keys: combine per-column C-level hashes
            # (pd.util.hash_array is process-stable) - no string building
            acc = np.zeros(len(batch), dtype=np.uint64)
            for c in keys:
                acc = acc * np.uint64(1000003) + pd.util.hash_array(
                    batch[c].to_numpy()
                )
            batch[BUCKET_COL] = (acc % np.uint64(num_buckets)).astype(np.int64)
        else:
            kv = (
                batch[keys[0]].astype(str) + "\x00" + batch[keys[1]].astype(str)
            ).to_numpy()
            for extra in keys[2:]:
                kv = kv + ("\x00" + batch[extra].astype(str)).to_numpy()
            batch[BUCKET_COL] = hash_bucket(kv, num_buckets)
        return batch

    def _apply(group: pd.DataFrame) -> pd.DataFrame:
        out = fn(group.drop(columns=[BUCKET_COL]))
        return out

    bucketed = ds.map_batches(_assign, batch_format="pandas", batch_size=None)
    return bucketed.groupby(BUCKET_COL).map_groups(_apply, batch_format="pandas")


def merge_partials(
    partials,
    key: str | Sequence[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    finalize: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
    small_rows: int = 2_000_000,
    fanin: int = 16,
    plan: str = "auto",
):
    """Merge side of a two-phase (combiner) aggregate, with a size-based
    physical plan choice.

    ``combine`` must be ASSOCIATIVE and schema-preserving over partial rows
    (e.g. union of packed sets, local min/first); ``finalize`` maps a
    key-complete combined frame to the output schema.

    The combiner bounds partials to (distinct keys x upstream blocks) rows.
    The partials are materialized (they are the small side by construction)
    and counted — measured, not guessed:

    - small partial set  -> no-shuffle REDUCTION TREE: coalesce blocks with
      ``repartition`` (a split/merge, not an exchange) and re-apply
      ``combine`` until one key-complete block remains. Ray's sort-based
      ``groupby`` exchange costs seconds of fixed barrier even on a few
      thousand rows (measured 5.4s at 32 cpus for 5k partial rows), which a
      tree avoids entirely.
    - large (high-cardinality keys, e.g. millions of entity pairs) -> the
      hash-partitioned shuffle merge, which scales out with cluster size.

    ``plan``: "auto" (default) probes as above; "tree" / "shuffle" skip the
    probe when the caller already knows the key-space size — "tree" stays
    fully lazy (no materialize barrier), the right call for bounded
    vocabularies like predicate/type pairs.
    """
    def final(batch: pd.DataFrame) -> pd.DataFrame:
        return finalize(combine(batch))

    if plan == "tree":
        # caller asserts a small key space: fully LAZY two-level reduction,
        # no probe barrier — one streaming execution end to end
        return (
            partials.repartition(fanin)
            .map_batches(combine, batch_format="pandas", batch_size=None)
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None)
        )
    if plan == "shuffle":
        return bucketed_group_apply(
            partials, key, lambda b: final(b), num_buckets
        )
    p = partials.materialize()
    if p.count() <= small_rows:
        nb = p.num_blocks()
        if nb <= 1:
            return p.map_batches(final, batch_format="pandas", batch_size=None)
        while nb > 1:
            nb = max(1, -(-nb // fanin))
            step = combine if nb > 1 else final
            p = p.repartition(nb).map_batches(
                step, batch_format="pandas", batch_size=None
            )
        return p
    return bucketed_group_apply(
        p, key, lambda b: final(b), num_buckets
    )




def segment_pairs(group_keys):
    """All ordered within-segment index pairs (i earlier, j later) over a
    SORTED group-key array, fully vectorized: row t at position p_t
    within its segment pairs every earlier segment row with t. Returns
    ``(i_idx, j_idx)`` int64 index arrays (empty when no segment has 2+
    rows). Shared by the co-occurrence pair expansion, the wedge-closure
    kernel and the FastSS candidate generator — one home for the subtle
    cumsum/repeat indexing.
    """
    import numpy as np

    n = len(group_keys)
    empty = np.array([], dtype=np.int64)
    if n == 0:
        return empty, empty
    idx = np.arange(n, dtype=np.int64)
    change = np.concatenate(([True], group_keys[1:] != group_keys[:-1]))
    starts = idx[change]
    seg_start = np.repeat(starts, np.diff(np.append(starts, n)))
    cnt = idx - seg_start  # pairs contributed by row t
    tot = int(cnt.sum())
    if tot == 0:
        return empty, empty
    j_idx = np.repeat(idx, cnt)
    block0 = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    off = np.arange(tot, dtype=np.int64) - np.repeat(block0, cnt)
    i_idx = np.repeat(seg_start, cnt) + off
    return i_idx, j_idx
