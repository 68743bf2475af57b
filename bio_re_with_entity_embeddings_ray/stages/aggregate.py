"""Stage 4 — graph node / adjacency aggregations.

Reference analog: ``build_mappings`` (/root/reference/data/pubtator.py:384-409)
— the dual doc->entities / entity->docs dict aggregation that the reference
runs driver-side; here each is a distributed partial-aggregate + merge.
Sorted-distinct list semantics mirror the reference's ``set_to_string``
(prepare_entity_dataset.py:76-81) so outputs are deterministic regardless
of block order / parallelism.

Scale design (combiner pattern, SURVEY.md §4): set-union is associative,
so every aggregate here runs a PARTIAL stage inside ``map_batches`` (one
row per key per input block, entity sets already deduped and ';;;'-packed)
and only those partials go through the hash-partitioned merge. For a hot
key the shuffle ships one row per block, not one row per mention — the
same discipline the pair aggregation uses (pairs.py).
"""

from __future__ import annotations

import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

SET_SEP = ";;;"  # reference's set serialization separator


def _pack(series: pd.Series) -> str:
    return SET_SEP.join(sorted(set(series)))


def _merge_packed(series: pd.Series) -> tuple[str, int]:
    seen: set[str] = set()
    for part in series:
        seen.update(part.split(SET_SEP))
    return SET_SEP.join(sorted(seen)), len(seen)


def conv2entity(mentions, num_buckets: int = 64, as_string: bool = True):
    """conv_id -> sorted distinct entity ids (+count)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["conv_id", "entity_id"]].drop_duplicates()
        g = b.groupby("conv_id", sort=False)["entity_id"]
        return g.agg(_pack).reset_index().rename(columns={"entity_id": "packed"})

    partials = mentions.map_batches(partial, batch_format="pandas")

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False)["packed"].agg(_merge_packed)
        out = pd.DataFrame(
            {
                "conv_id": g.index,
                "entity_ids": [t[0] for t in g],
                "n_entities": pd.Series([t[1] for t in g], dtype="int32").to_numpy(),
            }
        )
        if not as_string:
            out["entity_ids"] = out["entity_ids"].str.split(SET_SEP)
        return out

    return bucketed_group_apply(partials, "conv_id", merge, num_buckets)


def entity2conv(mentions, num_buckets: int = 64, as_string: bool = True):
    """entity_id -> sorted distinct conv ids + support (graph node table)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["entity_id", "entity_type", "conv_id"]].drop_duplicates()
        g = b.groupby(["entity_id", "entity_type"], sort=False)["conv_id"]
        return g.agg(_pack).reset_index().rename(columns={"conv_id": "packed"})

    partials = mentions.map_batches(partial, batch_format="pandas")

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["entity_id", "entity_type"], sort=False)["packed"].agg(
            _merge_packed
        )
        idx = g.index.to_frame(index=False)
        out = pd.DataFrame(
            {
                "entity_id": idx["entity_id"],
                "entity_type": idx["entity_type"],
                "conv_ids": [t[0] for t in g],
                "support": pd.Series([t[1] for t in g], dtype="int64").to_numpy(),
            }
        )
        if not as_string:
            out["conv_ids"] = out["conv_ids"].str.split(SET_SEP)
        return out

    return bucketed_group_apply(partials, "entity_id", merge, num_buckets)


def unique_values(ds, column: str, num_buckets: int = 64):
    """Global distinct of one column (reference UniqueValueExtractor,
    utils/pandas_utils.py:86-106 — there a driver-side side effect; here a
    first-class distributed distinct with a per-block combiner)."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[column]].drop_duplicates()

    vals = ds.map_batches(local, batch_format="pandas")
    return bucketed_group_apply(vals, column, local, num_buckets)


def drop_duplicates(ds, subset: list[str], order_col: str, num_buckets: int = 64):
    """Exact dedup keeping the first row by ``order_col`` per key
    (reference DropDuplicates, utils/pandas_utils.py:109-120 — pandas
    keep='first'; made deterministic here via an explicit order column)."""

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(order_col, kind="mergesort").drop_duplicates(
            subset=subset, keep="first"
        )

    pre = ds.map_batches(local_first, batch_format="pandas")
    return bucketed_group_apply(pre, subset, local_first, num_buckets)
