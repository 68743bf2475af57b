"""Stage 4 — graph node / adjacency aggregations.

Reference analog: ``build_mappings`` (/root/reference/data/pubtator.py:384-409)
— the dual doc->entities / entity->docs dict aggregation that the reference
runs driver-side; here each is a hash-partitioned distributed aggregate.
Sorted-distinct list semantics mirror the reference's ``set_to_string``
(prepare_entity_dataset.py:76-81) so outputs are deterministic regardless
of block order / parallelism.

Scale note (SURVEY.md §7.3): before the shuffle we pre-deduplicate
(conv_id, entity_id) pairs inside every input batch, so the shuffled volume
for a hot entity is one row per (entity, input-batch) — the combiner
pattern — rather than one row per mention.
"""

from __future__ import annotations

import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

SET_SEP = ";;;"  # reference's set serialization separator


def _prededup(cols: list[str]):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    return fn


def conv2entity(mentions, num_buckets: int = 64, as_string: bool = True):
    """conv_id -> sorted distinct entity ids (+count).

    ``as_string=True`` emits the reference-style ';;;'-joined string (also
    what the DuckDB oracle can reproduce with string_agg); ``False`` emits a
    real Arrow list column.
    """
    pairs = mentions.map_batches(
        _prededup(["conv_id", "entity_id"]), batch_format="pandas"
    )

    def agg(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates().sort_values(
            ["conv_id", "entity_id"], kind="mergesort"
        )
        g = b.groupby("conv_id", sort=False)["entity_id"]
        if as_string:
            out = g.agg(SET_SEP.join).reset_index().rename(columns={"entity_id": "entity_ids"})
        else:
            out = g.agg(list).reset_index().rename(columns={"entity_id": "entity_ids"})
        out["n_entities"] = g.nunique().to_numpy().astype("int32")
        return out

    return bucketed_group_apply(pairs, "conv_id", agg, num_buckets)


def entity2conv(mentions, num_buckets: int = 64, as_string: bool = True):
    """entity_id -> sorted distinct conv ids + support (graph node table)."""
    pairs = mentions.map_batches(
        _prededup(["entity_id", "entity_type", "conv_id"]), batch_format="pandas"
    )

    def agg(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates().sort_values(
            ["entity_id", "conv_id"], kind="mergesort"
        )
        g = b.groupby(["entity_id", "entity_type"], sort=False)["conv_id"]
        joiner = SET_SEP.join if as_string else list
        out = g.agg(joiner).reset_index().rename(columns={"conv_id": "conv_ids"})
        out["support"] = g.nunique().to_numpy().astype("int64")
        return out

    return bucketed_group_apply(pairs, "entity_id", agg, num_buckets)


def unique_values(ds, column: str, num_buckets: int = 64):
    """Global distinct of one column (reference UniqueValueExtractor,
    utils/pandas_utils.py:86-106 — there a driver-side side effect; here a
    first-class distributed distinct)."""
    vals = ds.map_batches(_prededup([column]), batch_format="pandas")

    def agg(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    return bucketed_group_apply(vals, column, agg, num_buckets)


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
