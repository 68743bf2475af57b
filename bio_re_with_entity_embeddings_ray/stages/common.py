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
import pyarrow as pa

from bio_re_with_entity_embeddings_ray.functions.textfns import hash_bucket

BUCKET_COL = "__bucket"


def add_bucket(ds, key: str, num_buckets: int):
    """Add the deterministic hash-bucket column for ``key``."""

    def _assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch[BUCKET_COL] = hash_bucket(batch[key].to_numpy(), num_buckets)
        return batch

    return ds.map_batches(_assign, batch_format="pandas")


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
        batch = batch.copy(deep=False)
        if join_key is not None:
            kv = batch[join_key].to_numpy()
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

    bucketed = ds.map_batches(_assign, batch_format="pandas")
    return bucketed.groupby(BUCKET_COL).map_groups(_apply, batch_format="pandas")


def to_arrow_sorted(df: pd.DataFrame, by: list[str], schema: pa.Schema | None = None) -> pa.Table:
    """Deterministic ordering helper for small driver-side results."""
    df = df.sort_values(by, kind="mergesort").reset_index(drop=True)
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)
