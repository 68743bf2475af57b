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
and only those partials go through the merge, whose physical plan
(no-shuffle reduction tree vs hash-partitioned exchange) is picked by
measured partial size — see :func:`common.merge_partials`.
"""

from __future__ import annotations

import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.common import (
    bucketed_group_apply,
    merge_partials,
)

SET_SEP = ";;;"  # reference's set serialization separator


def group_join(
    frame: pd.DataFrame, keys: list[str], col: str, out_col: str, sep: str = SET_SEP
) -> pd.DataFrame:
    """``sep``-join (default ';;;') of string ``col`` per ``keys`` in the
    frame's CURRENT row order — Arrow hash ``group_by('list')`` +
    ``binary_join``: one C call per batch instead of one Python ``join``
    per group (with millions of small groups the interpreter overhead
    dominated the combiner). Callers establish order / distinctness first;
    single-threaded group_by keeps first-appearance key order and in-order
    list values."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(frame) == 0:
        out = frame[keys].copy()
        out[out_col] = pd.Series([], dtype="object")
        return out
    t = pa.Table.from_pandas(frame[[*keys, col]], preserve_index=False)
    g = t.group_by(keys, use_threads=False).aggregate([(col, "list")])
    packed = pc.binary_join(g[f"{col}_list"].combine_chunks(), sep)
    return g.remove_column(len(keys)).append_column(out_col, packed).to_pandas()


def pack_sorted_distinct(
    frame: pd.DataFrame, keys: list[str], col: str, out_col: str
) -> pd.DataFrame:
    """Sorted-distinct ';;;'-pack of ``col`` per ``keys`` (the reference's
    set_to_string semantics, prepare_entity_dataset.py:76-81) — mergesort +
    dedup + :func:`group_join`, fully C-level."""
    cols = [*keys, col]
    b = frame[cols].drop_duplicates().sort_values(cols, kind="mergesort")
    return group_join(b, keys, col, out_col)


def explode_packed(frame: pd.DataFrame, keys: list[str], col: str) -> pd.DataFrame:
    """(keys, ';;;'-packed) -> one row per element; Arrow split + take."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(frame) == 0:
        return frame[[*keys, col]]
    t = pa.Table.from_pandas(frame[[*keys, col]], preserve_index=False)
    lists = pc.split_pattern(t[col].combine_chunks(), SET_SEP)
    par = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    return t.remove_column(len(keys)).take(par).append_column(col, flat).to_pandas()


def _combine_packed(keys: list[str], col: str = "packed", disjoint: bool = False):
    """Associative combine of ';;;'-packed sets per key (schema-preserving).

    ``disjoint=True`` asserts the partials for one key never share members
    (true when the set elements are conv ids and every conversation's rows
    live in exactly one upstream block — the conv-partitioned layout): the
    union degenerates to an in-order string concat, no split/dedup/sort.
    The set CONTENT stays deterministic; intra-list order then follows
    block order. Default keeps full sorted-union semantics (byte-stable
    output): explode the packed partials and re-pack sorted-distinct —
    both paths all-Arrow, no per-group Python.
    """

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        if disjoint:
            return group_join(batch, keys, col, col)
        return pack_sorted_distinct(explode_packed(batch, keys, col), keys, col, col)

    return combine


def conv2entity(
    mentions,
    num_buckets: int = 64,
    as_string: bool = True,
    disjoint_blocks: bool = False,
    merge_plan: str = "auto",
):
    """conv_id -> sorted distinct entity ids (+count).

    ``disjoint_blocks``: pass True when every conversation's mention rows
    are contiguous in one block (conv-partitioned layout) — the merge then
    concatenates disjoint partials instead of set-unioning (see
    ``_combine_packed``).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pack_sorted_distinct(batch, ["conv_id"], "entity_id", "packed")

    partials = mentions.map_batches(partial, batch_format="pandas", batch_size=None)

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined.rename(columns={"packed": "entity_ids"})
        counts = out["entity_ids"].str.count(SET_SEP) + 1
        out["n_entities"] = counts.astype("int32")
        if not as_string:
            out["entity_ids"] = out["entity_ids"].str.split(SET_SEP)
        return out

    return merge_partials(
        partials,
        "conv_id",
        _combine_packed(["conv_id"], disjoint=disjoint_blocks),
        finalize,
        num_buckets,
        plan=merge_plan,
    )


def entity2conv(
    mentions,
    num_buckets: int = 64,
    as_string: bool = True,
    disjoint_blocks: bool = False,
    merge_plan: str = "auto",
):
    """entity_id -> sorted distinct conv ids + support (graph node table).

    ``disjoint_blocks`` as in :func:`conv2entity` — per-entity partial conv
    sets from different blocks cannot overlap when conversations are
    block-contiguous, so the merge is a concat.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pack_sorted_distinct(
            batch, ["entity_id", "entity_type"], "conv_id", "packed"
        )

    partials = mentions.map_batches(partial, batch_format="pandas", batch_size=None)

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined.rename(columns={"packed": "conv_ids"})
        counts = out["conv_ids"].str.count(SET_SEP) + 1
        out["support"] = counts.astype("int64")
        if not as_string:
            out["conv_ids"] = out["conv_ids"].str.split(SET_SEP)
        return out

    return merge_partials(
        partials,
        "entity_id",
        _combine_packed(["entity_id", "entity_type"], disjoint=disjoint_blocks),
        finalize,
        num_buckets,
        plan=merge_plan,
    )


def entity2conv_bucketed(
    mentions,
    num_buckets: int = 64,
    assume_unsplit_blocks: bool = False,
    merge_plan: str = "auto",
):
    """Scale path for hot entities: bucketed provenance + payload-free
    exact support (same design and block-split robustness as
    pairs.triples_bucketed — boundary convs run through the exact path,
    interior convs pack per block; the sources are disjoint).

    Returns ``(nodes, provenance)``: nodes = (entity_id, entity_type,
    support); provenance = (entity_id, entity_type, conv_ids, n_convs)
    disjoint buckets whose union is each entity's full conv set."""

    def interior_pack(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "entity_id": pd.Series([], dtype="object"),
                    "entity_type": pd.Series([], dtype="object"),
                    "conv_ids": pd.Series([], dtype="object"),
                    "n_convs": pd.Series([], dtype="int64"),
                }
            )
        if assume_unsplit_blocks:
            inner = batch
        else:
            boundary = {batch["conv_id"].iloc[0], batch["conv_id"].iloc[-1]}
            inner = batch[~batch["conv_id"].isin(boundary)]
        out = pack_sorted_distinct(
            inner, ["entity_id", "entity_type"], "conv_id", "conv_ids"
        )
        out["n_convs"] = (out["conv_ids"].str.count(SET_SEP) + 1).astype("int64")
        return out

    def boundary_rows(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch[["entity_id", "entity_type", "conv_id"]]
        boundary = {batch["conv_id"].iloc[0], batch["conv_id"].iloc[-1]}
        return batch[batch["conv_id"].isin(boundary)][
            ["entity_id", "entity_type", "conv_id"]
        ]

    interior = mentions.map_batches(
        interior_pack, batch_format="pandas", batch_size=None
    )
    if assume_unsplit_blocks:
        provenance = interior.materialize()
        counts = provenance.select_columns(["entity_id", "entity_type", "n_convs"])
        return _merge_entity_counts(counts, num_buckets, merge_plan), provenance
    bnd = mentions.map_batches(boundary_rows, batch_format="pandas", batch_size=None)
    bnd_prov = entity2conv(bnd, num_buckets).map_batches(
        lambda b: pd.DataFrame(
            {
                "entity_id": b["entity_id"],
                "entity_type": b["entity_type"],
                "conv_ids": b["conv_ids"],
                "n_convs": b["support"].astype("int64"),
            }
        ),
        batch_format="pandas",
        batch_size=None,
    )
    provenance = interior.union(bnd_prov).materialize()
    counts = provenance.select_columns(["entity_id", "entity_type", "n_convs"])
    return _merge_entity_counts(counts, num_buckets, merge_plan), provenance


def _merge_entity_counts(counts, num_buckets: int, plan: str = "auto"):
    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["entity_id", "entity_type"], sort=False)["n_convs"].sum()
        return g.reset_index()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined[["entity_id", "entity_type"]].copy()
        out["support"] = combined["n_convs"].astype("int64")
        return out

    return merge_partials(
        counts, ["entity_id", "entity_type"], combine, finalize, num_buckets, plan=plan
    )


def unique_values(ds, column: str, num_buckets: int = 64):
    """Global distinct of one column (reference UniqueValueExtractor,
    utils/pandas_utils.py:86-106 — there a driver-side side effect; here a
    first-class distributed distinct with a per-block combiner)."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[column]].drop_duplicates()

    vals = ds.map_batches(local, batch_format="pandas", batch_size=None)
    return merge_partials(vals, column, local, lambda b: b, num_buckets)


def drop_duplicates(ds, subset: list[str], order_col: str, num_buckets: int = 64):
    """Exact dedup keeping the first row by ``order_col`` per key
    (reference DropDuplicates, utils/pandas_utils.py:109-120 — pandas
    keep='first'; made deterministic here via an explicit order column)."""

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        # full-row sort order: ties on order_col would otherwise resolve
        # by block arrival order, which varies with parallelism
        by = [order_col] + [c for c in batch.columns if c != order_col]
        return batch.sort_values(by, kind="mergesort").drop_duplicates(
            subset=subset, keep="first"
        )

    pre = ds.map_batches(local_first, batch_format="pandas", batch_size=None)
    return merge_partials(pre, subset, local_first, lambda b: b, num_buckets)


def keep_latest(ds, key_cols, order_cols, num_buckets: int = 16):
    """CDC/upsert compaction: keep, per ``key_cols`` group, the single
    row that is LAST under ``order_cols`` (ties impossible when the
    order includes a unique id — callers supply one, mirroring SQL
    ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order DESC) = 1``).

    The scale twin of :func:`drop_duplicates` (keep-first): a per-batch
    keep-latest COMBINER (idempotent and associative — max under a
    lexicographic order) collapses each block to one row per key before
    the key-partitioned merge, so a hot key ships one row per block,
    never its full update history. This is the compaction step of any
    incremental ingest (apply the newest record per entity)."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    keys = list(key_cols)
    order = list(order_cols)

    def local_latest(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(keys + order, kind="mergesort")
        return b.groupby(keys, as_index=False, sort=False).tail(1)

    return merge_partials(
        ds.map_batches(local_latest, batch_format="pandas"),
        keys,
        local_latest,
        lambda b: b,
        num_buckets,
    )


def entity_type_counts(mentions, num_buckets: int = 16):
    """Per-entity-type mention/entity counts over the mention stream:
    (entity_type, n_mentions, n_entities) with ``n_entities`` = distinct
    canonical ids of that type — the gazetteer-coverage observability
    aggregate. Per-block partials carry (type, id)-distinct id sets as
    counts would double-merge, so the distinct merge happens per
    type-hash bucket (type-bounded) before counting."""
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("entity_type", as_index=False).agg(
            n_mentions=("entity_id", "size")
        )
        g["n_mentions"] = g["n_mentions"].astype("int64")
        return g

    counts = merge_partials(
        mentions.map_batches(partial, batch_format="pandas", batch_size=None),
        "entity_type",
        lambda b: b.groupby("entity_type", as_index=False)["n_mentions"].sum(),
        lambda b: b,
        num_buckets,
        plan="tree",
    ).to_pandas()

    def distinct_ids(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["entity_type", "entity_id"]].drop_duplicates()

    slim = mentions.map_batches(distinct_ids, batch_format="pandas", batch_size=None)

    def per_type(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.drop_duplicates().groupby(
            "entity_type", as_index=False
        ).agg(n_entities=("entity_id", "size"))
        g["n_entities"] = g["n_entities"].astype("int64")
        return g

    ents = bucketed_group_apply(slim, "entity_type", per_type, num_buckets).to_pandas()
    out = counts.merge(ents, on="entity_type")
    return out.sort_values("entity_type").reset_index(drop=True)
