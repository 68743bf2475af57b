"""Stage 5 — candidate pair generation + pair aggregation (triples).

Reference analog: ``CooccurrencePreparator`` (/root/reference/
prepare_pair_dataset.py:25-53): inner-join the per-type doc->entities
mappings on document id, per-document cross product of (source, target)
entity ids, then aggregate pair -> article set (the emitted
``instances.tsv`` = (source_id, target_id, articles_str), the triples
ground truth; predicate implied by the type pair).

Scale design (the skew-prone shuffle, SURVEY.md §7.3):
- cross product happens inside the conv_id-partitioned stage (narrow per
  conversation);
- pair aggregation is TWO-PHASE: a combiner inside ``map_batches`` first
  collapses each batch to one row per (subj, obj) with a partial distinct
  conv set, so a hot pair ships one row per input block — not one row per
  co-occurrence — into the final hash-partitioned merge. This is the
  salted/partial-aggregation pattern the north rule requires for hot
  entities (high-frequency tools / operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.aggregate import (
    SET_SEP,
    _combine_packed,
    pack_sorted_distinct,
)
from bio_re_with_entity_embeddings_ray.stages.common import (
    bucketed_group_apply,
    merge_partials,
)


def _cross_and_pack(
    batch: pd.DataFrame,
    subj_type: str,
    obj_type: str,
    out_col: str,
    with_counts: bool = False,
) -> pd.DataFrame:
    """Per-conversation cross product of distinct subj x obj entities in
    one frame, packed to one ';;;'-sorted conv set per (subj, obj) — the
    single definition behind the general, conv-partitioned and bucketed
    paths (reference cross product, prepare_pair_dataset.py:37)."""
    b = batch[batch["entity_type"].isin([subj_type, obj_type])][
        ["conv_id", "entity_type", "entity_id"]
    ].drop_duplicates()
    src = b[b["entity_type"] == subj_type][["conv_id", "entity_id"]].rename(
        columns={"entity_id": "subj_id"}
    )
    tgt = b[b["entity_type"] == obj_type][["conv_id", "entity_id"]].rename(
        columns={"entity_id": "obj_id"}
    )
    m = src.merge(tgt, on="conv_id")
    out = pack_sorted_distinct(m, ["subj_id", "obj_id"], "conv_id", out_col)
    if with_counts:
        out["n_convs"] = (out[out_col].str.count(SET_SEP) + 1).astype("int64")
    return out


def candidate_pairs(
    mentions,
    subj_type: str,
    obj_type: str,
    num_buckets: int = 64,
):
    """Per-conversation cross product of distinct subj-type x obj-type
    entities -> (conv_id, subj_id, obj_id). One conv_id hash shuffle."""

    def prededup(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["entity_type"].isin([subj_type, obj_type])]
        return b[["conv_id", "entity_type", "entity_id"]].drop_duplicates()

    slim = mentions.map_batches(prededup, batch_format="pandas", batch_size=None)

    def cross(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates()
        src = b[b["entity_type"] == subj_type][["conv_id", "entity_id"]].rename(
            columns={"entity_id": "subj_id"}
        )
        tgt = b[b["entity_type"] == obj_type][["conv_id", "entity_id"]].rename(
            columns={"entity_id": "obj_id"}
        )
        # vectorized per-conv cross product == reference's
        # [(s, t) for s in source_ids for t in target_ids] at
        # prepare_pair_dataset.py:37, for every conv in the bucket at once
        return src.merge(tgt, on="conv_id")

    return bucketed_group_apply(slim, "conv_id", cross, num_buckets)


def aggregate_pairs(
    cand,
    pred: str,
    num_buckets: int = 64,
    as_string: bool = True,
    merge_plan: str = "auto",
):
    """(conv_id, subj_id, obj_id) -> (subj_id, pred, obj_id, conv_ids,
    support). Two-phase: per-batch combiner then hash-partitioned merge."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pack_sorted_distinct(
            batch, ["subj_id", "obj_id"], "conv_id", "convs_partial"
        )

    partials = cand.map_batches(partial, batch_format="pandas", batch_size=None)
    return _merge_pair_partials(partials, pred, num_buckets, as_string, plan=merge_plan)


def _merge_pair_partials(
    partials,
    pred: str,
    num_buckets: int,
    as_string: bool,
    disjoint: bool = False,
    plan: str = "auto",
):
    """Merge of (subj, obj, convs_partial) rows — associative combine +
    finalize, physical plan picked by measured partial size
    (common.merge_partials). ``disjoint=True`` (conv-partitioned upstream:
    a conversation's rows live in exactly one block, so per-pair partial
    conv sets cannot overlap) turns the set-union into a C-speed concat —
    see aggregate._combine_packed."""

    combine = _combine_packed(["subj_id", "obj_id"], "convs_partial", disjoint)

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "subj_id": combined["subj_id"],
                "pred": pred,
                "obj_id": combined["obj_id"],
                "conv_ids": combined["convs_partial"],
                "support": (
                    combined["convs_partial"].str.count(SET_SEP) + 1
                ).astype("int64"),
            }
        )
        if not as_string:
            out["conv_ids"] = out["conv_ids"].str.split(SET_SEP)
        return out

    return merge_partials(
        partials, ["subj_id", "obj_id"], combine, finalize, num_buckets, plan=plan
    )


def triples(
    mentions,
    subj_type: str,
    obj_type: str,
    pred: str,
    num_buckets: int = 64,
    as_string: bool = True,
    conv_partitioned: bool = False,
    merge_plan: str = "auto",
):
    """mentions -> aggregated co-occurrence triples for one type pair.

    ``conv_partitioned=True`` declares that every conversation's mention
    rows are contiguous within one block (true when the upstream pipeline
    derived/scanned transcripts per conversation and blocks were never
    split mid-conversation — the engine's standard layout, and the layout
    the checkpoint partitioning produces). Under that assumption the
    per-conv cross product + pair partial runs per BLOCK with no conv
    shuffle; only the tiny (subj, obj, packed-convs) partials shuffle into
    the final merge. Without it, the general path shuffles by conv first.
    """
    if not conv_partitioned:
        cand = candidate_pairs(mentions, subj_type, obj_type, num_buckets)
        return aggregate_pairs(cand, pred, num_buckets, as_string, merge_plan)

    def cross_and_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return _cross_and_pack(batch, subj_type, obj_type, "convs_partial")

    # batch = whole block so a conversation is never split across batches
    partials = mentions.map_batches(
        cross_and_partial, batch_format="pandas", batch_size=None
    )
    return _merge_pair_partials(
        partials, pred, num_buckets, as_string, disjoint=True, plan=merge_plan
    )


def triples_bucketed(
    mentions,
    subj_type: str,
    obj_type: str,
    pred: str,
    num_buckets: int = 64,
    assume_unsplit_blocks: bool = False,
    merge_plan: str = "auto",
):
    """Scale path for HOT pairs (SURVEY.md §7.3: cap/stream giant groups,
    support counts + bucketed provenance).

    When pair keys are pathologically hot (every pair co-occurring with a
    large fraction of all conversations), materializing one row per pair
    with its full conv list funnels the whole provenance payload through
    single tasks. Here provenance stays BUCKETED and is written/consumed
    in parallel; the edge table carries EXACT global support from a
    payload-free integer sum.

    Robust BY DEFAULT to Ray's dynamic block splitting (a conversation's
    rows straddling two blocks): only a block's FIRST and LAST conv can
    straddle, so those convs' raw mention rows (tiny, <= 2 convs/block)
    run through the EXACT general path — catching pairs whose subj and
    obj landed in different fragments — while interior convs are packed
    per block payload-free. A conv is boundary in every block it touches
    or interior in exactly one, so the two provenance sources are
    disjoint and their counts summable.

    Returns ``(edges, provenance)``:
      edges      — (subj_id, pred, obj_id, support), one row per pair
      provenance — (subj_id, obj_id, conv_ids, n_convs): disjoint buckets
                   whose union is each pair's full conv set

    ``assume_unsplit_blocks=True`` skips the boundary sub-pipelines when
    the caller guarantees blocks were never split mid-conversation
    (emitted block size << DataContext.target_max_block_size).
    """

    def interior_pack(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "subj_id": pd.Series([], dtype="object"),
                    "obj_id": pd.Series([], dtype="object"),
                    "conv_ids": pd.Series([], dtype="object"),
                    "n_convs": pd.Series([], dtype="int64"),
                }
            )
        if assume_unsplit_blocks:
            inner = batch
        else:
            boundary = {batch["conv_id"].iloc[0], batch["conv_id"].iloc[-1]}
            inner = batch[~batch["conv_id"].isin(boundary)]
        return _cross_and_pack(
            inner, subj_type, obj_type, "conv_ids", with_counts=True
        )

    def boundary_rows(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch[["conv_id", "entity_type", "entity_id"]]
        boundary = {batch["conv_id"].iloc[0], batch["conv_id"].iloc[-1]}
        return batch[batch["conv_id"].isin(boundary)][
            ["conv_id", "entity_type", "entity_id"]
        ]

    interior = mentions.map_batches(
        interior_pack, batch_format="pandas", batch_size=None
    )
    if assume_unsplit_blocks:
        # caller guarantees block size stays under
        # DataContext.target_max_block_size so Ray never splits a
        # conversation across blocks — skip the boundary sub-pipelines
        provenance = interior.materialize()
    else:
        bnd = mentions.map_batches(
            boundary_rows, batch_format="pandas", batch_size=None
        )
        bnd_prov = triples(bnd, subj_type, obj_type, pred, num_buckets).map_batches(
            lambda b: pd.DataFrame(
                {
                    "subj_id": b["subj_id"],
                    "obj_id": b["obj_id"],
                    "conv_ids": b["conv_ids"],
                    "n_convs": b["support"].astype("int64"),
                }
            ),
            batch_format="pandas",
            batch_size=None,
        )
        provenance = interior.union(bnd_prov).materialize()

    counts = provenance.select_columns(["subj_id", "obj_id", "n_convs"])
    edges = merge_pair_counts(counts, pred, num_buckets, merge_plan)
    return edges, provenance


def merge_pair_counts(counts, pred: str, num_buckets: int = 64, plan: str = "auto"):
    """(subj_id, obj_id, n_convs) disjoint partial counts -> exact edges
    (subj_id, pred, obj_id, support) via the measured merge-plan chooser
    (shared by triples_bucketed and kg.nodes_and_triples_bucketed)."""

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["subj_id", "obj_id"], sort=False)["n_convs"].sum()
        return g.reset_index()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj_id": combined["subj_id"],
                "pred": pred,
                "obj_id": combined["obj_id"],
                "support": combined["n_convs"].astype("int64"),
            }
        )

    return merge_partials(
        counts, ["subj_id", "obj_id"], combine, finalize, num_buckets, plan=plan
    )


def adjacency_edges(triples_ds):
    """Flatten triples into symmetric flat edges
    (entity_id, neighbor_id, pred, weight=support) — the flat form of the
    adjacency index (nested list<struct> variant: :func:`adjacency_index`)."""

    def flip(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame(
            {
                "entity_id": batch["subj_id"],
                "neighbor_id": batch["obj_id"],
                "pred": batch["pred"],
                "weight": batch["support"].astype("int64"),
            }
        )
        rev = pd.DataFrame(
            {
                "entity_id": batch["obj_id"],
                "neighbor_id": batch["subj_id"],
                "pred": batch["pred"],
                "weight": batch["support"].astype("int64"),
            }
        )
        return pd.concat([fwd, rev], ignore_index=True)

    return triples_ds.map_batches(flip, batch_format="pandas")


def adjacency_index(edges_ds, num_buckets: int = 16):
    """Nested adjacency index (schemas.ADJACENCY): group the flat symmetric
    edges into one row per entity with its neighbor list as a real Arrow
    ``list<struct<neighbor_id, pred, weight>>`` column, sorted by
    (neighbor_id, pred) for determinism.

    This is the graph-serving materialization of the KG (reference's
    entity-pair dataset consumed as an adjacency map,
    prepare_entity_dataset.py:55-101): one shuffle of the edge table keyed
    by entity_id, nested assembly inside the bucket — entity text /
    provenance never rides along. Oracle: DuckDB
    ``list(struct_pack(...) ORDER BY ...)`` (oracles.ADJACENCY_INDEX).
    """

    def build(bucket: pd.DataFrame):
        import pyarrow as pa

        b = bucket.sort_values(
            ["entity_id", "neighbor_id", "pred"], kind="mergesort"
        )
        # vectorized nested assembly: one struct array over the sorted
        # edges + a ListArray cut at entity boundaries (no per-entity
        # Python loop; emits a real Arrow list<struct> block)
        structs = pa.StructArray.from_arrays(
            [
                pa.array(b["neighbor_id"], pa.string()),
                pa.array(b["pred"], pa.string()),
                pa.array(b["weight"].to_numpy().astype(np.int64), pa.int64()),
            ],
            names=["neighbor_id", "pred", "weight"],
        )
        ents, starts = np.unique(b["entity_id"].to_numpy(), return_index=True)
        offsets = np.append(starts, len(b)).astype(np.int32)
        return pa.table(
            {
                "entity_id": pa.array(ents, pa.string()),
                "neighbors": pa.ListArray.from_arrays(offsets, structs),
            }
        )

    return bucketed_group_apply(edges_ds, "entity_id", build, num_buckets)


def temporal_triples(
    transcripts,
    subj_type: str,
    obj_type: str,
    pred: str,
    num_buckets: int = 16,
):
    """Triples with VALIDITY WINDOWS: each (subj, pred, obj) edge carries
    the epoch-second range [first_s, last_s] spanned by its supporting
    conversations — the temporal-KG annotation (when was this relation
    observed) that plain co-occurrence aggregation drops.

    Scale shape: the conversation time table (conv -> min/max ts) is
    fact-scale, so it is NOT broadcast — candidate pairs join it through
    the measured ``relational.hash_join`` on conv_id (both sides
    conv-keyed), then a pair-keyed min/min-max/max-sum combiner merge.
    Timestamps floor to integer epoch seconds once, so the SQL mirror is
    exact under any accumulation order.
    """
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials
    from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions
    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    m = scan_mentions(transcripts, include_tool=True)
    cand = candidate_pairs(m, subj_type, obj_type, num_buckets)

    def ts_partial(batch: pd.DataFrame) -> pd.DataFrame:
        e = batch["ts"].astype("datetime64[s]").astype("int64")
        return (
            pd.DataFrame({"conv_id": batch["conv_id"], "e": e})
            .groupby("conv_id", as_index=False)
            .agg(first_s=("e", "min"), last_s=("e", "max"))
        )

    def ts_combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("conv_id", as_index=False).agg(
            first_s=("first_s", "min"), last_s=("last_s", "max")
        )

    conv_ts = merge_partials(
        transcripts.map_batches(ts_partial, batch_format="pandas"),
        "conv_id",
        ts_combine,
        lambda b: b,
        num_buckets,
    )
    j = hash_join(cand, conv_ts, "conv_id", num_buckets=num_buckets)

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["subj_id", "obj_id"], as_index=False).agg(
            support=("conv_id", "size"),
            first_s=("first_s", "min"),
            last_s=("last_s", "max"),
        )

    def pair_combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["subj_id", "obj_id"], as_index=False).agg(
            support=("support", "sum"),
            first_s=("first_s", "min"),
            last_s=("last_s", "max"),
        )

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined.copy(deep=False)
        out["pred"] = pred
        out["support"] = out["support"].astype("int64")
        out["first_s"] = out["first_s"].astype("int64")
        out["last_s"] = out["last_s"].astype("int64")
        return out[["subj_id", "pred", "obj_id", "support", "first_s", "last_s"]]

    return merge_partials(
        j.map_batches(pair_partial, batch_format="pandas"),
        ["subj_id", "obj_id"],
        pair_combine,
        finalize,
        num_buckets,
    )


def triple_negatives(triples_ds, salt: str = "neg"):
    """TransE-style deterministic negative sampling: for each positive
    triple, one corrupted-object negative chosen by salted hash over the
    OBJECT VOCABULARY (the distinct obj ids of the triple table itself —
    type-consistent corruption). ``neg = vocab[h % n]``, bumped by one
    slot when the draw hits the true object — reproducible across runs
    and cluster sizes, a new epoch of negatives is a new salt.

    The object vocabulary is entity-bounded and broadcast; the pass is a
    pure narrow map. Returns (subj_id, obj_id, neg_obj_id).
    """
    import ray

    from bio_re_with_entity_embeddings_ray.functions.textfns import (
        md5int8_array,
    )

    vocab = np.sort(
        triples_ds.select_columns(["obj_id"])
        .to_pandas()["obj_id"]
        .unique()
    )
    vref = ray.put(vocab)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        vb = ray.get(vref)
        n = len(vb)
        key = (
            salt + ":" + batch["subj_id"].astype(str) + "|"
            + batch["obj_id"].astype(str)
        ).to_numpy()
        h = md5int8_array(key) % n
        neg = vb[h]
        clash = neg == batch["obj_id"].to_numpy()
        neg = np.where(clash, vb[(h + 1) % n], neg)
        return pd.DataFrame(
            {
                "subj_id": batch["subj_id"],
                "obj_id": batch["obj_id"],
                "neg_obj_id": neg,
            }
        )

    return triples_ds.map_batches(fn, batch_format="pandas")


def pair_lift(
    mentions,
    subj_type: str,
    obj_type: str,
    num_buckets: int = 64,
    scale: int = 10_000,
    merge_plan: str = "auto",
):
    """Co-occurrence strength ('lift' = observed/expected, the
    exponential of PMI) per candidate pair — the statistical edge weight
    the reference's downstream classifier learns implicitly from
    co-occurrence counts (prepare_pair_dataset.py:25-53 emits raw
    support; lift normalizes it by the entities' marginal frequencies so
    a hot tool co-occurring with everything stops looking like a strong
    relation).

    ``lift_bp = scale * n_pair * n_convs // (n_subj * n_obj)`` — exact
    integer arithmetic end to end (no logs, no floats), so the DuckDB
    oracle agrees bit-for-bit. n_convs = distinct conversations with at
    least one mention of either type (the candidate universe).

    Scale shape: ONE conv_id hash shuffle produces a tagged partial-count
    table (pair / entity-marginal / conv-count rows). Buckets partition
    conversations, so partials are exact and disjoint — the merges are
    plain sums. Pair counts merge through the measured plan; the
    entity marginals and the conv scalar are VOCABULARY-bounded, merged
    with the lazy tree plan and broadcast (``ray.put`` once) into the
    pair merge's finalize. No text and no provenance payload ever
    crosses an exchange — only (key, count) rows.
    """
    import ray

    def prededup(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["entity_type"].isin([subj_type, obj_type])]
        return b[["conv_id", "entity_type", "entity_id"]].drop_duplicates()

    slim = mentions.map_batches(prededup, batch_format="pandas", batch_size=None)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates()
        src = b[b["entity_type"] == subj_type][["conv_id", "entity_id"]].rename(
            columns={"entity_id": "subj_id"}
        )
        tgt = b[b["entity_type"] == obj_type][["conv_id", "entity_id"]].rename(
            columns={"entity_id": "obj_id"}
        )
        m = src.merge(tgt, on="conv_id")
        pair = m.groupby(["subj_id", "obj_id"], as_index=False).size()
        ent = b.groupby(["entity_type", "entity_id"], as_index=False).size()
        frames = [
            pd.DataFrame(
                {
                    "kind": "pair",
                    "k1": pair["subj_id"].astype(str),
                    "k2": pair["obj_id"].astype(str),
                    "n": pair["size"].astype("int64"),
                }
            ),
            pd.DataFrame(
                {
                    "kind": "ent",
                    "k1": ent["entity_type"].astype(str),
                    "k2": ent["entity_id"].astype(str),
                    "n": ent["size"].astype("int64"),
                }
            ),
            pd.DataFrame(
                {
                    "kind": ["conv"],
                    "k1": [""],
                    "k2": [""],
                    "n": np.array([b["conv_id"].nunique()], dtype=np.int64),
                }
            ),
        ]
        return pd.concat(frames, ignore_index=True)

    tagged = bucketed_group_apply(
        slim, "conv_id", per_bucket, num_buckets
    ).materialize()

    # entity marginals + conv universe: vocabulary-bounded side tables
    side = tagged.filter(expr="kind != 'pair'").to_pandas()
    side = side.groupby(["kind", "k1", "k2"], as_index=False)["n"].sum()
    n_convs = int(side.loc[side["kind"] == "conv", "n"].sum())
    ent_rows = side[side["kind"] == "ent"]
    n_subj_map = pd.Series(
        ent_rows.loc[ent_rows["k1"] == subj_type, "n"].to_numpy(),
        index=ent_rows.loc[ent_rows["k1"] == subj_type, "k2"],
    )
    n_obj_map = pd.Series(
        ent_rows.loc[ent_rows["k1"] == obj_type, "n"].to_numpy(),
        index=ent_rows.loc[ent_rows["k1"] == obj_type, "k2"],
    )
    marg_ref = ray.put((n_subj_map, n_obj_map, n_convs))

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["k1", "k2"], as_index=False)["n"].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        smap, omap, nconv = ray.get(marg_ref)
        n_pair = combined["n"].to_numpy(dtype=np.int64)
        n_subj = combined["k1"].map(smap).to_numpy(dtype=np.int64)
        n_obj = combined["k2"].map(omap).to_numpy(dtype=np.int64)
        if len(n_pair) and scale * nconv * int(n_pair.max()) > np.iinfo(np.int64).max:
            raise OverflowError(
                "pair_lift: scale * n_pair * n_convs exceeds int64 — "
                "lower `scale` for this corpus size"
            )
        lift = scale * n_pair * nconv // (n_subj * n_obj)
        return pd.DataFrame(
            {
                "subj_id": combined["k1"],
                "obj_id": combined["k2"],
                "n_pair": n_pair,
                "n_subj": n_subj,
                "n_obj": n_obj,
                "n_convs": np.int64(nconv),
                "lift_bp": lift.astype(np.int64),
            }
        )

    return merge_partials(
        tagged.filter(expr="kind == 'pair'"),
        ["k1", "k2"],
        combine,
        finalize,
        num_buckets,
        plan=merge_plan,
    )


def functional_violations(triples, min_objs: int = 2, num_buckets: int = 16):
    """KG consistency audit: subjects whose (subj, pred) carries
    ``min_objs``-or-more distinct objects — the violations of a
    functional-predicate constraint (one object expected), the first
    contradiction-detection pass over a freshly built KG. Returns
    (subj_id, pred, n_objs).

    The triple table is already DISTINCT on (subj, pred, obj) by
    construction, so this is a pure count combiner keyed (subj, pred) —
    one partial row per (key, block), no provenance payload."""
    import pandas as pd

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["subj_id", "pred"], as_index=False).size()
        return g.rename(columns={"size": "n_objs"})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["subj_id", "pred"], as_index=False)["n_objs"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b[b["n_objs"] >= min_objs].sort_values(
            ["subj_id", "pred"]
        ).reset_index(drop=True)
        out["n_objs"] = out["n_objs"].astype("int64")
        return out

    partials = triples.map_batches(partial, batch_format="pandas")
    return merge_partials(
        partials, ["subj_id", "pred"], combine, finalize, num_buckets
    )


def incremental_triples(prior, delta, num_buckets: int = 64):
    """Incremental KG materialization: merge a PRIOR aggregated triples
    table with a NEW shard's triples — per (subj_id, pred, obj_id), the
    sorted union of the packed conv sets with ``support`` recomputed as
    the union size. Because conversation universes of distinct crawl
    shards are disjoint, the incremental merge is EXACTLY equal to a
    full rebuild over the union corpus — which is how the driver oracle
    checks it (the query merges two half-corpus KGs and compares against
    the full-corpus TRIPLES SQL).

    Scale shape: one (subj, pred, obj)-keyed exchange of the two
    aggregated tables (pair-bounded, never the mention streams); the
    per-key union is the all-Arrow explode + re-pack combiner
    (:func:`~bio_re_with_entity_embeddings_ray.stages.aggregate.explode_packed`).
    History never recomputes — the whole point of incremental ingest.
    """
    from bio_re_with_entity_embeddings_ray.stages.aggregate import (
        SET_SEP,
        explode_packed,
        pack_sorted_distinct,
    )
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
    )

    keys = ["subj_id", "pred", "obj_id"]
    u = prior.select_columns([*keys, "conv_ids"]).union(
        delta.select_columns([*keys, "conv_ids"])
    )

    def per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        ex = explode_packed(bucket, keys, "conv_ids")
        p = pack_sorted_distinct(ex, keys, "conv_ids", "conv_ids")
        p["support"] = (p["conv_ids"].str.count(SET_SEP) + 1).astype("int64")
        return p[[*keys, "conv_ids", "support"]]

    return bucketed_group_apply(u, keys, per_key, num_buckets)
