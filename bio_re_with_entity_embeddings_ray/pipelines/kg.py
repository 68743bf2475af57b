"""End-to-end knowledge-graph construction pipeline.

Mirrors the reference's E1+E2 entry points (prepare_entity_dataset.py,
prepare_pair_dataset.py — see SURVEY.md §3) as one lazy Ray Data DAG:

    transcripts ──┬── scan_mentions (actor pool) ──┬── conv2entity ──┐
                  │                                ├── entity2conv   ├── triples
                  └── conversations (reassembly)───┴── doc2vec_input ┘

Everything stays a streaming Dataset until a sink consumes it.
"""

from __future__ import annotations

from bio_re_with_entity_embeddings_ray.stages.aggregate import (
    SET_SEP,
    conv2entity,
    entity2conv,
    unique_values,
)
from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions
from bio_re_with_entity_embeddings_ray.stages.pairs import adjacency_edges, triples
from bio_re_with_entity_embeddings_ray.stages.reassembly import conversations


def _str_ordinals(arr):
    """String Array -> (string-ordered int64 ordinal per row, dictionary
    sorted by string). Ordinal order == UTF-8 byte order == Python str
    order, so numpy lexsorts over ordinals reproduce pandas string sorts
    exactly while staying integer-speed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = pc.dictionary_encode(arr)
    codes = enc.indices.to_numpy().astype(np.int64)
    d = enc.dictionary
    si = pc.sort_indices(d).to_numpy().astype(np.int64)
    rank = np.empty(len(d), dtype=np.int64)
    rank[si] = np.arange(len(d), dtype=np.int64)
    return rank[codes], d.take(pa.array(si))


def _combined_arrow(batch, subj_type: str, obj_type: str):
    """Arrow-native fused per-block pack (the hot kernel of
    :func:`nodes_and_triples_bucketed`): produces the same
    (kind, a, b, conv_ids, n_convs) rows as the pandas composition of
    ``pairs._cross_and_pack`` + ``aggregate.pack_sorted_distinct`` —
    equality pinned by tests/test_kg_oracle.py — with zero pandas
    object-string round trips. All sorting runs over string-ordered
    integer ordinals (numpy lexsort); set packing is one
    ``binary_join`` over a LargeListArray re-offsetting of the sorted
    conv values (the derive_batch discipline). Measured 120 ms -> ~15 ms
    per 2,500-doc bench block, which dominated the headline's fused scan
    stage."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "kind": pa.array([], pa.string()),
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "conv_ids": pa.array([], pa.string()),
            "n_convs": pa.array([], pa.int64()),
        }
    )
    n = batch.num_rows
    if n == 0:
        return empty
    conv = batch["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    cv_ord, cv_dict = _str_ordinals(conv)
    eid_ord, eid_dict = _str_ordinals(batch["entity_id"])
    ety_ord, ety_dict = _str_ordinals(batch["entity_type"])

    # global row dedup in (eid, etype, conv) sort order (mentions may
    # repeat across turns; the pandas path drop_duplicates too)
    order = np.lexsort((cv_ord, ety_ord, eid_ord))
    e1, t1, c1 = eid_ord[order], ety_ord[order], cv_ord[order]
    uniq = np.ones(n, dtype=bool)
    uniq[1:] = (e1[1:] != e1[:-1]) | (t1[1:] != t1[:-1]) | (c1[1:] != c1[:-1])
    order = order[uniq]
    e1, t1, c1 = e1[uniq], t1[uniq], c1[uniq]
    m = len(order)

    def pack(sorted_conv_ord, group_starts):
        offs = pa.array(
            np.append(group_starts, len(sorted_conv_ord)), pa.int64()
        )
        vals = cv_dict.take(pa.array(sorted_conv_ord))
        return pc.binary_join(pa.LargeListArray.from_arrays(offs, vals), SET_SEP)

    # ---- N rows: per-(entity_id, entity_type) sorted conv set
    new_n = np.ones(m, dtype=bool)
    new_n[1:] = (e1[1:] != e1[:-1]) | (t1[1:] != t1[:-1])
    sN = np.flatnonzero(new_n)
    packedN = pack(c1, sN)
    aN = eid_dict.take(pa.array(e1[sN]))
    bN = ety_dict.take(pa.array(t1[sN]))
    cntN = np.diff(np.append(sN, m)).astype(np.int64)

    # ---- P rows: per-conv cross product of subj-type x obj-type ids,
    # then per-(subj, obj) sorted conv set
    types = ety_dict.to_pylist()
    subj_code = types.index(subj_type) if subj_type in types else -1
    obj_code = types.index(obj_type) if obj_type in types else -1
    ncv = len(cv_dict)

    def side(code):
        rows = np.flatnonzero(t1 == code) if code >= 0 else np.array([], np.int64)
        # (c1, e1) already sorted with conv inner — resort side rows by
        # (conv, eid) so per-conv runs are contiguous and eid-ascending
        so = rows[np.lexsort((e1[rows], c1[rows]))]
        per_conv = np.bincount(c1[so], minlength=ncv).astype(np.int64)
        off = np.concatenate(([0], np.cumsum(per_conv)))
        return so, per_conv, off

    op_rows, n_op, op_off = side(subj_code)
    res_rows, n_res, res_off = side(obj_code)
    cnt_c = n_op * n_res
    convs_u = np.flatnonzero(cnt_c)
    if len(convs_u):
        cnt = cnt_c[convs_u]
        total = int(cnt.sum())
        pair_off = np.concatenate(([0], np.cumsum(cnt)))
        pg = np.arange(total, dtype=np.int64) - np.repeat(pair_off[:-1], cnt)
        nr_rep = np.repeat(n_res[convs_u], cnt)
        subj_row = op_rows[np.repeat(op_off[convs_u], cnt) + pg // nr_rep]
        obj_row = res_rows[np.repeat(res_off[convs_u], cnt) + pg % nr_rep]
        s_ord, o_ord = e1[subj_row], e1[obj_row]
        cvp = np.repeat(convs_u, cnt)
        po = np.lexsort((cvp, o_ord, s_ord))
        s2, o2, c2 = s_ord[po], o_ord[po], cvp[po]
        new_p = np.ones(total, dtype=bool)
        new_p[1:] = (s2[1:] != s2[:-1]) | (o2[1:] != o2[:-1])
        sP = np.flatnonzero(new_p)
        packedP = pack(c2, sP)
        aP = eid_dict.take(pa.array(s2[sP]))
        bP = eid_dict.take(pa.array(o2[sP]))
        cntP = np.diff(np.append(sP, total)).astype(np.int64)
    else:
        packedP = pa.array([], pa.string())
        aP = pa.array([], pa.string())
        bP = pa.array([], pa.string())
        cntP = np.array([], np.int64)

    np_rows, nn_rows = len(cntP), len(cntN)
    kind = pa.array(["P"] * np_rows + ["N"] * nn_rows, pa.string())
    return pa.table(
        {
            "kind": kind,
            "a": pa.concat_arrays([aP.combine_chunks() if isinstance(aP, pa.ChunkedArray) else aP,
                                   aN.combine_chunks() if isinstance(aN, pa.ChunkedArray) else aN]),
            "b": pa.concat_arrays([bP.combine_chunks() if isinstance(bP, pa.ChunkedArray) else bP,
                                   bN.combine_chunks() if isinstance(bN, pa.ChunkedArray) else bN]),
            "conv_ids": pa.concat_arrays([packedP, packedN]),
            "n_convs": pa.array(np.concatenate([cntP, cntN]), pa.int64()),
        }
    )


def build_kg(
    transcripts,
    subj_type: str = "op",
    obj_type: str = "res",
    pred: str = "applies_to",
    num_buckets: int = 64,
    mention_concurrency=None,
    as_string: bool = True,
) -> dict:
    """Wire the full KG DAG over a transcripts Dataset; returns the lazy
    logical tables (consume with write_parquet / to_pandas / count)."""
    mentions = scan_mentions(
        transcripts, include_tool=True, concurrency=mention_concurrency
    )
    trip = triples(mentions, subj_type, obj_type, pred, num_buckets, as_string)
    return {
        "mentions": mentions,
        "conversations": conversations(transcripts, num_buckets),
        "conv2entity": conv2entity(mentions, num_buckets, as_string),
        "entity2conv": entity2conv(mentions, num_buckets, as_string),
        "triples": trip,
        "edges": adjacency_edges(trip),
        "conv_ids": unique_values(mentions, "conv_id", num_buckets),
    }


def nodes_and_triples_bucketed(
    mentions,
    subj_type: str = "op",
    obj_type: str = "res",
    pred: str = "applies_to",
    num_buckets: int = 64,
    assume_unsplit_blocks: bool = False,
    merge_plan: str = "auto",
    pack_engine: str = "arrow",
):
    """BOTH bucketed-provenance wide consumers (pairs.triples_bucketed +
    aggregate.entity2conv_bucketed) computed in ONE fused per-block pass
    over the mention stream. Returns ``(edges, nodes, pair_prov,
    node_prov, tagged)`` — ``tagged`` is the MATERIALIZED union the two
    provenance views project from (one row per (pair|entity, block):
    ``len(tagged) == len(pair_prov) + len(node_prov)``), exposed so
    callers can count/inspect it without re-running the projections.

    Why one pass: run separately, each consumer needs the mention stream
    materialized (a 7M-row object-store boundary at bench scale) and then
    re-reads it for its own per-block pack. Fusing the two packs into the
    scan's own tasks removes the big boundary entirely — the only
    materialized intermediate is the TAGGED provenance (one packed row
    per (pair|entity, block), ~1000x fewer rows), from which the two
    count merges and both provenance views are cheap projections. This is
    the headline composition bench.bench_kg measures.

    ``assume_unsplit_blocks=False`` falls back to the two boundary-exact
    sub-pipelines (fusion would have to duplicate the boundary-conv
    handling; callers without the unsplit-blocks guarantee keep the
    per-consumer exact paths).
    """
    import pandas as pd

    from bio_re_with_entity_embeddings_ray.stages.aggregate import (
        entity2conv_bucketed,
        pack_sorted_distinct,
    )
    from bio_re_with_entity_embeddings_ray.stages.pairs import (
        _cross_and_pack,
        triples_bucketed,
    )

    if not assume_unsplit_blocks:
        edges, pair_prov = triples_bucketed(
            mentions, subj_type, obj_type, pred, num_buckets, merge_plan=merge_plan
        )
        nodes, node_prov = entity2conv_bucketed(
            mentions, num_buckets, merge_plan=merge_plan
        )
        return edges, nodes, pair_prov, node_prov, None

    def combined(batch: pd.DataFrame) -> pd.DataFrame:
        pp = _cross_and_pack(batch, subj_type, obj_type, "conv_ids", with_counts=True)
        nv = pack_sorted_distinct(
            batch, ["entity_id", "entity_type"], "conv_id", "conv_ids"
        )
        nv["n_convs"] = (nv["conv_ids"].str.count(SET_SEP) + 1).astype("int64")
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "kind": "P",
                        "a": pp["subj_id"],
                        "b": pp["obj_id"],
                        "conv_ids": pp["conv_ids"],
                        "n_convs": pp["n_convs"],
                    }
                ),
                pd.DataFrame(
                    {
                        "kind": "N",
                        "a": nv["entity_id"],
                        "b": nv["entity_type"],
                        "conv_ids": nv["conv_ids"],
                        "n_convs": nv["n_convs"],
                    }
                ),
            ],
            ignore_index=True,
        )

    if pack_engine == "arrow":
        # the Arrow kernel dedups internally and measures ~6x faster per
        # block (equality vs the pandas composition pinned by
        # tests/test_kg_oracle.py::test_fused_pack_engines_agree)
        def combined_arrow(batch):
            return _combined_arrow(batch, subj_type, obj_type)

        tagged = mentions.map_batches(
            combined_arrow, batch_format="pyarrow", batch_size=None
        ).materialize()
    elif pack_engine == "pandas":
        tagged = mentions.map_batches(
            combined, batch_format="pandas", batch_size=None
        ).materialize()
    else:
        raise ValueError(f"unknown pack_engine {pack_engine!r}")

    def pick(kind: str, ra: str, rb: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            s = b[b["kind"] == kind]
            return pd.DataFrame(
                {
                    ra: s["a"],
                    rb: s["b"],
                    "conv_ids": s["conv_ids"],
                    "n_convs": s["n_convs"],
                }
            )

        return fn

    pair_prov = tagged.map_batches(
        pick("P", "subj_id", "obj_id"), batch_format="pandas", batch_size=None
    )
    node_prov = tagged.map_batches(
        pick("N", "entity_id", "entity_type"), batch_format="pandas", batch_size=None
    )

    # ONE kind-combined count merge for both consumers (kind rides in the
    # key), so the measured plan probe + merge execution happen once, not
    # twice; edges/nodes are then lazy projections of the tiny (~pairs +
    # entities rows) materialized result
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def proj_counts(b: pd.DataFrame) -> pd.DataFrame:
        return b[["kind", "a", "b", "n_convs"]]

    def comb(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["kind", "a", "b"], sort=False)["n_convs"].sum().reset_index()

    merged = merge_partials(
        tagged.map_batches(proj_counts, batch_format="pandas", batch_size=None),
        ["kind", "a", "b"],
        comb,
        lambda c: c,
        num_buckets,
        plan=merge_plan,
    ).materialize()

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b[b["kind"] == "P"]
        return pd.DataFrame(
            {
                "subj_id": s["a"],
                "pred": pred,
                "obj_id": s["b"],
                "support": s["n_convs"].astype("int64"),
            }
        )

    def to_nodes(b: pd.DataFrame) -> pd.DataFrame:
        s = b[b["kind"] == "N"]
        return pd.DataFrame(
            {
                "entity_id": s["a"],
                "entity_type": s["b"],
                "support": s["n_convs"].astype("int64"),
            }
        )

    edges = merged.map_batches(to_edges, batch_format="pandas", batch_size=None)
    nodes = merged.map_batches(to_nodes, batch_format="pandas", batch_size=None)
    return edges, nodes, pair_prov, node_prov, tagged


def doc2vec_input(conv2entity_ds, conversations_ds, num_partitions: int = 32):
    """Reference Doc2VecPreparation (prepare_doc2vec_input.py:40-52):
    (tags, text) per conversation — an inner hash join on conv_id
    (skips convs without mentions, like :46-47 skips unparsed ids)."""
    tags = conv2entity_ds.select_columns(["conv_id", "entity_ids"])
    convs = conversations_ds.select_columns(["conv_id", "text"])
    joined = tags.join(
        convs, join_type="inner", num_partitions=num_partitions, on=("conv_id",)
    )
    return joined.rename_columns({"entity_ids": "tags"})


def flagship(sf_dir: str, num_buckets: int = 16):
    """The headline pipeline over a testdata scale dir: derive transcripts
    from documents, build the KG, return the triples table."""
    from bio_re_with_entity_embeddings_ray.sources.transcripts import derive_transcripts

    ts = derive_transcripts(sf_dir)
    return build_kg(ts, num_buckets=num_buckets)["triples"]


def full_pipeline(
    sf_dir: str,
    out_dir: str,
    num_buckets: int = 16,
    embedding_dim: int = 32,
    mentions=None,
) -> dict:
    """The complete E1+E2+E3 composition (SURVEY.md §3) with Parquet
    artifacts — what a reference user runs instead of the three CLI entry
    points:

    transcripts -> mentions -> {conv2entity, entity2conv, conversations}
      -> doc2vec_input -> train_entity_embeddings (E3 analog)
      -> score_triples (embedding lookup) -> ranked edges

    Writes partitioned Parquet under ``out_dir``: nodes/, triples/,
    doc2vec_input/, embeddings/, scored/. Returns the written row counts.
    """
    from bio_re_with_entity_embeddings_ray.sources.transcripts import derive_transcripts
    from bio_re_with_entity_embeddings_ray.stages.embedding_train import (
        train_entity_embeddings,
    )
    from bio_re_with_entity_embeddings_ray.stages.scoring import score_triples_with

    from bio_re_with_entity_embeddings_ray.stages.pairs import adjacency_index

    ts = derive_transcripts(sf_dir)
    if mentions is None:
        # scan ONCE: three consumers (conv2entity, entity2conv, triples)
        # would otherwise each re-run derivation + the gazetteer scan
        mentions = scan_mentions(ts, include_tool=True).materialize()
    # else: caller supplies committed mentions (e.g. the CLI's
    # checkpoint-resumable extraction, cli.cmd_kg)

    counts: dict[str, int] = {}
    c2e = conv2entity(mentions, num_buckets)
    convs = conversations(ts, num_buckets)
    nodes = entity2conv(mentions, num_buckets)
    d2v = doc2vec_input(c2e, convs, num_partitions=num_buckets).materialize()
    emb = train_entity_embeddings(
        d2v, dim=embedding_dim, num_buckets=num_buckets
    ).materialize()
    trip = triples(mentions, "op", "res", "applies_to", num_buckets).materialize()
    scored = score_triples_with(trip, emb)
    adjacency = adjacency_index(adjacency_edges(trip), num_buckets)

    import shutil

    for name, ds in {
        "nodes": nodes,
        "triples": trip,
        "doc2vec_input": d2v,
        "embeddings": emb,
        "scored": scored,
        "adjacency": adjacency,
    }.items():
        # write_parquet APPENDS into an existing directory; a re-run must
        # replace the artifact, not double it (resumable partial-run skips
        # are the checkpoint layer's job, state/checkpoint.py)
        shutil.rmtree(f"{out_dir}/{name}", ignore_errors=True)
        ds.write_parquet(f"{out_dir}/{name}")
        # count from the written files (metadata-only scan) — ds.count()
        # would re-execute the whole lazy DAG a second time
        import pyarrow.dataset as pads

        counts[name] = pads.dataset(
            f"{out_dir}/{name}", format="parquet"
        ).count_rows()
    return counts
