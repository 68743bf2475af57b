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

    tagged = mentions.map_batches(
        combined, batch_format="pandas", batch_size=None
    ).materialize()

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
