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
