"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship KG pipeline on sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2); each takes ``sf_dir`` and returns a Ray Dataset /
pandas DataFrame / pyarrow Table.
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
genuinely non-SQL-expressible ops: model scoring).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from bio_re_with_entity_embeddings_ray import oracles, quiet_ray_data
from bio_re_with_entity_embeddings_ray.pipelines import kg
from bio_re_with_entity_embeddings_ray.sources.transcripts import derive_transcripts
from bio_re_with_entity_embeddings_ray.stages import (
    aggregate,
    mentions as mstage,
    pairs as pstage,
    reassembly,
)

_NB = 16  # hash-shuffle buckets at test scale (scale knob: ~2-4x total cores)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 -> triples table."""
    quiet_ray_data()
    return kg.flagship("/root/testdata/sf0.001", num_buckets=8).to_pandas()


# ---------------------------------------------------------------- KG core


def _q_transcripts(sf_dir: str):
    quiet_ray_data()
    return derive_transcripts(sf_dir)


def _q_conversations(sf_dir: str):
    quiet_ray_data()
    return reassembly.conversations(derive_transcripts(sf_dir), _NB)


def _q_mentions(sf_dir: str):
    quiet_ray_data()
    return mstage.scan_mentions(derive_transcripts(sf_dir), include_tool=False)


def _q_tool_mentions(sf_dir: str):
    quiet_ray_data()
    return mstage.tool_mentions(derive_transcripts(sf_dir))


def _all_mentions(sf_dir: str):
    return mstage.scan_mentions(derive_transcripts(sf_dir), include_tool=True)


def _q_conv2entity(sf_dir: str):
    quiet_ray_data()
    return aggregate.conv2entity(_all_mentions(sf_dir), _NB)


def _q_entity2conv(sf_dir: str):
    quiet_ray_data()
    return aggregate.entity2conv(_all_mentions(sf_dir), _NB)


def _q_triples(sf_dir: str):
    quiet_ray_data()
    return pstage.triples(_all_mentions(sf_dir), "op", "res", "applies_to", _NB)


def _q_adjacency_edges(sf_dir: str):
    quiet_ray_data()
    trip = pstage.triples(_all_mentions(sf_dir), "op", "res", "applies_to", _NB)
    return pstage.adjacency_edges(trip)


def _q_doc2vec_input(sf_dir: str):
    quiet_ray_data()
    ts = derive_transcripts(sf_dir)
    c2e = aggregate.conv2entity(
        mstage.scan_mentions(ts, include_tool=True), _NB
    )
    convs = reassembly.conversations(ts, _NB)
    return kg.doc2vec_input(c2e, convs, num_partitions=_NB)


def _q_conv_ids(sf_dir: str):
    quiet_ray_data()
    return aggregate.unique_values(_all_mentions(sf_dir), "conv_id", _NB)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcripts": _q_transcripts,
        "conversations": _q_conversations,
        "mentions": _q_mentions,
        "tool_mentions": _q_tool_mentions,
        "conv2entity": _q_conv2entity,
        "entity2conv": _q_entity2conv,
        "triples": _q_triples,
        "adjacency_edges": _q_adjacency_edges,
        "doc2vec_input": _q_doc2vec_input,
        "conv_ids": _q_conv_ids,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": oracles.TRANSCRIPTS,
        "conversations": oracles.CONVERSATIONS,
        "mentions": oracles.MENTIONS,
        "tool_mentions": oracles.TOOL_MENTIONS,
        "conv2entity": oracles.CONV2ENTITY,
        "entity2conv": oracles.ENTITY2CONV,
        "triples": oracles.TRIPLES,
        "adjacency_edges": oracles.ADJACENCY_EDGES,
        "doc2vec_input": oracles.DOC2VEC_INPUT,
        "conv_ids": oracles.CONV_IDS,
    }
