"""Explicit Arrow schemas for every logical table in the engine.

The reference passes implicit pandas/TSV contracts between steps
(see /root/reference/data/pubtator.py:384-409, prepare_pair_dataset.py:66-68);
here every table has a declared ``pyarrow.Schema`` and delimiter-encoded
collections become real Arrow ``list`` columns (or, for oracle-checked
query outputs, deterministic '; ;;'-joined sorted strings mirroring the
reference's ``set_to_string`` at prepare_entity_dataset.py:76-81).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (BASELINE.json input_hint — exact shape).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Reassembled conversation (reference Document.text():
# /root/reference/data/pubtator.py:25-30 — title ⊕ " " ⊕ abstract).
CONVERSATIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("text", pa.string()),
        ("n_turns", pa.int32()),
    ]
)

# A detected mention (reference Annotation: data/pubtator.py:33-40,
# span-verified per data/pubtator.py:74-84).
MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("entity_type", pa.string()),
        ("entity_id", pa.string()),
        ("mention_text", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)

# conv -> sorted distinct entity ids (reference pubmed2entity,
# data/pubtator.py:384-407).
CONV2ENTITY = pa.schema(
    [
        ("conv_id", pa.string()),
        ("entity_ids", pa.list_(pa.string())),
        ("n_entities", pa.int32()),
    ]
)

# entity -> sorted distinct conv ids (reference entity2pubmed /
# instances.tsv, prepare_entity_dataset.py:62).
ENTITY2CONV = pa.schema(
    [
        ("entity_id", pa.string()),
        ("entity_type", pa.string()),
        ("conv_ids", pa.list_(pa.string())),
        ("support", pa.int64()),
    ]
)

# Candidate / emitted triple (reference pair instances.tsv:
# prepare_pair_dataset.py:66-68 — (source_id, target_id, articles_str),
# predicate implied by the type pair).
TRIPLES = pa.schema(
    [
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("conv_ids", pa.list_(pa.string())),
        ("support", pa.int64()),
    ]
)

SCORED_TRIPLES = TRIPLES.append(pa.field("score", pa.float32()))

# Entity / pair embedding table (reference exported doc2vec vectors,
# extract_document_vectors.py:26-37).
EMBEDDINGS = pa.schema(
    [
        ("tag", pa.string()),
        ("vector", pa.list_(pa.float32())),
    ]
)

# Adjacency index (graph materialization) — built by
# stages/pairs.adjacency_index, oracle-verified (oracles.ADJACENCY_INDEX);
# weight is the integer co-occurrence support.
ADJACENCY = pa.schema(
    [
        ("entity_id", pa.string()),
        (
            "neighbors",
            pa.list_(
                pa.struct(
                    [
                        ("neighbor_id", pa.string()),
                        ("pred", pa.string()),
                        ("weight", pa.int64()),
                    ]
                )
            ),
        ),
    ]
)

# doc2vec training-input analog (reference prepare_doc2vec_input.py:40-52,
# "tags<TAB>text"): real list column instead of ";;;" strings.
DOC2VEC_INPUT = pa.schema(
    [
        ("conv_id", pa.string()),
        ("tags", pa.list_(pa.string())),
        ("text", pa.string()),
    ]
)
