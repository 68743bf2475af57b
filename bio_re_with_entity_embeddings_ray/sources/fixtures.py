"""Seeded synthetic fixture generator (FIXTURES.md).

Produces the biomedical-shaped conformance fixture: a transcripts table
whose turns embed dictionary surface forms, plus a pre-supplied annotation
table (the PubTator-annotation-line analog) containing BOTH valid spans and
the pathological cases the reference's guards handle:

- corrupt offsets that must FAIL span verification
  (/root/reference/data/pubtator.py:74-84),
- ``*``-prefixed ids (drop, data/pubtator.py:120-125),
- ``ID;garbage`` suffixes (:151, :169, :210),
- multi-id ``;`` / ``,`` splits 1->N (:236-239, :262-266),
- ``(Expired)`` markers (:251),
- unmapped MeSH ids (dropped like data/pubtator.py:183-187).

Deterministic for a given (n_convs, seed); rows emitted in SHUFFLED order
to exercise the stable turn_idx reassembly sort. Hot entities appear in
~10% of conversations (skew knob for the salted pair aggregation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bio_re_with_entity_embeddings_ray.sources.dictionaries import DictEntry

# surface -> (type, raw_id); canonical expectation encoded for tests
FIXTURE_DICT: list[DictEntry] = [
    DictEntry("aspirin", "drug", "MESH:D001241", "DB00945"),
    DictEntry("panadol", "drug", "MESH:D010100;garbage", "DB00316|DB09341"),
    DictEntry("mysterydrug", "drug", "MESH:D999999", ""),  # unmapped -> drop
    DictEntry("headache", "disease", "MESH:D006261", "MESH:D006261"),
    DictEntry("alzheimer", "disease", "OMIM:104300;suffix", "OMIM:104300"),
    DictEntry("vaguedisease", "disease", "XYZ:123", ""),  # wrong prefix -> drop
    DictEntry("brca", "gene", "672;675", "NCBI:672|NCBI:675"),
    DictEntry("ghostgene", "gene", "None", ""),
    DictEntry("v600e", "mutation", "RS#:113488022,121913529", "rs113488022|rs121913529"),
    DictEntry("oldmut", "mutation", "RS#:121(Expired)", "rs121"),
    DictEntry("hgvsmut", "mutation", "HGVS:c.1799T>A", ""),  # no RS#: -> drop
    DictEntry("human", "species", "*9606", "TAXON:9606"),
    DictEntry("caffeine", "chemical", "MESH:D002110", "MESH:D002110"),
    DictEntry("weirdchem", "chemical", "CHEBI:27732", ""),  # non-MESH -> drop
    DictEntry("hela", "cellline", "CVCL_0030;note", "CVCL_0030"),
    DictEntry("badline", "cellline", "ATCC-1", ""),  # no cvcl -> drop
]

MESH2DRUGBANK = {
    "MESH:D001241": "DB00945",
    "MESH:D010100": "DB00316|DB09341",  # 1->N
}

# hot entities (skew): appear in ~10% of conversations
HOT_SURFACES = ["aspirin", "headache"]

FILLER = (
    "patient reports mild symptoms today and requests follow up with the "
    "care team about treatment options and monitoring schedule"
).split()

PRED_BY_PAIR = {
    ("mutation", "disease"): "associated_with",
    ("drug", "disease"): "treats",
}


def generate(n_convs: int = 200, seed: int = 42):
    """Return (transcripts: pa.Table, annotations: pa.Table).

    Annotations carry a ``valid`` generation flag used only by tests (the
    engine never sees it; corrupt rows must be dropped by span
    verification, not by the flag).
    """
    rng = np.random.RandomState(seed)
    surfaces = [e.surface for e in FIXTURE_DICT]
    by_surface = {e.surface: e for e in FIXTURE_DICT}

    t_conv: list[str] = []
    t_turn: list[int] = []
    t_role: list[str] = []
    t_text: list[str] = []
    t_tool: list[str | None] = []
    t_ts: list[int] = []

    a_conv: list[str] = []
    a_turn: list[int] = []
    a_type: list[str] = []
    a_raw: list[str] = []
    a_mention: list[str] = []
    a_start: list[int] = []
    a_end: list[int] = []
    a_valid: list[bool] = []

    for c in range(n_convs):
        cid = f"conv-{c:06d}"
        n_turns = int(rng.randint(3, 12))
        hot = rng.rand() < 0.10
        for t in range(n_turns):
            words = list(rng.choice(FILLER, size=int(rng.randint(4, 10))))
            n_m = int(rng.randint(0, 4))
            picks = list(rng.choice(surfaces, size=n_m)) if n_m else []
            if hot and t == 0:
                picks.extend(HOT_SURFACES)
            # splice mention words at random positions
            for s in picks:
                pos = int(rng.randint(0, len(words) + 1))
                words.insert(pos, s)
            text = " ".join(words)
            role = "tool" if t % 5 == 4 else ("user" if t % 2 == 0 else "assistant")
            tool = "grep" if role == "tool" else None

            t_conv.append(cid)
            t_turn.append(t)
            t_role.append(role)
            t_text.append(text)
            t_tool.append(tool)
            t_ts.append((c * 100_000 + t) * 1_000_000)

            # gold annotations at true offsets (+ some corrupted)
            offset = 0
            for w in words:
                if w in by_surface:
                    e = by_surface[w]
                    corrupt = rng.rand() < 0.15
                    start = offset + (3 if corrupt else 0)
                    if corrupt and rng.rand() < 0.3:
                        start = len(text) + 50  # beyond text
                    a_conv.append(cid)
                    a_turn.append(t)
                    a_type.append(e.entity_type)
                    a_raw.append(e.raw_id)
                    a_mention.append(w)
                    a_start.append(start)
                    a_end.append(start + len(w))
                    a_valid.append(not corrupt)
                offset += len(w) + 1

    transcripts = pa.table(
        {
            "conv_id": pa.array(t_conv, pa.string()),
            "turn_idx": pa.array(t_turn, pa.int32()),
            "role": pa.array(t_role, pa.string()),
            "text": pa.array(t_text, pa.string()),
            "tool": pa.array(t_tool, pa.string()),
            "ts": pa.array(t_ts, pa.timestamp("us")),
        }
    )
    annotations = pa.table(
        {
            "conv_id": pa.array(a_conv, pa.string()),
            "turn_idx": pa.array(a_turn, pa.int32()),
            "entity_type": pa.array(a_type, pa.string()),
            "raw_id": pa.array(a_raw, pa.string()),
            "mention_text": pa.array(a_mention, pa.string()),
            "start": pa.array(a_start, pa.int32()),
            "end": pa.array(a_end, pa.int32()),
            "valid": pa.array(a_valid, pa.bool_()),
        }
    )

    # shuffle row order (exercises the stable reassembly sort)
    perm = rng.permutation(transcripts.num_rows)
    transcripts = transcripts.take(pa.array(perm))
    perm_a = rng.permutation(annotations.num_rows)
    annotations = annotations.take(pa.array(perm_a))
    return transcripts, annotations


def write_fixture(out_dir: str, n_convs: int = 200, seed: int = 42) -> tuple[str, str]:
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    transcripts, annotations = generate(n_convs, seed)
    tp = os.path.join(out_dir, "transcripts.parquet")
    ap = os.path.join(out_dir, "annotations.parquet")
    pq.write_table(transcripts, tp)
    pq.write_table(annotations, ap)
    return tp, ap
