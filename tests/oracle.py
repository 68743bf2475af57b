"""Single-process reference-semantics oracle (SURVEY.md §5).

A deliberately independent ~150-line reimplementation of the reference
pipeline semantics (span verification -> per-type id normalization ->
doc/entity mappings -> per-document pair cross product), written with
plain dicts/sets like the reference's driver-side code
(/root/reference/data/pubtator.py:384-409, prepare_pair_dataset.py:25-53).
Engine output must match at P/R >= 0.95 (target exact).

Normalization rules are intentionally re-written inline (NOT imported from
the engine) so an engine bug cannot hide in shared code.
"""

from __future__ import annotations

from collections import defaultdict

MESH2DRUGBANK = {
    "MESH:D001241": "DB00945",
    "MESH:D010100": "DB00316|DB09341",
}


def normalize(entity_type: str, raw: str) -> list[str]:
    if entity_type == "chemical":
        return [raw] if raw.startswith("MESH:") else []
    if entity_type == "cellline":
        if not raw.lower().startswith("cvcl"):
            return []
        return [raw.split(";")[0]]
    if entity_type == "drug":
        if not raw.startswith("MESH:"):
            return []
        mapped = MESH2DRUGBANK.get(raw.split(";")[0])
        return mapped.split("|") if mapped else []
    if entity_type == "disease":
        if raw.startswith("MESH:") or raw.startswith("OMIM:"):
            return [raw.split(";")[0]]
        return []
    if entity_type == "gene":
        if not raw or raw == "None":
            return []
        return ["NCBI:" + g for g in raw.split(";") if g]
    if entity_type == "mutation":
        if "RS#:" not in raw:
            return []
        cleaned = raw.replace("(Expired)", "")
        for tok in cleaned.split(";"):
            if tok.startswith("RS#:"):
                return ["rs" + r for r in tok[4:].split(",") if r]
        return []
    if entity_type == "species":
        return ["TAXON:" + raw.lstrip("*")] if raw else []
    if raw.startswith("*") or not raw:
        return []
    return [raw]


def run(transcript_rows, annotation_rows):
    """transcript_rows: dicts with conv_id/turn_idx/text (any order).
    annotation_rows: dicts with conv_id/turn_idx/entity_type/raw_id/
    mention_text/start/end. Returns dict of plain-python results."""
    turn_text: dict[tuple[str, int], str] = {}
    turns_by_conv: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for r in transcript_rows:
        key = (r["conv_id"], r["turn_idx"])
        turn_text[key] = r["text"]
        turns_by_conv[r["conv_id"]].append((r["turn_idx"], r["text"]))

    conversations = {
        cid: " ".join(t for _, t in sorted(pairs))
        for cid, pairs in turns_by_conv.items()
    }

    mentions = []  # (conv_id, turn_idx, entity_type, entity_id)
    for a in annotation_rows:
        text = turn_text.get((a["conv_id"], a["turn_idx"]))
        if text is None:
            continue
        s, e = a["start"], a["end"]
        # reference span verification, data/pubtator.py:74-84; bounds are
        # strict (0 <= s <= e <= len) so Python slice truncation / negative
        # indexing can't admit out-of-range spans
        if not (0 <= s <= e <= len(text)) or text[s:e].lower() != a["mention_text"].lower():
            continue
        for canon in normalize(a["entity_type"], a["raw_id"]):
            mentions.append((a["conv_id"], a["turn_idx"], a["entity_type"], canon))

    conv2entity: dict[str, set[str]] = defaultdict(set)
    entity2conv: dict[tuple[str, str], set[str]] = defaultdict(set)
    typed_by_conv: dict[tuple[str, str], set[str]] = defaultdict(set)
    for cid, _tix, etype, eid in mentions:
        conv2entity[cid].add(eid)
        entity2conv[(eid, etype)].add(cid)
        typed_by_conv[(cid, etype)].add(eid)

    def triples(subj_type: str, obj_type: str, pred: str):
        pair2conv: dict[tuple[str, str], set[str]] = defaultdict(set)
        for cid in conversations:
            for s in typed_by_conv.get((cid, subj_type), ()):
                for o in typed_by_conv.get((cid, obj_type), ()):
                    pair2conv[(s, o)].add(cid)
        return {
            (s, pred, o): sorted(cids) for (s, o), cids in pair2conv.items()
        }

    return {
        "conversations": conversations,
        "mentions": mentions,
        "conv2entity": {k: sorted(v) for k, v in conv2entity.items()},
        "entity2conv": {k: sorted(v) for k, v in entity2conv.items()},
        "triples": triples,
    }
