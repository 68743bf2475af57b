"""OBO ontology parser — small dimension-table source.

Reference analog: the line-oriented doid.obo stanza parser
(/root/reference/data/disease_ontology.py:151-225) that extracts
id / name / synonyms / alt_ids / xref MESH / is_a into a DataFrame, cached
as TSV. Ontologies are small dimension tables (DOID ~11k stanzas), so the
parse is a one-time driver-side step producing an Arrow table that is then
broadcast into normalizer actors (stages/mentions, functions/normalize) or
registered as a `ray.data.from_arrow` dataset.

Output schema mirrors the reference's table
(data/disease_ontology.py:227-254): ``doid, name, alternative_ids,
parent_ids, mesh_terms, synonyms`` with ';'-joined cells kept as real
Arrow ``list<string>`` columns instead.
"""

from __future__ import annotations

import re

import pyarrow as pa

_SYN_RE = re.compile(r'^synonym:\s+"([^"]*)"')  # disease_ontology.py:188-196


def clean_id(raw: str, prefix: str = "DOID") -> str:
    """Canonical DOID form: strip prefix, int-normalize, re-prefix
    (reference clean_id, data/disease_ontology.py:273-280)."""
    v = raw.strip()
    if ":" in v:
        v = v.split(":", 1)[1]
    try:
        return f"{prefix}:{int(v)}"
    except ValueError:
        return f"{prefix}:{v}"


def parse_obo(text: str) -> pa.Table:
    """Parse OBO text into the ontology dimension table. Only [Term]
    stanzas contribute; obsolete terms are kept (the reference keeps them
    too) with whatever fields they carry."""
    ids: list[str] = []
    names: list[str] = []
    alts: list[list[str]] = []
    parents: list[list[str]] = []
    meshes: list[list[str]] = []
    syns: list[list[str]] = []

    cur: dict | None = None

    def flush():
        if cur is None or "id" not in cur:
            return
        ids.append(cur["id"])
        names.append(cur.get("name", ""))
        alts.append(cur.get("alt", []))
        parents.append(cur.get("isa", []))
        meshes.append(cur.get("mesh", []))
        syns.append(cur.get("syn", []))

    in_term = False
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("["):
            flush()
            cur = {}
            in_term = line == "[Term]"
            continue
        if not in_term or cur is None or not line:
            continue
        if line.startswith("id:"):
            cur["id"] = clean_id(line[3:])
        elif line.startswith("name:"):
            cur["name"] = line[5:].strip()
        elif line.startswith("alt_id:"):
            cur.setdefault("alt", []).append(clean_id(line[7:]))
        elif line.startswith("is_a:"):
            # "is_a: DOID:123 ! some name"
            tgt = line[5:].split("!", 1)[0].strip()
            cur.setdefault("isa", []).append(clean_id(tgt))
        elif line.startswith("xref:"):
            x = line[5:].strip()
            # reference keeps MESH xrefs only (disease_ontology.py:199-204)
            if x.upper().startswith("MESH:"):
                cur.setdefault("mesh", []).append("MESH:" + x.split(":", 1)[1])
        elif line.startswith("synonym:"):
            m = _SYN_RE.match(line)
            if m:
                cur.setdefault("syn", []).append(m.group(1))
    flush()

    return pa.table(
        {
            "doid": pa.array(ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "alternative_ids": pa.array(alts, pa.list_(pa.string())),
            "parent_ids": pa.array(parents, pa.list_(pa.string())),
            "mesh_terms": pa.array(meshes, pa.list_(pa.string())),
            "synonyms": pa.array(syns, pa.list_(pa.string())),
        }
    )


def read_obo(path: str) -> pa.Table:
    with open(path, "r", encoding="utf-8") as f:
        return parse_obo(f.read())


def mesh_to_doid(tbl: pa.Table) -> dict[str, list[str]]:
    """MESH id -> [doid] broadcast map (reference lazy cache
    data/disease_ontology.py:111-119, built eagerly here for actor
    __init__)."""
    out: dict[str, list[str]] = {}
    for doid, meshes in zip(tbl["doid"].to_pylist(), tbl["mesh_terms"].to_pylist()):
        for m in meshes:
            out.setdefault(m, []).append(doid)
    return out


def synonym_to_doid(tbl: pa.Table) -> dict[str, str]:
    """lowercase synonym/name -> doid, FIRST-wins on duplicates
    (reference data/disease_ontology.py:121-135)."""
    out: dict[str, str] = {}
    for doid, name, syns in zip(
        tbl["doid"].to_pylist(), tbl["name"].to_pylist(), tbl["synonyms"].to_pylist()
    ):
        for s in [name, *syns]:
            k = s.lower()
            if k and k not in out:
                out[k] = doid
    return out
