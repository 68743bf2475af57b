"""OBO stanza parser (reference disease_ontology.py:151-225 semantics):
term extraction, MESH xref filter, synonym first-wins lookup, id
canonicalization, and the mention-normalizer integration."""

from __future__ import annotations

from bio_re_with_entity_embeddings_ray.functions import normalize
from bio_re_with_entity_embeddings_ray.sources import obo

OBO = """format-version: 1.2

[Term]
id: DOID:0050117
name: disease by infectious agent
synonym: "infectious disease" EXACT []
xref: MESH:D003141
xref: ICD10CM:A00-B99

[Term]
id: DOID:7
name: disease of anatomical entity
alt_id: DOID:0000004
is_a: DOID:4 ! disease
synonym: "anatomic disease" RELATED []

[Typedef]
id: part_of
name: part of

[Term]
id: DOID:0050117XX
name: weird unparseable id survives as string
"""


def test_parse_terms_and_fields():
    tbl = obo.parse_obo(OBO)
    rows = {r["doid"]: r for r in tbl.to_pylist()}
    # Typedef stanza ignored; 3 terms parsed
    assert len(rows) == 3
    inf = rows["DOID:50117"]  # canonicalized: int-normalized, re-prefixed
    assert inf["name"] == "disease by infectious agent"
    assert inf["mesh_terms"] == ["MESH:D003141"]  # ICD xref dropped
    assert inf["synonyms"] == ["infectious disease"]
    anat = rows["DOID:7"]
    assert anat["alternative_ids"] == ["DOID:4"]
    assert anat["parent_ids"] == ["DOID:4"]
    # non-integer id kept verbatim after prefix strip
    assert "DOID:0050117XX" in rows


def test_lookup_maps_and_first_wins():
    tbl = obo.parse_obo(OBO)
    m2d = obo.mesh_to_doid(tbl)
    assert m2d == {"MESH:D003141": ["DOID:50117"]}
    s2d = obo.synonym_to_doid(tbl)
    assert s2d["infectious disease"] == "DOID:50117"
    assert s2d["disease by infectious agent"] == "DOID:50117"


def test_feeds_disease_normalizer():
    """End-to-end with the mention stage's disease normalizer (reference
    MeSH->DOID remap, data/pubtator.py:190-224)."""
    tbl = obo.parse_obo(OBO)
    mesh_map = {m: d for m, ds in obo.mesh_to_doid(tbl).items() for d in ds}
    fn = normalize.make_normalize_disease(mesh_map)
    assert fn("MESH:D003141") == ["DOID:50117"]


def _ref_parent_paths(terms: dict[str, list[str]]) -> list[tuple[str, str]]:
    """Single-process reimplementation of the reference's
    append_paths/get_parent_paths/get_paths recursion
    (data/disease_ontology.py:68-81,227-270) for oracle comparison."""

    def get_parent_paths(doid: str) -> list[list[str]]:
        if doid not in terms:
            return [[]]
        parents = terms[doid]
        if not parents:
            return [[doid + "#"]]
        return [
            path + [doid + "#"]
            for p in parents
            for path in get_parent_paths(p)
        ]

    out = []
    for doid, parents in terms.items():
        if not parents:
            continue  # append_paths: None parents -> "[]" -> get_paths {}
        for p in parents:
            for chain in get_parent_paths(p):
                out.append((doid, ">".join(chain) + ">" + doid + "#"))
    return sorted(out)


def _paths_table(terms: dict[str, list[str]]):
    import pyarrow as pa

    return pa.table(
        {
            "doid": pa.array(list(terms), pa.string()),
            "parent_ids": pa.array(list(terms.values()), pa.list_(pa.string())),
        }
    )


def test_parent_paths_diamond_duplicates_and_unknowns(ray_session):
    # diamond (D via B and C), duplicate parent edge (E lists B twice),
    # unknown direct parent (F -> GHOST), root-parent chains
    terms = {
        "A": [],
        "B": ["A"],
        "C": ["A"],
        "D": ["B", "C"],
        "E": ["B", "B"],
        "F": ["GHOST"],
        "G": ["D"],
    }
    got = sorted(
        (r["doid"], r["path"])
        for r in obo.ontology_parent_paths(_paths_table(terms)).take_all()
    )
    assert got == _ref_parent_paths(terms)
    # reference-literal spot checks
    assert ("D", "A#>B#>D#") in got and ("D", "A#>C#>D#") in got
    assert got.count(("E", "A#>B#>E#")) == 2  # duplicates preserved
    assert ("F", ">F#") in got  # missing direct parent: leading '>'
    assert not any(d == "A" for d, _ in got)  # roots emit nothing
    assert ("G", "A#>B#>D#>G#") in got and ("G", "A#>C#>D#>G#") in got


def test_parent_paths_cycle_raises(ray_session):
    import pytest

    terms = {"A": ["B"], "B": ["A"], "C": []}
    with pytest.raises(ValueError, match="cycle"):
        obo.ontology_parent_paths(_paths_table(terms)).take_all()
