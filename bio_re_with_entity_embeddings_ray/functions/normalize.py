"""Per-entity-type raw-id normalizers (the reference's extension surface).

Reimplements the *semantics* of the reference's ``AnnotationExtractor``
subclass hierarchy (/root/reference/data/pubtator.py:86-278) as pure
functions ``raw_id -> list[canonical_id]`` (1->N; empty list = drop).

Registry keyed by entity_type; users add a type by registering a function
(mirrors the subclass-API extension point, data/pubtator.py:86-87).

Reference bugs intentionally NOT replicated (intended semantics instead,
documented per SURVEY.md §7.3):
- Cellline ``normalize_id`` returns ``str``/``None`` instead of ``list``
  so the caller iterates characters (data/pubtator.py:145-151 vs :117);
  we return ``[id]``.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

Normalizer = Callable[[str], list[str]]

_REGISTRY: dict[str, Normalizer] = {}


def register(entity_type: str, fn: Normalizer) -> None:
    _REGISTRY[entity_type] = fn


def get(entity_type: str) -> Normalizer:
    return _REGISTRY.get(entity_type, normalize_default)


def normalize_default(raw: str) -> list[str]:
    """Keep the id as-is; drop ``*``-prefixed ids (the reference's PubTator
    workaround, data/pubtator.py:120-125) and empties."""
    if not raw or raw.startswith("*"):
        return []
    return [raw]


def normalize_chemical(raw: str) -> list[str]:
    """Keep only ``MESH:*`` ids (data/pubtator.py:128-137)."""
    return [raw] if raw.startswith("MESH:") else []


def normalize_cellline(raw: str) -> list[str]:
    """Keep ``cvcl:*``; strip a ``;<garbage>`` suffix (data/pubtator.py:140-151,
    intended list semantics)."""
    if not raw.lower().startswith("cvcl"):
        return []
    return [raw.split(";", 1)[0]]


def make_normalize_drug(mesh2drugbank: Mapping[str, str]) -> Normalizer:
    """Chemical MESH ids -> DrugBank ids via mapping table, 1->N on ``|``;
    unmapped dropped (data/pubtator.py:154-187; mapping format
    resources/mappings/drug_mapping.tsv)."""

    def normalize_drug(raw: str) -> list[str]:
        if not raw.startswith("MESH:"):
            return []
        mesh = raw.split(";", 1)[0]
        mapped = mesh2drugbank.get(mesh)
        if not mapped:
            return []
        return [d for d in mapped.split("|") if d]

    return normalize_drug


def make_normalize_disease(mesh2doid: Mapping[str, str] | None = None) -> Normalizer:
    """Keep ``MESH:*`` / ``OMIM:*``; strip ``;...`` suffix; optionally remap
    MeSH->DOID 1->N, dropping misses (data/pubtator.py:190-224,
    data/disease_ontology.py:59-66)."""

    def normalize_disease(raw: str) -> list[str]:
        if not (raw.startswith("MESH:") or raw.startswith("OMIM:")):
            return []
        rid = raw.split(";", 1)[0]
        if mesh2doid is None:
            return [rid]
        mapped = mesh2doid.get(rid)
        if not mapped:
            return []
        return sorted({d for d in mapped.split("|") if d})

    return normalize_disease


def normalize_gene(raw: str) -> list[str]:
    """Drop empty/``None``; split ``;`` -> prefix each with ``NCBI:``
    (data/pubtator.py:227-239)."""
    if not raw or raw == "None":
        return []
    return ["NCBI:" + g for g in raw.split(";") if g]


def normalize_mutation(raw: str) -> list[str]:
    """Require ``RS#:``; strip ``(Expired)``; first ``RS#:`` token ->
    ``rs<digits>``; split ``,`` -> 1->N (data/pubtator.py:242-266)."""
    if "RS#:" not in raw:
        return []
    cleaned = raw.replace("(Expired)", "")
    for token in cleaned.split(";"):
        if token.startswith("RS#:"):
            rs_part = token[len("RS#:") :]
            return ["rs" + r for r in rs_part.split(",") if r]
    return []


def normalize_species(raw: str) -> list[str]:
    """Strip leading ``*``; prefix ``TAXON:`` (data/pubtator.py:269-278)."""
    return ["TAXON:" + raw.lstrip("*")] if raw else []


register("chemical", normalize_chemical)
register("cellline", normalize_cellline)
register("gene", normalize_gene)
register("mutation", normalize_mutation)
register("species", normalize_species)
