"""Entity gazetteer + mapping tables (small broadcast dimension tables).

The reference's annotation vocabulary + per-type normalizers
(/root/reference/data/pubtator.py:90-278) become a gazetteer: a small
``surface -> (entity_type, raw_id)`` dictionary, loaded once per actor and
matched against turn text. The canonical testdata gazetteer below is
defined over the synthetic ``documents`` vocabulary so the DuckDB oracle
can reproduce it from an inline VALUES list (``gazetteer_sql_values``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DictEntry:
    surface: str        # lowercase match form (case-insensitive match,
                        # like data/pubtator.py:81)
    entity_type: str
    raw_id: str         # pre-normalization id (pathological forms in fixtures)
    canonical_id: str   # post-normalization id (oracle ground truth)


# Two pairable types over the testdata vocabulary: query *operators* and the
# *resources* they apply to; plus a 'tool' type fed by the `tool` column
# (pre-linked mentions). Predicate per type pair, like the reference's
# mutation–disease pairing (SURVEY.md, prepare_pair_dataset.py:25-53).
_OPS = ["join", "sort", "merge", "filter", "scan", "agg", "group"]
_RES = ["table", "row", "column", "key", "batch", "vector"]

GAZETTEER: list[DictEntry] = [
    DictEntry(s, "op", f"OP:{s.upper()}", f"OP:{s.upper()}") for s in _OPS
] + [
    DictEntry(s, "res", f"RES:{s.upper()}", f"RES:{s.upper()}") for s in _RES
]

# Predicate per ordered (subj_type, obj_type) pair.
PREDICATES: dict[tuple[str, str], str] = {
    ("op", "res"): "applies_to",
    ("tool", "res"): "touches",
}


def gazetteer_sql_values(alias: str = "dict") -> str:
    """The gazetteer as an inline SQL VALUES relation, for the DuckDB oracle."""
    rows = ", ".join(
        f"('{e.surface}', '{e.entity_type}', '{e.canonical_id}')" for e in GAZETTEER
    )
    return f"(VALUES {rows}) AS {alias}(surface, entity_type, entity_id)"


def surface_map(entries: list[DictEntry] | None = None) -> dict[str, list[tuple[str, str]]]:
    """surface -> [(entity_type, raw_id)] (a surface may map to several types)."""
    out: dict[str, list[tuple[str, str]]] = {}
    for e in entries if entries is not None else GAZETTEER:
        out.setdefault(e.surface, []).append((e.entity_type, e.raw_id))
    return out
