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


def ontology_parent_paths(onto, max_iters: int = 64):
    """Transitive root-to-term ancestor paths over the ``is_a`` DAG —
    the reference's ``append_paths``/``get_parent_paths`` column
    (data/disease_ontology.py:227-270, consumed by ``get_paths``,
    disease_ontology.py:68-81): one output row per (term, path) with
    ``path = 'a1#>a2#>...>term#'`` for every distinct root-to-term chain,
    DUPLICATES PRESERVED (a diamond, or a repeated parent id, yields one
    row per chain, exactly like the reference's list concatenation).

    Reference-literal edge semantics:
    - a term with no parents (root) emits NO rows (``get_paths`` on the
      serialized ``[]`` sentinel returns the empty set);
    - a parent id that is itself a root contributes its own id as the
      chain head (``get_parent_paths`` base case);
    - a DIRECT parent id missing from the table contributes the
      empty chain, so the emitted path is ``'>term#'`` with a leading
      '>' (string concat in ``get_paths``, disease_ontology.py:78);
      missing ids deeper in the recursion vanish into the join.

    Execution shape: level-synchronous broadcast closure. Terms live in a
    ``ray.data.Dataset``; each round broadcasts the resolved
    node->chains map (``ray.put`` once, read per task) and a narrow
    ``map_batches`` emits chains for terms whose parents all resolved.
    Iterations = DAG depth (DOID ~15). Driver/broadcast state is bounded
    by the ONTOLOGY (a dimension table: DOID ~11k terms — the reference
    holds the whole table in driver memory too), never by the corpus.
    Raises ``ValueError`` on a cycle (no progress with terms unresolved)
    rather than recursing forever like the reference would.

    ``onto``: Dataset (or Arrow table) with ``doid: string`` and
    ``parent_ids: list<string>`` columns, e.g. from :func:`parse_obo`.
    Returns a Dataset with columns ``(doid, path)``.
    """
    import ray
    import ray.data

    if isinstance(onto, pa.Table):
        onto = ray.data.from_arrow(onto)
    terms = onto.select_columns(["doid", "parent_ids"])

    known: set[str] = set()
    for b in terms.select_columns(["doid"]).iter_batches(batch_format="pyarrow"):
        known.update(b["doid"].to_pylist())

    # chains[t] = every root->t chain as a '>'-joined string of '#'-marked
    # ids, t inclusive; complete once all of t's ancestors are complete
    chains: dict[str, list[str]] = {}
    unresolved = terms
    pending = unresolved.count()

    def resolve_round(resolved_ref, known_ref):
        def fn(batch: pa.Table) -> pa.Table:
            res = ray.get(resolved_ref)
            kn = ray.get(known_ref)
            out_id: list[str] = []
            out_chains: list[list[str]] = []
            for doid, parents in zip(
                batch["doid"].to_pylist(), batch["parent_ids"].to_pylist()
            ):
                parents = parents or []
                ready = all(p in res or p not in kn for p in parents)
                if not ready:
                    continue
                cs: list[str] = []
                for p in parents:
                    if p in kn:
                        cs.extend(f"{c}>{doid}#" for c in res[p])
                    else:
                        # unknown id: base-case empty chain (ref
                        # get_parent_paths returns [[]])
                        cs.append(f"{doid}#")
                if not parents:
                    cs = [f"{doid}#"]
                out_id.append(doid)
                out_chains.append(cs)
            return pa.table(
                {
                    "doid": pa.array(out_id, pa.string()),
                    "chains": pa.array(out_chains, pa.list_(pa.string())),
                }
            )

        return fn

    known_ref = ray.put(known)
    for _ in range(max_iters):
        if pending == 0:
            break
        resolved_ref = ray.put(chains)
        new = unresolved.map_batches(
            resolve_round(resolved_ref, known_ref), batch_format="pyarrow"
        )
        progressed = False
        for b in new.iter_batches(batch_format="pyarrow"):
            for doid, cs in zip(b["doid"].to_pylist(), b["chains"].to_pylist()):
                chains[doid] = cs
                progressed = True
        if not progressed:
            raise ValueError(
                f"ontology_parent_paths: cycle detected — {pending} terms "
                "unresolvable (is_a graph must be a DAG)"
            )
        done_arr = pa.array(list(chains), pa.string())

        def drop_done(batch: pa.Table, d=done_arr) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.invert(pc.is_in(batch["doid"], value_set=d))
            )

        unresolved = unresolved.map_batches(drop_done, batch_format="pyarrow")
        pending = unresolved.count()
    if pending:
        raise ValueError(
            f"ontology_parent_paths: depth exceeded max_iters={max_iters}"
        )

    # reference-literal emission (get_paths): a term's FULL paths come
    # from its direct parents' chains — roots emit nothing, a missing
    # DIRECT parent contributes the ''-chain (leading-'>' path)
    chains_ref = ray.put(chains)

    def emit(batch: pa.Table) -> pa.Table:
        res = ray.get(chains_ref)
        kn = ray.get(known_ref)
        out_id: list[str] = []
        out_path: list[str] = []
        for doid, parents in zip(
            batch["doid"].to_pylist(), batch["parent_ids"].to_pylist()
        ):
            for p in parents or []:
                for c in res[p] if p in kn else [""]:
                    out_id.append(doid)
                    out_path.append(f"{c}>{doid}#")
        return pa.table(
            {
                "doid": pa.array(out_id, pa.string()),
                "path": pa.array(out_path, pa.string()),
            }
        )

    return terms.map_batches(emit, batch_format="pyarrow")
