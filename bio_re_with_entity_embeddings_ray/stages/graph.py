"""Graph analytics over the materialized KG entity graph.

The reference stops at emitting the co-occurrence edge table
(/root/reference/doc2vec_entity_pairs.py pair aggregation); a KG engine
at 100 TB also needs the downstream graph passes that consume it:
node-importance ranking (PageRank), per-node neighborhood sampling for
GNN-style training data, and triangle/clustering statistics. All three
are built on the engine's standard primitives — combiner ``map_batches``
partials + the measured merge-plan chooser — and all use EXACT integer
arithmetic so the DuckDB oracles match bit-for-bit regardless of
summation order (the bm25/bigram_nll discipline).

Scale shapes:

- The EDGE LIST is the fact table: every pass over it is a narrow
  ``map_batches`` with per-batch pre-aggregation; only per-node partial
  rows (one per (node, block)) cross an exchange.
- The NODE TABLE (entity vocabulary) is dimension-scale by KG
  construction (entities come from a gazetteer / ontology), so per-node
  state (degree vector, rank vector) is broadcast via ``ray.put`` and
  updated O(nodes) on the driver per iteration — the exact centroid
  economics of ``stages/clustering.kmeans_fit``. For a graph whose NODE
  set is itself fact-scale (billions of web pages), swap the broadcast
  for a per-iteration ``relational.hash_join`` of ranks against edges —
  the code notes where.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.common import (
    bucketed_group_apply,
    merge_partials,
    segment_pairs,
)
from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array

PAGERANK_SCALE = 10**12  # rank unit: 1/SCALE of total probability mass


def cooccurrence_graph(
    mentions,
    num_buckets: int = 16,
    conv_partitioned: bool = False,
    assume_unsplit_blocks: bool = False,
):
    """Symmetric DISTINCT entity co-occurrence edge list (src, dst) over
    ALL entity types: an undirected edge per entity pair that shares at
    least one conversation (each edge present in both directions).

    The type-pair KG edge tables (``pairs.triples``) are bipartite by
    construction; graph passes that need closed walks (triangles,
    clustering) consume this untyped projection instead. Shape: per-conv
    pair expansion is the same vectorized segment kernel as
    ``pairs._cross_and_pack`` bounded by conversation size; cross-conv
    dedup is a combiner (local ``drop_duplicates``) + the measured merge
    plan — a hot pair ships one row per block, never one per conv.

    ``conv_partitioned=True`` declares the engine's standard layout
    (every conversation's mention rows contiguous in one block — the
    same contract as ``pairs.triples``): pair expansion then runs per
    BLOCK with NO conv shuffle — only block-local distinct pairs (edge-
    vocabulary bounded, NOT mention-stream sized) reach the merge.
    Measured at 128 replicas / 4.6M turns: the general path's full
    mention exchange was the entire 130 s runtime; the per-block path
    removes it. Robust by default to Ray splitting a conversation
    across blocks: only a block's first/last conv can straddle, and
    those convs' rows are routed through the exact general path — the
    union is deduped by the distinct merge, so overlap is harmless
    (``assume_unsplit_blocks=True`` skips the boundary sub-pipeline
    when the caller guarantees small emitted blocks, as in bench/kg).
    """

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        dm = bucket[["conv_id", "entity_id"]].drop_duplicates()
        b = dm.sort_values(["conv_id", "entity_id"], kind="mergesort")
        ent = b["entity_id"].to_numpy()
        lo_idx, hi_idx = segment_pairs(b["conv_id"].to_numpy())
        if len(lo_idx) == 0:
            return pd.DataFrame(
                {
                    "lo": pd.Series([], dtype="object"),
                    "hi": pd.Series([], dtype="object"),
                }
            )
        return pd.DataFrame(
            {"lo": ent[lo_idx], "hi": ent[hi_idx]}
        ).drop_duplicates()

    if not conv_partitioned:
        pairs = bucketed_group_apply(mentions, "conv_id", per_conv, num_buckets)
    else:

        def interior_pairs(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0 or assume_unsplit_blocks:
                return per_conv(batch)
            boundary = {batch["conv_id"].iloc[0], batch["conv_id"].iloc[-1]}
            return per_conv(batch[~batch["conv_id"].isin(boundary)])

        pairs = mentions.map_batches(
            interior_pairs, batch_format="pandas", batch_size=None
        )
        if not assume_unsplit_blocks:

            def boundary_rows(batch: pd.DataFrame) -> pd.DataFrame:
                if len(batch) == 0:
                    return batch[["conv_id", "entity_id"]]
                boundary = {batch["conv_id"].iloc[0], batch["conv_id"].iloc[-1]}
                return batch.loc[
                    batch["conv_id"].isin(boundary), ["conv_id", "entity_id"]
                ]

            bnd = mentions.map_batches(
                boundary_rows, batch_format="pandas", batch_size=None
            )
            pairs = pairs.union(
                bucketed_group_apply(bnd, "conv_id", per_conv, num_buckets)
            )

    und = merge_partials(
        pairs,
        ["lo", "hi"],
        lambda b: b.drop_duplicates(["lo", "hi"]),
        lambda b: b,
        num_buckets,
    )

    def flip(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate(
                    [batch["lo"].to_numpy(), batch["hi"].to_numpy()]
                ),
                "dst": np.concatenate(
                    [batch["hi"].to_numpy(), batch["lo"].to_numpy()]
                ),
            }
        )

    return und.map_batches(flip, batch_format="pandas")


def degree_ds(edges, src: str = "src", dst: str = "dst",
              num_buckets: int = 16):
    """(node, deg) out-degree over a distinct directed edge list as a
    DATASET (no driver materialization), plus zero-degree rows for nodes
    appearing only as ``dst``. One combiner pass over the edges; the
    merged result is node-vocabulary bounded."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out_deg = batch[src].value_counts()
        dst_only = pd.Index(batch[dst].unique()).difference(out_deg.index)
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [out_deg.index.to_numpy(), dst_only.to_numpy()]
                ),
                "deg": np.concatenate(
                    [
                        out_deg.to_numpy().astype(np.int64),
                        np.zeros(len(dst_only), dtype=np.int64),
                    ]
                ),
            }
        )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("node", as_index=False, sort=False)["deg"].sum()

    return merge_partials(
        edges.map_batches(partial, batch_format="pandas"),
        "node",
        combine,
        lambda b: b,
        num_buckets,
    )


def degree_table(edges, src: str = "src", dst: str = "dst",
                 num_buckets: int = 16) -> pd.DataFrame:
    """Driver-side pandas view of :func:`degree_ds` (node-bounded)."""
    return degree_ds(edges, src, dst, num_buckets).to_pandas()


def _filter_edges_by_nodes(
    edges,
    keep,
    src: str,
    dst: str,
    plan: str = "auto",
    num_buckets: int = 16,
    broadcast_max_nodes: int = 5_000_000,
):
    """Keep edges whose BOTH endpoints appear in the ``keep`` dataset's
    ``node`` column — the per-round peel filter of :func:`kcore`, with
    the measured broadcast-vs-hash crossover discipline of
    :func:`~bio_re_with_entity_embeddings_ray.stages.relational.key_semi_anti_join`:

    - ``broadcast`` (node count <= ``broadcast_max_nodes``): the keep set
      crosses the wire ONCE as a compact Arrow array (``ray.put``,
      zero-copy deserialization per worker — never a Python set at
      ~50 B/entry), and one fused Arrow pass filters both endpoints.
    - ``hash``: two chained endpoint semi-joins; the edge list crosses
      two exchanges, nothing node-bounded ever sits on the driver — the
      plan for billion-node graphs where even an array broadcast is too
      big.
    - ``auto``: count the keep side (measured, not guessed) and pick.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if plan == "auto":
        keep = keep.materialize()
        plan = "broadcast" if keep.count() <= broadcast_max_nodes else "hash"
    if plan == "broadcast":
        kdf = keep.to_pandas()
        vals = kdf["node"].unique() if "node" in kdf.columns else []
        ref = ray.put(pa.array(vals))

        def efilter(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            if len(ks) == 0:
                return batch.slice(0, 0)
            m = pc.and_(
                pc.is_in(batch[src], value_set=ks),
                pc.is_in(batch[dst], value_set=ks),
            )
            return batch.filter(m)

        return edges.map_batches(efilter, batch_format="pyarrow", batch_size=None)
    if plan != "hash":
        raise ValueError(f"unknown node-filter plan {plan!r}")
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        key_semi_anti_join,
    )

    half = key_semi_anti_join(
        edges, keep, src, keys_key_col="node", plan="hash",
        num_buckets=num_buckets, other_cols={dst: ""},
    )
    return key_semi_anti_join(
        half, keep, dst, keys_key_col="node", plan="hash",
        num_buckets=num_buckets, other_cols={src: ""},
    )


def pagerank(
    edges,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Integer-exact PageRank over a DISTINCT directed edge list.

    Fixed-point variant with every operation pinned to int64 floor
    arithmetic so the unrolled SQL oracle reproduces it exactly:

    - ``r0[v]   = scale // N`` for all N nodes
    - ``share[u] = r[u] // deg[u]`` (deg 0 ⇒ contributes nothing — the
      dangling mass is dropped, the standard simplification; the KG
      entity graph is symmetric so it has no dangling nodes)
    - per-edge contribution ``(damping_pct * share[u]) // 100``
    - ``r'[v] = base + Σ contribs``,
      ``base = ((100 - damping_pct) * (scale // N)) // 100``

    Per iteration: the per-node contribution vector (node-bounded) is
    broadcast once via ``ray.put``; ONE narrow pass over the edges maps
    ``src → contrib`` at C level and pre-sums per ``dst`` per batch, so
    only (node, partial-sum) rows — one per node per block — reach the
    measured merge. Hot (high in-degree) nodes cost one int64 add per
    block, never a row per in-edge, so skew is absorbed by the combiner
    exactly as in ``pairs.merge_pair_counts``. Driver state is O(nodes)
    (see module docstring for the fact-scale-nodes alternative).

    Returns (node, rank_mu) with rank in 1/scale units, driver-side
    (node-vocabulary bounded, like kmeans centroids).
    """
    import ray

    # the edge list is consumed iters+1 times (degree pass + one pass per
    # iteration): pin it once so the upstream DAG (mention scan, pair
    # dedup) is not re-executed per pass — the materialized edges are the
    # iteration working set and spill to the object store at scale
    edges = edges.materialize()
    deg_df = degree_table(edges, src, dst, num_buckets)
    nodes = np.sort(deg_df["node"].to_numpy())
    deg = (
        deg_df.set_index("node")["deg"].reindex(nodes).to_numpy().astype(np.int64)
    )
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": nodes, "rank_mu": np.array([], dtype=np.int64)})
    pos = pd.Series(np.arange(n), index=nodes)
    r = np.full(n, scale // n, dtype=np.int64)
    base = ((100 - damping_pct) * (scale // n)) // 100

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("node", as_index=False, sort=False)["c"].sum()

    for _ in range(iters):
        share = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        contrib = pd.Series((damping_pct * share) // 100, index=nodes)
        ref = ray.put(contrib)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            cvec = ray.get(ref)  # per-worker cached deserialization
            c = batch[src].map(cvec).to_numpy()
            g = (
                pd.DataFrame({"node": batch[dst], "c": c})
                .groupby("node", as_index=False, sort=False)["c"]
                .sum()
            )
            return g

        summed = merge_partials(
            edges.map_batches(partial, batch_format="pandas"),
            "node",
            combine,
            lambda b: b,
            num_buckets,
        ).to_pandas()
        r = np.full(n, base, dtype=np.int64)
        if len(summed):
            r[pos[summed["node"]].to_numpy()] += summed["c"].to_numpy().astype(
                np.int64
            )
    return pd.DataFrame({"node": nodes, "rank_mu": r})


def pagerank_personalized(
    edges,
    seed_prefix: str,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Integer-exact PERSONALIZED PageRank: the restart distribution is
    uniform over the SEED SET (nodes whose id starts with
    ``seed_prefix``) instead of all nodes — ranks measure proximity to
    the seeds, the standard recommendation/expansion primitive
    ("entities related to the tool family").

    Same fixed-point discipline as :func:`pagerank` (every operation
    int64 floor so the unrolled SQL oracle agrees bit-for-bit), with the
    restart term concentrated:

    - ``r0[v] = scale // |S|`` for seeds, else 0
    - ``base[v] = ((100 - damping_pct) * (scale // |S|)) // 100`` for
      seeds, else 0
    - contribution/update identical to :func:`pagerank`

    Scale shape identical too: per-iteration broadcast of the node-
    bounded contribution vector, one narrow edge pass with per-block dst
    pre-sums, measured merge. Seeds are identified by prefix on the node
    id — zero extra input, same convention as :func:`reachable_k`.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    edges = edges.materialize()
    deg_df = degree_table(edges, src, dst, num_buckets)
    nodes = np.sort(deg_df["node"].to_numpy())
    deg = (
        deg_df.set_index("node")["deg"].reindex(nodes).to_numpy().astype(np.int64)
    )
    n = len(nodes)
    if n == 0:
        return pd.DataFrame(
            {"node": nodes, "rank_mu": np.array([], dtype=np.int64)}
        )
    pos = pd.Series(np.arange(n), index=nodes)
    is_seed = np.array(
        [str(v).startswith(seed_prefix) for v in nodes], dtype=bool
    )
    ns = int(is_seed.sum())
    if ns == 0:
        return pd.DataFrame(
            {"node": nodes, "rank_mu": np.zeros(n, dtype=np.int64)}
        )
    unit = scale // ns
    r = np.where(is_seed, unit, 0).astype(np.int64)
    base = np.where(is_seed, ((100 - damping_pct) * unit) // 100, 0).astype(
        np.int64
    )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("node", as_index=False, sort=False)["c"].sum()

    for _ in range(iters):
        share = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        contrib = pd.Series((damping_pct * share) // 100, index=nodes)
        ref = ray.put(contrib)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            cvec = ray.get(ref)
            c = batch[src].map(cvec).to_numpy()
            return (
                pd.DataFrame({"node": batch[dst], "c": c})
                .groupby("node", as_index=False, sort=False)["c"]
                .sum()
            )

        summed = merge_partials(
            edges.map_batches(partial, batch_format="pandas"),
            "node",
            combine,
            lambda b: b,
            num_buckets,
        ).to_pandas()
        r = base.copy()
        if len(summed):
            r[pos[summed["node"]].to_numpy()] += summed["c"].to_numpy().astype(
                np.int64
            )
    return pd.DataFrame({"node": nodes, "rank_mu": r})


def neighbor_sample(
    edges,
    k: int = 3,
    src: str = "entity_id",
    dst: str = "neighbor_id",
    salt: str = "nbr",
    num_buckets: int = 16,
):
    """GraphSAGE-style per-node neighbor sampling: keep at most ``k``
    neighbors per node, chosen DETERMINISTICALLY by salted-hash rank so
    the sample is reproducible and parallelism-invariant (the
    ``sampling.py`` / ``deterministic_shuffle`` discipline — no RNG
    state, any worker computes the same decision).

    rank(u, v) = (md5int8(salt:u|v), v); keep the k smallest per u.
    SQL: ROW_NUMBER() OVER (PARTITION BY u ORDER BY hash, v) <= k.

    One node-keyed exchange of the (src, dst) pairs; the per-bucket
    kernel is a single lexsort + segmented cumcount — no per-row Python.
    A hot node's edges land in one bucket (bounded blast radius, same
    note as ``bucketed_group_apply``); its output is capped at k rows.

    Returns (src, dst, h) — the hash is kept so downstream epochs can
    re-rank with a different salt.
    """

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    src: pd.Series([], dtype="object"),
                    dst: pd.Series([], dtype="object"),
                    "h": pd.Series([], dtype="int64"),
                }
            )
        key = (
            salt + ":" + bucket[src].astype(str) + "|" + bucket[dst].astype(str)
        ).to_numpy()
        h = md5int8_array(key)
        b = pd.DataFrame(
            {src: bucket[src].to_numpy(), dst: bucket[dst].to_numpy(), "h": h}
        ).sort_values([src, "h", dst], kind="mergesort")
        rank = b.groupby(src, sort=False).cumcount()
        return b[rank < k].reset_index(drop=True)

    return bucketed_group_apply(edges, src, per_bucket, num_buckets)

def _closed_wedges(
    edges,
    src: str,
    dst: str,
    num_buckets: int,
    broadcast_max_rows: int,
):
    """Shared wedge-closure kernel for :func:`triangle_counts` and
    :func:`edge_jaccard`.

    Degree-ordered orientation (the MapReduce-classic NodeIterator++):
    each undirected edge points from the lower-ranked endpoint to the
    higher, rank(v) = (deg(v), v) — so wedge generation at a node
    enumerates pairs of OUT-neighbors only, bounding total wedges by
    O(E^1.5) regardless of hot-node degree (a star hub has out-degree
    <= 1 under this ranking — that IS the skew handling, not an
    approximation). Wedge ⋈ oriented-edge closure runs through the
    measured broadcast/hash plan of ``relational.key_semi_anti_join`` on
    a packed composite key.

    Returns ``(closed, deg_df, rank_ref)``: closed wedge rows
    (a, b, c) with a < b < c in rank order — each one triangle, counted
    exactly once — plus the node-bounded degree table and the broadcast
    rank handle.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        key_semi_anti_join,
    )

    # edges feed the degree pass AND the orient map; the oriented list
    # feeds wedge generation AND the closure key side — pin both once
    edges = edges.materialize()
    deg_df = degree_table(edges, src, dst, num_buckets)
    # rank by (deg, node): a C-level lexsort position per node
    d = deg_df.sort_values(["deg", "node"], kind="mergesort")
    rank = pd.Series(np.arange(len(d)), index=d["node"].to_numpy())
    rref = ray.put(rank)

    def orient(batch: pd.DataFrame) -> pd.DataFrame:
        rk = ray.get(rref)
        rs = batch[src].map(rk).to_numpy()
        rd = batch[dst].map(rk).to_numpy()
        keep = rs < rd  # symmetric input: each undirected edge kept once
        return pd.DataFrame(
            {"a": batch[src].to_numpy()[keep], "b": batch[dst].to_numpy()[keep]}
        )

    oriented = edges.map_batches(orient, batch_format="pandas").materialize()

    def wedges(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="object"),
                "b": pd.Series([], dtype="object"),
                "c": pd.Series([], dtype="object"),
            }
        )
        if len(bucket) == 0:
            return empty
        rk = ray.get(rref)
        b = bucket.assign(rb=bucket["b"].map(rk)).sort_values(
            ["a", "rb"], kind="mergesort"
        )
        nb = b["b"].to_numpy()
        a = b["a"].to_numpy()
        # all ordered out-neighbor pairs within each per-src segment
        # (common.segment_pairs), preserving rb order so wedge (b, c)
        # has rank(b) < rank(c)
        b_idx, c_idx = segment_pairs(a)
        if len(b_idx) == 0:
            return empty
        return pd.DataFrame({"a": a[c_idx], "b": nb[b_idx], "c": nb[c_idx]})

    wedge_ds = bucketed_group_apply(oriented, "a", wedges, num_buckets)

    # close the wedge: (b, c) must be an oriented edge. Packed composite
    # key through the generic measured-plan semi-join.
    SEP = "\x00"

    def pack_wedge(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["bc"] = batch["b"].astype(str) + SEP + batch["c"].astype(str)
        return batch

    def pack_edge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bc": batch["a"].astype(str) + SEP + batch["b"].astype(str)}
        )

    # dtype-true dummies for the hash plan: sample an actual node value
    # so int64/string node ids both unify across the tagged union
    nd = deg_df["node"].to_numpy()
    dummy = nd[0] if len(nd) else ""
    closed = key_semi_anti_join(
        wedge_ds.map_batches(pack_wedge, batch_format="pandas"),
        oriented.map_batches(pack_edge, batch_format="pandas"),
        "bc",
        anti=False,
        num_buckets=num_buckets,
        broadcast_max_keys=broadcast_max_rows,
        other_cols={"a": dummy, "b": dummy, "c": dummy},
    )
    return closed, deg_df, rref


def triangle_counts(
    edges,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 16,
    broadcast_max_rows: int = 5_000_000,
):
    """Per-node triangle counts over an UNDIRECTED graph given as a
    symmetric distinct edge list: each closed wedge (one triangle,
    canonical a < b < c rank orientation — see :func:`_closed_wedges`)
    is credited to all three corners, merged by a count combiner.

    Returns (node, triangles) for nodes in >= 1 triangle.
    """
    closed, _, _ = _closed_wedges(
        edges, src, dst, num_buckets, broadcast_max_rows
    )

    def credit(batch: pd.DataFrame) -> pd.DataFrame:
        tri = np.concatenate(
            [batch["a"].to_numpy(), batch["b"].to_numpy(), batch["c"].to_numpy()]
        )
        g = (
            pd.DataFrame({"node": tri})
            .groupby("node", as_index=False, sort=False)
            .size()
            .rename(columns={"size": "triangles"})
        )
        g["triangles"] = g["triangles"].astype("int64")
        return g

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("node", as_index=False, sort=False)[
            "triangles"
        ].sum()

    return merge_partials(
        closed.map_batches(credit, batch_format="pandas"),
        "node",
        combine,
        lambda b: b,
        num_buckets,
    )


def khop_sample(
    edges,
    k1: int = 3,
    k2: int = 2,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 16,
):
    """Two-hop GNN minibatch frontier: for every node, a deterministic
    sample of up to ``k1`` neighbors, each expanded by up to ``k2`` of
    ITS neighbors (GraphSAGE layer-wise sampling, the sample-once-per-
    node-per-layer variant — hop-2 fanouts are shared between seeds that
    sampled the same hop-1 node, which is the memory-efficient form).

    Output (seed, hop1, hop2), <= N * k1 * k2 rows by construction — the
    sampling caps make the frontier join safe on power-law graphs where
    a raw 2-hop expansion is quadratic in hub degree. Built purely from
    engine primitives: two :func:`neighbor_sample` passes (salts
    ``nbr1``/``nbr2`` so layers draw independent samples) joined through
    the measured broadcast/hash plan of ``relational.hash_join``.
    """
    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    edges = edges.materialize()  # consumed by both sampling layers
    ns1 = neighbor_sample(
        edges, k=k1, src=src, dst=dst, salt="nbr1", num_buckets=num_buckets
    )
    ns2 = neighbor_sample(
        edges, k=k2, src=src, dst=dst, salt="nbr2", num_buckets=num_buckets
    )

    def as_l1(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"seed": b[src], "hop1": b[dst]})

    def as_l2(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hop1": b[src], "hop2": b[dst]})

    return hash_join(
        ns1.map_batches(as_l1, batch_format="pandas"),
        ns2.map_batches(as_l2, batch_format="pandas"),
        "hop1",
        num_buckets=num_buckets,
    )


def edge_jaccard(
    edges,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 16,
    broadcast_max_rows: int = 5_000_000,
):
    """Per-edge neighborhood Jaccard similarity — the classic
    link-prediction / edge-strength feature over the KG graph: for every
    undirected edge (a, b) with at least one common neighbor,
    ``common = |N(a) ∩ N(b)|`` and
    ``jaccard_bp = 10000 * common // (deg(a) + deg(b) - common)``
    (exact integers end to end).

    Common-neighbor counting reuses the wedge-closure kernel
    (:func:`_closed_wedges`, O(E^1.5)): a closed wedge (a, b, c)
    witnesses ONE common neighbor for each of its three edges — c for
    (a,b), b for (a,c), a for (b,c) — so common counts are a per-edge
    sum over closed wedges, a combiner merge; degrees come from the
    node-bounded degree table (broadcast into the finalize).
    Returns (lo, hi, common, jaccard_bp), lo < hi lexicographic.
    """
    import ray

    closed, deg_df, _ = _closed_wedges(
        edges, src, dst, num_buckets, broadcast_max_rows
    )
    dref = ray.put(deg_df.set_index("node")["deg"])

    def credit_edges(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        c = batch["c"].to_numpy()
        g = (
            pd.DataFrame(
                {
                    "x": np.concatenate([a, a, b]),
                    "y": np.concatenate([b, c, c]),
                }
            )
            .groupby(["x", "y"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "common"})
        )
        g["common"] = g["common"].astype("int64")
        return g

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["x", "y"], as_index=False, sort=False)[
            "common"
        ].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        dg = ray.get(dref)
        da = combined["x"].map(dg).to_numpy()
        db = combined["y"].map(dg).to_numpy()
        common = combined["common"].to_numpy()
        union = da + db - common
        x = combined["x"].to_numpy()
        y = combined["y"].to_numpy()
        lo = np.where(x < y, x, y)
        hi = np.where(x < y, y, x)
        return pd.DataFrame(
            {
                "lo": lo,
                "hi": hi,
                "common": common.astype(np.int64),
                "jaccard_bp": (10000 * common // union).astype(np.int64),
            }
        )

    return merge_partials(
        closed.map_batches(credit_edges, batch_format="pandas"),
        ["x", "y"],
        combine,
        finalize,
        num_buckets,
    )


def deterministic_walks(
    edges,
    length: int = 3,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 16,
):
    """DeepWalk-style walk corpus with DETERMINISTIC transitions: from
    every node, a walk of ``length`` steps where step t moves from node
    u to ``argmin_{v in N(u)} (md5int8(f"walk{t}:{u}|{v}"), v)`` — i.e.
    :func:`neighbor_sample` with k=1 and a per-step salt. No RNG state,
    parallelism-invariant, reproducible across runs/cluster sizes; a new
    epoch of walks is a new salt prefix. Walks from graph embeddings'
    (DeepWalk/node2vec) data-generation stage, in the engine's
    determinism discipline (the reference's doc2vec consumes exactly
    this kind of sequence corpus — learn_embeddings.py:36-58).

    Each step is one k=1 sampling pass (node-keyed exchange, k-capped
    output) plus one measured-plan join of the walk frontier against the
    step's transition table — ``length`` joins total, each <= N rows on
    both sides. Output: (start, n1, ..., n<length>); nodes with no
    out-edge end their walk (inner join drops them — absent from the
    symmetric co-occurrence graph where deg >= 1).
    """
    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    edges = edges.materialize()  # consumed once per walk step
    def step_table(t: int):
        ns = neighbor_sample(
            edges, k=1, src=src, dst=dst, salt=f"walk{t}", num_buckets=num_buckets
        )
        prev = "start" if t == 1 else f"n{t - 1}"

        def rename(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({prev: b[src], f"n{t}": b[dst]})

        return ns.map_batches(rename, batch_format="pandas")

    walk = step_table(1)
    for t in range(2, length + 1):
        walk = hash_join(
            walk, step_table(t), f"n{t - 1}", num_buckets=num_buckets
        )
    cols = ["start"] + [f"n{t}" for t in range(1, length + 1)]
    return walk.select_columns(cols)

def kcore(
    edges,
    k: int = 2,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 16,
    plan: str = "auto",
    broadcast_max_nodes: int = 5_000_000,
):
    """Fixed-round k-core peeling over a symmetric distinct edge list:
    each round drops nodes of degree < k and the edges touching them
    (``rounds`` rounds — a bounded-iteration approximation of the full
    k-core fixpoint, same unrolled-iteration contract as
    :func:`pagerank` / kmeans so the SQL oracle can mirror it exactly;
    ``rounds`` rises to the graph's peel depth for exactness and the
    pytest checks a case that converges). Returns (node, deg) of the
    survivors with their residual degree.

    Scale shape per round: one combiner degree pass (node-bounded
    DATASET — never parked on the driver), then the measured
    :func:`_filter_edges_by_nodes` plan: keep-set broadcast as ONE
    compact Arrow array while it fits (<= ``broadcast_max_nodes``), else
    two chained hash semi-joins of the edge list against the survivors —
    so the 100x story never depends on a Python-set broadcast. The edge
    list shrinks monotonically; ``plan``/"auto" re-measures per round.
    """
    cur = edges.materialize()  # re-read every round; pin the input once
    for _ in range(rounds):
        deg = degree_ds(cur, src, dst, num_buckets)

        def survivors(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[b["deg"] >= k, ["node"]]

        keep = deg.map_batches(survivors, batch_format="pandas")
        cur = _filter_edges_by_nodes(
            cur, keep, src, dst, plan, num_buckets, broadcast_max_nodes
        ).materialize()
    deg_df = degree_table(cur, src, dst, num_buckets)
    out = deg_df[deg_df["deg"] >= k].sort_values("node").reset_index(drop=True)
    out["deg"] = out["deg"].astype("int64")
    return out


def reachable_k(edges, seed_prefix: str = "TOOL:", k: int = 2,
                src: str = "src", dst: str = "dst"):
    """Bounded-hop reachability (k-hop transitive closure) from a seed
    set over the symmetric co-occurrence edge list: every node whose
    minimum hop distance from any seed is <= ``k``, with that distance —
    the blast-radius query of KG impact analysis ("what can this tool
    touch within two hops?").

    Scale shape (same node-bounded contract as :func:`kcore` /
    :func:`pagerank`): the edge list is pinned once and NEVER shuffles;
    each of the <= ``k`` rounds is one streaming semi-join pass with the
    current frontier broadcast ONCE as a compact Arrow array (``ray.put``
    + zero-copy per-worker get + ``pc.is_in`` — never a Python set at
    ~50 B/entry), emitting per-block distinct successor nodes. Driver
    state is two flat node-bounded arrays (reached nodes + dists),
    deduplicated with C-level ``pd.Index.difference`` — no per-node
    Python dict/set ops. BFS first-discovery depth IS the minimum
    distance, so no min-merge is needed. Returns a pandas (node, dist)
    frame sorted by node.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    cur = edges.materialize()  # k passes over the same edge working set

    def seed_partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[src])
        return pa.table(
            {"node": u.filter(pc.starts_with(pc.cast(u, pa.string()),
                                             seed_prefix))}
        )

    def _nodes(ds) -> np.ndarray:
        df = ds.to_pandas()
        if "node" not in df.columns:  # fully-empty output loses the schema
            return np.array([], dtype=object)
        return df["node"].unique()

    seeds = _nodes(cur.map_batches(seed_partial, batch_format="pyarrow"))
    reached_nodes = seeds.astype(object)
    reached_dist = np.zeros(len(seeds), dtype=np.int64)
    frontier = seeds
    for d in range(1, k + 1):
        if not len(frontier):
            break
        fref = ray.put(pa.array(frontier))

        def step(batch: pa.Table, _f=fref) -> pa.Table:
            fs = ray.get(_f)
            m = pc.is_in(batch[src], value_set=fs)
            return pa.table({"node": pc.unique(batch.filter(m)[dst])})

        nxt = _nodes(cur.map_batches(step, batch_format="pyarrow"))
        frontier = (
            pd.Index(nxt).difference(pd.Index(reached_nodes)).to_numpy()
        )
        reached_nodes = np.concatenate([reached_nodes, frontier])
        reached_dist = np.concatenate(
            [reached_dist, np.full(len(frontier), d, dtype=np.int64)]
        )
    out = (
        pd.DataFrame({"node": reached_nodes.astype(str),
                      "dist": reached_dist})
        .sort_values("node")
        .reset_index(drop=True)
    )
    return out


def hits_scores(edges, src: str = "src", dst: str = "dst",
                iters: int = 2, num_buckets: int = 16) -> pd.DataFrame:
    """Unnormalized integer HITS over a DISTINCT directed edge list:
    ``iters`` rounds of  a[v] = Σ_{(u,v)} h[u]  then  h[u] = Σ_{(u,v)} a[v]
    starting from h0 = 1 — hub/authority path counts, exact int64
    (normalization is a driver-side scalar divide the oracle doesn't
    need; 2 rounds on a KG-degree graph stay far below int64).

    Same physical shape as :func:`pagerank`: the node-bounded score
    vector broadcasts via ``ray.put``; each half-round is ONE narrow
    edge pass with per-batch pre-summation, so only (node, partial-sum)
    rows reach the measured merge. Returns (node, hub, auth)."""
    import ray

    edges = edges.materialize()

    def nodes_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat(
                    [batch[src], batch[dst]], ignore_index=True
                ).drop_duplicates()
            }
        )

    nodes_df = merge_partials(
        edges.map_batches(nodes_partial, batch_format="pandas"),
        "node",
        lambda b: b.drop_duplicates("node"),
        lambda b: b,
        num_buckets,
    ).to_pandas()
    nodes = np.sort(nodes_df["node"].to_numpy())
    n = len(nodes)
    if n == 0:
        z = np.array([], dtype=np.int64)
        return pd.DataFrame({"node": nodes, "hub": z, "auth": z})

    h = pd.Series(np.ones(n, dtype=np.int64), index=nodes)
    a = pd.Series(np.zeros(n, dtype=np.int64), index=nodes)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("node", as_index=False, sort=False)["c"].sum()

    def half_round(vec: pd.Series, from_col: str, to_col: str) -> pd.Series:
        ref = ray.put(vec)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            v = ray.get(ref)
            c = batch[from_col].map(v).to_numpy()
            return (
                pd.DataFrame({"node": batch[to_col], "c": c})
                .groupby("node", as_index=False, sort=False)["c"]
                .sum()
            )

        summed = merge_partials(
            edges.map_batches(partial, batch_format="pandas"),
            "node",
            combine,
            lambda b: b,
            num_buckets,
        ).to_pandas()
        out = pd.Series(np.zeros(n, dtype=np.int64), index=nodes)
        out[summed["node"].to_numpy()] = summed["c"].to_numpy().astype(np.int64)
        return out

    for _ in range(iters):
        a = half_round(h, src, dst)
        h = half_round(a, dst, src)

    return pd.DataFrame(
        {
            "node": nodes.astype(str),
            "hub": h.to_numpy().astype(np.int64),
            "auth": a.to_numpy().astype(np.int64),
        }
    )


def degree_centrality(edges, src: str = "src", dst: str = "dst",
                      num_buckets: int = 16) -> pd.DataFrame:
    """Degree centrality over the (symmetric distinct) edge list:
    (node, deg, deg_bp) with ``deg_bp = 10000 * deg // (n_nodes - 1)``
    — the normalized first-pass importance score of graph analytics
    (exact integers; the float normalization is the caller's one
    division). Single combiner pass (:func:`degree_ds`); the node count
    is a metadata read of the merged node-bounded result."""
    deg = degree_ds(edges, src, dst, num_buckets).to_pandas()
    n = len(deg)
    out = deg.sort_values("node").reset_index(drop=True)
    out["deg"] = out["deg"].astype("int64")
    out["deg_bp"] = (10000 * out["deg"] // max(n - 1, 1)).astype("int64")
    return out


def clustering_coeff(edges, src: str = "src", dst: str = "dst",
                     num_buckets: int = 16,
                     broadcast_max_rows: int = 5_000_000) -> pd.DataFrame:
    """Local clustering coefficient per node in integer basis points:
    ``cc_bp = 10000 * 2 * triangles // (deg * (deg - 1))`` over the
    symmetric distinct edge list — how tightly a node's neighborhood
    closes (the KG community-structure signal). Nodes of degree < 2 are
    excluded (undefined denominator). Composition of two verified
    passes: :func:`triangle_counts` (degree-ordered wedge closure,
    O(E^1.5)) and :func:`degree_ds`; both node-bounded."""
    edges = edges.materialize()  # two consumers: wedge closure + degrees
    tri = triangle_counts(
        edges, src, dst, num_buckets, broadcast_max_rows
    ).to_pandas()
    deg = degree_table(edges, src, dst, num_buckets)
    m = deg[deg["deg"] >= 2].merge(tri, on="node", how="left")
    t = m["triangles"].fillna(0).astype("int64")
    out = pd.DataFrame(
        {
            "node": m["node"],
            "deg": m["deg"].astype("int64"),
            "triangles": t,
            "cc_bp": (20000 * t // (m["deg"] * (m["deg"] - 1))).astype("int64"),
        }
    )
    return out.sort_values("node").reset_index(drop=True)


def degree_mixing(edges, src: str = "src", dst: str = "dst",
                  num_buckets: int = 16) -> pd.DataFrame:
    """Degree-assortativity sufficient statistics over the symmetric
    edge list: one row of EXACT int64 accumulators
    (n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2) where x/y are the
    endpoint degrees of each directed edge — the Pearson correlation is
    one driver-side float expression away, while the distributed part
    stays bit-stable for the oracle (the embedding_covariance
    discipline).

    Scale shape: degrees broadcast once (node-bounded Arrow arrays);
    one narrow edges pass emits per-block partial sums (6 ints/block);
    lazy tree merge."""
    import pyarrow as pa
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    deg = degree_table(edges, src, dst, num_buckets)
    deg_ref = ray.put(pd.Series(deg["deg"].to_numpy(), index=deg["node"]))

    def partial(batch: pd.DataFrame, _d=deg_ref) -> pd.DataFrame:
        dm = ray.get(_d)
        x = batch[src].map(dm).to_numpy().astype(np.int64)
        y = batch[dst].map(dm).to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": np.zeros(1, dtype=np.int64),
                "n_edges": [np.int64(len(batch))],
                "sum_x": [x.sum()],
                "sum_y": [y.sum()],
                "sum_xy": [(x * y).sum()],
                "sum_x2": [(x * x).sum()],
                "sum_y2": [(y * y).sum()],
            }
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("k", as_index=False).sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return combine(b).drop(columns=["k"])

    return merge_partials(
        edges.map_batches(partial, batch_format="pandas"),
        "k", combine, finalize, num_buckets, plan="tree",
    )


def cooccurrence_weights(mentions, num_buckets: int = 16):
    """WEIGHTED symmetric co-occurrence edge list: (src, dst, w) where
    ``w`` = number of distinct conversations in which the two entities
    co-occur — the support-weighted companion of
    :func:`cooccurrence_graph` (whose edges are the w >= 1 projection).

    Same shape: per-conv pair expansion bounded by conversation size;
    per-block pair-count partials (one row per (pair, block)) merge
    through the measured plan — a hot pair ships one int per block."""

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        dm = bucket[["conv_id", "entity_id"]].drop_duplicates()
        b = dm.sort_values(["conv_id", "entity_id"], kind="mergesort")
        ent = b["entity_id"].to_numpy()
        lo_idx, hi_idx = segment_pairs(b["conv_id"].to_numpy())
        if len(lo_idx) == 0:
            return pd.DataFrame(
                {"lo": pd.Series([], dtype=object),
                 "hi": pd.Series([], dtype=object),
                 "w": np.array([], np.int64)}
            )
        g = (
            pd.DataFrame({"lo": ent[lo_idx], "hi": ent[hi_idx]})
            .groupby(["lo", "hi"], as_index=False).size()
            .rename(columns={"size": "w"})
        )
        g["w"] = g["w"].astype("int64")
        return g

    pairs = bucketed_group_apply(mentions, "conv_id", per_conv, num_buckets)

    und = merge_partials(
        pairs,
        ["lo", "hi"],
        lambda b: b.groupby(["lo", "hi"], as_index=False)["w"].sum(),
        lambda b: b,
        num_buckets,
    )

    def flip(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate([batch["lo"].to_numpy(), batch["hi"].to_numpy()]),
                "dst": np.concatenate([batch["hi"].to_numpy(), batch["lo"].to_numpy()]),
                "w": np.concatenate([batch["w"].to_numpy()] * 2),
            }
        )

    return und.map_batches(flip, batch_format="pandas")


def pagerank_weighted(
    edges,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    iters: int = 2,
    damping_pct: int = 85,
    scale: int = 10**9,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Integer-exact WEIGHTED PageRank: mass splits along out-edges
    proportionally to edge weight — per edge (u, v, w):
    ``contrib = (damping_pct * ((r[u] * w) // W[u])) // 100`` with
    ``W[u]`` = u's total out-weight; ``r'[v] = base + Σ contribs``
    (same base/init as :func:`pagerank`). Every step int64 floor
    arithmetic, so the unrolled SQL recurrence matches bit-for-bit.

    Integer envelope: ``scale * max_edge_weight`` must stay below 2^63
    — the default scale drops to 10^9 (rank_nano units) so weights to
    ~10^9 are safe; assert at call sites with heavier weights.

    Scale shape: per iteration the rank and out-weight vectors broadcast
    once (node-bounded); ONE narrow pass over the weighted edges
    computes per-edge contributions at C level and pre-sums per dst per
    block — hot nodes cost one add per block (the combiner absorbs the
    skew exactly as unweighted pagerank).
    """
    import ray

    edges = edges.materialize()

    def wsum_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(src, as_index=False)[w].sum()
        return g.rename(columns={src: "node", w: "W"})

    W_df = merge_partials(
        edges.map_batches(wsum_partial, batch_format="pandas"),
        "node",
        lambda b: b.groupby("node", as_index=False)["W"].sum(),
        lambda b: b,
        num_buckets,
    ).to_pandas()

    # Node vocabulary = union of src and dst: a sink node (appears only
    # as dst) has out-weight 0 but still accumulates rank, mirroring the
    # unweighted pagerank's zero-degree handling via degree_table.
    def dst_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch[dst].unique()})

    dst_df = merge_partials(
        edges.map_batches(dst_partial, batch_format="pandas"),
        "node",
        lambda b: b.drop_duplicates("node"),
        lambda b: b,
        num_buckets,
    ).to_pandas()
    nodes = np.sort(
        pd.concat([W_df["node"], dst_df["node"]]).unique()
    )
    Wv = (
        W_df.set_index("node")["W"].reindex(nodes, fill_value=0)
        .to_numpy().astype(np.int64)
    )
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": nodes, "rank_nano": np.array([], np.int64)})
    pos = pd.Series(np.arange(n), index=nodes)
    r = np.full(n, scale // n, dtype=np.int64)
    base = ((100 - damping_pct) * (scale // n)) // 100

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("node", as_index=False, sort=False)["c"].sum()

    for _ in range(iters):
        rser = pd.Series(r, index=nodes)
        Wser = pd.Series(Wv, index=nodes)
        rref, wref = ray.put(rser), ray.put(Wser)

        def partial(batch: pd.DataFrame, _r=rref, _W=wref) -> pd.DataFrame:
            rv = ray.get(_r)
            Wv_ = ray.get(_W)
            ru = batch[src].map(rv).to_numpy().astype(np.int64)
            Wu = batch[src].map(Wv_).to_numpy().astype(np.int64)
            we = batch[w].to_numpy().astype(np.int64)
            c = (damping_pct * ((ru * we) // np.maximum(Wu, 1))) // 100
            return (
                pd.DataFrame({"node": batch[dst], "c": c})
                .groupby("node", as_index=False, sort=False)["c"].sum()
            )

        summed = merge_partials(
            edges.map_batches(partial, batch_format="pandas"),
            "node", combine, lambda b: b, num_buckets,
        ).to_pandas()
        r = np.full(n, base, dtype=np.int64)
        if len(summed):
            r[pos[summed["node"]].to_numpy()] += (
                summed["c"].to_numpy().astype(np.int64)
            )
    return pd.DataFrame({"node": nodes, "rank_nano": r})


def min_label_prop(
    edges,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Bounded-round min-label propagation: every node starts labelled
    with its own id; each round every node takes the minimum of its own
    label and its in-neighbors' labels. After enough rounds this is
    connected components (see ``dedup.connected_components`` for the
    converging variants); at a FIXED round budget it is the
    deterministic "community seed" primitive — label(v) = smallest node
    id within ``rounds`` hops — used to pre-cluster before expensive
    pairwise work. Returns (node, label).

    Scale shape mirrors :func:`pagerank`: the label vector is
    node-vocabulary-bounded and broadcast once per round; ONE narrow
    pass over the edges maps src → label and pre-MINS per dst per block
    (hot nodes cost one comparison per block, not one per in-edge); the
    measured merge reduces (node, min-label) partials. Driver state is
    O(nodes), same bound as every finalize in this family.
    """
    import ray

    edges = edges.materialize()
    deg_df = degree_table(edges, src, dst, num_buckets)
    nodes = np.sort(deg_df["node"].to_numpy())
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": nodes, "label": nodes})
    pos = pd.Series(np.arange(n), index=nodes)
    lbl = nodes.copy()

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("node", as_index=False, sort=False)["ml"].min()

    for _ in range(rounds):
        lvec = pd.Series(lbl, index=nodes)
        ref = ray.put(lvec)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            lv = ray.get(ref)
            return (
                pd.DataFrame(
                    {"node": batch[dst], "ml": batch[src].map(lv).to_numpy()}
                )
                .groupby("node", as_index=False, sort=False)["ml"]
                .min()
            )

        summed = merge_partials(
            edges.map_batches(partial, batch_format="pandas"),
            "node",
            combine,
            lambda b: b,
            num_buckets,
        ).to_pandas()
        if len(summed):
            p = pos[summed["node"]].to_numpy()
            incoming = summed["ml"].to_numpy()
            lbl[p] = np.minimum(lbl[p], incoming)
    return pd.DataFrame({"node": nodes, "label": lbl})
