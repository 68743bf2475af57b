"""Graph analytics family (stages/graph.py): integer-exact PageRank,
deterministic neighbor sampling, degree-ordered triangle counting and the
entity co-occurrence graph builder — brute-force pinned on random graphs,
plus parallelism invariance (num_buckets must not change any result)."""

import itertools

import numpy as np
import pandas as pd
import pytest

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8


def _random_graph(n_nodes=40, n_edges=120, seed=7):
    """Symmetric distinct edge list over string node ids."""
    rng = np.random.RandomState(seed)
    und = set()
    while len(und) < n_edges:
        a, b = rng.randint(0, n_nodes, 2)
        if a != b:
            und.add((min(a, b), max(a, b)))
    rows = []
    for a, b in sorted(und):
        rows.append({"src": f"n{a:03d}", "dst": f"n{b:03d}"})
        rows.append({"src": f"n{b:03d}", "dst": f"n{a:03d}"})
    return pd.DataFrame(rows)


def _brute_pagerank(edges: pd.DataFrame, iters=2, scale=10**12) -> pd.DataFrame:
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    deg = edges.groupby("src").size().to_dict()
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = (15 * (scale // n)) // 100
    for _ in range(iters):
        nr = {v: base for v in nodes}
        for e in edges.itertuples():
            nr[e.dst] += (85 * (r[e.src] // deg[e.src])) // 100
        r = nr
    return pd.DataFrame({"node": nodes, "rank_mu": [r[v] for v in nodes]})


def _brute_triangles(edges: pd.DataFrame) -> dict:
    adj = {}
    for e in edges.itertuples():
        adj.setdefault(e.src, set()).add(e.dst)
    counts = {}
    seen = set()
    for a in adj:
        for b, c in itertools.combinations(sorted(adj[a]), 2):
            if c in adj.get(b, ()):
                tri = tuple(sorted((a, b, c)))
                if tri not in seen:
                    seen.add(tri)
                    for v in tri:
                        counts[v] = counts.get(v, 0) + 1
    return counts


@pytest.mark.parametrize("num_buckets", [3, 16])
def test_pagerank_matches_integer_recurrence(ray_session, num_buckets):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges_df = _random_graph()
    got = graph.pagerank(
        ray.data.from_pandas(edges_df), iters=2, num_buckets=num_buckets
    ).reset_index(drop=True)
    exp = _brute_pagerank(edges_df)
    pd.testing.assert_frame_equal(got, exp)
    # rank mass is conserved up to flooring: every node's rank is positive
    # and the floor-losses only ever shrink the total
    assert (got["rank_mu"] > 0).all()
    assert got["rank_mu"].sum() <= 10**12


def test_pagerank_dangling_nodes_contribute_nothing(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    # directed chain a -> b -> c: c is dangling (deg 0)
    edges_df = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    got = graph.pagerank(ray.data.from_pandas(edges_df), iters=2, num_buckets=2)
    exp = _brute_pagerank(edges_df)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


@pytest.mark.parametrize("num_buckets", [3, 16])
def test_triangle_counts_match_brute_force(ray_session, num_buckets):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges_df = _random_graph(n_nodes=25, n_edges=90, seed=3)
    got = (
        graph.triangle_counts(
            ray.data.from_pandas(edges_df), num_buckets=num_buckets
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = _brute_triangles(edges_df)
    assert dict(zip(got["node"], got["triangles"])) == exp


def test_triangle_counts_hash_plan_equals_broadcast(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges_df = _random_graph(n_nodes=25, n_edges=90, seed=3)
    ds = ray.data.from_pandas(edges_df)
    broad = graph.triangle_counts(ds, num_buckets=4).to_pandas()
    hashp = graph.triangle_counts(
        ds, num_buckets=4, broadcast_max_rows=0
    ).to_pandas()
    key = lambda df: df.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(broad), key(hashp))


def test_neighbor_sample_is_deterministic_hash_topk(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges_df = _random_graph(n_nodes=15, n_edges=60, seed=5).rename(
        columns={"src": "entity_id", "dst": "neighbor_id"}
    )
    k = 2
    got = graph.neighbor_sample(
        ray.data.from_pandas(edges_df), k=k, num_buckets=4
    ).to_pandas()
    # brute force: k smallest (md5int8('nbr:'+u+'|'+v), v) per u
    b = edges_df.copy()
    b["h"] = [
        md5int8(f"nbr:{u}|{v}")
        for u, v in zip(b["entity_id"], b["neighbor_id"])
    ]
    exp = (
        b.sort_values(["entity_id", "h", "neighbor_id"], kind="mergesort")
        .groupby("entity_id", sort=False)
        .head(k)
    )
    key = lambda df: df.sort_values(["entity_id", "neighbor_id"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(key(got), key(exp[got.columns]))
    # invariance: a different bucket count yields the identical sample
    again = graph.neighbor_sample(
        ray.data.from_pandas(edges_df), k=k, num_buckets=11
    ).to_pandas()
    pd.testing.assert_frame_equal(key(got), key(again))


def test_cooccurrence_graph_matches_pair_semantics(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    # conv 1: {a, b, c} (a twice), conv 2: {b, c}, conv 3: {d}
    m = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c1", "c1", "c2", "c2", "c3"],
            "entity_id": ["a", "b", "c", "a", "b", "c", "d"],
        }
    )
    got = (
        graph.cooccurrence_graph(ray.data.from_pandas(m), num_buckets=3)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    und = {("a", "b"), ("a", "c"), ("b", "c")}
    exp = pd.DataFrame(
        sorted([(x, y) for x, y in und] + [(y, x) for x, y in und]),
        columns=["src", "dst"],
    )
    pd.testing.assert_frame_equal(got, exp)


def test_khop_sample_composes_layer_samples(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges_df = _random_graph(n_nodes=20, n_edges=50, seed=21)
    ds = ray.data.from_pandas(edges_df)
    got = (
        graph.khop_sample(ds, k1=2, k2=2, num_buckets=4)
        .to_pandas()
        .sort_values(["seed", "hop1", "hop2"])
        .reset_index(drop=True)
    )
    # brute force: independent salted layers, joined
    def layer(salt, k):
        b = edges_df.copy()
        b["h"] = [
            md5int8(f"{salt}:{u}|{v}") for u, v in zip(b["src"], b["dst"])
        ]
        return (
            b.sort_values(["src", "h", "dst"], kind="mergesort")
            .groupby("src", sort=False)
            .head(k)[["src", "dst"]]
        )

    l1 = layer("nbr1", 2).rename(columns={"src": "seed", "dst": "hop1"})
    l2 = layer("nbr2", 2).rename(columns={"src": "hop1", "dst": "hop2"})
    exp = (
        l1.merge(l2, on="hop1")[["seed", "hop1", "hop2"]]
        .sort_values(["seed", "hop1", "hop2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["seed", "hop1", "hop2"]], exp)
    # frontier bound holds
    assert got.groupby("seed").size().max() <= 2 * 2


def test_edge_jaccard_matches_brute_force(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges_df = _random_graph(n_nodes=18, n_edges=60, seed=31)
    got = (
        graph.edge_jaccard(ray.data.from_pandas(edges_df), num_buckets=4)
        .to_pandas()
        .sort_values(["lo", "hi"])
        .reset_index(drop=True)
    )
    adj = {}
    for e in edges_df.itertuples():
        adj.setdefault(e.src, set()).add(e.dst)
    rows = []
    for a in adj:
        for b in adj[a]:
            if a < b:
                common = len(adj[a] & adj[b])
                if common:
                    union = len(adj[a]) + len(adj[b]) - common
                    rows.append((a, b, common, 10000 * common // union))
    exp = (
        pd.DataFrame(rows, columns=["lo", "hi", "common", "jaccard_bp"])
        .sort_values(["lo", "hi"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_deterministic_walks_follow_argmin_hash(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges_df = _random_graph(n_nodes=12, n_edges=30, seed=41)
    got = (
        graph.deterministic_walks(
            ray.data.from_pandas(edges_df), length=3, num_buckets=4
        )
        .to_pandas()
        .sort_values("start")
        .reset_index(drop=True)
    )
    adj = {}
    for e in edges_df.itertuples():
        adj.setdefault(e.src, set()).add(e.dst)

    def step(t, u):
        return min(adj[u], key=lambda v: (md5int8(f"walk{t}:{u}|{v}"), v))

    for r in got.itertuples():
        n1 = step(1, r.start)
        n2 = step(2, n1)
        n3 = step(3, n2)
        assert (r.n1, r.n2, r.n3) == (n1, n2, n3)
    # one walk per node (every node has deg >= 1 in a symmetric graph)
    assert len(got) == len(adj)


def test_kcore_matches_iterative_peel(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    # two triangles joined by a path of degree-1/2 nodes: the path peels
    # away over rounds, triangles survive (converged within 3 rounds)
    und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7), (4, 5)]
    rows = []
    for a, b in und:
        rows.append({"src": f"n{a}", "dst": f"n{b}"})
        rows.append({"src": f"n{b}", "dst": f"n{a}"})
    df = pd.DataFrame(rows)
    got = graph.kcore(ray.data.from_pandas(df), k=2, rounds=3, num_buckets=3)
    # brute force peel to fixpoint
    adj = {}
    for a, b in und:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
        adj.setdefault(f"n{b}", set()).add(f"n{a}")
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < 2:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    exp = pd.DataFrame(
        sorted((v, len(ns)) for v, ns in adj.items()), columns=["node", "deg"]
    )
    pd.testing.assert_frame_equal(got, exp.astype({"deg": "int64"}))


def test_cooccurrence_conv_partitioned_paths_agree(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    rng = np.random.RandomState(17)
    rows = []
    for c in range(60):
        ents = rng.choice([f"e{i}" for i in range(12)],
                          size=rng.randint(1, 6), replace=False)
        for e in ents:
            rows.append({"conv_id": f"c{c:03d}", "entity_id": e})
    m = pd.DataFrame(rows).sort_values("conv_id", kind="mergesort")
    # conv-contiguous blocks: split at conv boundaries... and ALSO a
    # layout where a conv straddles two blocks (default path must still
    # be exact via the boundary sub-pipeline)
    ds_whole = ray.data.from_pandas(m)
    cut = len(m) // 2  # almost certainly mid-conversation
    ds_split = ray.data.from_pandas([m.iloc[:cut], m.iloc[cut:]])

    key = lambda df: df.sort_values(["src", "dst"]).reset_index(drop=True)
    general = key(graph.cooccurrence_graph(ds_whole, 4).to_pandas())
    partitioned = key(
        graph.cooccurrence_graph(
            ds_whole, 4, conv_partitioned=True, assume_unsplit_blocks=True
        ).to_pandas()
    )
    straddling = key(
        graph.cooccurrence_graph(ds_split, 4, conv_partitioned=True).to_pandas()
    )
    pd.testing.assert_frame_equal(general, partitioned)
    pd.testing.assert_frame_equal(general, straddling)


def test_triangle_counts_int_node_ids_hash_plan(ray_session):
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    # int64 node ids through the FORCED hash closure plan: the wedge
    # semi-join's dummies must be dtype-true, not hardcoded strings
    und = [(0, 1), (1, 2), (0, 2), (2, 3)]
    rows = []
    for a, b in und:
        rows.append({"src": np.int64(a), "dst": np.int64(b)})
        rows.append({"src": np.int64(b), "dst": np.int64(a)})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = (
        graph.triangle_counts(ds, num_buckets=3, broadcast_max_rows=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert dict(zip(got["node"], got["triangles"])) == {0: 1, 1: 1, 2: 1}


def test_reachable_k_path_graph(ray_session):
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import graph

    # path TOOL:a - b - c - d (symmetric); k=2 reaches b (1) and c (2), not d
    und = [("TOOL:a", "b"), ("b", "c"), ("c", "d")]
    rows = [(s, t) for s, t in und] + [(t, s) for s, t in und]
    edges = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]))
    out = graph.reachable_k(edges, "TOOL:", k=2)
    assert dict(zip(out["node"], out["dist"])) == {"TOOL:a": 0, "b": 1, "c": 2}

    out3 = graph.reachable_k(edges, "TOOL:", k=3)
    assert dict(zip(out3["node"], out3["dist"]))["d"] == 3


def test_reachable_k_no_seeds(ray_session):
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import graph

    edges = rd.from_pandas(
        pd.DataFrame([("a", "b"), ("b", "a")], columns=["src", "dst"])
    )
    out = graph.reachable_k(edges, "TOOL:", k=2)
    assert len(out) == 0


def test_kcore_hash_plan_equals_broadcast(ray_session):
    """The two _filter_edges_by_nodes physical plans (compact-array
    broadcast vs chained hash semi-joins) must agree — the measured
    crossover is a plan choice, never a semantics choice."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages import graph

    und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7), (4, 5)]
    rows = []
    for a, b in und:
        rows.append({"src": f"n{a}", "dst": f"n{b}"})
        rows.append({"src": f"n{b}", "dst": f"n{a}"})
    df = pd.DataFrame(rows)
    bc = graph.kcore(
        ray.data.from_pandas(df), k=2, rounds=3, num_buckets=3, plan="broadcast"
    )
    hs = graph.kcore(
        ray.data.from_pandas(df), k=2, rounds=3, num_buckets=3, plan="hash"
    )
    pd.testing.assert_frame_equal(bc, hs)


def test_pagerank_weighted_matches_hand_recurrence(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import graph

    # weighted triangle: a-b heavy, a-c light (symmetric)
    und = [("a", "b", 10), ("a", "c", 1), ("b", "c", 2)]
    rows = [(s, t, w) for s, t, w in und] + [(t, s, w) for s, t, w in und]
    edges = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    got = graph.pagerank_weighted(edges, iters=2, num_buckets=2)
    gm = dict(zip(got["node"], got["rank_nano"]))

    # hand-rolled integer recurrence
    scale, damp = 10**9, 85
    W = {"a": 11, "b": 12, "c": 3}
    nodes = ["a", "b", "c"]
    r = {n: scale // 3 for n in nodes}
    base = ((100 - damp) * (scale // 3)) // 100
    for _ in range(2):
        nxt = {n: base for n in nodes}
        for s, t, w in rows:
            nxt[t] += (damp * ((r[s] * w) // W[s])) // 100
        r = nxt
    assert gm == r


def test_pagerank_weighted_directed_sink(ray_session):
    """Directed edge list with a pure sink (appears only as dst): the
    node vocabulary must be src UNION dst, the sink gets out-weight 0,
    and rank still accumulates into it (round-5 ADVICE fix — previously
    raised KeyError on A->B->C)."""
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import graph

    rows = [("a", "b", 3), ("b", "c", 5)]  # c is a sink
    edges = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    got = graph.pagerank_weighted(edges, iters=2, num_buckets=2)
    gm = dict(zip(got["node"], got["rank_nano"]))

    scale, damp = 10**9, 85
    W = {"a": 3, "b": 5, "c": 0}
    nodes = ["a", "b", "c"]
    r = {n: scale // 3 for n in nodes}
    base = ((100 - damp) * (scale // 3)) // 100
    for _ in range(2):
        nxt = {n: base for n in nodes}
        for s, t, w in rows:
            nxt[t] += (damp * ((r[s] * w) // max(W[s], 1))) // 100
        r = nxt
    assert gm == r
