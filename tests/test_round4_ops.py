"""Round-4 operator tests: LSH+verify chain, sparse similarity mining,
SCD2 history — each against a single-process brute-force reference."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_minhash_verified_subset_semantics(ray_session):
    """verified = exact-Jaccard pairs ∩ LSH candidates, bit-for-bit."""
    from bio_re_with_entity_embeddings_ray.stages import dedup

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon eta",      # near-dup of 1
        3: "one two three four five six seven",
        4: "one two three four five six seven",       # exact dup of 3
        5: "totally different words entirely here now",
    }
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    ver = dedup.minhash_verified_pairs(docs, k=3, threshold_bp=5000, num_buckets=4)
    got = ver.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    exact = (
        dedup.ngram_jaccard_pairs(docs, k=3, threshold_bp=5000, num_buckets=4)
        .to_pandas()
    )
    cand = dedup.minhash_lsh_pairs(docs, k=3, num_buckets=4).to_pandas()
    ck = set(zip(cand["doc_a"], cand["doc_b"]))
    exp = (
        exact[[tuple(p) in ck for p in zip(exact["doc_a"], exact["doc_b"])]]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # the exact dup and the near-dup must both survive the chain
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (3, 4) in pairs and (1, 2) in pairs


def test_similar_doc_pairs_vs_brute_force(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import similar_doc_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 15)))
        for _ in range(40)
    ]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    got = (
        similar_doc_pairs(rd.from_pandas(df), top=10, num_buckets=4)
        .to_pandas()
    )
    # brute force
    from collections import Counter

    tf = {i: Counter(t.split(" ")) for i, t in zip(df["doc_id"], df["text"])}
    dfc = Counter()
    for c in tf.values():
        dfc.update(c.keys())
    W = {t: 1_000_000 // (d * d) for t, d in dfc.items() if 1_000_000 // (d * d) > 0}
    dots = {}
    for a in tf:
        for b in tf:
            if a < b:
                d = sum(tf[a][t] * tf[b][t] * W.get(t, 0) for t in tf[a])
                if d > 0:
                    dots[(a, b)] = d
    norms = {i: sum(c[t] ** 2 * W.get(t, 0) for t in c) for i, c in tf.items()}
    exp = sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(got) == min(10, len(exp))
    for rank, ((a, b), d) in enumerate(exp, 1):
        r = got[got["rank"] == rank].iloc[0]
        assert (r["doc_a"], r["doc_b"], r["dot"]) == (a, b, d)
        assert (r["norm_a"], r["norm_b"]) == (norms[a], norms[b])


def test_scd2_history_intervals(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import scd2_history

    ts = pd.to_datetime(
        ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04", "2026-01-05"]
    )
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_type": ["A", "A", "B", "A", "C"],  # A-run collapses
            "ts": ts,
            "event_id": [10, 11, 12, 13, 14],
        }
    )
    out = (
        scd2_history(rd.from_pandas(ev), num_buckets=2)
        .to_pandas()
        .sort_values(["user_id", "valid_from"])
        .reset_index(drop=True)
    )
    u1 = out[out["user_id"] == 1]
    assert list(u1["state"]) == ["A", "B", "A"]
    assert list(u1["is_current"]) == [0, 0, 1]
    assert u1.iloc[0]["valid_to"] == ts[2]  # A interval ends at B's start
    assert pd.isna(u1.iloc[2]["valid_to"])
    u2 = out[out["user_id"] == 2]
    assert list(u2["state"]) == ["C"] and list(u2["is_current"]) == [1]


def test_collocations_vs_brute_force(ray_session):
    from collections import Counter

    from bio_re_with_entity_embeddings_ray.stages.textstats import collocations

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 12)))
        for _ in range(50)
    ]
    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64), "text": texts})
    got = collocations(rd.from_pandas(df), top=8, min_n=2, num_buckets=3).to_pandas()
    bg = Counter()
    left, right = Counter(), Counter()
    for t in texts:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            bg[(a, b)] += 1
            left[a] += 1
            right[b] += 1
    B = sum(bg.values())
    scored = sorted(
        (
            (-(10000 * n * B // (left[a] * right[b])), a, b, n)
            for (a, b), n in bg.items()
            if n >= 2
        )
    )[:8]
    assert len(got) == min(8, len(scored))
    for rank, (neg_lift, a, b, n) in enumerate(scored, 1):
        r = got[got["rank"] == rank].iloc[0]
        assert (r["w1"], r["w2"], r["n"], r["lift_bp"]) == (a, b, n, -neg_lift)


def test_event_state_asof_tie_semantics(ray_session):
    """Same-ts ties: an event ordered before a change by event_id still
    sees the new state (interval semantics, valid_from <= ts); two
    changes at one ts -> the later wins (zero-length interval drops)."""
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        event_state_asof,
    )

    ts = pd.to_datetime(
        ["2026-01-01", "2026-01-02", "2026-01-02", "2026-01-03",
         "2026-01-04", "2026-01-04", "2026-01-04"]
    )
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2, 2],
            #           A   A  B..same-ts  A |  C   D  D(same ts double chg)
            "event_type": ["A", "A", "B", "A", "C", "D", "D"],
            "ts": ts,
            "event_id": [10, 12, 11, 13, 20, 21, 22],
        }
    )
    out = event_state_asof(rd.from_pandas(ev), num_buckets=2).to_pandas()
    st = dict(zip(out["event_id"], out["state"]))
    # user 1: change to B happens at (01-02, id 11); the same-ts event
    # id 12 (type A... wait id 12 is type A at same ts) — change flags
    # follow (ts, id) order: 10:A(chg) 11:B(chg) 12:A(chg) 13:A
    assert st[10] == "A"
    # at ts 01-02 the LAST change is id 12 (A): both same-ts events see A
    assert st[11] == "A" and st[12] == "A"
    assert st[13] == "A"
    # user 2: 20:C(chg) 21:D(chg at same-ts? 21 and 22 both 01-04)
    # order: 20(C,chg) 21(D,chg) 22(D, not chg): last change at 01-04 is 21
    assert st[20] == "D" and st[21] == "D" and st[22] == "D"


def test_blocklist_hits_counts(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.safety import blocklist_hits

    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["Alpha beta ALPHA sigma", "nothing here"],
        }
    )
    out = blocklist_hits(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_blocked"] == 3 and out.loc[1, "n_tokens"] == 4
    assert out.loc[1, "blocked_bp"] == 7500
    assert out.loc[2, "n_blocked"] == 0 and out.loc[2, "blocked_bp"] == 0


# ---------------------------------------------------------------- property
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSET = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_HSET)
@given(
    st.lists(  # (node, parents) with parents strictly smaller => DAG
        st.tuples(
            st.integers(0, 15),
            st.lists(st.integers(0, 15), max_size=3),
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda t: t[0],
    )
)
def test_ontology_paths_matches_reference_recursion(ray_session, spec):
    """Random DAGs (parents forced strictly smaller; ghost parents kept as
    the unknown-id case) against the single-process reimplementation of
    the reference recursion."""
    from bio_re_with_entity_embeddings_ray.sources.obo import (
        ontology_parent_paths,
    )
    from tests.test_obo import _paths_table, _ref_parent_paths

    terms = {}
    for node, parents in spec:
        name = f"D{node}"
        # keep acyclic: only strictly-smaller ids resolve; others become
        # ghosts (unknown ids), exercising the base case
        ps = [f"D{p}" if p < node else f"GHOST{p}" for p in parents]
        terms[name] = ps
    got = sorted(
        (r["doid"], r["path"])
        for r in ontology_parent_paths(_paths_table(terms)).take_all()
    )
    assert got == _ref_parent_paths(terms)


@settings(**_HSET)
@given(
    st.lists(  # (conv, type, id) mention rows WITH duplicates allowed
        st.tuples(
            st.integers(0, 4),
            st.sampled_from(["op", "res", "svc"]),
            st.integers(0, 5),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_combined_arrow_matches_pandas_property(ray_session, rows):
    import pyarrow as pa

    from bio_re_with_entity_embeddings_ray.pipelines.kg import _combined_arrow
    from bio_re_with_entity_embeddings_ray.stages.aggregate import (
        SET_SEP,
        pack_sorted_distinct,
    )
    from bio_re_with_entity_embeddings_ray.stages.pairs import _cross_and_pack

    batch = pa.table(
        {
            "conv_id": pa.array([f"c{c}" for c, _, _ in rows], pa.string()),
            "entity_type": pa.array([t for _, t, _ in rows], pa.string()),
            "entity_id": pa.array([f"e{i}" for _, _, i in rows], pa.string()),
        }
    )
    got = (
        _combined_arrow(batch, "op", "res")
        .to_pandas()
        .sort_values(["kind", "a", "b"])
        .reset_index(drop=True)
    )
    df = batch.to_pandas()
    pp = _cross_and_pack(df, "op", "res", "conv_ids", with_counts=True)
    nv = pack_sorted_distinct(df, ["entity_id", "entity_type"], "conv_id", "conv_ids")
    nv["n_convs"] = (nv["conv_ids"].str.count(SET_SEP) + 1).astype("int64")
    exp = (
        pd.concat(
            [
                pd.DataFrame({"kind": "P", "a": pp["subj_id"], "b": pp["obj_id"],
                              "conv_ids": pp["conv_ids"], "n_convs": pp["n_convs"]}),
                pd.DataFrame({"kind": "N", "a": nv["entity_id"], "b": nv["entity_type"],
                              "conv_ids": nv["conv_ids"], "n_convs": nv["n_convs"]}),
            ],
            ignore_index=True,
        )
        .sort_values(["kind", "a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[got.columns])


def test_nearest_doc_vs_brute_force(ray_session):
    from collections import Counter

    from bio_re_with_entity_embeddings_ray.stages.textstats import nearest_doc

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 10))) for _ in range(25)]
    df = pd.DataFrame({"doc_id": np.arange(25, dtype=np.int64), "text": texts})
    got = nearest_doc(rd.from_pandas(df), num_buckets=3).to_pandas()
    tf = {i: Counter(t.split(" ")) for i, t in zip(df["doc_id"], df["text"])}
    dfc = Counter()
    for c in tf.values():
        dfc.update(c.keys())
    W = {t: 1_000_000 // (d * d) for t, d in dfc.items() if 1_000_000 // (d * d) > 0}
    best = {}
    for a in tf:
        for b in tf:
            if a == b:
                continue
            d = sum(tf[a][t] * tf[b][t] * W.get(t, 0) for t in tf[a])
            if d > 0 and (a not in best or (d, -b) > (best[a][1], -best[a][0])):
                best[a] = (b, d)
    gm = {r["doc_id"]: (r["best_doc"], r["dot"]) for _, r in got.iterrows()}
    assert gm == best


def test_tool_latency_excludes_final_turns(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import tool_latency

    ts = pd.to_datetime(
        ["2026-01-01 00:00:00", "2026-01-01 00:00:02", "2026-01-01 00:00:05",
         "2026-01-02 00:00:00", "2026-01-02 00:00:07"]
    )
    tr = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c1", "c2", "c2"],
            "turn_idx": np.array([0, 1, 2, 0, 1], dtype=np.int32),
            "role": ["user", "tool", "tool", "user", "tool"],
            "text": ["a", "b", "c", "d", "e"],
            # c1 turn2 is a conversation-final tool turn -> excluded
            "tool": [None, "grep", "sed", None, None],
            "ts": ts,
        }
    )
    out = tool_latency(rd.from_pandas(tr), num_buckets=2).to_pandas()
    m = {r["tool"]: r for _, r in out.iterrows()}
    assert set(m) == {"grep"}
    assert m["grep"]["n_calls"] == 1 and m["grep"]["total_ms"] == 3000
    assert m["grep"]["max_ms"] == 3000


def test_markov_next_token_vs_brute_force(ray_session):
    from collections import Counter

    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        markov_next_token,
    )

    texts = ["a b a b a c", "b a b", "c c c c", "z y"]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": texts})
    got = markov_next_token(rd.from_pandas(df), k=2, min_n=2, num_buckets=3).to_pandas()
    bg = Counter()
    for t in texts:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            bg[(a, b)] += 1
    tot = Counter()
    for (a, _), n in bg.items():
        tot[a] += n
    exp = []
    for a in sorted(tot):
        if tot[a] < 2:
            continue
        succ = sorted(
            ((b, n) for (x, b), n in bg.items() if x == a),
            key=lambda t: (-t[1], t[0]),
        )[:2]
        for rank, (b, n) in enumerate(succ, 1):
            exp.append((a, b, n, rank))
    assert sorted(zip(got["w1"], got["w2"], got["n"], got["rank"])) == sorted(exp)
    # 'z' has only 1 continuation -> excluded by min_n
    assert "z" not in set(got["w1"])


def test_time_to_first_boundary_semantics(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import time_to_first

    # sub-millisecond components: date_diff counts ms boundaries
    ts = pd.to_datetime(
        ["2026-01-01 00:00:00.000900", "2026-01-01 00:00:00.001100",
         "2026-01-01 00:00:05.000000"]
    )
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "event_type": ["view", "purchase", "view"],
            "ts": ts,
            "event_id": [1, 2, 3],
        }
    )
    out = time_to_first(rd.from_pandas(ev), num_buckets=2).to_pandas()
    # (1100us -> 1ms boundary) - (900us -> 0ms boundary) = 1, not 0
    assert dict(zip(out["user_id"], out["ms"])) == {1: 1}  # user 2 never converts


def _sym_edges(und):
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    return rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]))


def test_clustering_coeff_brute_force(ray_session):
    from bio_re_with_entity_embeddings_ray.stages import graph

    # triangle 0-1-2 + pendant 3 on node 2 + square 4-5-6-7 (no diagonal)
    und = [("n0", "n1"), ("n1", "n2"), ("n0", "n2"), ("n2", "n3"),
           ("n4", "n5"), ("n5", "n6"), ("n6", "n7"), ("n4", "n7")]
    out = graph.clustering_coeff(_sym_edges(und), num_buckets=3)
    m = {r["node"]: r for _, r in out.iterrows()}
    assert m["n0"]["cc_bp"] == 10000 and m["n1"]["cc_bp"] == 10000
    # n2: deg 3, one triangle -> 2*1/(3*2) = 1/3
    assert m["n2"]["deg"] == 3 and m["n2"]["cc_bp"] == 20000 // 6
    assert "n3" not in m  # degree 1 excluded
    assert m["n4"]["cc_bp"] == 0  # square has no triangles


def test_degree_mixing_sufficient_stats(ray_session):
    from bio_re_with_entity_embeddings_ray.stages import graph

    und = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    out = graph.degree_mixing(_sym_edges(und), num_buckets=3).to_pandas()
    deg = {"a": 2, "b": 2, "c": 3, "d": 1}
    xs, ys = [], []
    for a, b in und:
        for s, t in ((a, b), (b, a)):
            xs.append(deg[s]); ys.append(deg[t])
    r = out.iloc[0]
    assert r["n_edges"] == 8
    assert r["sum_x"] == sum(xs) and r["sum_y"] == sum(ys)
    assert r["sum_xy"] == sum(x * y for x, y in zip(xs, ys))
    assert r["sum_x2"] == sum(x * x for x in xs)
    assert r["sum_y2"] == sum(y * y for y in ys)


def test_cluster_size_hist_planted(ray_session):
    from bio_re_with_entity_embeddings_ray.stages import dedup

    # 3 exact copies of one text and 2 of another -> clusters of 3 and 2
    texts = (["alpha beta gamma delta epsilon zeta"] * 3
             + ["one two three four five six"] * 2
             + ["totally unrelated words entirely here now"])
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64), "text": texts})
    )
    out = dedup.cluster_size_hist(docs, k=3, num_buckets=4).to_pandas()
    assert dict(zip(out["size"], out["n_clusters"])) == {3: 1, 2: 1}


def test_incremental_triples_union_semantics(ray_session):
    """Merging triples tables unions conv sets per key — including the
    NON-disjoint case (recrawled conversations dedupe, support counts
    the union)."""
    from bio_re_with_entity_embeddings_ray.stages.pairs import incremental_triples

    prior = pd.DataFrame(
        {
            "subj_id": ["s1", "s2"],
            "pred": ["applies_to"] * 2,
            "obj_id": ["o1", "o2"],
            "conv_ids": ["c1;;;c2", "c5"],
            "support": np.array([2, 1], dtype=np.int64),
        }
    )
    delta = pd.DataFrame(
        {
            "subj_id": ["s1", "s3"],
            "pred": ["applies_to"] * 2,
            "obj_id": ["o1", "o3"],
            "conv_ids": ["c2;;;c3", "c9"],  # c2 recrawled -> dedupes
            "support": np.array([2, 1], dtype=np.int64),
        }
    )
    out = (
        incremental_triples(rd.from_pandas(prior), rd.from_pandas(delta), 2)
        .to_pandas()
        .set_index("subj_id")
    )
    assert out.loc["s1", "conv_ids"] == "c1;;;c2;;;c3"
    assert out.loc["s1", "support"] == 3
    assert out.loc["s2", "support"] == 1 and out.loc["s3", "support"] == 1
