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
