"""Round-3 second wave: role transitions, repeated-turn cleanup,
conversation stats, set ops, rollup grouping sets, BPE pair counts,
doc entropy, stratified sampling — brute-force pandas checks +
parallelism invariance."""

import numpy as np
import pandas as pd
import pytest


def _transcripts(n_convs=12, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    roles = ["user", "assistant", "tool"]
    for c in range(n_convs):
        n = rng.randint(1, 9)
        for t in range(n):
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": np.int32(t),
                    "role": roles[rng.randint(0, 3)],
                    "text": f"w{rng.randint(0, 4)} w{rng.randint(0, 4)}",
                    "tool": None,
                    "ts": pd.Timestamp("2025-01-01")
                    + pd.Timedelta(seconds=int(c) * 1000 + t * 3),
                }
            )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("nb", [2, 8])
def test_role_transitions_matches_lag(ray_session, nb):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import role_transitions

    ts = _transcripts()
    out = (
        role_transitions(rd.from_pandas(ts).repartition(4), nb)
        .to_pandas()
        .sort_values(["prev_role", "role"])
        .reset_index(drop=True)
    )
    b = ts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    b["prev_role"] = b.groupby("conv_id")["role"].shift(1)
    exp = (
        b.dropna(subset=["prev_role"])
        .groupby(["prev_role", "role"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["prev_role", "role"])
        .reset_index(drop=True)
    )
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(out, exp)


def test_drop_repeated_turns_consecutive_only(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        drop_repeated_turns,
    )

    # A A B A -> keeps turns 0, 2, 3 (the later "A" is NOT consecutive)
    ts = pd.DataFrame(
        {
            "conv_id": ["x"] * 4 + ["y"],
            "turn_idx": np.array([0, 1, 2, 3, 0], dtype=np.int32),
            "role": ["user"] * 5,
            "text": ["A", "A", "B", "A", "A"],
            "tool": [None] * 5,
            "ts": pd.to_datetime(["2025-01-01"] * 5),
        }
    )
    out = (
        drop_repeated_turns(rd.from_pandas(ts).repartition(3), 4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(zip(out["conv_id"], out["turn_idx"])) == [
        ("x", 0),
        ("x", 2),
        ("x", 3),
        ("y", 0),
    ]


def test_conv_stats_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import conv_stats

    ts = _transcripts()
    out = (
        conv_stats(rd.from_pandas(ts).repartition(5), 4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    g = ts.groupby("conv_id")
    exp = pd.DataFrame(
        {
            "conv_id": sorted(ts["conv_id"].unique()),
        }
    )
    exp["n_turns"] = exp["conv_id"].map(g.size()).astype("int64")
    exp["n_user"] = (
        exp["conv_id"]
        .map(ts[ts["role"] == "user"].groupby("conv_id").size())
        .fillna(0)
        .astype("int64")
    )
    exp["n_tool"] = (
        exp["conv_id"]
        .map(ts[ts["role"] == "tool"].groupby("conv_id").size())
        .fillna(0)
        .astype("int64")
    )
    exp["n_roles"] = exp["conv_id"].map(g["role"].nunique()).astype("int64")
    dur = (g["ts"].max() - g["ts"].min()).dt.total_seconds() * 1000
    exp["duration_ms"] = exp["conv_id"].map(dur).astype("int64")
    pd.testing.assert_frame_equal(out.sort_values("conv_id").reset_index(drop=True), exp)


@pytest.mark.parametrize("op", ["intersect", "except"])
def test_set_op_brute(ray_session, op):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import set_op

    rng = np.random.RandomState(3)
    a = pd.DataFrame({"k": rng.randint(0, 40, 60)})  # dups on purpose
    b = pd.DataFrame({"k": rng.randint(20, 60, 60)})
    out = (
        set_op(rd.from_pandas(a).repartition(4), rd.from_pandas(b).repartition(3), op, "k", 4)
        .to_pandas()["k"]
        .sort_values()
        .tolist()
    )
    sa, sb = set(a["k"]), set(b["k"])
    exp = sorted(sa & sb) if op == "intersect" else sorted(sa - sb)
    assert out == exp


def test_rollup_counts_levels(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import rollup_counts

    rng = np.random.RandomState(5)
    docs = pd.DataFrame(
        {
            "lang": rng.choice(["en", "fr"], 50),
            "source": rng.choice(["s1", "s2", "s3"], 50),
            "n_chars": rng.randint(1, 100, 50).astype("int64"),
        }
    )
    out = rollup_counts(rd.from_pandas(docs).repartition(4), 4).to_pandas()
    total = out[(out["lang"] == "*") & (out["source"] == "*")]
    assert total["n"].iloc[0] == 50
    assert total["sum_chars"].iloc[0] == docs["n_chars"].sum()
    lvl1 = out[(out["lang"] != "*") & (out["source"] == "*")]
    assert lvl1["n"].sum() == 50
    fine = out[(out["lang"] != "*") & (out["source"] != "*")]
    exp_fine = docs.groupby(["lang", "source"]).size()
    assert len(fine) == len(exp_fine)
    assert fine["n"].sum() == 50
    for _, r in fine.iterrows():
        assert r["n"] == exp_fine[(r["lang"], r["source"])]


def test_bpe_pair_counts_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.textstats import bpe_pair_counts

    rng = np.random.RandomState(9)
    texts = [
        " ".join(rng.choice(["aa", "bb", "cc"], rng.randint(1, 10)))
        for _ in range(40)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(40), "text": texts})
    out = bpe_pair_counts(rd.from_pandas(docs).repartition(4), k=5, num_buckets=4).to_pandas()
    # brute force
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            c[(toks[i], toks[i + 1])] += 1
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(zip(out["w1"], out["w2"]), out["n"]))
    assert got == [((w1, w2), n) for (w1, w2), n in exp]
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]


def test_doc_entropy_brute(ray_session):
    import math

    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.textstats import doc_entropy

    texts = ["a a a a", "a b c d", "x x y", ""]
    docs = pd.DataFrame({"doc_id": np.arange(4), "text": texts})
    out = (
        doc_entropy(rd.from_pandas(docs).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def brute(t):
        toks = t.split(" ")
        n = len(toks)
        from collections import Counter

        return sum(
            math.floor(c * math.log(n / c) * 1_000_000)
            for c in Counter(toks).values()
        )

    assert out["entropy_fp"].tolist() == [brute(t) for t in texts]
    # uniform docs have zero entropy; diverse docs have ~n*ln(n)
    assert out["entropy_fp"].iloc[0] == 0


def test_stratified_sample_rates_and_determinism(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.sampling import stratified_sample

    n = 4000
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["t"] * n,
            "lang": np.where(np.arange(n) % 2 == 0, "en", "zh"),
        }
    )
    rates = {"en": 2000, "zh": 9000}
    o1 = stratified_sample(rd.from_pandas(docs).repartition(4), rates).to_pandas()
    o2 = stratified_sample(rd.from_pandas(docs).repartition(7), rates).to_pandas()
    assert sorted(o1["doc_id"]) == sorted(o2["doc_id"])  # layout-invariant
    en = o1[o1["lang"] == "en"]
    zh = o1[o1["lang"] == "zh"]
    assert abs(len(en) / (n / 2) - 0.2) < 0.05
    assert abs(len(zh) / (n / 2) - 0.9) < 0.05
    with pytest.raises(ValueError):
        stratified_sample(rd.from_pandas(docs), {"en": 20000})
