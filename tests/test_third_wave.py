"""Round-3 third wave: running totals, funnel analysis, k-anonymity,
column profiling, HITS, functional-predicate violations — brute-force
pandas checks."""

import numpy as np
import pandas as pd
import pytest


def _events(n=400, users=20, seed=13):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 90_000, n), unit="s"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error"], n
            ),
            "value": rng.randn(n) * 5,
        }
    )


@pytest.mark.parametrize("nb", [3, 16])
def test_running_total_matches_pandas(ray_session, nb):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import running_total

    ev = _events()
    out = (
        running_total(rd.from_pandas(ev).repartition(5), nb)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = ev.copy()
    b["v_milli"] = np.round(b["value"].to_numpy() * 1000).astype(np.int64)
    b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    b["cum_sum_milli"] = b.groupby("user_id", sort=False)["v_milli"].cumsum()
    b["cum_n"] = b.groupby("user_id", sort=False).cumcount() + 1
    exp = (
        b[["event_id", "user_id", "cum_n", "cum_sum_milli"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp["cum_n"] = exp["cum_n"].astype("int64")
    pd.testing.assert_frame_equal(out, exp)


def _brute_funnel(ev: pd.DataFrame, steps):
    depths = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        cur = pd.Timestamp.min
        depth = 0
        for step in steps:
            cand = g[(g["event_type"] == step) & (g["ts"] > cur)]
            if len(cand) == 0:
                break
            cur = cand["ts"].min()
            depth += 1
        depths[uid] = depth
    s = pd.Series(depths).value_counts().sort_index()
    return pd.DataFrame(
        {"depth": s.index.astype("int64"), "n_users": s.to_numpy().astype("int64")}
    ).reset_index(drop=True)


def test_funnel_counts_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import funnel_counts

    ev = _events(n=200, users=30)
    steps = ("view", "click", "purchase")
    out = (
        funnel_counts(rd.from_pandas(ev).repartition(4), steps, 4)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _brute_funnel(ev, steps))
    assert out["n_users"].sum() == ev["user_id"].nunique()


def test_funnel_strictly_after(ray_session):
    """A click at the exact same timestamp as the view does NOT count."""
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import funnel_counts

    t0 = pd.Timestamp("2025-01-01")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": [t0, t0, t0],
            "event_type": ["view", "click", "view"],
            "value": [0.0, 0.0, 0.0],
        }
    )
    out = funnel_counts(
        rd.from_pandas(ev), ("view", "click", "purchase"), 2
    ).to_pandas()
    # both users stop at depth 1 (the click is not strictly after)
    assert out["depth"].tolist() == [1]
    assert out["n_users"].tolist() == [2]


def test_k_anonymity_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import k_anonymity

    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {
            "zip": rng.choice(["a", "b", "c", "d"], 100),
            "age": rng.randint(0, 3, 100).astype(np.int64),
        }
    )
    out = k_anonymity(rd.from_pandas(df).repartition(4), ["zip", "age"], k=7, num_buckets=4).to_pandas()
    exp = df.groupby(["zip", "age"], as_index=False).size()
    exp = exp[exp["size"] < 7].rename(columns={"size": "n"})
    exp = exp.sort_values(["zip", "age"]).reset_index(drop=True)
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(out, exp)


def test_column_profile_brute_with_nulls(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import column_profile

    df = pd.DataFrame(
        {
            "a": [1, 2, 2, None, 3],
            "b": ["x", None, None, "y", "x"],
        }
    )
    out = column_profile(rd.from_pandas(df).repartition(3), ["a", "b"], 4).to_pandas()
    a = out[out["column"] == "a"].iloc[0]
    assert (a["n"], a["n_null"], a["n_distinct"]) == (5, 1, 3)
    # floats render via str(); min/max lexicographic over the rendering
    assert a["min_str"] == str(1.0) and a["max_str"] == str(3.0)
    b = out[out["column"] == "b"].iloc[0]
    assert (b["n"], b["n_null"], b["n_distinct"]) == (5, 2, 2)
    assert b["min_str"] == "x" and b["max_str"] == "y"


def test_hits_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.graph import hits_scores

    edges = pd.DataFrame(
        {
            "src": ["a", "a", "b", "c"],
            "dst": ["x", "y", "x", "y"],
        }
    )
    out = (
        hits_scores(rd.from_pandas(edges).repartition(2), num_buckets=4)
        .sort_values("node")
        .reset_index(drop=True)
    )
    # brute: h0=1; a1 = indegree; h1[u] = sum a1 over out-nbrs;
    # a2[v] = sum h1 over in-nbrs; h2[u] = sum a2 over out-nbrs
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    h = {n: 1 for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(2):
        a = {n: 0 for n in nodes}
        for s, d in edges.itertuples(index=False):
            a[d] += h[s]
        h = {n: 0 for n in nodes}
        for s, d in edges.itertuples(index=False):
            h[s] += a[d]
    assert out["node"].tolist() == nodes
    assert out["hub"].tolist() == [h[n] for n in nodes]
    assert out["auth"].tolist() == [a[n] for n in nodes]


def test_functional_violations_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.pairs import (
        functional_violations,
    )

    trip = pd.DataFrame(
        {
            "subj_id": ["s1", "s1", "s1", "s2", "s3", "s3"],
            "pred": ["p", "p", "q", "p", "p", "p"],
            "obj_id": ["o1", "o2", "o3", "o4", "o5", "o6"],
        }
    )
    out = functional_violations(
        rd.from_pandas(trip).repartition(3), min_objs=2, num_buckets=4
    ).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [("s1", "p", 2), ("s3", "p", 2)]


def test_interval_coalesce_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        interval_coalesce,
    )

    ev = _events(n=250, users=8)
    gap = 5000
    out = (
        interval_coalesce(rd.from_pandas(ev).repartition(4), gap, 4)
        .to_pandas()
        .sort_values(["user_id", "start_s"])
        .reset_index(drop=True)
    )
    # brute force islands
    rows = []
    for uid, g in ev.groupby("user_id"):
        s = np.sort(g["ts"].astype("datetime64[s]").astype("int64").to_numpy())
        start, last, cnt = s[0], s[0], 1
        for x in s[1:]:
            if x > last + gap:
                rows.append((uid, start, last + gap, cnt))
                start, cnt = x, 0
            last = x
            cnt += 1
        rows.append((uid, start, last + gap, cnt))
    exp = pd.DataFrame(
        rows, columns=["user_id", "start_s", "end_s", "n_events"]
    ).sort_values(["user_id", "start_s"]).reset_index(drop=True)
    exp = exp.astype(
        {"user_id": "int64", "start_s": "int64", "end_s": "int64", "n_events": "int64"}
    )
    pd.testing.assert_frame_equal(out, exp)
    assert (out["n_events"] > 1).any()  # merging actually happened


def test_cohort_retention_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        cohort_retention,
    )

    ev = _events(n=300, users=12)
    bucket_s = 10_000
    out = (
        cohort_retention(rd.from_pandas(ev).repartition(5), bucket_s, 4)
        .to_pandas()
        .reset_index(drop=True)
    )
    b = ev.copy()
    b["bucket"] = b["ts"].astype("datetime64[s]").astype("int64") // bucket_s
    b = b[["user_id", "bucket"]].drop_duplicates()
    cohort = b.groupby("user_id")["bucket"].min()
    b["cohort"] = b["user_id"].map(cohort)
    exp = (
        b.groupby(["cohort", "bucket"], as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
        .sort_values(["cohort", "bucket"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(out, exp)
    # diagonal property: every cohort is active in its own first bucket
    first = exp.groupby("cohort")["bucket"].min()
    assert (first.index == first.values).all()


def test_cross_join_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import cross_join

    fact = pd.DataFrame({"a": np.arange(7, dtype=np.int64)})
    dim = pd.DataFrame({"b": ["x", "y", "z"]})
    out = (
        cross_join(rd.from_pandas(fact).repartition(3), dim)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == 21
    assert out.groupby("a").size().eq(3).all()
    assert out.groupby("b").size().eq(7).all()


def test_throttle_events_brute(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        throttle_events,
    )

    ev = _events(n=300, users=5)
    w = 20_000
    out = (
        throttle_events(rd.from_pandas(ev).repartition(4), w, 4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = ev.copy()
    b["s"] = b["ts"].astype("datetime64[s]").astype("int64")
    b = b.sort_values(["user_id", "event_type", "s", "event_id"], kind="mergesort")
    prev = b.groupby(["user_id", "event_type"], sort=False)["s"].shift()
    keep = prev.isna() | (b["s"] - prev >= w)
    exp = (
        b[keep][["event_id", "user_id", "event_type", "s"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    assert len(out) < len(ev)  # the throttle actually fired
