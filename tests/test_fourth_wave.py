"""Round-3 fourth wave: JSON field extraction, unpivot, histogram,
aggregate-then-LAG deltas, gap-filled dense counts — brute-force pandas
checks."""

import numpy as np
import pandas as pd
import pytest


def _events(n=400, users=20, seed=17):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 400_000, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase"], n),
            "value": rng.rand(n) * 300,
        }
    )


def test_json_field_int(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import json_field_int

    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "props": [
                '{"k": 87}',
                '{"k": -3, "x": 1}',
                '{"x": 5}',  # missing field -> null
                "{}",
                '{"k": 0}',
                '{ "k" : 12 }',  # whitespace around key/colon
            ],
        }
    )
    out = (
        json_field_int(rd.from_pandas(df).repartition(3), "props", "k", "k")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["k"].tolist()[:2] == [87, -3]
    assert pd.isna(out["k"][2]) and pd.isna(out["k"][3])
    assert out["k"][4] == 0 and out["k"][5] == 12
    assert "props" not in out.columns


@pytest.mark.parametrize("nparts", [1, 4])
def test_unpivot_matches_melt(ray_session, nparts):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import unpivot

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "id": np.arange(50, dtype=np.int64),
            "a": rng.randint(0, 100, 50).astype(np.int64),
            "b": rng.randint(0, 100, 50).astype(np.int64),
        }
    )
    out = (
        unpivot(rd.from_pandas(df).repartition(nparts), ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "measure"])
        .reset_index(drop=True)
    )
    exp = (
        df.melt(["id"], ["a", "b"], var_name="measure", value_name="value")
        .astype({"value": "int64"})
        .sort_values(["id", "measure"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    assert len(out) == 100


def test_histogram_matches_numpy(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import histogram

    ev = _events()
    # include a negative value so floor (not truncation) semantics are hit
    ev.loc[0, "value"] = -7.5
    out = histogram(
        rd.from_pandas(ev[["value"]]).repartition(5), "value", width=25.0
    ).to_pandas()
    bins = np.floor(ev["value"].to_numpy() / 25.0).astype(np.int64)
    u, n = np.unique(bins, return_counts=True)
    exp = pd.DataFrame({"bin": u, "n": n.astype(np.int64)})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    assert out["bin"].min() == -1


def _daily(ev):
    b = pd.DataFrame(
        {
            "event_type": ev["event_type"],
            "day": ev["ts"].astype("datetime64[s]").astype("int64") // 86400,
        }
    )
    return (
        b.groupby(["event_type", "day"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )


def test_window_deltas_matches_pandas(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import window_deltas

    ev = _events()
    out = (
        window_deltas(rd.from_pandas(ev).repartition(5))
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    exp = _daily(ev).sort_values(["event_type", "day"]).reset_index(drop=True)
    prev = exp.groupby("event_type")["n"].shift(1)
    exp["delta"] = (exp["n"] - prev).fillna(0).astype("int64")
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(out, exp)


def test_dense_counts_fills_gaps(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import dense_counts

    # sparse: events on days 0, 3 only for one type
    ev = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "user_id": np.zeros(3, dtype=np.int64),
            "ts": pd.to_datetime(["2025-01-01", "2025-01-01", "2025-01-04"]),
            "event_type": ["view", "view", "view"],
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = (
        dense_counts(rd.from_pandas(ev).repartition(2))
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    assert len(out) == 4  # days d, d+1, d+2, d+3
    assert out["n"].tolist() == [2, 0, 0, 1]
    days = out["day"].to_numpy()
    assert (np.diff(days) == 1).all()


def test_tpch_q3_matches_pandas(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import tpch_q3

    sf = "/root/testdata/sf0.001"
    cust = rd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    li = rd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    out = tpch_q3(cust, orders, li, "BUILDING", "1998-06-01", k=10,
                  num_buckets=8).to_pandas()

    c = pd.read_parquet(f"{sf}/customer.parquet")
    o = pd.read_parquet(f"{sf}/orders.parquet")
    l = pd.read_parquet(f"{sf}/lineitem.parquet")
    cut = pd.Timestamp("1998-06-01")
    l = l[l["l_shipdate"] > cut].copy()
    l["rev"] = np.floor(
        l["l_extendedprice"].to_numpy() * (1.0 - l["l_discount"].to_numpy())
        * 100.0
    ).astype(np.int64)
    rev = l.groupby("l_orderkey", as_index=False)["rev"].sum()
    oo = o[(o["o_orderdate"] < cut)
           & o["o_custkey"].isin(c[c["c_mktsegment"] == "BUILDING"]
                                 ["c_custkey"])]
    j = rev.merge(oo, left_on="l_orderkey", right_on="o_orderkey")
    j["o_orderdate_s"] = (
        j["o_orderdate"].astype("datetime64[s]").astype("int64")
    )
    exp = (
        j.sort_values(["rev", "o_orderdate_s", "l_orderkey"],
                      ascending=[False, True, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert out["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert out["revenue_cents"].tolist() == exp["rev"].tolist()


def test_anomaly_days_flags_planted_spike(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import anomaly_days

    # 1 event/day for 14 days, then a 10-event day -> spike
    rows = []
    eid = 0
    for d in range(14):
        rows.append((eid, 0, pd.Timestamp("2025-01-01")
                     + pd.Timedelta(days=d), "view", 1.0)); eid += 1
    for _ in range(10):
        rows.append((eid, 0, pd.Timestamp("2025-01-15"), "view", 1.0))
        eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type", "value"])
    out = (
        anomaly_days(rd.from_pandas(ev).repartition(3), trail=7, factor=2,
                     num_buckets=4)
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    # days 8..15 of the range emitted (full windows)
    assert len(out) == 8
    assert out["is_spike"].tolist() == [0] * 7 + [1]
    spike = out.iloc[-1]
    assert spike["n"] == 10 and spike["trail_sum"] == 7


def test_mode_per_group_tie_break(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import mode_per_group

    ev = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
            "ts": pd.to_datetime(["2025-01-01"] * 6),
            "event_type": ["view", "view", "click", "click", "b", "a"],
            "value": np.ones(6),
        }
    )
    out = (
        mode_per_group(rd.from_pandas(ev).repartition(3), num_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # user 1: click/view tied 2-2 -> 'click' (lexicographic); user 2: a/b
    # tied 1-1 -> 'a'
    assert out["mode_type"].tolist() == ["click", "a"]
    assert out["n"].tolist() == [2, 1]


def test_forward_fill_carries_last_value(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import forward_fill

    ev = pd.DataFrame(
        {
            "event_id": np.array([0, 1, 2], dtype=np.int64),
            "user_id": np.zeros(3, dtype=np.int64),
            # two events on day 0 (later one wins), gap, then day 3
            "ts": pd.to_datetime(
                ["2025-01-01 01:00", "2025-01-01 02:00", "2025-01-04 05:00"]
            ),
            "event_type": ["view", "view", "view"],
            "value": [1.5, 2.5, 9.0],
        }
    )
    out = (
        forward_fill(rd.from_pandas(ev).repartition(2), num_buckets=4)
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    # day 0 takes the LAST event's value (2500), days 1-2 carry it forward
    assert out["v_milli"].tolist() == [2500, 2500, 2500, 9000]


def test_share_bp_sums_under_10000(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import share_bp

    ev = _events()
    out = share_bp(rd.from_pandas(ev).repartition(5)).to_pandas()
    exp = ev.groupby("event_type").size()
    total = int(exp.sum())
    for _, r in out.iterrows():
        assert r["share_bp"] == r["n"] * 10000 // total
    assert out["n"].sum() == total
    assert 10000 - len(out) < out["share_bp"].sum() <= 10000


def test_attribution_brute_force(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import attribution

    ev = _events()
    ev["event_type"] = np.where(
        np.arange(len(ev)) % 5 == 0, "purchase", ev["event_type"]
    )
    out = (
        attribution(rd.from_pandas(ev).repartition(5), "purchase",
                    num_buckets=8)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # brute force
    exp = []
    b = ev.copy()
    b["s"] = b["ts"].astype("datetime64[s]").astype("int64")
    for uid, g in b.groupby("user_id"):
        g = g.sort_values(["s", "event_id"], kind="mergesort")
        last = None
        for _, r in g.iterrows():
            if r["event_type"] == "purchase":
                if last is not None:
                    exp.append((r["event_id"], uid, r["s"], last))
            else:
                last = r["event_type"]
    exp = pd.DataFrame(
        exp, columns=["event_id", "user_id", "s", "attrib_type"]
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"event_id": "int64", "user_id": "int64", "s": "int64"}),
        exp.astype({"event_id": "int64", "user_id": "int64", "s": "int64"}),
    )


def test_approx_quantile_hist_bin_resolution(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        approx_quantile_hist,
    )

    ev = _events()
    out = approx_quantile_hist(
        rd.from_pandas(ev[["value"]]).repartition(5), "value",
        [2500, 5000, 9900], width=10.0
    ).to_pandas()
    v = np.sort(ev["value"].to_numpy())
    n = len(v)
    for _, r in out.iterrows():
        rank = (r["q_bp"] * n + 9999) // 10000
        exact = v[int(rank) - 1]
        lo = r["bin"] * 10.0
        # the exact quantile falls inside the reported bin
        assert lo <= exact < lo + 10.0


def test_label_centroids_matches_numpy(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.scoring import label_centroids

    rng = np.random.RandomState(5)
    n, d = 60, 8
    emb = pd.DataFrame(
        {
            "label": rng.randint(0, 3, n).astype(np.int64),
            "embedding": [rng.randn(d).astype(np.float32) for _ in range(n)],
        }
    )
    out = label_centroids(
        rd.from_pandas(emb).repartition(4)
    ).to_pandas()
    M = np.floor(
        np.array(emb["embedding"].tolist(), dtype=np.float64) * 1e6
    ).astype(np.int64)
    for lbl in range(3):
        mask = emb["label"].to_numpy() == lbl
        exp = M[mask].sum(axis=0)
        got = out[out["label"] == lbl].sort_values("dim_idx")
        assert got["sum_q"].tolist() == exp.tolist()
        assert (got["n"] == mask.sum()).all()
