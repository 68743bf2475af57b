"""Semi/anti join physical-plan equivalence: broadcast and hash
co-partition plans must produce identical rows (J3 scale note)."""

import pandas as pd
import pytest
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import relational


def _tables():
    cust = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4, 5, 6],
            "c_name": [f"c{i}" for i in range(1, 7)],
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": [1, 1, 2, 4, 5, 5, 6],
            "o_orderstatus": ["F", "O", "F", "O", "F", "F", "P"],
        }
    )
    return rd.from_pandas(cust), rd.from_pandas(orders)


@pytest.mark.parametrize("plan", ["broadcast", "hash", "auto"])
def test_semi_join_plans_agree(ray_session, plan):
    cust, orders = _tables()
    out = (
        relational.semi_join_customers(cust, orders, "F", plan=plan, num_buckets=4)
        .to_pandas()
        .sort_values("c_custkey")
    )
    assert list(out["c_custkey"]) == [1, 2, 5]
    assert list(out["c_name"]) == ["c1", "c2", "c5"]


@pytest.mark.parametrize("plan", ["broadcast", "hash", "auto"])
def test_anti_join_plans_agree(ray_session, plan):
    cust, orders = _tables()
    out = (
        relational.anti_join_customers(cust, orders, "F", plan=plan, num_buckets=4)
        .to_pandas()
        .sort_values("c_custkey")
    )
    assert list(out["c_custkey"]) == [3, 4, 6]


def test_auto_flips_to_hash_when_keys_exceed_cap(ray_session):
    cust, orders = _tables()
    # broadcast_max_keys=1 forces the hash plan through the auto probe
    out = (
        relational.semi_join_customers(
            cust, orders, "F", plan="auto", num_buckets=4, broadcast_max_keys=1
        )
        .to_pandas()
        .sort_values("c_custkey")
    )
    assert list(out["c_custkey"]) == [1, 2, 5]


def test_hopping_window_rejects_non_multiple_hop(ray_session):
    ev = rd.from_pandas(
        pd.DataFrame({"event_type": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "value": [1.0]})
    )
    with pytest.raises(ValueError, match="multiple"):
        relational.hopping_window(ev, width_s=3600, hop_s=1000)


def _ev(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_s", "event_type"])
    df["ts"] = pd.to_datetime(df["ts_s"], unit="s")
    return rd.from_pandas(df[["event_id", "user_id", "ts", "event_type"]])


def test_asof_join_edges(ray_session):
    ev = _ev(
        [
            (1, 7, 100, "signup"),   # marker
            (2, 7, 100, "click"),    # exact-match ts -> matches marker 1
            (3, 7, 50, "view"),      # before first marker -> -1
            (4, 7, 200, "signup"),   # second marker
            (5, 7, 201, "click"),    # -> marker 4, lag 1
            (6, 8, 300, "click"),    # user with no markers -> -1
            (7, 9, 400, "signup"),
            (8, 9, 400, "signup"),   # tie on (user, ts): max event_id wins
            (9, 9, 401, "click"),
        ]
    )
    out = (
        relational.asof_join_events(ev, "signup", num_buckets=4)
        .to_pandas()
        .set_index("event_id")
    )
    assert out.loc[2, "ref_event_id"] == 1 and out.loc[2, "lag_s"] == 0
    assert out.loc[3, "ref_event_id"] == -1 and out.loc[3, "lag_s"] == -1
    assert out.loc[5, "ref_event_id"] == 4 and out.loc[5, "lag_s"] == 1
    assert out.loc[6, "ref_event_id"] == -1
    assert out.loc[9, "ref_event_id"] == 8  # deterministic tie-break
    # markers also appear as left rows and match themselves (ts equality)
    assert out.loc[1, "ref_event_id"] == 1 and out.loc[4, "ref_event_id"] == 4


def test_range_join_boundaries(ray_session):
    orders = rd.from_pandas(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_totalprice": [0.0, 49_999.99, 50_000.0, 299_999.5],
            }
        )
    )
    out = (
        relational.range_join_orders(orders)
        .to_pandas()
        .set_index("o_orderkey")["band_id"]
    )
    assert out[1] == 0       # lo inclusive
    assert out[2] == 0       # 49999.99 floors to 49999 -> band 0
    assert out[3] == 1       # hi exclusive: 50000 starts band 1
    assert out[4] == 2


def test_hash_join_plans_agree(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 40, size=500).astype(np.int64),
            "a": rng.randint(0, 1000, size=500).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.arange(0, 50, dtype=np.int64),  # some keys unmatched
            "b": np.arange(100, 150, dtype=np.int64),
        }
    )
    outs = {}
    for plan in ("broadcast", "hash"):
        outs[plan] = (
            hash_join(
                rd.from_pandas(left).repartition(4),
                rd.from_pandas(right).repartition(2),
                "k",
                "rk",
                plan=plan,
                num_buckets=4,
            )
            .to_pandas()
            .sort_values(["k", "a", "b"])
            .reset_index(drop=True)
        )
        assert sorted(outs[plan].columns) == ["a", "b", "k"]
    pd.testing.assert_frame_equal(
        outs["broadcast"][["k", "a", "b"]], outs["hash"][["k", "a", "b"]]
    )
    # inner semantics: every row's key is a right-side key
    assert outs["broadcast"]["k"].isin(right["rk"]).all()


def test_left_join_plans_agree_with_unmatched_rows(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    rng = np.random.RandomState(9)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 40, size=300).astype(np.int64),
            "a": np.arange(300, dtype=np.int64),
        }
    )
    right = pd.DataFrame(  # keys 20..39 are unmatched on the left side
        {
            "rk": np.arange(0, 20, dtype=np.int64),
            "b": np.arange(500, 520, dtype=np.int64),
        }
    )
    outs = {}
    for plan in ("broadcast", "hash"):
        df = (
            hash_join(
                rd.from_pandas(left).repartition(4),
                rd.from_pandas(right).repartition(2),
                "k",
                "rk",
                plan=plan,
                num_buckets=4,
                how="left",
            )
            .to_pandas()
        )
        df["b"] = df["b"].fillna(-1).astype("int64")
        outs[plan] = df.sort_values(["k", "a"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        outs["broadcast"][["k", "a", "b"]], outs["hash"][["k", "a", "b"]]
    )
    # every left row survives exactly once (right side is unique-keyed)
    assert len(outs["broadcast"]) == len(left)
    unmatched = outs["broadcast"]["k"] >= 20
    assert unmatched.any()
    assert (outs["broadcast"].loc[unmatched, "b"] == -1).all()
    assert (outs["broadcast"].loc[~unmatched, "b"] >= 500).all()


def test_full_outer_join_unmatched_both_sides(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    left = pd.DataFrame(
        {
            "k": np.array([0, 1, 2, 2, 5], dtype=np.int64),  # 5 unmatched
            "a": np.arange(5, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.array([1, 2, 9], dtype=np.int64),  # 9 unmatched
            "b": np.array([100, 200, 900], dtype=np.int64),
        }
    )
    out = (
        hash_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            "k",
            "rk",
            plan="auto",  # auto must force the hash plan for outer
            num_buckets=4,
            how="outer",
        )
        .to_pandas()
    )
    out["a"] = out["a"].fillna(-1).astype("int64")
    out["b"] = out["b"].fillna(-1).astype("int64")
    out = out.sort_values(["k", "a", "b"]).reset_index(drop=True)
    exp = (
        left.merge(right, left_on="k", right_on="rk", how="outer")
        .assign(k=lambda d: d["k"].fillna(d["rk"]).astype("int64"))
        .drop(columns=["rk"])
        .fillna(-1)
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "a", "b"]], exp[["k", "a", "b"]])
    # the unmatched-right row survived with its key coalesced
    assert (out["k"] == 9).sum() == 1
    assert out.loc[out["k"] == 9, "a"].item() == -1
    # broadcast plan must refuse outer joins
    with pytest.raises(ValueError, match="broadcast"):
        hash_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            "k",
            "rk",
            plan="broadcast",
            how="outer",
        )


def test_right_join_unmatched_right_rows(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    left = pd.DataFrame(
        {
            "k": np.array([1, 2, 2], dtype=np.int64),
            "a": np.arange(3, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.array([1, 2, 9], dtype=np.int64),  # 9 unmatched
            "b": np.array([100, 200, 900], dtype=np.int64),
        }
    )
    out = (
        hash_join(
            rd.from_pandas(left).repartition(2),
            rd.from_pandas(right).repartition(2),
            "k",
            "rk",
            plan="auto",  # auto must force the hash plan for right joins
            num_buckets=4,
            how="right",
        )
        .to_pandas()
    )
    out["a"] = out["a"].fillna(-1).astype("int64")
    out = out.sort_values(["k", "a", "b"]).reset_index(drop=True)
    exp = (
        left.merge(right, left_on="k", right_on="rk", how="right")
        .assign(k=lambda d: d["k"].fillna(d["rk"]).astype("int64"))
        .drop(columns=["rk"])
        .fillna(-1)
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "a", "b"]], exp[["k", "a", "b"]])
    assert (out["k"] == 9).any()  # unmatched right row survived

    with pytest.raises(ValueError):
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
            plan="broadcast", how="right",
        )


def test_bloom_semi_join_superset_and_exact_mirror(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        BLOOM_K,
        BLOOM_M,
        bloom_semi_join,
    )

    rng = np.random.RandomState(9)
    big = pd.DataFrame(
        {"k": rng.randint(0, 10_000, 2_000).astype(np.int64)}
    )
    keys = pd.DataFrame({"k": rng.randint(0, 10_000, 50).astype(np.int64)})
    got = (
        bloom_semi_join(
            rd.from_pandas(big).repartition(4),
            rd.from_pandas(keys).repartition(2),
            "k",
            num_buckets=4,
        )
        .to_pandas()["k"]
        .to_numpy()
    )
    # brute-force bloom with the same hash family
    bits = set()
    for v in keys["k"]:
        for j in range(BLOOM_K):
            bits.add(md5int8(f"bloom{j}:{v}") % BLOOM_M)
    exp = [
        v
        for v in big["k"]
        if all(md5int8(f"bloom{j}:{v}") % BLOOM_M in bits for j in range(BLOOM_K))
    ]
    assert sorted(got) == sorted(exp)
    # no false negatives: every true match survives
    true_matches = big[big["k"].isin(set(keys["k"]))]["k"]
    assert set(true_matches).issubset(set(got))
    # sparse filter => false-positive rate is small but nonzero-capable;
    # survivors are far fewer than the input
    assert len(got) < len(big) * 0.2
