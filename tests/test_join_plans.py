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
