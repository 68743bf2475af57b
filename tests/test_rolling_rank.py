"""rolling_per_key (ROWS BETWEEN k PRECEDING AND CURRENT ROW) and
global_rank (distributed ROW_NUMBER / equi-depth tiles): brute-force
property checks + parallelism invariance."""

import numpy as np
import pandas as pd
import pytest


def _events(n=300, users=15, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 50_000, n), unit="s"),
            "value": rng.randn(n) * 7,
        }
    )


def _brute_rolling(ev: pd.DataFrame, k: int) -> pd.DataFrame:
    b = ev.copy()
    b["v_milli"] = np.round(b["value"].to_numpy() * 1000).astype(np.int64)
    b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g = b.groupby("user_id", sort=False)["v_milli"]
    b["roll_sum_milli"] = g.rolling(k + 1, min_periods=1).sum().to_numpy().astype(
        np.int64
    )
    b["roll_n"] = g.rolling(k + 1, min_periods=1).count().to_numpy().astype(np.int64)
    return (
        b[["event_id", "user_id", "roll_n", "roll_sum_milli"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("num_buckets", [4, 16])
def test_rolling_matches_pandas_rolling(ray_session, num_buckets):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import rolling_per_key

    ev = _events()
    out = (
        rolling_per_key(rd.from_pandas(ev).repartition(5), k=4, num_buckets=num_buckets)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _brute_rolling(ev, 4))


def test_rolling_duplicate_timestamps_tiebreak(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import rolling_per_key

    # every event same user, same ts: order falls back to event_id
    ev = pd.DataFrame(
        {
            "event_id": np.array([3, 1, 2, 0], dtype=np.int64),
            "user_id": np.zeros(4, dtype=np.int64),
            "ts": pd.to_datetime(["2025-01-01"] * 4),
            "value": np.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    out = (
        rolling_per_key(rd.from_pandas(ev), k=1, num_buckets=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event_id order: 0(v=4000), 1(v=2000), 2(v=3000), 3(v=1000); window=2
    assert out["roll_sum_milli"].tolist() == [4000, 6000, 5000, 4000]
    assert out["roll_n"].tolist() == [1, 2, 2, 2]


@pytest.mark.parametrize("num_ranges", [3, 16])
def test_global_rank_matches_argsort(ray_session, num_ranges):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.ordered import global_rank

    rng = np.random.RandomState(5)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "n_chars": rng.randint(0, 25, 120).astype(np.int64),
        }
    )
    out = (
        global_rank(
            rd.from_pandas(docs).repartition(6),
            ["n_chars", "doc_id"],
            num_ranges=num_ranges,
            tiles=10,
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    exp = docs.sort_values(["n_chars", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )
    assert out["rank"].tolist() == list(range(1, 121))
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["tile"].tolist() == [(r - 1) * 10 // 120 for r in out["rank"]]
    # equi-depth: every tile has exactly 12 rows
    assert out["tile"].value_counts().tolist() == [12] * 10


def test_robust_outliers_matches_numpy_median_mad(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        robust_outliers,
    )

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.randn(500), [40.0, -35.0, 60.0]])  # planted
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(vals), dtype=np.int64),
            "value": vals,
        }
    )
    got = (
        robust_outliers(rd.from_pandas(ev).repartition(4), k=3, num_buckets=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    v = np.round(vals * 1000).astype(np.int64)
    n = len(v)
    pos = max(1, -(-5000 * n // 10000)) - 1
    med = np.sort(v)[pos]
    dev = np.abs(v - med)
    mad = np.sort(dev)[pos]
    exp_ids = ev["event_id"].to_numpy()[dev > 3 * mad]
    assert got["event_id"].tolist() == sorted(exp_ids)
    # the planted extremes are flagged
    assert {len(vals) - 3, len(vals) - 2, len(vals) - 1} <= set(got["event_id"])


def test_turn_lag_matches_pandas_lag(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import relational

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in rng.randint(0, 30, n)],
            "turn_idx": np.zeros(n, dtype="int32"),
            "role": rng.choice(["user", "assistant", "tool"], n),
            "text": "x",
            "tool": None,
            "ts": pd.to_datetime(
                rng.randint(0, 10**6, n) * 1_000_003, unit="us"
            ),
        }
    )
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype("int32")
    got = (
        relational.turn_lag(rd.from_pandas(df.sample(frac=1, random_state=1)), 4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    g = b.groupby("conv_id", sort=False)
    want = pd.DataFrame(
        {
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"],
            "role": b["role"],
            "prev_role": g["role"].shift(1).fillna(""),
            "gap_ms": (
                b["ts"].astype("datetime64[ms]").astype("int64")
                - b["ts"]
                .astype("datetime64[ms]")
                .astype("int64")
                .groupby(b["conv_id"], sort=False)
                .shift(1)
            ).fillna(-1).astype("int64"),
        }
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_rank_in_group_matches_pandas_with_ties(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import relational

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            # coarse grid forces plenty of exact v_milli ties per user
            "value": rng.integers(0, 5, n) / 2.0,
        }
    )
    out = (
        relational.rank_in_group(rd.from_pandas(df), num_buckets=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    v = np.round(df["value"].to_numpy() * 1000).astype(np.int64)
    exp = df.assign(v_milli=v)
    g = exp.groupby("user_id")["v_milli"]
    exp["rank"] = g.rank(method="min", ascending=False).astype(np.int64)
    exp["dense_rank"] = g.rank(method="dense", ascending=False).astype(np.int64)
    size = exp.groupby("user_id")["v_milli"].transform("size").to_numpy()
    exp["pr_bp"] = np.where(
        size > 1,
        (exp["rank"].to_numpy() - 1) * 10000 // np.maximum(size - 1, 1),
        0,
    ).astype(np.int64)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["event_id", "user_id", "rank", "dense_rank", "pr_bp"]],
        exp[["event_id", "user_id", "rank", "dense_rank", "pr_bp"]],
    )
