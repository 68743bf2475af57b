"""Randomized property tests pinning distributed operators to brute-force
single-process references."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import relational, textstats


def test_exact_quantiles_matches_sorted_position(ray_session):
    rng = np.random.RandomState(3)
    for trial in range(3):
        vals = rng.randint(0, [10, 1000, 3][trial] + 1, size=500).astype("int64")
        ds = rd.from_pandas(pd.DataFrame({"v": vals}))
        qs = [1, 2500, 5000, 7500, 9999, 10000]
        out = textstats.exact_quantiles(ds, "v", qs, num_buckets=4)
        srt = np.sort(vals)
        for q, got in zip(out["q_bp"], out["value"]):
            pos = max(1, -(-int(q) * len(vals) // 10000))
            assert got == srt[pos - 1], (trial, q)


def test_exact_quantiles_by_matches_per_group(ray_session):
    rng = np.random.RandomState(5)
    grp = rng.randint(0, 4, size=400)
    vals = rng.randint(0, 50, size=400).astype("int64")
    ds = rd.from_pandas(pd.DataFrame({"g": grp, "v": vals}))
    out = textstats.exact_quantiles_by(ds, "g", "v", [2500, 5000, 7500], num_buckets=4)
    for _, row in out.to_pandas().iterrows():
        gv = np.sort(vals[grp == row["g"]])
        pos = max(1, -(-int(row["q_bp"]) * len(gv) // 10000))
        assert row["value"] == gv[pos - 1]


def _brute_asof(df, marker):
    out = {}
    for _, r in df.iterrows():
        cands = df[
            (df["user_id"] == r["user_id"])
            & (df["event_type"] == marker)
            & (df["ts_s"] <= r["ts_s"])
        ]
        if len(cands):
            best = cands.sort_values(["ts_s", "event_id"]).iloc[-1]
            out[r["event_id"]] = (int(best["event_id"]), int(r["ts_s"] - best["ts_s"]))
        else:
            out[r["event_id"]] = (-1, -1)
    return out


def test_asof_join_matches_brute_force(ray_session):
    rng = np.random.RandomState(9)
    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.randint(0, 8, n),
            "ts_s": rng.randint(0, 500, n),
            "event_type": rng.choice(["m", "x", "y"], n, p=[0.3, 0.4, 0.3]),
        }
    )
    ev = df.copy()
    ev["ts"] = pd.to_datetime(ev["ts_s"], unit="s")
    out = (
        relational.asof_join_events(
            rd.from_pandas(ev[["event_id", "user_id", "ts", "event_type"]]),
            "m",
            num_buckets=4,
        )
        .to_pandas()
        .set_index("event_id")
    )
    want = _brute_asof(df, "m")
    assert len(out) == n
    for eid, (ref, lag) in want.items():
        assert out.loc[eid, "ref_event_id"] == ref, eid
        assert out.loc[eid, "lag_s"] == lag, eid
