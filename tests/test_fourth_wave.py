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
