"""pair_lift pinned to a brute-force single-process reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import pairs


def _brute_lift(df: pd.DataFrame, subj_t: str, obj_t: str, scale=10_000):
    b = df[df["entity_type"].isin([subj_t, obj_t])][
        ["conv_id", "entity_type", "entity_id"]
    ].drop_duplicates()
    src = b[b["entity_type"] == subj_t]
    tgt = b[b["entity_type"] == obj_t]
    n_convs = b["conv_id"].nunique()
    ns = src.groupby("entity_id").size()
    nt = tgt.groupby("entity_id").size()
    m = src.merge(tgt, on="conv_id", suffixes=("_s", "_t"))
    rows = []
    for (s, o), g in m.groupby(["entity_id_s", "entity_id_t"]):
        n_pair = g["conv_id"].nunique()
        rows.append(
            (
                s,
                o,
                n_pair,
                int(ns[s]),
                int(nt[o]),
                n_convs,
                scale * n_pair * n_convs // (int(ns[s]) * int(nt[o])),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "subj_id", "obj_id", "n_pair", "n_subj", "n_obj", "n_convs", "lift_bp",
        ],
    ).sort_values(["subj_id", "obj_id"]).reset_index(drop=True)


def test_pair_lift_matches_brute_force(ray_session):
    rng = np.random.RandomState(11)
    n = 600
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in rng.randint(0, 80, n)],
            "entity_type": rng.choice(["op", "res", "tool"], n),
            "entity_id": [f"e{i}" for i in rng.randint(0, 12, n)],
        }
    )
    got = (
        pairs.pair_lift(rd.from_pandas(df), "op", "res", num_buckets=4)
        .to_pandas()
        .sort_values(["subj_id", "obj_id"])
        .reset_index(drop=True)
    )
    want = _brute_lift(df, "op", "res")
    pd.testing.assert_frame_equal(
        got.astype({"n_convs": "int64"}), want.astype(got.dtypes.to_dict())
    )


def test_pair_lift_hot_entity_is_discounted(ray_session):
    # a subj co-occurring with everything has lift ~= scale; a perfectly
    # correlated rare pair has lift >> scale
    rows = []
    for i in range(20):
        rows.append((f"c{i}", "op", "HOT"))
        rows.append((f"c{i}", "res", f"r{i % 4}"))
    rows += [("c0", "op", "RARE"), ("c0", "res", "r0")]
    df = pd.DataFrame(rows, columns=["conv_id", "entity_type", "entity_id"])
    out = pairs.pair_lift(rd.from_pandas(df), "op", "res", num_buckets=2).to_pandas()
    hot = out[out["subj_id"] == "HOT"]["lift_bp"]
    rare = out[(out["subj_id"] == "RARE") & (out["obj_id"] == "r0")]["lift_bp"]
    assert int(rare.iloc[0]) > int(hot.max())
