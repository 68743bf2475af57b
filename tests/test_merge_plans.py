"""Physical-plan equivalence: every merge plan (auto probe / lazy tree /
hash shuffle) and the disjoint-concat combine must produce identical
aggregate CONTENT (set membership + counts), and the sorted-union paths
must be byte-identical regardless of parallelism."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import aggregate, pairs


def _mentions(num_blocks: int):
    """Synthetic mentions with conversations contiguous per block."""
    tables = []
    for b in range(num_blocks):
        rows = []
        for c in range(3):
            conv = f"c{b}_{c}"
            rows += [
                (conv, "op", f"OP:{(b + c) % 4}"),
                (conv, "op", f"OP:{(b * c) % 4}"),
                (conv, "res", f"RES:{c % 2}"),
            ]
        tables.append(
            pa.table(
                {
                    "conv_id": pa.array([r[0] for r in rows]),
                    "entity_type": pa.array([r[1] for r in rows]),
                    "entity_id": pa.array([r[2] for r in rows]),
                }
            )
        )
    return rd.from_arrow(tables)


def _norm_triples(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["conv_ids"] = df["conv_ids"].map(
        lambda s: ";;;".join(sorted(s.split(";;;")))
    )
    return df.sort_values(["subj_id", "obj_id"]).reset_index(drop=True)[
        sorted(df.columns)
    ]


def test_triples_plans_agree():
    m = _mentions(6)
    base = None
    for kwargs in (
        dict(conv_partitioned=False),
        dict(conv_partitioned=True),
        dict(conv_partitioned=True, merge_plan="tree"),
        dict(conv_partitioned=True, merge_plan="shuffle"),
    ):
        out = _norm_triples(
            pairs.triples(m, "op", "res", "applies_to", 8, **kwargs).to_pandas()
        )
        if base is None:
            base = out
        else:
            pd.testing.assert_frame_equal(base, out)


def test_entity2conv_disjoint_matches_union():
    m = _mentions(5)
    ref = aggregate.entity2conv(m, 8).to_pandas()
    fast = aggregate.entity2conv(m, 8, disjoint_blocks=True).to_pandas()

    def norm(df):
        df = df.copy()
        df["conv_ids"] = df["conv_ids"].map(
            lambda s: ";;;".join(sorted(s.split(";;;")))
        )
        return df.sort_values("entity_id").reset_index(drop=True)[sorted(df.columns)]

    pd.testing.assert_frame_equal(norm(ref), norm(fast))


def test_sorted_union_is_parallelism_invariant():
    # same rows, different block layouts -> byte-identical default output
    a = aggregate.conv2entity(_mentions(4), 4).to_pandas()
    b = aggregate.conv2entity(_mentions(4).repartition(2), 4).to_pandas()
    a = a.sort_values("conv_id").reset_index(drop=True)
    b = b.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_provenance_paths_match_exact_support():
    m = _mentions(6)
    edges, prov = pairs.triples_bucketed(m, "op", "res", "applies_to", 8)
    ref = pairs.triples(m, "op", "res", "applies_to", 8).to_pandas()
    e = edges.to_pandas().sort_values(["subj_id", "obj_id"]).reset_index(drop=True)
    r = (
        ref[["subj_id", "pred", "obj_id", "support"]]
        .sort_values(["subj_id", "obj_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(e[["subj_id", "pred", "obj_id", "support"]], r)
    # union of provenance buckets == the full conv set per pair
    pv = prov.to_pandas()
    got = (
        pv.groupby(["subj_id", "obj_id"])["conv_ids"]
        .agg(lambda s: ";;;".join(sorted(";;;".join(s).split(";;;"))))
        .reset_index()
    )
    want = ref[["subj_id", "obj_id", "conv_ids"]].copy()
    want["conv_ids"] = want["conv_ids"].map(
        lambda s: ";;;".join(sorted(s.split(";;;")))
    )
    merged = got.merge(want, on=["subj_id", "obj_id"], suffixes=("_b", "_r"))
    assert (merged["conv_ids_b"] == merged["conv_ids_r"]).all()

    nodes, nprov = aggregate.entity2conv_bucketed(m, 8)
    nref = aggregate.entity2conv(m, 8).to_pandas()
    n = nodes.to_pandas().sort_values("entity_id").reset_index(drop=True)
    nr = (
        nref[["entity_id", "entity_type", "support"]]
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        n[["entity_id", "entity_type", "support"]], nr
    )


def test_bucketed_exact_under_block_straddle():
    """A conversation whose rows straddle two blocks — including its subj
    and obj falling into DIFFERENT fragments — must still produce exact
    support in the bucketed paths (boundary convs go through the exact
    general path)."""
    b1 = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "cX"]),
            "entity_type": pa.array(["op", "res", "op"]),
            "entity_id": pa.array(["OP:A", "RES:X", "OP:A"]),
        }
    )
    b2 = pa.table(
        {
            "conv_id": pa.array(["cX", "c2", "c2"]),
            "entity_type": pa.array(["res", "op", "res"]),
            "entity_id": pa.array(["RES:X", "OP:A", "RES:X"]),
        }
    )
    m = rd.from_arrow([b1, b2])
    edges, prov = pairs.triples_bucketed(m, "op", "res", "applies_to", 4)
    e = edges.to_pandas()
    assert e["support"].tolist() == [3]  # c1, c2, AND the straddled cX
    convs = sorted(set(";;;".join(prov.to_pandas()["conv_ids"]).split(";;;")))
    assert convs == ["c1", "c2", "cX"]
    nodes, _ = aggregate.entity2conv_bucketed(m, 4)
    assert sorted(nodes.to_pandas()["support"]) == [3, 3]


def test_fused_nodes_and_triples_matches_separate_paths():
    """kg.nodes_and_triples_bucketed (one fused per-block pass + one
    kind-combined count merge) must equal the two separate bucketed
    consumers — edges, nodes, AND the unioned provenance."""
    from bio_re_with_entity_embeddings_ray.pipelines import kg

    m = _mentions(6)
    edges, nodes, pp, np_, tagged = kg.nodes_and_triples_bucketed(
        m, "op", "res", "applies_to", 8, assume_unsplit_blocks=True
    )
    ref_e = pairs.triples(m, "op", "res", "applies_to", 8).to_pandas()
    e = edges.to_pandas().sort_values(["subj_id", "obj_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        e[["subj_id", "pred", "obj_id", "support"]],
        ref_e[["subj_id", "pred", "obj_id", "support"]]
        .sort_values(["subj_id", "obj_id"])
        .reset_index(drop=True),
    )
    ref_n = aggregate.entity2conv(m, 8).to_pandas()
    n = nodes.to_pandas().sort_values("entity_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        n[["entity_id", "entity_type", "support"]],
        ref_n[["entity_id", "entity_type", "support"]]
        .sort_values("entity_id")
        .reset_index(drop=True),
    )
    # provenance union per pair == the exact conv sets
    pv = pp.to_pandas()
    got = (
        pv.groupby(["subj_id", "obj_id"])["conv_ids"]
        .agg(lambda s: ";;;".join(sorted(";;;".join(s).split(";;;"))))
        .reset_index()
    )
    want = ref_e[["subj_id", "obj_id", "conv_ids"]].copy()
    want["conv_ids"] = want["conv_ids"].map(
        lambda s: ";;;".join(sorted(s.split(";;;")))
    )
    merged = got.merge(want, on=["subj_id", "obj_id"], suffixes=("_f", "_r"))
    assert len(merged) == len(want)
    assert (merged["conv_ids_f"] == merged["conv_ids_r"]).all()
    assert tagged.count() == pp.count() + np_.count()

    # the exact (assume_unsplit_blocks=False) delegation agrees too
    e2, n2, _, _, tg = kg.nodes_and_triples_bucketed(
        m, "op", "res", "applies_to", 8, assume_unsplit_blocks=False
    )
    assert tg is None
    pd.testing.assert_frame_equal(
        e2.to_pandas().sort_values(["subj_id", "obj_id"]).reset_index(drop=True)[
            ["subj_id", "pred", "obj_id", "support"]
        ],
        e[["subj_id", "pred", "obj_id", "support"]],
    )
    pd.testing.assert_frame_equal(
        n2.to_pandas().sort_values("entity_id").reset_index(drop=True)[
            ["entity_id", "entity_type", "support"]
        ],
        n[["entity_id", "entity_type", "support"]],
    )


def test_pivot_counts_matches_pandas_pivot(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import pivot_counts

    rng = np.random.RandomState(8)
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 40, 800).astype(np.int64),
            "t": rng.choice(["a", "b", "c"], 800),
        }
    )
    # static column set, including a value absent from the data
    got = (
        pivot_counts(
            rd.from_pandas(df).repartition(5), "g", "t",
            values=["a", "b", "c", "zzz"], num_buckets=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.assign(n=1)
        .pivot_table(index="g", columns="t", values="n", aggfunc="sum",
                     fill_value=0)
        .reindex(columns=["a", "b", "c", "zzz"], fill_value=0)
        .reset_index()
    )
    exp.columns = ["g", "n_a", "n_b", "n_c", "n_zzz"]
    pd.testing.assert_frame_equal(got, exp.astype({c: "int64" for c in exp.columns}))
    # discovery path (values=None) agrees on the observed vocabulary
    disc = (
        pivot_counts(rd.from_pandas(df).repartition(5), "g", "t", num_buckets=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(disc, got.drop(columns=["n_zzz"]))


def test_keep_latest_matches_row_number(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.aggregate import keep_latest

    rng = np.random.RandomState(12)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 30, 600).astype(np.int64),
            "ts": rng.randint(0, 10_000, 600).astype(np.int64),
            "uid": np.arange(600, dtype=np.int64),
            "payload": rng.randn(600),
        }
    )
    got = (
        keep_latest(rd.from_pandas(df).repartition(5), ["k"], ["ts", "uid"], 4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["k", "ts", "uid"], kind="mergesort")
        .groupby("k", as_index=False, sort=False)
        .tail(1)
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_windowed_topk_and_union_by_name(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.relational import (
        union_by_name,
        windowed_topk,
    )

    rng = np.random.RandomState(5)
    ev = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b", "c", "d"], 800,
                                     p=[0.5, 0.3, 0.15, 0.05]),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 4 * 3600, 800), unit="s"),
        }
    )
    got = (
        windowed_topk(rd.from_pandas(ev).repartition(4), 3600, 2, 4)
        .to_pandas()
        .sort_values(["window_start", "rank"])
        .reset_index(drop=True)
    )
    e = ev.assign(w=(ev["ts"].astype("datetime64[s]").astype("int64") // 3600) * 3600)
    exp_rows = []
    for w, grp in e.groupby("w"):
        c = grp["event_type"].value_counts()
        top = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:2]
        for r, (t, n) in enumerate(top, 1):
            exp_rows.append((w, t, n, r))
    exp = pd.DataFrame(exp_rows, columns=["window_start", "event_type", "n", "rank"])
    pd.testing.assert_frame_equal(got, exp.astype(
        {"window_start": "int64", "n": "int64", "rank": "int64"}))

    a = pd.DataFrame({"x": [1, 2], "y": ["p", "q"]})
    b = pd.DataFrame({"x": [3], "z": [9.5]})
    u = (
        union_by_name(rd.from_pandas(a), rd.from_pandas(b))
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert list(u.columns) == ["x", "y", "z"]
    assert u["y"].tolist()[:2] == ["p", "q"] and u["y"].isna().tolist()[2]
    assert u["z"].isna().tolist()[:2] == [True, True] and u["z"].iloc[2] == 9.5
