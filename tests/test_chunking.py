"""chunk_documents: brute-force parity (incl. unicode, empty docs,
exact-boundary lengths) and stream-shape invariants."""
from __future__ import annotations

import pandas as pd
import pytest


def _brute(df: pd.DataFrame, size: int, overlap: int):
    step = size - overlap
    rows = []
    for _, r in df.iterrows():
        t = r["text"]
        n = len(t)
        m = 1 if n <= size else 1 + -(-(n - size) // step)
        for j in range(m):
            c = t[j * step : j * step + size]
            rows.append((int(r["doc_id"]), j, j * step, len(c), c))
    return pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "start", "chunk_len", "chunk_text"]
    )


@pytest.mark.parametrize("size,overlap", [(120, 24), (8, 3), (5, 0)])
def test_chunk_documents_matches_brute_force(ray_session, size, overlap):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.textstats import chunk_documents

    df = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [
                "",                         # empty -> one empty chunk
                "a" * (size - 1),           # just under one chunk
                "b" * size,                 # exactly one chunk
                "c" * (size + 1),           # just over -> two chunks
                "héllo wörld ありがとう " * 9,  # unicode codepoints
                "x y z " * 40,
                "d" * (2 * size - overlap),  # exactly two full chunks
                "single",
            ],
        }
    )
    out = (
        chunk_documents(rd.from_pandas(df), size=size, overlap=overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    exp = _brute(df, size, overlap).astype(
        {"doc_id": "int64", "chunk_id": "int64", "start": "int64", "chunk_len": "int64"}
    )
    pd.testing.assert_frame_equal(out, exp)


def test_chunk_documents_rejects_full_overlap(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.textstats import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(rd.from_items([{"doc_id": 1, "text": "x"}]), size=4, overlap=4)


def test_skyline_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import relational

    rng = np.random.default_rng(11)
    n = 300
    # coarse grids force price ties and duplicate points
    price = rng.integers(1, 20, n) * 10.0
    days = rng.integers(0, 15, n)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_totalprice": price,
            "o_orderdate": pd.Timestamp("1995-01-01")
            + pd.to_timedelta(days, unit="D"),
        }
    )
    out = (
        relational.skyline(rd.from_pandas(df), fanin=4)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    p = np.round(price * 100).astype(np.int64)
    d = (
        df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
    )
    keep = [
        i
        for i in range(n)
        if not any(
            p[j] >= p[i] and d[j] <= d[i] and (p[j] > p[i] or d[j] < d[i])
            for j in range(n)
        )
    ]
    exp = pd.DataFrame(
        {"o_orderkey": np.array(keep, np.int64), "price_cents": p[keep], "d_days": d[keep]}
    )
    pd.testing.assert_frame_equal(out, exp)


def test_snapshot_diff_classifies_all_three_statuses(ray_session):
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import relational

    old = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha", "beta", "gamma", "delta"],
        }
    )
    new = pd.DataFrame(
        {
            # 2 removed; 3 changed; 5 added; 1 and 4 unchanged
            "doc_id": [1, 3, 4, 5],
            "text": ["alpha", "gamma EDIT", "delta", "epsilon"],
        }
    )
    out = (
        relational.snapshot_diff(
            rd.from_pandas(old), rd.from_pandas(new), num_buckets=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"doc_id": [2, 3, 5], "status": ["removed", "changed", "added"]}
    ).astype({"doc_id": "int64"})
    pd.testing.assert_frame_equal(out, exp)


def test_event_paths_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import relational

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 60, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10000, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase"], n),
        }
    )
    out = (
        relational.event_paths(rd.from_pandas(df), k=3, top=10, num_buckets=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    s["rn"] = s.groupby("user_id").cumcount()
    paths = (
        s[s["rn"] < 3]
        .groupby("user_id")["event_type"]
        .agg(">".join)
        .value_counts()
        .rename_axis("path")
        .reset_index(name="n")
    )
    paths = paths.sort_values(
        ["n", "path"], ascending=[False, True], kind="mergesort"
    ).head(10).reset_index(drop=True).astype({"n": "int64"})
    pd.testing.assert_frame_equal(out, paths[["path", "n"]])
