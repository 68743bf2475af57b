"""Curation pipeline: each drop reason (short, low-distinct spam, exact
dup), keep-min-id dedup, and budget consistency."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bio_re_with_entity_embeddings_ray.pipelines import curate


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        "one clean document with enough distinct words",  # dup, HIGHER id
                        "too short",
                        "one clean document with enough distinct words",  # kept (min id)
                        "a a a a a a a a",
                        "another clean document with different words here",
                    ]
                ),
            }
        )
    )


def test_curate_drops_and_dedups():
    cur = curate.curate(_docs(), num_buckets=4).to_pandas()
    assert sorted(cur["doc_id"]) == [3, 5]  # min-id kept for the dup pair
    assert sorted(cur["n_tokens"]) == [7, 7]


def test_budget_matches_curated():
    cur = curate.curate(_docs(), num_buckets=4)
    b = curate.token_budget(cur).to_pandas()
    assert len(b) == 1
    assert int(b["n_docs"][0]) == 2
    assert int(b["total_tokens"][0]) == 14


def test_empty_corpus():
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert curate.curate(empty, num_buckets=2).count() == 0
    b = curate.token_budget(curate.curate(empty, num_buckets=2)).to_pandas()
    assert int(b["total_tokens"][0]) == 0


def test_cache_modes_agree_and_validate():
    import pytest

    a = curate.curate(_docs(), num_buckets=4, cache="cache").to_pandas()
    b = curate.curate(_docs(), num_buckets=4, cache="recompute").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"]) == [3, 5]
    with pytest.raises(ValueError, match="cache"):
        curate.curate(_docs(), num_buckets=4, cache="bogus").to_pandas()


import pytest  # noqa: E402


@pytest.mark.parametrize("plan", ["broadcast", "hash"])
def test_curate_join_plans_agree(plan):
    """The keep-set pass must be plan-equivalent: broadcast set filter and
    co-partitioned hash semi-join produce identical curated rows."""
    out = (
        curate.curate(_docs(), num_buckets=4, join_plan=plan)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["doc_id"]) == [3, 5]
    assert list(out["n_tokens"]) == [7, 7]
    assert list(out.columns) == ["doc_id", "text", "n_tokens"]


@pytest.mark.parametrize("plan", ["broadcast", "hash"])
def test_curate_neardup_join_plans_agree(plan):
    """Same plan equivalence for the anti-join drop-set pass of
    curate_neardup (near-identical docs collapse to the min-id rep)."""
    import pyarrow as pa
    import ray.data as rd

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon zeta",
                        "alpha beta gamma delta epsilon zeta",  # near-dup of 1
                        "totally different words in this document here",
                    ]
                ),
            }
        )
    )
    out = (
        curate.curate_neardup(docs, num_buckets=4, join_plan=plan, cc_method="dataset")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["doc_id"]) == [1, 3]


def test_curate_auto_flips_to_hash_past_key_cap():
    # broadcast_max_keys=1 forces the hash plan through the auto probe
    out = (
        curate.curate(_docs(), num_buckets=4, broadcast_max_keys=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["doc_id"]) == [3, 5]


def test_curate_incremental_drops_prior_content(ray_session):
    import hashlib

    from bio_re_with_entity_embeddings_ray.pipelines import curate as cur

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "brand new document with fresh content here",
                "seen yesterday exact same content as before",
                "another brand new one with different words",
                "seen yesterday exact same content as before",  # in-batch dup of prior
                "x",                                             # fails quality
            ],
        }
    )
    prior = pd.DataFrame(
        {
            "content_md5": [
                hashlib.md5(
                    b"seen yesterday exact same content as before"
                ).hexdigest()
            ]
        }
    )
    out = (
        cur.curate_incremental(
            rd.from_pandas(docs), rd.from_pandas(prior), num_buckets=4
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["doc_id"]) == [0, 2]
