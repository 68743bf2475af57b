"""Deterministic hash sampling / split / mix: reproducibility, disjoint
split, salt independence."""

import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import sampling


def _docs(n=2000):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": range(n), "text": [f"doc {i}" for i in range(n)]})
    )


def test_sample_deterministic_and_in_rate_ballpark(ray_session):
    a = sampling.hash_sample(_docs(), 2500).to_pandas()
    b = sampling.hash_sample(_docs(), 2500).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # binomial(2000, 0.25): far outside [350, 650] would mean a broken hash
    assert 350 < len(a) < 650


def test_different_salts_give_different_samples(ray_session):
    a = set(sampling.hash_sample(_docs(), 2500, salt="s1").to_pandas()["doc_id"])
    b = set(sampling.hash_sample(_docs(), 2500, salt="s2").to_pandas()["doc_id"])
    assert a != b
    # independent samples overlap ~ rate^2
    assert len(a & b) < len(a)


def test_split_partitions_every_row_once(ray_session):
    train, val = sampling.hash_split(_docs(), 1000)
    t = set(train.to_pandas()["doc_id"])
    v = set(val.to_pandas()["doc_id"])
    assert t.isdisjoint(v)
    assert len(t) + len(v) == 2000
    assert 120 < len(v) < 290  # ~10%


def test_mix_rates(ray_session):
    full = _docs()
    mixed = sampling.mix_corpora(
        [(full, 10000, "a"), (full, 0, "b")]
    ).to_pandas()
    assert len(mixed) == 2000  # rate 10000 keeps all, rate 0 keeps none


def test_rate_validation(ray_session):
    import pytest

    with pytest.raises(ValueError):
        sampling.hash_sample(_docs(), 10001)


def test_cap_per_group_deterministic_and_capped(ray_session):
    import numpy as np

    df = pd.DataFrame(
        {
            "doc_id": range(500),
            "grp": np.arange(500) % 3,  # one hot-ish group per residue
        }
    )
    out1 = sampling.cap_per_group(rd.from_pandas(df), "grp", 10, num_buckets=4).to_pandas()
    out2 = sampling.cap_per_group(
        rd.from_pandas(df.sample(frac=1.0, random_state=5)), "grp", 10, num_buckets=4
    ).to_pandas()
    # cap respected and selection independent of input row order
    assert out1.groupby("grp").size().max() == 10
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])


def test_cap_per_group_small_groups_untouched(ray_session):
    df = pd.DataFrame({"doc_id": range(6), "grp": [0, 0, 1, 1, 2, 2]})
    out = sampling.cap_per_group(rd.from_pandas(df), "grp", 5, num_buckets=2).to_pandas()
    assert len(out) == 6


def test_weighted_sample_is_hash_thresholded(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8
    from bio_re_with_entity_embeddings_ray.stages.sampling import weighted_sample

    rng = np.random.RandomState(6)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3000, dtype=np.int64),
            "w": rng.randint(0, 12000, 3000).astype(np.int64),
        }
    )
    got = (
        weighted_sample(rd.from_pandas(df).repartition(4), "w", key="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    keep = [
        r.doc_id
        for r in df.itertuples()
        if md5int8(f"wsample:{r.doc_id}") % 10000 < min(r.w, 10000)
    ]
    assert got["doc_id"].tolist() == keep
    # weight 0 never kept; weight >= scale always kept
    z = df[df["w"] == 0]["doc_id"]
    assert not set(z) & set(got["doc_id"])
    full = df[df["w"] >= 10000]["doc_id"]
    assert set(full) <= set(got["doc_id"])
    # keep rate tracks mean weight within a few points
    expected_rate = np.minimum(df["w"], 10000).mean() / 10000
    assert abs(len(got) / len(df) - expected_rate) < 0.05
