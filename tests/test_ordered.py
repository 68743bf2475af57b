"""Ordered operators (prefix scan, sequence packing, deterministic
shuffle) pinned to brute-force references, including skewed and
non-contiguous order keys."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array
from bio_re_with_entity_embeddings_ray.stages import ordered


def test_ranged_prefix_scan_matches_cumsum(ray_session):
    rng = np.random.RandomState(2)
    # non-contiguous, unsorted ids; values with zeros
    ids = rng.permutation(np.arange(0, 3000, 7, dtype=np.int64))[:300]
    vals = rng.randint(0, 9, size=len(ids)).astype(np.int64)
    df = pd.DataFrame({"k": ids, "v": vals})
    out = (
        ordered.ranged_prefix_scan(rd.from_pandas(df), ["k"], "v", num_ranges=5)
        .to_pandas()
        .set_index("k")
    )
    srt = df.sort_values("k")
    expect = srt["v"].cumsum() - srt["v"]
    for k, e in zip(srt["k"], expect):
        assert out.loc[k, "prefix_excl"] == e


def test_ranged_prefix_scan_skewed_key(ray_session):
    # 90% of rows share one tiny key region: correctness must hold even
    # when ranging is badly unbalanced
    ids = np.concatenate(
        [np.arange(100, dtype=np.int64), np.array([1_000_000], dtype=np.int64)]
    )
    vals = np.ones(len(ids), dtype=np.int64)
    df = pd.DataFrame({"k": ids, "v": vals})
    out = (
        ordered.ranged_prefix_scan(rd.from_pandas(df), ["k"], "v", num_ranges=4)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert list(out["prefix_excl"]) == list(range(len(ids)))


def test_pack_sequences_layout(ray_session):
    texts = ["a b c", "d e", "f g h i j", "", "k l m n"]
    # token counts: 3, 2, 5, 1, 4 -> starts 0, 3, 5, 10, 11 (budget 4)
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
    out = (
        ordered.pack_sequences(rd.from_pandas(df), budget=4, num_ranges=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out["n_tokens"]) == [3, 2, 5, 1, 4]
    assert list(out["seq_id"]) == [0, 0, 1, 2, 2]
    assert list(out["offset_in_seq"]) == [0, 3, 1, 2, 3]


def test_deterministic_shuffle_is_a_permutation_and_stable(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    a = (
        ordered.deterministic_shuffle(rd.from_pandas(df), salt="s1", num_ranges=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    b = (
        ordered.deterministic_shuffle(rd.from_pandas(df), salt="s1", num_ranges=7)
        .to_pandas()
        .sort_values("doc_id")
    )
    # permutation of 0..n-1, identical across different parallelism
    assert sorted(a["shuffle_pos"]) == list(range(200))
    assert list(a["shuffle_pos"]) == list(b["shuffle_pos"])
    # matches the definitional order
    h = md5int8_array([f"s1:{i}" for i in range(200)])
    rank = np.empty(200, dtype=np.int64)
    rank[np.lexsort((np.arange(200), h))] = np.arange(200)
    assert list(a["shuffle_pos"]) == list(rank)
    # a different salt gives a different permutation
    c = (
        ordered.deterministic_shuffle(rd.from_pandas(df), salt="s2", num_ranges=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(c["shuffle_pos"]) != list(a["shuffle_pos"])


def test_pack_sequences_shuffled_matches_shuffle_order(ray_session):
    texts = ["a b c", "d e", "f g h i j", "k", "l m n o"]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
    out = (
        ordered.pack_sequences_shuffled(
            rd.from_pandas(df), budget=4, salt="e1", num_ranges=2
        )
        .to_pandas()
        .set_index("doc_id")
    )
    # brute force: order docs by (hash, id), cumsum
    h = md5int8_array([f"e1:{i}" for i in range(5)])
    order = np.lexsort((np.arange(5), h))
    n_tok = np.array([3, 2, 5, 1, 4])
    start = 0
    for i in order:
        assert out.loc[i, "seq_id"] == start // 4, i
        assert out.loc[i, "offset_in_seq"] == start % 4, i
        start += n_tok[i]
