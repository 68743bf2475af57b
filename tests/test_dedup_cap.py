"""Hot-shingle df cap in ngram_jaccard_pairs: a shingle shared by every
document must not generate O(n^2) candidate pairs, while duplicates that
also share RARE shingles are still found."""

import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import dedup


def _corpus(n_docs: int) -> pd.DataFrame:
    # every doc starts with the same 3 tokens (one corpus-wide hot
    # shingle); docs 2i and 2i+1 additionally share a pair-unique tail
    rows = []
    for i in range(n_docs):
        p = i // 2
        rows.append(
            {
                "doc_id": i,
                "text": f"the quick brown t0{p} t1{p} t2{p} t3{p} t4{p} t5{p}",
            }
        )
    return pd.DataFrame(rows)


def test_hot_shingle_cap_bounds_candidates(ray_session):
    # threshold_bp=1 keeps EVERY candidate with inter >= 1, so the output
    # size IS the candidate-set size. The corpus-wide "the quick brown"
    # shingle links all C(40,2) = 780 doc pairs; with df cap 8 only the 20
    # true near-dup pairs (rare pair-unique tails) are generated.
    docs = rd.from_pandas(_corpus(40))
    capped = dedup.ngram_jaccard_pairs(
        docs, k=3, threshold_bp=1, num_buckets=4, max_df=8
    ).to_pandas()
    assert len(capped) == 20
    assert set(zip(capped["doc_a"], capped["doc_b"])) == {
        (2 * p, 2 * p + 1) for p in range(20)
    }

    uncapped = dedup.ngram_jaccard_pairs(
        docs, k=3, threshold_bp=1, num_buckets=4, max_df=1000
    ).to_pandas()
    assert len(uncapped) == 780  # quadratic blowup the cap prevents


def test_capped_dups_still_pass_jaccard_threshold(ray_session):
    # at the default 0.5 threshold the pair-tail dups still qualify:
    # inter=6 of 7+7 shingles -> Jaccard 6/8 = 0.75
    docs = rd.from_pandas(_corpus(8))
    out = dedup.ngram_jaccard_pairs(
        docs, k=3, threshold_bp=5000, num_buckets=2, max_df=4
    ).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {
        (2 * p, 2 * p + 1) for p in range(4)
    }
    assert (out["inter"] == 6).all() and (out["size_a"] == 7).all()


def test_simhash_max_hamming_guard(ray_session):
    import pytest

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a b c"]}))
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_near_dup_pairs(docs, max_hamming=4)
