"""The batch-vectorized signature kernels must be bit-identical to the
per-doc reference implementations they replaced."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.functions.textfns import (
    md5int8_array,
    minhash_signature,
    shingles,
    simhash32,
)
from bio_re_with_entity_embeddings_ray.stages import dedup


def _texts(seed: int, n: int = 80) -> list:
    rng = np.random.RandomState(seed)
    vocab = ["a", "b", "c", "dd", "ee", "the", "ümläut"]
    out = [" ".join(rng.choice(vocab, size=rng.randint(0, 9))) for _ in range(n)]
    out += ["", "one", "one two", "x y z", out[0]]  # edges + exact dup
    return out


def test_batch_signatures_match_per_doc():
    texts = _texts(13)
    dedup._SIG_CACHE.clear()
    got = dedup._signatures_for_batch(texts, 3)
    for t, sig in zip(texts, got):
        sh = list(set(shingles(t.split(" "), 3)))
        if not sh:
            assert sig is None, repr(t)
        else:
            ref = minhash_signature(md5int8_array(sh))
            assert np.array_equal(sig, ref), repr(t)
    # second call is all cache hits and still identical
    again = dedup._signatures_for_batch(texts, 3)
    for a, b in zip(got, again):
        assert (a is None and b is None) or np.array_equal(a, b)


def test_simhash_vectorized_matches_per_doc(ray_session):
    texts = _texts(29, n=60)
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    out = (
        dedup.simhash_fingerprints(rd.from_pandas(df))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        ref = simhash32(md5int8_array(t.split(" ")))
        assert out.loc[i, "simhash"] == ref, repr(t)
