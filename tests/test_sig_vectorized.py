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


def test_span_mask_ascii_equals_loop():
    """The vectorized ASCII span kernel must agree with the exact per-row
    check on every boundary case (round-5 vectorization of
    AnnotationVerifier)."""
    import numpy as np

    from bio_re_with_entity_embeddings_ray.stages.mentions import (
        _span_keep_mask_ascii,
    )

    texts = np.array([
        "Aspirin treats PAIN well",     # exact
        "Aspirin treats PAIN well",     # case-insensitive match
        "Aspirin treats PAIN well",     # wrong substring
        "short",                        # end past len(text)
        "inverted",                     # start > end
        "negative",                     # start < 0
        "zerowidth",                    # s == e, empty mention
        "zerowidth",                    # s == e, nonempty mention
        "width mismatch here",          # e-s != len(mention)
        "",                             # empty text, empty span
    ], dtype=object)
    starts = np.array([0, 15, 0, 2, 5, -1, 3, 3, 0, 0], dtype=np.int64)
    ends = np.array([7, 19, 7, 99, 2, 3, 3, 3, 5, 0], dtype=np.int64)
    mentions = np.array([
        "Aspirin", "pain", "Treats", "ort", "ver", "neg", "", "x",
        "width mismatch", "",
    ], dtype=object)

    got = _span_keep_mask_ascii(texts, starts, ends, mentions)
    exp = np.fromiter(
        (0 <= s <= e <= len(t) and t[s:e].lower() == m.lower()
         for t, s, e, m in zip(texts, starts, ends, mentions)),
        dtype=bool, count=len(texts),
    )
    assert (got == exp).all(), (got, exp)
    assert got.tolist() == [True, True, False, False, False, False,
                            True, False, False, True]


def test_span_mask_ascii_random_agrees_with_loop():
    import numpy as np

    from bio_re_with_entity_embeddings_ray.stages.mentions import (
        _span_keep_mask_ascii,
    )

    rng = np.random.RandomState(7)
    alpha = np.array(list("abcDEF xyZ"))
    texts, starts, ends, mentions = [], [], [], []
    for _ in range(500):
        t = "".join(rng.choice(alpha, size=rng.randint(0, 30)))
        s = rng.randint(-2, max(len(t), 1) + 2)
        e = s + rng.randint(-1, 8)
        if rng.rand() < 0.5 and 0 <= s <= e <= len(t):
            m = t[s:e]
            if rng.rand() < 0.5:
                m = m.swapcase()
        else:
            m = "".join(rng.choice(alpha, size=max(e - s, 0)))
        texts.append(t); starts.append(s); ends.append(e); mentions.append(m)
    texts = np.array(texts, dtype=object)
    starts = np.array(starts, dtype=np.int64)
    ends = np.array(ends, dtype=np.int64)
    mentions = np.array(mentions, dtype=object)
    got = _span_keep_mask_ascii(texts, starts, ends, mentions)
    exp = np.fromiter(
        (0 <= s <= e <= len(t) and t[s:e].lower() == m.lower()
         for t, s, e, m in zip(texts, starts, ends, mentions)),
        dtype=bool, count=len(texts),
    )
    assert (got == exp).all()


def test_annotation_verifier_non_ascii_falls_back_to_char_offsets():
    import numpy as np
    import pandas as pd

    from bio_re_with_entity_embeddings_ray.stages.mentions import (
        AnnotationVerifier,
    )

    # 'café' — char offsets 5..9 select 'brew'; byte-indexed logic would
    # misalign past the 2-byte é
    batch = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": np.array([0, 0], dtype=np.int32),
            "entity_type": ["Chemical", "Chemical"],
            "raw_id": ["MESH:D001241", "MESH:D001241"],
            "mention_text": ["brew", "Café"],
            "start": np.array([5, 0], dtype=np.int64),
            "end": np.array([9, 4], dtype=np.int64),
            "text": ["café brew time", "café brew time"],
        }
    )
    out = AnnotationVerifier()(batch)
    assert sorted(out["mention_text"]) == ["Café", "brew"]
