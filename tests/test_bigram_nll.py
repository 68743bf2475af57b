"""Bigram-LM NLL pinned to a single-process reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages.textstats import bigram_nll


def _brute(texts):
    from collections import Counter

    toks = [t.split(" ") for t in texts]
    bi = Counter((w1, w2) for t in toks for w1, w2 in zip(t, t[1:]))
    ctx = Counter()
    for (w1, _), c in bi.items():
        ctx[w1] += c
    V = len({w for t in toks for w in t})
    rows = []
    for d, t in enumerate(toks):
        pairs = list(zip(t, t[1:]))
        if not pairs:
            continue
        nll = sum(
            int(np.floor(-np.log((bi[p] + 1.0) / (ctx[p[0]] + V)) * 1e6))
            for p in pairs
        )
        rows.append((d, len(pairs), nll))
    return rows


def test_bigram_nll_matches_brute_force(ray_session):
    rng = np.random.RandomState(11)
    vocab = ["a", "b", "c", "d", "e"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 25))) for _ in range(120)
    ]
    texts[5] = "z"  # single-token doc: no bigrams, omitted from output
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})
    out = (
        bigram_nll(rd.from_pandas(df).repartition(5), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    got = list(zip(out["doc_id"], out["n_bigrams"], out["nll_fp"]))
    assert got == _brute(texts)
