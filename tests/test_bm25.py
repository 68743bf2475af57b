"""BM25 top-k pinned to a single-process float reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages.textstats import bm25_topk


def _brute_bm25(texts, query, k, k1=1.2, b=0.75):
    toks = [t.split(" ") for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    scores = np.zeros(n, dtype=np.int64)
    for term in query.split(" "):
        df = sum(1 for t in toks if term in t)
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, t in enumerate(t for t in toks):
            tf = float(t.count(term))
            if tf > 0:
                contrib = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
                scores[i] += int(np.floor(contrib * 1e6))
    order = sorted(
        (i for i in range(n) if scores[i] > 0),
        key=lambda i: (-scores[i], i),
    )[:k]
    return [(i, int(scores[i])) for i in order]


def test_bm25_matches_brute_force(ray_session):
    rng = np.random.RandomState(7)
    vocab = ["join", "sort", "window", "scan", "agg", "merge", "key"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 30)))
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    out = bm25_topk(
        rd.from_pandas(df).repartition(7), query="join sort window", k=10
    )
    want = _brute_bm25(texts, "join sort window", 10)
    got = list(zip(out["doc_id"].tolist(), out["score_fp"].tolist()))
    assert got == want
    assert out["rank"].tolist() == list(range(1, len(want) + 1))


def test_bm25_absent_term_contributes_nothing(ray_session):
    df = pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64),
         "text": ["a b c", "b c d", "c d e"]}
    )
    out = bm25_topk(rd.from_pandas(df), query="zebra", k=5)
    assert len(out) == 0
