"""Exact-substring duplication coverage pinned to a brute-force local ref."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages.dedup import duplicate_spans


def _brute(texts, k):
    grams = [
        [" ".join(t.split(" ")[i : i + k]) for i in range(len(t.split(" ")) - k + 1)]
        for t in texts
    ]
    rows = []
    for d, gs in enumerate(grams):
        if not gs:
            continue
        dup = sum(
            1
            for g in gs
            if any(g in other for o, other in enumerate(grams) if o != d)
        )
        rows.append((d, len(gs), dup, 10000 * dup // len(gs)))
    return rows


def test_duplicate_spans_matches_brute_force(ray_session):
    texts = [
        "a b c d e f",        # shares "a b c" with doc 2
        "x y z w",            # unique
        "q a b c r s",        # shares "a b c" with doc 0
        "x y z w",            # full duplicate of doc 1
        "m n",                # too short for k=3 -> omitted
        "t t t t t",          # internal repeats only -> dup 0
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    out = (
        duplicate_spans(rd.from_pandas(df).repartition(3), k=3, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    got = list(
        zip(out["doc_id"], out["n_grams"], out["dup_grams"], out["dup_bp"])
    )
    assert got == _brute(texts, 3)
