"""Paragraph-level exact dedup (stages/dedup.paragraph_dedup): brute-force
property check + broadcast/hash plan equivalence, incl. the empty-text and
lose-every-paragraph edges the standard corpus lacks."""

import numpy as np
import pandas as pd
import pytest


def _brute(docs: pd.DataFrame, pt: int) -> pd.DataFrame:
    rows = []
    for _, r in docs.iterrows():
        toks = r.text.split(" ") if r.text else []
        for p in range(0, len(toks), pt):
            rows.append((r.doc_id, p // pt, " ".join(toks[p : p + pt])))
    bf = pd.DataFrame(rows, columns=["doc_id", "pidx", "para"])
    win = bf.sort_values(["doc_id", "pidx"]).groupby("para").first().reset_index()
    keepset = set(zip(win.doc_id, win.pidx))
    exp = []
    for did, g in bf.groupby("doc_id"):
        kept = g[[(d, p) in keepset for d, p in zip(g.doc_id, g.pidx)]].sort_values(
            "pidx"
        )
        exp.append((did, len(g), len(kept), " ".join(kept.para)))
    return pd.DataFrame(
        exp, columns=["doc_id", "n_paras", "n_kept", "text_dedup"]
    ).reset_index(drop=True)


@pytest.mark.parametrize("plan", ["broadcast", "hash"])
def test_paragraph_dedup_matches_brute_force(ray_session, plan):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.dedup import paragraph_dedup

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d e f g h i j k l",  # paras "a..h", "i j k l"
                "a b c d e f g h x y",  # first para dup of doc 1's
                "i j k l",  # dup of doc 1's tail para
                "",  # empty: absent from output
                "a b c d e f g h i j k l",  # full dup: loses everything
            ],
        }
    )
    exp = _brute(docs, 8)
    out = (
        paragraph_dedup(
            rd.from_pandas(docs).repartition(3), para_tokens=8, num_buckets=4, plan=plan
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert out.loc[out.doc_id == 5, "n_kept"].item() == 0
    assert 4 not in set(out.doc_id)


def test_paragraph_dedup_random_corpus_plan_equivalence(ray_session):
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.dedup import paragraph_dedup

    rng = np.random.RandomState(7)
    vocab = np.array(list("abcdefg"))
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 14))) for _ in range(60)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
    exp = _brute(docs, 4)
    outs = {}
    for plan in ("broadcast", "hash"):
        outs[plan] = (
            paragraph_dedup(
                rd.from_pandas(docs).repartition(5),
                para_tokens=4,
                num_buckets=8,
                plan=plan,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["broadcast"], outs["hash"])
    pd.testing.assert_frame_equal(outs["broadcast"], exp, check_dtype=False)
