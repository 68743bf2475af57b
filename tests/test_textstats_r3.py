"""Round-3 text-analysis operators: repetition scores, tf-idf top-k,
inverted index — each pinned to a brute-force single-process reference
on randomized corpora (the oracle harness covers the SQL mirror; these
pin the *vectorized kernels* to naive Python semantics)."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import textstats


def _random_docs(seed: int, n: int = 60) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    vocab = ["a", "b", "cc", "dd", "the", "spam"]
    texts = []
    for _ in range(n):
        L = rng.randint(0, 12)
        texts.append(" ".join(rng.choice(vocab, size=L)) if L else "")
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def test_repetition_scores_match_brute_force(ray_session):
    df = _random_docs(11)
    out = (
        textstats.repetition_scores(rd.from_pandas(df), k=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for _, row in df.iterrows():
        toks = row["text"].split(" ")
        kgs = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        n_kg = len(kgs)
        rep = 10000 * (n_kg - len(set(kgs))) // max(n_kg, 1)
        top = 10000 * max(toks.count(t) for t in set(toks)) // len(toks)
        got = out.loc[row["doc_id"]]
        assert got["n_tokens"] == len(toks)
        assert got["n_kgrams"] == n_kg
        assert got["rep_kgram_bp"] == rep, row["text"]
        assert got["top_token_bp"] == top, row["text"]


def test_tfidf_topk_matches_brute_force(ray_session):
    df = _random_docs(7, n=40)
    out = textstats.tfidf_topk(rd.from_pandas(df), top=3, num_buckets=4).to_pandas()
    # brute df
    dfreq: dict[str, int] = {}
    for t in df["text"]:
        for w in set(t.split(" ")):
            dfreq[w] = dfreq.get(w, 0) + 1
    for _, row in df.iterrows():
        toks = row["text"].split(" ")
        scored = sorted(
            (
                (-(10**9 * toks.count(w) // (len(toks) * dfreq[w])), w)
                for w in set(toks)
            )
        )[:3]
        got = out[out["doc_id"] == row["doc_id"]].sort_values("rank")
        assert list(got["token"]) == [w for _, w in scored], row["text"]
        assert list(got["score_ppb"]) == [-s for s, _ in scored]
        assert list(got["rank"]) == list(range(1, len(scored) + 1))


def test_inverted_index_postings_truncated_and_df_full(ray_session):
    df = _random_docs(3, n=50)
    out = (
        textstats.inverted_index(rd.from_pandas(df), max_postings=4, num_buckets=4)
        .to_pandas()
        .set_index("token")
    )
    post: dict[str, list[int]] = {}
    for _, row in df.iterrows():
        for w in set(row["text"].split(" ")):
            post.setdefault(w, []).append(int(row["doc_id"]))
    assert set(out.index) == set(post)
    for tok, ids in post.items():
        ids = sorted(ids)
        assert out.loc[tok, "df"] == len(ids)
        assert out.loc[tok, "postings"] == ",".join(str(i) for i in ids[:4])


def test_winsorize_clips_to_exact_percentile_positions(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.textstats import winsorize

    rng = np.random.RandomState(2)
    vals = np.concatenate(
        [rng.randint(50, 200, 400), [1, 2, 9000, 12000]]  # planted outliers
    ).astype(np.int64)
    df = pd.DataFrame(
        {"doc_id": np.arange(len(vals), dtype=np.int64), "v": vals}
    )
    got = (
        winsorize(rd.from_pandas(df).repartition(4), "v", 500, 9500, 4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = len(vals)
    s = np.sort(vals)
    lo = s[max(1, -(-500 * n // 10000)) - 1]
    hi = s[max(1, -(-9500 * n // 10000)) - 1]
    assert (got["clipped"].to_numpy() == np.clip(vals, lo, hi)).all()
    assert got["clipped"].min() == lo and got["clipped"].max() == hi
    # originals preserved
    assert (got["v"].to_numpy() == vals).all()


def test_fuzzy_token_pairs_complete_for_ed1(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        _ed1_mask,
        fuzzy_token_pairs,
    )

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "merge table filter stream",
                "mergee tablle filte",       # insert / double / delete
                "margе unrelated words here", # cyrillic е: NOT ED1 of merge+r
                "aaab abab baab merge",
            ],
        }
    )
    got = (
        fuzzy_token_pairs(rd.from_pandas(docs).repartition(2), num_buckets=3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # brute force over the >=4-char vocabulary
    vocab = sorted(
        {w for t in docs["text"] for w in t.split(" ") if len(w) >= 4}
    )

    def ed(a, b):
        if len(a) > len(b):
            a, b = b, a
        if len(b) - len(a) > 1:
            return 2
        prev = list(range(len(a) + 1))
        for i, cb in enumerate(b, 1):
            cur = [i]
            for j, ca in enumerate(a, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    exp = pd.DataFrame(
        [(a, b) for i, a in enumerate(vocab) for b in vocab[i + 1:]
         if ed(a, b) <= 1],
        columns=["a", "b"],
    )
    pd.testing.assert_frame_equal(got, exp)
    # the vectorized verifier agrees with DP on tricky candidates
    a = np.array(["abab", "aaab", "abcd", "abcd", "xabcd"], dtype=object)
    b = np.array(["baab", "aaab", "abd", "abxcd", "abcd"], dtype=object)
    assert _ed1_mask(a, b).tolist() == [ed(x, y) <= 1 for x, y in zip(a, b)]


def test_fuzzy_link_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.sources.dictionaries import GAZETTEER
    from bio_re_with_entity_embeddings_ray.stages.mentions import fuzzy_link

    tr = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "text": [
                "the mergee applied to tble rows",  # merge+e, table-del
                "join the batch",                    # exact hits
                "unrelated words only here",
            ],
        }
    )
    got = (
        fuzzy_link(rd.from_pandas(tr).repartition(2), num_buckets=3)
        .to_pandas()
        .sort_values(["conv_id", "entity_id", "token"])
        .reset_index(drop=True)
    )

    def ed(a, b):
        if len(a) > len(b):
            a, b = b, a
        if len(b) - len(a) > 1:
            return 2
        prev = list(range(len(a) + 1))
        for i, cb in enumerate(b, 1):
            cur = [i]
            for j, ca in enumerate(a, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    exp_rows = set()
    for r in tr.itertuples():
        for w in r.text.lower().split(" "):
            if len(w) < 4:
                continue
            for e in GAZETTEER:
                if ed(w, e.surface) <= 1:
                    exp_rows.add((r.conv_id, e.canonical_id, w))
    assert set(map(tuple, got.to_numpy())) == exp_rows
    assert ("c1", "OP:MERGE", "mergee") in exp_rows  # typo linked
    assert ("c1", "RES:TABLE", "tble") in exp_rows
