"""Safety operators (decontamination, PII scrub) pinned to brute-force
references on randomized corpora."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import safety


def _docs(seed: int, n: int = 50) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    vocab = ["w1", "w2", "w3", "w4", "w5", "w6"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(0, 10))) for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _sh(text: str, k: int = 3) -> set:
    t = text.split(" ")
    return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}


def test_decontaminate_matches_brute_force(ray_session):
    df = _docs(21)
    bench_mask = df["doc_id"] % 5 == 0
    bench_sh = set().union(*(_sh(t) for t in df.loc[bench_mask, "text"]))
    out = (
        safety.decontaminate(
            rd.from_pandas(df),
            rd.from_pandas(df[bench_mask].reset_index(drop=True)),
            k=3,
            threshold_bp=2000,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for _, row in df.iterrows():
        sh = _sh(row["text"])
        ov = len(sh & bench_sh)
        bp = 10000 * ov // max(len(sh), 1)
        got = out.loc[row["doc_id"]]
        assert got["n_shingles"] == len(sh)
        assert got["n_overlap"] == ov
        assert got["contam_bp"] == bp
        assert got["contaminated"] == int(bp >= 2000)


def test_decontaminate_empty_benchmark(ray_session):
    df = _docs(4, n=12)
    bench = pd.DataFrame({"doc_id": [0], "text": ["xy"]})  # < k tokens
    out = safety.decontaminate(
        rd.from_pandas(df), rd.from_pandas(bench), k=3
    ).to_pandas()
    assert len(out) == 12
    assert (out["n_overlap"] == 0).all()
    assert (out["contaminated"] == 0).all()


def test_pii_scrub_counts_and_redacts(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "mail me at a.b_c@host.org today",
                "two mails x@y.io and z9@q.co plus 123-4567",
                "no pii here",
                "call 555-0199 or 555-0200",
                "not-a-phone 12-3456 and almost@x",  # neither matches
            ],
        }
    )
    out = safety.pii_scrub(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert list(out["n_emails"]) == [1, 2, 0, 0, 0]
    assert list(out["n_phones"]) == [0, 1, 0, 2, 0]
    assert out.loc[0, "clean_text"] == "mail me at <EMAIL> today"
    assert out.loc[1, "clean_text"] == "two mails <EMAIL> and <EMAIL> plus <PHONE>"
    assert out.loc[3, "clean_text"] == "call <PHONE> or <PHONE>"
    assert out.loc[4, "clean_text"] == df.loc[4, "text"]


def test_curate_decontam_drops_overlap_then_dedups(ray_session):
    from bio_re_with_entity_embeddings_ray.pipelines import curate as cur

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "alpha beta gamma delta epsilon zeta",   # benchmark member
                "alpha beta gamma delta epsilon zeta",   # dup of benchmark: contaminated
                "one two three four five six",           # clean
                "one two three four five six",           # exact dup of clean -> deduped
                "totally different clean document here", # clean
                "x y",                                   # fails min_tokens
            ],
        }
    )
    bench = docs.iloc[[0]]
    out = (
        cur.curate_decontam(
            rd.from_pandas(docs), rd.from_pandas(bench), num_buckets=4
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # contaminated (0, 1) gone, short (5) gone, dup (3) deduped to 2
    assert list(out["doc_id"]) == [2, 4]


def test_normalize_text_lowers_collapses_trims(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["  Hello\t\tWORLD \n x ", "already clean", "A\nB\tC"],
        }
    )
    out = safety.normalize_text(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[0, "norm_text"] == "hello world x"
    assert out.loc[1, "norm_text"] == "already clean"
    assert out.loc[2, "norm_text"] == "a b c"
