"""Local driver-mimic: run every __ray_entry__ query AND its DuckDB oracle
side by side, compare row count + schema + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    if len(df) == 0:
        # apply(axis=1) over zero rows returns a DataFrame (no .tolist());
        # hash the column list so empty==empty compares by schema
        return hashlib.md5(("\x01".join(df.columns)).encode()).hexdigest()
    rows = sorted(
        df.astype(str).apply(lambda r: "\x01".join(r.values), axis=1).tolist()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


PATHO_QUERIES = {
    # doc/embedding-based queries runnable over the pathological corpus
    # (TPC-H- and transcript-derived queries need their own tables)
    "dedup_exact", "dedup_exact_hashed", "dedup_ngram_jaccard",
    "containment_pairs", "prefix_clusters", "systematic_sample",
    "lexical_diversity", "minhash_jaccard_est", "curate_to_pack",
    "nll_percentile_filter",
    "dedup_minhash_lsh", "dedup_minhash_star", "simhash",
    "embedding_near_dup", "knn_topk", "ivf_assign",
    "ivf_assign_kmeans", "embedding_near_dup_ivf_kmeans",
    "token_counts", "quality_scores", "lang_id", "fingerprints",
    "media_stats", "media_features", "media_frames", "media_resize", "media_frames_apng",
    "pubtator_roundtrip",
    # round-2 additions
    "dedup_clusters", "curate", "curate_budget", "curate_neardup",
    # round-3: the hash-plan keep/drop-set variants
    "curate_hash", "curate_neardup_hash",
    "token_quantiles", "hash_sample", "corpus_mix", "vocab_topk",
    "hash_split_train", "hash_split_val",
    "token_quantiles_by_lang", "cap_per_group",
    # round-3: text-analysis + safety additions
    "repetition_scores", "tfidf_topk", "inverted_index",
    "decontaminate", "pii_scrub", "pack_sequences", "deterministic_shuffle",
    "curate_decontam", "pack_sequences_shuffled", "normalize_text", "hll_registers", "kmeans_centroids", "curate_incremental",
    "semantic_dedup", "bm25_topk", "curate_percentile", "audio_features",
    "lsh_assign", "ann_lsh_search", "embedding_covariance",
    "fuzzy_token_pairs",
    "paragraph_dedup",
    "duplicate_spans", "bigram_nll", "token_counts_regex",
    # round-3 final session: chunking survives unicode/empty/short docs;
    # snapshot CDC survives exact-duplicate texts
    "chunk_docs", "snapshot_diff",
}


def write_pathological(dirpath: str) -> None:
    """Adversarial documents + embeddings parquet: the cases the standard
    corpus lacks — sub-shingle-size docs, exact duplicate texts, repeated
    tokens, unicode, similarity TIES (duplicate vectors), 1-doc-long
    shingles — so oracle comparisons exercise edge semantics, not just the
    happy path."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    texts = [
        "one",                               # 1 token (< k shingles)
        "one two",                           # 2 tokens
        "one two",                           # exact duplicate of the above
        "a a a a a a",                       # single repeated token
        "alpha beta gamma delta epsilon",    # normal
        "alpha beta gamma delta epsilon",    # exact dup of normal
        "alpha beta gamma delta zeta",       # near dup (1 token off)
        "uno dos tres cuatro cinco seis",
        "ümläut töken ümläut stream",  # unicode
        "x y z w v u t s r q p o n m",       # long-ish
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        f"{dirpath}/documents.parquet",
    )
    rng = np.random.RandomState(42)
    vecs = [rng.randn(8) for _ in range(10)]
    vecs[3] = vecs[1].copy()   # exact tie with vec 1
    vecs[7] = vecs[2].copy()   # exact tie with vec 2
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(10)), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        ),
        f"{dirpath}/embeddings.parquet",
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--patho"]
    patho = "--patho" in sys.argv
    if patho:
        # under --patho every positional is a query name (sf_dir is fixed)
        only = set(args)
        sf_dir = "/tmp/patho_sf"
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        only = set(args[1:])
    if patho:
        write_pathological(sf_dir)
        if only:
            dropped = only - PATHO_QUERIES
            if dropped:
                print(f"[skip] not runnable on the patho corpus: {sorted(dropped)}")
            only = only & PATHO_QUERIES
            if not only:
                print("[FAIL] no requested query is patho-runnable")
                return 2
        else:
            only = set(PATHO_QUERIES)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=16,
            include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    import os

    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )

    qs, os_ = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"[FAIL] unknown query name(s): {sorted(unknown)}")
        return 2
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"[FAIL] {name}: ray error: {ex!r}")
            failures += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(mine)} rows")
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL error: {ex!r}")
            failures += 1
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} != {len(oracle)}")
        if sorted(mine.columns) != sorted(oracle.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(oracle.columns)}")
        else:
            h1, h2 = value_hash(mine), value_hash(oracle)
            if h1 != h2:
                problems.append("value-hash mismatch")
                m = mine[sorted(mine.columns)].astype(str)
                o = oracle[sorted(oracle.columns)].astype(str)
                mk = set(map(tuple, m.values.tolist()))
                ok = set(map(tuple, o.values.tolist()))
                extra = list(mk - ok)[:3]
                miss = list(ok - mk)[:3]
                if extra:
                    problems.append(f"engine-only: {extra}")
                if miss:
                    problems.append(f"oracle-only: {miss}")
        if problems:
            failures += 1
            print(f"[FAIL] {name}: " + " | ".join(problems))
        else:
            print(f"[ OK ] {name}: {len(mine)} rows ({time.perf_counter() - t0:.1f}s)")
    return failures


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(1 if rc else 0)
