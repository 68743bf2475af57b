"""Stage 6a — distributed entity/pair representation learning.

Reference analog: gensim Doc2Vec DBOW over tagged documents
(/root/reference/learn_embeddings.py:36-58 — single process, 8 threads,
20 epochs; vector export extract_document_vectors.py:26-37). Gensim is a
single-node library and is not a Ray Data primitive, so the engine
substitutes a DISTRIBUTED, deterministic representation with the same
contract: one dense vector per tag (entity / entity-pair), trained from
the same ``doc2vec_input`` table (tags + document text), exported as an
``embeddings`` Parquet table consumed by the scorer actor pool
(stages/scoring.py).

Algorithm — hashed PPMI (positive pointwise mutual information over
feature-hashed token context):

1. per batch: count (tag, hash(token) % dim) co-occurrences — a dense
   (local_tags x dim) accumulator via ``np.add.at``, emitted as one
   partial row per tag per block (combiner pattern);
2. merge partials: vector sum per tag (associative);
3. tiny global aggregates: per-feature totals + grand total (dim-sized,
   broadcast);
4. finalize per tag: PPMI = max(0, log(p(t,f) / (p(t) p(f)))), then
   L2-normalize.

Memory is bounded by ``dim`` regardless of token vocabulary (feature
hashing), and by (distinct tags x dim) per block for the combiner — the
same scaling envelope as the engine's other aggregates. 177k-tag
reference vocabularies (README.md:55-146) are ~45 MB of partials per
block at dim=64.

CONFORMANCE NOTE — what diverges from the reference (gensim is absent in
this environment, and single-node SGD is not a Ray Data primitive):
- reference: Doc2Vec DBOW, 20 epochs x 1 iteration, 8 threads, window 10,
  lr 0.01, min_count 4, dims {500..2000} (learn_embeddings.py:36-58,
  resources/configurations/doc2vec-0500.config) — stochastic (hogwild
  SGD), vectors differ run to run;
- here: hashed-PPMI count factorization — deterministic, embarrassingly
  distributable, same (tag -> dense L2-normalized vector) contract and
  the same doc2vec_input consumption, but NOT numerically comparable to
  gensim vectors; no negative sampling, no window (document-level
  co-occurrence), no min_count pruning, dim is a feature-hash width.
Downstream consumers (scorer actor pools, kNN, export sinks) are
representation-agnostic, so swapping in real Doc2Vec vectors trained
off-platform preserves every pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8
from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

SET_SEP = ";;;"


def _hash_tokens(tokens: list[str], dim: int) -> np.ndarray:
    # md5-based for cross-process determinism (same primitive as the
    # dedup family); cached per process
    return np.array([_tok_hash(t) % dim for t in tokens], dtype=np.int64)


_TOK_CACHE: dict[str, int] = {}
_TOK_CACHE_MAX = 500_000


def _tok_hash(tok: str) -> int:
    h = _TOK_CACHE.get(tok)
    if h is None:
        h = md5int8(tok)
        if len(_TOK_CACHE) < _TOK_CACHE_MAX:
            _TOK_CACHE[tok] = h
    return h


def train_entity_embeddings(
    doc2vec_input,
    dim: int = 64,
    num_buckets: int = 64,
    dtype=np.float32,
):
    """doc2vec_input(conv_id, tags, text) -> embeddings(tag, vector).

    ``tags`` is the ';;;'-packed tag set per document (the reference's
    doc2vec_input.txt first column, prepare_doc2vec_input.py:40-52).
    Deterministic: independent of block layout and parallelism.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tag_ix: dict[str, int] = {}
        rows_tags: list[list[int]] = []
        feats: list[np.ndarray] = []
        for tags, text in zip(batch["tags"], batch["text"]):
            f = _hash_tokens(text.split(" "), dim)
            feats.append(f)
            ids = []
            for t in tags.split(SET_SEP):
                if t not in tag_ix:
                    tag_ix[t] = len(tag_ix)
                ids.append(tag_ix[t])
            rows_tags.append(ids)
        acc = np.zeros((len(tag_ix), dim), dtype=np.int64)
        for ids, f in zip(rows_tags, feats):
            counts = np.bincount(f, minlength=dim)
            for i in ids:
                acc[i] += counts
        tags_out = list(tag_ix)
        return pd.DataFrame(
            {"tag": tags_out, "counts": [acc[tag_ix[t]] for t in tags_out]}
        )

    partials = doc2vec_input.map_batches(
        partial, batch_format="pandas", batch_size=None
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("tag", sort=False)["counts"].agg(
            lambda s: np.sum(np.stack(list(s)), axis=0)
        )
        return g.reset_index()

    summed = bucketed_group_apply(partials, "tag", merge, num_buckets).materialize()

    # tiny global aggregates (dim + 1 numbers) — safe to collect
    totals = np.zeros(dim, dtype=np.int64)
    for b in summed.iter_batches(batch_size=None, batch_format="pandas"):
        totals += np.sum(np.stack(list(b["counts"])), axis=0)
    grand = max(int(totals.sum()), 1)
    feat_p = np.maximum(totals, 1) / grand

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = []
        for c in batch["counts"]:
            c = np.asarray(c, dtype=np.float64)
            tag_total = max(c.sum(), 1.0)
            with np.errstate(divide="ignore"):
                pmi = np.log((c / grand) / ((tag_total / grand) * feat_p))
            v = np.maximum(pmi, 0.0)
            n = np.linalg.norm(v)
            vecs.append((v / n if n > 0 else v).astype(dtype))
        return pd.DataFrame({"tag": batch["tag"], "vector": vecs})

    return summed.map_batches(finalize, batch_format="pandas", batch_size=None)


def explode_vectors_bp(embeddings_ds):
    """(tag, vector) -> exploded (tag, dim_idx, value_bp) with value_bp =
    round(1e6 * value) as int64 — the integer projection the DuckDB oracle
    (oracles.LEARNED_EMBEDDINGS) reproduces bit-for-bit. Train with
    dtype=float64 when feeding this: float32 representation error (~1e-7)
    is bigger than the 1e-6 rounding grid and would flip boundary cells."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "tag": pd.Series([], dtype="object"),
                    "dim_idx": pd.Series([], dtype="int64"),
                    "value_bp": pd.Series([], dtype="int64"),
                }
            )
        V = np.stack([np.asarray(v, dtype=np.float64) for v in batch["vector"]])
        n, d = V.shape
        return pd.DataFrame(
            {
                "tag": np.repeat(batch["tag"].to_numpy(), d),
                "dim_idx": np.tile(np.arange(d, dtype=np.int64), n),
                "value_bp": np.rint(1e6 * V).astype(np.int64).reshape(-1),
            }
        )

    return embeddings_ds.map_batches(explode, batch_format="pandas", batch_size=None)


def export_embeddings(embeddings_ds, path: str):
    """Parquet export of (tag, vector) — the engine's S8 sink (reference:
    gensim model.save + docvecs + vocab text, learn_embeddings.py:60-80)."""
    embeddings_ds.write_parquet(path)
    return path
