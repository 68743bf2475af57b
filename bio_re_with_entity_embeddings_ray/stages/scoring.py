"""Stage 6 — embedding lookup, similarity search, triple scoring.

Reference analog: the exported doc2vec ``KeyedVectors`` + ``most_similar``
consumption (/root/reference/examples/load_entity_embeddings.py:1-17,
extract_document_vectors.py:26-37). The embedding matrix lives in a
stateful actor pool (loaded once per actor from a ``ray.put`` broadcast);
similarity is blocked numpy matmul; top-k is per-batch partial
``argpartition`` merged in a tiny final aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array
from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply


def _load_matrix(emb_pdf: pd.DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"):
    ids = emb_pdf[id_col].to_numpy()
    M = np.array(emb_pdf[vec_col].tolist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    return ids, M


def _rowwise_topk(qids: np.ndarray, ids: np.ndarray, sims: np.ndarray, k: int) -> pd.DataFrame:
    """Exact per-query top-k over a (n_queries, n_candidates) similarity
    matrix with the oracle tie order (sim DESC, nid ASC), fully
    vectorized across queries: columns are pre-sorted by neighbor id
    once, then a STABLE row-wise argsort on -sim preserves the id order
    among sim ties — equivalent to a per-query lexsort((nid, -sim)) with
    no Python loop over queries (the per-query loop was the ST5 scale
    ceiling for large query sets). Self-matches (ids == qid) and
    ``sims == -inf`` cells (callers mask out-of-bucket candidates that
    way) are excluded."""
    if sims.shape[1] == 0 or len(qids) == 0:
        return pd.DataFrame(
            {
                "qid": np.array([], dtype=np.int64),
                "nid": np.array([], dtype=np.int64),
                "sim": np.array([], dtype=np.float64),
            }
        )
    sims = np.where(ids[None, :] == qids[:, None], -np.inf, sims)
    col_order = np.argsort(ids, kind="stable")
    s2 = sims[:, col_order]
    ord2 = np.argsort(-s2, axis=1, kind="stable")[:, :k]
    top_cols = col_order[ord2]  # (q, k') positions into ids
    top_sims = np.take_along_axis(s2, ord2, axis=1)
    kk = ord2.shape[1]
    q_idx = np.repeat(np.arange(len(qids)), kk)
    flat_cols = top_cols.reshape(-1)
    flat_sims = top_sims.reshape(-1)
    keep = np.isfinite(flat_sims)
    return pd.DataFrame(
        {
            "qid": qids[q_idx[keep]].astype(np.int64),
            "nid": ids[flat_cols[keep]].astype(np.int64),
            "sim": flat_sims[keep],
        }
    )


def knn_topk(emb, n_queries: int = 5, k: int = 10, num_buckets: int = 16):
    """Brute-force cosine top-k: queries = vec_id < n_queries (broadcast),
    corpus streamed in batches. Returns (qid, nid, rank), rank 1..k,
    ties broken by neighbor id.

    Per batch: one numpy matmul against the broadcast query matrix, then a
    per-query partial top-k; the final exact top-k merge handles only
    n_queries * k * n_blocks rows.
    """
    import ray

    qpdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    if len(qpdf) == 0:
        raise ValueError(
            f"knn_topk: no embedding rows with vec_id < {n_queries}; queries "
            "are the vec_id < n_queries rows by convention — pass n_queries "
            "matching your id space"
        )
    qids, Q = _load_matrix(qpdf)
    qref = ray.put((qids, Q))

    class PartialTopK:
        def __init__(self, qref):
            self.qids, self.Q = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy()
            M = np.array(batch["embedding"].tolist(), dtype=np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            sims = self.Q @ M.T  # (q, b)
            return _rowwise_topk(self.qids, ids, sims, k)

    partial = emb.map_batches(
        PartialTopK,
        fn_constructor_args=(qref,),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 8),
    )

    def final_topk(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in bucket.groupby("qid", sort=False):
            g = g.sort_values(["sim", "nid"], ascending=[False, True], kind="mergesort")
            g = g.head(k).reset_index(drop=True)
            out.append(
                pd.DataFrame(
                    {"qid": qid, "nid": g["nid"], "rank": np.arange(1, len(g) + 1)}
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(columns=["qid", "nid", "rank"])
        )

    res = bucketed_group_apply(partial, "qid", final_topk, min(num_buckets, n_queries))

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        batch["rank"] = batch["rank"].astype("int64")
        return batch

    return res.map_batches(cast, batch_format="pandas")


def ivf_assign(emb, n_centroids: int = 8, centroids: str = "prefix",
               iters: int = 2):
    """IVF coarse quantization: assign each vector to its nearest centroid.
    Returns (vec_id, centroid_id). This bucketing is the scale path for
    ANN: search only within the query's centroid bucket.

    Two centroid modes:

    - ``centroids="prefix"`` (default, the original convention): centroids
      are the embeddings of ``vec_id < n_centroids``; assignment by cosine
      (ties -> lowest centroid id).
    - ``centroids="kmeans"``: centroids come from the distributed Lloyd fit
      (:func:`~bio_re_with_entity_embeddings_ray.stages.clustering.kmeans_matrix`,
      ``iters`` iterations, init = the same vec_id-prefix rows) and
      assignment is Euclidean argmin ties -> lowest centroid id — the same
      metric/tie discipline as the fit itself, so buckets are true Voronoi
      cells of the trained codebook. Real-centroid cells balance bucket
      sizes on clustered data, which is what bounds the per-bucket work of
      every IVF consumer at scale.
    """
    import ray

    if centroids == "kmeans":
        from bio_re_with_entity_embeddings_ray.stages.clustering import (
            kmeans_matrix,
        )

        C = kmeans_matrix(emb, k=n_centroids, iters=iters)
        cref = ray.put(C)

        class AssignKm:
            def __init__(self, cref):
                self.C = ray.get(cref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                M = np.array(batch["embedding"].tolist(), dtype=np.float64)
                Cb = self.C
                d2 = (
                    (M * M).sum(axis=1, keepdims=True)
                    - 2.0 * (M @ Cb.T)
                    + (Cb * Cb).sum(axis=1)[None, :]
                )
                best = d2.argmin(axis=1)  # first min: ties -> lowest cid
                return pd.DataFrame(
                    {
                        "vec_id": batch["vec_id"],
                        "centroid_id": best.astype("int64"),
                    }
                )

        return emb.map_batches(
            AssignKm,
            fn_constructor_args=(cref,),
            batch_format="pandas",
            batch_size=2048,
            concurrency=(1, 8),
        )

    cpdf = (
        emb.filter(expr=f"vec_id < {n_centroids}")
        .to_pandas()
        .sort_values("vec_id")  # argmax keeps the FIRST max: ties -> lowest id
    )
    if len(cpdf) == 0:
        raise ValueError(
            f"ivf_assign: no embedding rows with vec_id < {n_centroids}; "
            "centroids are the vec_id < n_centroids rows by convention"
        )
    cids, C = _load_matrix(cpdf)
    cref = ray.put((cids, C))

    class Assign:
        def __init__(self, cref):
            self.cids, self.C = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            M = np.array(batch["embedding"].tolist(), dtype=np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            sims = M @ self.C.T  # (b, c) ; ties broken by lowest centroid id
            best = sims.argmax(axis=1)
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"],
                    "centroid_id": self.cids[best].astype("int64"),
                }
            )

    return emb.map_batches(
        Assign,
        fn_constructor_args=(cref,),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 8),
    )


def ivf_search(
    emb, n_centroids: int = 8, n_queries: int = 5, k: int = 5, n_probe: int = 1
):
    """IVF-bucketed ANN top-k: each query searches its ``n_probe`` nearest
    centroid buckets (the coarse-quantization scale path; brute-force
    knn_topk is the exact baseline; higher n_probe trades compute for
    recall). Returns (qid, nid, rank) with ties broken by neighbor id;
    the query itself is excluded. Deterministic given the centroid
    convention (vec_id < n_centroids, ties to lowest id)."""
    import ray

    cpdf = (
        emb.filter(expr=f"vec_id < {n_centroids}")
        .to_pandas()
        .sort_values("vec_id")
    )
    if len(cpdf) == 0:
        raise ValueError(
            f"ivf_search: no embedding rows with vec_id < {n_centroids}"
        )
    cids, C = _load_matrix(cpdf)
    qpdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    if len(qpdf) == 0:
        raise ValueError(f"ivf_search: no embedding rows with vec_id < {n_queries}")
    qids, Q = _load_matrix(qpdf)
    # n_probe nearest centroids per query, ties to lowest centroid id
    qsim = Q @ C.T
    order = np.lexsort((np.broadcast_to(cids, qsim.shape), -qsim), axis=1)
    q_cent = cids[order[:, :n_probe]]  # (n_queries, n_probe)
    ref = ray.put((qids, Q, q_cent, cids, C))

    class BucketTopK:
        """Per batch: assign rows to centroids, score only the rows landing
        in some query's bucket."""

        def __init__(self, ref):
            self.qids, self.Q, self.q_cent, self.cids, self.C = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy()
            M = np.array(batch["embedding"].tolist(), dtype=np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            cent = self.cids[(M @ self.C.T).argmax(axis=1)]
            sims = self.Q @ M.T  # (q, b)
            # out-of-bucket candidates -> -inf (dropped by _rowwise_topk);
            # the (q, b, n_probe) comparison is bool and bounded by the
            # batch size knob
            in_bucket = (cent[None, :, None] == self.q_cent[:, None, :]).any(axis=2)
            sims = np.where(in_bucket, sims, -np.inf)
            return _rowwise_topk(self.qids, ids, sims, k)

    partial = emb.map_batches(
        BucketTopK,
        fn_constructor_args=(ref,),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 8),
    )

    def final_topk(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["qid", "sim", "nid"], ascending=[True, False, True], kind="mergesort")
        g = b.groupby("qid", sort=False)
        out = g.head(k).copy()
        out["rank"] = out.groupby("qid", sort=False).cumcount().to_numpy() + 1
        out["rank"] = out["rank"].astype("int64")
        return out[["qid", "nid", "rank"]]

    return bucketed_group_apply(partial, "qid", final_topk, 16)


class TripleScorer:
    """Actor-pool triple scorer: holds the (tag->row, matrix) embedding
    state once per actor (reference ST5: KeyedVectors lookup +
    most_similar; here cosine(subj, obj) over deterministic id->vector
    assignment ``md5int8(entity_id) % n_vecs`` when entity tags are not in
    the embedding vocabulary)."""

    def __init__(self, emb_ref):
        import ray

        self.ids, self.M = ray.get(emb_ref)
        self.n = len(self.ids)

    def _rows(self, entity_ids: pd.Series) -> np.ndarray:
        # deterministic assignment: md5 % n is a row POSITION into the
        # matrix (valid for any vec_id space, dense or not)
        return md5int8_array(entity_ids.tolist()) % self.n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            batch["score"] = pd.Series([], dtype="float64")
            return batch
        s = self.M[self._rows(batch["subj_id"])]
        o = self.M[self._rows(batch["obj_id"])]
        batch = batch.copy(deep=False)
        batch["score"] = (s * o).sum(axis=1)
        return batch


def score_triples(triples_ds, emb, concurrency=(1, 8), batch_size: int = 4096):
    """Attach an embedding-similarity score to each triple.

    The matrix is built in vec_id order (not file order) so the
    position -> vector mapping is deterministic and the DuckDB oracle
    (oracles.SCORED_TRIPLES: row_number() OVER (ORDER BY vec_id)) can
    reproduce it."""
    import ray

    ids, M = _load_matrix(emb.to_pandas().sort_values("vec_id"))
    ref = ray.put((ids, M))
    return triples_ds.map_batches(
        TripleScorer,
        fn_constructor_args=(ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class TagTripleScorer:
    """Actor-pool scorer over LEARNED tag-keyed embeddings
    (stages/embedding_train.py output): score = cosine(subj_vec, obj_vec)
    via direct tag lookup; unknown tags score 0. The distributed analog of
    the reference's KeyedVectors similarity lookups
    (examples/load_entity_embeddings.py:1-17)."""

    def __init__(self, emb_ref):
        import ray

        tags, M = ray.get(emb_ref)
        self.row_of = {t: i for i, t in enumerate(tags)}
        self.M = M  # rows are L2-normalized by the trainer

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        if len(batch) == 0:
            batch["score"] = pd.Series([], dtype="float32")
            return batch
        rs = batch["subj_id"].map(self.row_of).fillna(-1).astype("int64").to_numpy()
        ro = batch["obj_id"].map(self.row_of).fillna(-1).astype("int64").to_numpy()
        s = np.where(rs[:, None] >= 0, self.M[rs], 0.0)
        o = np.where(ro[:, None] >= 0, self.M[ro], 0.0)
        batch["score"] = np.einsum("ij,ij->i", s, o).astype(np.float32)
        return batch


def score_triples_with(triples_ds, emb_ds, concurrency=(1, 8), batch_size: int = 4096):
    """score_triples over a LEARNED (tag, vector) embeddings Dataset."""
    import ray

    df = emb_ds.to_pandas()
    M = np.stack([np.asarray(v, dtype=np.float32) for v in df["vector"]])
    ref = ray.put((list(df["tag"]), M))
    return triples_ds.map_batches(
        TagTripleScorer,
        fn_constructor_args=(ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def default_classifier_weights(dim: int) -> np.ndarray:
    """Deterministic placeholder weights for the relation classifier when no
    trained weights are supplied: w_j = 0.3 * ((md5int8('w<j>') % 2001) -
    1000) / 1000 for j in 0..2*dim-1 — uniform in [-0.3, 0.3], reproducible
    in pure SQL (oracles.CLASSIFIED_TRIPLES) so the scoring path is
    oracle-checkable end to end. Real deployments pass trained weights."""
    h = md5int8_array([f"w{j}" for j in range(2 * dim)])
    return 0.3 * ((h % 2001) - 1000) / 1000.0


class LogisticRelationClassifier:
    """Embedding-based relation classifier (the paper's downstream scorer):
    sigmoid(w . [subj_vec ++ obj_vec] + b) per predicate, weights held in the
    actor (deterministic md5-derived weights when none are supplied)."""

    def __init__(self, emb_ref, dim: int, weights: np.ndarray | None = None):
        import ray

        self.ids, self.M = ray.get(emb_ref)
        self.n = len(self.ids)
        self.w = default_classifier_weights(dim) if weights is None else weights
        self.b = 0.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            batch["prob"] = pd.Series([], dtype="float64")
            return batch
        rows_s = md5int8_array(batch["subj_id"].tolist()) % self.n
        rows_o = md5int8_array(batch["obj_id"].tolist()) % self.n
        s = self.M[rows_s]
        o = self.M[rows_o]
        z = np.concatenate([s, o], axis=1) @ self.w + self.b
        batch = batch.copy(deep=False)
        batch["prob"] = 1.0 / (1.0 + np.exp(-z))
        return batch


def project_bp(ds, col: str, out_col: str):
    """Replace float column ``col`` with integer micro-units
    ``out_col = round(1e6 * col)`` (int64) — the projection under which
    numpy-float64 and DuckDB-double results compare bit-for-bit (both sides
    agree to ~1e-15 relative; the grid is 1e-6)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch[out_col] = np.rint(1e6 * batch[col]).astype("int64")
        return batch.drop(columns=[col])

    return ds.map_batches(fn, batch_format="pandas", batch_size=None)


def classify_triples(triples_ds, emb, concurrency=(1, 8)):
    import ray

    pdf = emb.to_pandas().sort_values("vec_id")
    ids, M = _load_matrix(pdf)
    dim = M.shape[1]
    ref = ray.put((ids, M))
    return triples_ds.map_batches(
        LogisticRelationClassifier,
        fn_constructor_args=(ref, dim),
        batch_format="pandas",
        concurrency=concurrency,
    )


# ---------------------------------------------------- LSH-bucketed ANN

LSH_PLANES = 8  # hyperplanes -> 2^8 buckets
LSH_BP = 10_000  # fixed-point quantization for the sign test


def _lsh_sign_matrix(dim: int, planes: int = LSH_PLANES) -> np.ndarray:
    """(planes, dim) ±1 hyperplane matrix derived from md5 — no RNG
    state, bit-identical in SQL: s[b, i] = +1 iff md5int8(f"lsh:{b}:{i}")
    is odd (i is 1-based to match SQL unnest ordinals)."""
    keys = [f"lsh:{b}:{i}" for b in range(planes) for i in range(1, dim + 1)]
    bits = md5int8_array(keys) & 1
    return (2 * bits - 1).astype(np.int64).reshape(planes, dim)


def _lsh_buckets(M: np.ndarray, S: np.ndarray) -> np.ndarray:
    """Bucket id per row of M: sign-random-projection over the EXACT
    integer quantization floor(v * LSH_BP), so a near-zero projection
    can't flip sign between engine and oracle float paths."""
    Q = np.floor(M.astype(np.float64) * LSH_BP).astype(np.int64)
    bits = (Q @ S.T) > 0  # (n, planes)
    return (bits.astype(np.int64) << np.arange(S.shape[0])[None, :]).sum(axis=1)


def lsh_assign(emb, planes: int = LSH_PLANES):
    """(vec_id, bucket) — narrow map, one int64 matmul per batch."""
    state: dict = {}

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                }
            )
        M = np.array(batch["embedding"].tolist(), dtype=np.float64)
        S = state.get("S")
        if S is None or S.shape[1] != M.shape[1]:
            S = state["S"] = _lsh_sign_matrix(M.shape[1], planes)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype("int64"),
                "bucket": _lsh_buckets(M, S),
            }
        )

    return emb.map_batches(assign, batch_format="pandas")


def ann_lsh_search(
    emb, n_queries: int = 5, k: int = 5, planes: int = LSH_PLANES,
    num_buckets: int = 16,
):
    """LSH-bucketed approximate nearest neighbours (the scale path next
    to :func:`ivf_search`): candidates are ONLY the corpus vectors
    sharing the query's sign-random-projection bucket, so per-batch work
    drops from O(batch x queries) full cosine to the bucket-collision
    slice; recall trades with ``planes`` exactly as IVF's trades with
    n_centroids. Deterministic end to end (md5 hyperplanes + integer
    sign test) — the oracle reproduces bucket assignment AND the final
    (sim DESC, nid) ranking.

    Same two-phase shape as knn_topk: per-batch partial top-k (masked to
    bucket collisions via the -inf convention of ``_rowwise_topk``),
    tiny exact final merge. The broadcast query state is
    (n_queries x d) plus their buckets.
    """
    import ray

    qpdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    if len(qpdf) == 0:
        raise ValueError(
            f"ann_lsh_search: no embedding rows with vec_id < {n_queries}"
        )
    qids, Q = _load_matrix(qpdf)
    Mq = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
    S = _lsh_sign_matrix(Mq.shape[1], planes)
    qbuckets = _lsh_buckets(Mq, S)
    qref = ray.put((qids, Q, qbuckets, S))

    class PartialTopK:
        def __init__(self, qref):
            self.qids, self.Q, self.qb, self.S = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy()
            if len(ids) == 0:
                return _rowwise_topk(
                    self.qids, ids.astype(np.int64), np.zeros((len(self.qids), 0)), k
                )
            M = np.array(batch["embedding"].tolist(), dtype=np.float64)
            cb = _lsh_buckets(M, self.S)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = self.Q @ Mn.T  # (q, b)
            sims = np.where(self.qb[:, None] == cb[None, :], sims, -np.inf)
            return _rowwise_topk(self.qids, ids, sims, k)

    partial = emb.map_batches(
        PartialTopK,
        fn_constructor_args=(qref,),
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 8),
    )

    def final_topk(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in bucket.groupby("qid", sort=False):
            g = g.sort_values(
                ["sim", "nid"], ascending=[False, True], kind="mergesort"
            ).head(k)
            out.append(
                pd.DataFrame(
                    {
                        "qid": qid,
                        "nid": g["nid"],
                        "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "qid": pd.Series([], dtype="int64"),
                    "nid": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        )

    res = bucketed_group_apply(
        partial, "qid", final_topk, min(num_buckets, n_queries)
    )

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        batch["rank"] = batch["rank"].astype("int64")
        return batch

    return res.map_batches(cast, batch_format="pandas")


def label_centroids(emb, scale: float = 1_000_000.0, num_buckets: int = 16):
    """Grouped vector pooling: per-label component sums of the quantized
    embeddings plus the vector count — the mean-pool / class-centroid
    aggregate (doc embedding from turn embeddings, class prototype from
    labeled vectors). Emitted as exact integers so the result is
    order-independent: components are floor(v * scale) PER VECTOR before
    summation; the mean is sum_q / n downstream.

    Scale shape: per-batch label-grouped ``np.add.reduceat`` partials
    (|labels| x dim rows per block — label-bounded, never row-bounded),
    lazy tree merge. Returns (label, dim_idx, sum_q, n)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "dim_idx": pd.Series([], dtype="int64"),
                    "sum_q": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        labels = batch["label"].to_numpy().astype(np.int64)
        M = np.array(batch["embedding"].tolist(), dtype=np.float64)
        Q = np.floor(M * scale).astype(np.int64)
        order = np.argsort(labels, kind="stable")
        labels = labels[order]
        Q = Q[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(labels[1:] != labels[:-1]) + 1)
        )
        sums = np.add.reduceat(Q, starts, axis=0)
        uniq = labels[starts]
        counts = np.diff(np.append(starts, len(labels)))
        dim = Q.shape[1]
        return pd.DataFrame(
            {
                "label": np.repeat(uniq, dim),
                "dim_idx": np.tile(np.arange(dim, dtype=np.int64), len(uniq)),
                "sum_q": sums.reshape(-1),
                "n": np.repeat(counts.astype(np.int64), dim),
            }
        )

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    partials = emb.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["label", "dim_idx"], as_index=False)[
            ["sum_q", "n"]
        ].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b.sort_values(["label", "dim_idx"]).reset_index(drop=True)
        return out.astype(
            {"label": "int64", "dim_idx": "int64", "sum_q": "int64",
             "n": "int64"}
        )

    return merge_partials(partials, ["label", "dim_idx"], combine, finalize,
                          plan="tree")


def embedding_quantize(emb):
    """Per-vector int8-range quantization codes — the storage/serving
    compression step before shipping an embedding table to an ANN
    index: (vec_id, i, code) with 1-based dimension index and
    ``code = floor((v - min) * 255 / (max - min))`` clamped to 255
    (0 for constant vectors). Per-vector min/max scaling (asymmetric,
    zero-point-free) — the simplest codebook; the reconstruction
    ``min + code * (max - min) / 255`` bounds per-dimension error at
    half a step.

    Determinism: values are cast to float64 BEFORE the arithmetic and
    the oracle mirrors the exact expression order, so engine and SQL
    floor the same IEEE double. Purely per-row vectorized (one
    list-flatten, no Python loop), no exchange."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        M = np.stack(
            [np.asarray(v, dtype=np.float32) for v in batch["embedding"]]
        ).astype(np.float64)
        n, d = M.shape
        mn = M.min(axis=1, keepdims=True)
        mx = M.max(axis=1, keepdims=True)
        rng = mx - mn
        safe = np.where(rng == 0, 1.0, rng)
        code = np.floor((M - mn) * 255.0 / safe)
        code = np.where(rng == 0, 0.0, np.minimum(code, 255.0))
        return pd.DataFrame(
            {
                "vec_id": np.repeat(ids, d),
                "i": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
                "code": code.reshape(-1).astype(np.int64),
            }
        )

    return emb.map_batches(fn, batch_format="pandas")
