"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact dedup (utils/pandas_utils.py:109-120) these
add the standard near-dup family. All are expressed as Ray Data
shuffles with per-batch combiners; every hash primitive has an exact
DuckDB equivalent (functions/textfns.py) so each operator is
oracle-checkable.

Scale notes:
- exact dedup: content-hash computed per batch; shuffle ships one row per
  (hash, batch) thanks to the local min-combiner.
- MinHash-LSH: signatures are computed vectorized per batch; the shuffle
  key is (band_id, band_key) so only banded collisions co-locate.
- n-gram Jaccard: candidate pairs come from a shingle inverted index
  (co-occurrence join), intersection counts from a pair-count aggregate,
  set sizes broadcast (small side) into the final filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import (
    MINHASH_BAND_ROWS,
    MINHASH_NUM_PERMS,
    NGRAM_MAX_DF,
    md5int8_array,
    minhash_signature,
    simhash32,
    shingles,
)
from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply


def exact_dedup(docs, num_buckets: int = 64):
    """Keep the first (min doc_id) row per exact text; returns
    (doc_id, text). Reference DropDuplicates semantics made deterministic
    (utils/pandas_utils.py:109-120 keeps pandas iteration order; we keep
    min id)."""

    def local_min(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch[["doc_id", "text"]]
            .groupby("text", sort=False, as_index=False)["doc_id"]
            .min()[["doc_id", "text"]]
        )

    pre = docs.map_batches(local_min, batch_format="pandas")
    return bucketed_group_apply(pre, "text", local_min, num_buckets)


def exact_dedup_hashed(docs, num_buckets: int = 64, plan: str = "auto"):
    """Scale variant of exact dedup: ship (md5(text), doc_id) through the
    merge instead of full document text. Returns the KEEP SET
    (doc_id, content_md5) — one row per distinct content, min doc_id —
    which a second broadcast/semi-join pass turns into deduped documents.
    At 100 TB this moves ~40 bytes/doc through the exchange instead of
    whole documents.

    The merge side goes through ``common.merge_partials`` (min-per-key is
    associative): a small measured partial set takes the no-shuffle
    reduction tree (saves the seconds-fixed sort-exchange barrier);
    billions of distinct contents fall back to the hash-partitioned
    exchange automatically."""
    import hashlib

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def local_min(batch: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        h = [md5(t.encode("utf-8")).hexdigest() for t in batch["text"]]
        b = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "content_md5": h})
        return b.groupby("content_md5", sort=False, as_index=False)["doc_id"].min()[
            ["doc_id", "content_md5"]
        ]

    def merge_min(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("content_md5", sort=False, as_index=False)[
            "doc_id"
        ].min()[["doc_id", "content_md5"]]

    pre = docs.map_batches(local_min, batch_format="pandas", batch_size=None)
    return merge_partials(
        pre,
        "content_md5",
        merge_min,
        lambda b: b[["doc_id", "content_md5"]],
        num_buckets,
        plan=plan,
    )


def _doc_shingles(batch: pd.DataFrame, k: int) -> pd.DataFrame:
    ids: list[int] = []
    shs: list[str] = []
    for did, txt in zip(batch["doc_id"], batch["text"]):
        for s in set(shingles(txt.split(" "), k)):
            ids.append(did)
            shs.append(s)
    return pd.DataFrame({"doc_id": ids, "shingle": shs})


def shingle_table(docs, k: int = 3):
    """(doc_id, shingle) distinct — the inverted-index feed."""
    return docs.map_batches(lambda b: _doc_shingles(b, k), batch_format="pandas")


def ngram_jaccard_pairs(
    docs,
    k: int = 3,
    threshold_bp: int = 5000,
    num_buckets: int = 64,
    max_df: int = NGRAM_MAX_DF,
    mode: str = "jaccard",
):
    """Near-dup pairs by k-token-shingle Jaccard (or containment).

    ``mode="jaccard"`` (default) returns (doc_a, doc_b, inter, size_a,
    size_b) for pairs with
    ``10000 * inter >= threshold_bp * (size_a + size_b - inter)`` —
    integer arithmetic only, so engine and oracle agree bit-for-bit.

    ``mode="containment"`` keeps pairs with
    ``10000 * inter >= threshold_bp * least(size_a, size_b)`` — the
    ASYMMETRIC shingle-containment criterion (is the smaller document
    essentially a subset of the larger?). Jaccard misses
    subset-duplication when the container is much larger (a paragraph
    quoted inside a long page scores near-zero Jaccard but 1.0
    containment); web-curation pipelines run both.

    Hot-shingle cap: a shingle appearing in more than ``max_df`` documents
    is EXCLUDED from candidate generation (its per-shingle self-join is
    O(df^2) — one stopword trigram shared by millions of docs would blow
    up the candidate table). Intersection counts therefore only cover
    sub-cap shingles; per-doc set sizes still count every shingle. The
    SQL oracle applies the identical cap, and each bucket worker logs the
    number of pruned (shingle, doc) postings (no silent truncation).

    Scale note: the per-doc size map is collected and broadcast
    (8+8 B/doc) — fine to ~10^9 docs; past that, swap the broadcast for
    the J3 co-partitioned hash join on doc id (relational._key_semi_anti
    pattern). For crawl-scale near-dup the family's scale path is
    MinHash-LSH (star) + connected components, not all-pairs Jaccard.
    """
    import ray

    # two consumers (sizes + candidate pairs): persist the shingle table
    # once instead of re-running the per-doc shingling and the corpus scan
    sh = shingle_table(docs, k).materialize()

    # small side: per-doc distinct shingle counts (|docs| rows) — broadcast
    def count_local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("doc_id", as_index=False).agg(size=("shingle", "nunique"))

    def count_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("doc_id", as_index=False).agg(size=("size", "sum"))

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    sizes = merge_partials(
        sh.map_batches(count_local, batch_format="pandas"),
        "doc_id",
        count_merge,
        lambda b: b,
        num_buckets,
    ).to_pandas()
    sizes_ref = ray.put(dict(zip(sizes["doc_id"], sizes["size"])))

    # candidate pairs: co-occurrence in the shingle inverted index.
    # Bucketing is BY shingle, so each bucket sees the complete posting
    # list of every shingle it holds — the df cap needs no extra pass.
    def pairs_of(bucket: pd.DataFrame) -> pd.DataFrame:
        df_of = bucket.groupby("shingle", sort=False)["doc_id"].transform("size")
        hot = df_of > max_df
        n_hot = int(hot.sum())
        if n_hot:
            import logging

            logging.getLogger("bio_re_with_entity_embeddings_ray.dedup").warning(
                "ngram_jaccard: pruned %d hot-shingle postings (df > %d) "
                "before pairing", n_hot, max_df
            )
            bucket = bucket[~hot]
        m = bucket.merge(bucket, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        g = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        return g.rename(
            columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b", "size": "inter"}
        )

    partial = bucketed_group_apply(sh, "shingle", pairs_of, num_buckets)

    def merge_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("inter", "sum")
        )

    # associative pair-count sum: tree for moderate candidate tables,
    # hash exchange beyond (same plan choice as the minhash distinct)
    pair_counts = merge_partials(
        partial, ["doc_a", "doc_b"], merge_pairs, lambda b: b, num_buckets,
        small_rows=10_000_000,
    )

    class JaccardFilter:
        def __init__(self, sizes_ref):
            self.sizes = ray.get(sizes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                # keep int64 dtypes: a bare [] assign makes float64 columns
                # and the empty block's schema then fails Arrow unification
                return batch.assign(
                    size_a=pd.Series([], dtype="int64"),
                    size_b=pd.Series([], dtype="int64"),
                )
            sa = batch["doc_a"].map(self.sizes).astype("int64")
            sb = batch["doc_b"].map(self.sizes).astype("int64")
            inter = batch["inter"].astype("int64")
            if mode == "containment":
                keep = 10000 * inter >= threshold_bp * np.minimum(sa, sb)
            else:
                keep = 10000 * inter >= threshold_bp * (sa + sb - inter)
            out = batch.assign(size_a=sa, size_b=sb)[keep.to_numpy()]
            out["inter"] = out["inter"].astype("int64")
            return out[["doc_a", "doc_b", "inter", "size_a", "size_b"]]

    return pair_counts.map_batches(
        JaccardFilter,
        fn_constructor_args=(sizes_ref,),
        batch_format="pandas",
        concurrency=(1, 4),
    )


def containment_pairs(
    docs,
    k: int = 3,
    threshold_bp: int = 8000,
    num_buckets: int = 64,
    max_df: int = NGRAM_MAX_DF,
):
    """Asymmetric shingle-containment near-dup pairs: keep (doc_a, doc_b)
    where ``inter / min(|A|, |B|) >= threshold_bp / 10000`` (integer
    arithmetic; see :func:`ngram_jaccard_pairs` ``mode="containment"``).
    Catches subset-duplication — one document quoted or embedded inside a
    much larger one — which symmetric Jaccard under-scores by design.
    Same candidate machinery, same hot-shingle cap, same scale shape."""
    return ngram_jaccard_pairs(
        docs,
        k=k,
        threshold_bp=threshold_bp,
        num_buckets=num_buckets,
        max_df=max_df,
        mode="containment",
    )


# worker-process-resident cache md5(text) -> minhash signature
# (int64[NUM_PERMS]). Dedup corpora repeat content by nature (that is why
# dedup exists), and Ray reuses worker processes across tasks, so identical
# documents hash once per worker. Keyed by the 16-byte md5 DIGEST, never the
# text itself, so per-entry memory is fixed (~200 B) regardless of document
# size: the entry cap bounds the cache to ~40 MB per worker even for
# multi-MB documents. Beyond the cap we compute without inserting.
_SIG_CACHE: dict[tuple[int, bytes], np.ndarray] = {}
_SIG_CACHE_MAX = 200_000


def _signature_of(text: str, k: int) -> np.ndarray | None:
    """Signature, or None when the doc yields no shingles (< k tokens) —
    matching the oracle, which emits no rows for such docs. Single-doc
    path kept for tests; the hot path is :func:`_signatures_for_batch`."""
    import hashlib

    ck = (k, hashlib.md5(text.encode("utf-8")).digest())
    sig = _SIG_CACHE.get(ck)
    if sig is None:
        sh = list(set(shingles(text.split(" "), k)))
        if not sh:
            return None
        sig = minhash_signature(md5int8_array(sh))
        if len(_SIG_CACHE) < _SIG_CACHE_MAX:
            _SIG_CACHE[ck] = sig
    return sig


def _signatures_for_batch(texts, k: int) -> list:
    """MinHash signatures for a whole batch, vectorized: cache hits are
    looked up by content digest; all misses run through ONE call of the
    shared distinct-shingle kernel (md5 once per DISTINCT shingle in the
    batch — textstats.distinct_shingle_hashes_per_row), then a single
    (P x shingles) permutation matrix + grouped ``np.minimum.reduceat``
    yields every miss's signature at C speed. The only remaining per-row
    Python is the content digest the cache is keyed by. Entries are
    ``None`` for sub-k-token docs (no shingles -> no bands)."""
    import hashlib

    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        distinct_shingle_hashes_per_row,
    )
    from bio_re_with_entity_embeddings_ray.functions.textfns import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_PRIME,
    )

    texts = list(texts)
    res: list = [None] * len(texts)
    keys = []
    miss_idx = []
    for i, t in enumerate(texts):
        ck = (k, hashlib.md5(t.encode("utf-8")).digest())
        keys.append(ck)
        sig = _SIG_CACHE.get(ck)
        if sig is not None:
            res[i] = sig
        else:
            miss_idx.append(i)
    if not miss_idx:
        return res
    _, sh_row, _, uniq_hash, gid = distinct_shingle_hashes_per_row(
        [texts[i] for i in miss_idx], k, return_codes=True
    )
    if len(sh_row) == 0:
        return res
    # permute only the UNIQUE shingle hashes (the expensive int64 modulo
    # runs once per distinct shingle, not per incidence), then fan out to
    # the incidence stream by gather — pure memory traffic, no division
    xu = uniq_hash % MINHASH_PRIME
    hu = (MINHASH_A[:, None] * xu[None, :] + MINHASH_B[:, None]) % MINHASH_PRIME
    hmat = hu[:, gid]  # (P, incidences)
    starts_mask = np.ones(len(sh_row), dtype=bool)
    starts_mask[1:] = sh_row[1:] != sh_row[:-1]
    starts = np.flatnonzero(starts_mask)
    mins = np.ascontiguousarray(
        np.minimum.reduceat(hmat, starts, axis=1).T
    )  # (groups, P)
    for g, local_row in enumerate(sh_row[starts]):
        gi = miss_idx[local_row]
        sig = mins[g]
        res[gi] = sig
        if len(_SIG_CACHE) < _SIG_CACHE_MAX:
            _SIG_CACHE[keys[gi]] = sig
    return res


def minhash_bands(docs, k: int = 3):
    """(doc_id, band_id, k0..k3) — LSH banding of MinHash signatures.

    Band keys are NUMERIC columns (the four signature rows of the band),
    not '-'-joined strings: the key never leaves the pipeline (the output
    of LSH is candidate pairs), and numeric multi-column keys keep the
    downstream bucket hash and groupby at C speed. The oracle's string
    band_key (oracles.MINHASH_LSH) groups identically."""
    n_bands = MINHASH_NUM_PERMS // MINHASH_BAND_ROWS

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = _signatures_for_batch(batch["text"], k)
        # sub-k-token docs emit no bands (oracle semantics)
        pairs = [(i, s) for i, s in enumerate(sigs) if s is not None]
        ids = batch["doc_id"].to_numpy()[[i for i, _ in pairs]]
        if not pairs:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "band_id": pd.Series([], dtype="int32"),
                    **{f"k{r}": pd.Series([], dtype="int64") for r in range(MINHASH_BAND_ROWS)},
                }
            )
        sigs = np.stack([s for _, s in pairs])  # (n, P)
        n = len(ids)
        out = {
            "doc_id": np.repeat(ids, n_bands),
            "band_id": np.tile(np.arange(n_bands, dtype=np.int32), n),
        }
        # row-major interleave: rows grouped per doc, band_id varying fastest
        for r in range(MINHASH_BAND_ROWS):
            cols = sigs[:, r::MINHASH_BAND_ROWS]  # (n, n_bands): row r of each band
            out[f"k{r}"] = cols.reshape(-1)
        return pd.DataFrame(out)

    return docs.map_batches(bands, batch_format="pandas", batch_size=None)


_BAND_KEYS = ["band_id", "k0", "k1", "k2", "k3"]


def minhash_lsh_pairs(docs, k: int = 3, num_buckets: int = 64, star: bool = False):
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    Returns distinct (doc_a, doc_b).

    ``star=False``: ALL intra-bucket pairs — the textbook LSH candidate
    set, but O(m^2) per bucket: a cluster of m exact/near duplicates
    emits m*(m-1)/2 pairs, which at corpus scale turns heavy duplication
    into a quadratic blowup of the candidate table.

    ``star=True`` (the scale path): each bucket emits only SPANNING edges
    (min doc_id, other) — linear in bucket size and preserving cluster
    connectivity, which is all a downstream connected-components /
    keep-one-per-cluster dedup needs. Both modes are oracle-checkable."""
    banded = minhash_bands(docs, k)

    if star:
        def pairs_of(bucket: pd.DataFrame) -> pd.DataFrame:
            mn = bucket.groupby(_BAND_KEYS, sort=False, as_index=False)[
                "doc_id"
            ].min().rename(columns={"doc_id": "doc_a"})
            m = bucket.merge(mn, on=_BAND_KEYS)
            m = m[m["doc_id"] > m["doc_a"]]
            return m[["doc_a", "doc_id"]].drop_duplicates().rename(
                columns={"doc_id": "doc_b"}
            )
    else:
        def pairs_of(bucket: pd.DataFrame) -> pd.DataFrame:
            m = bucket.merge(bucket, on=_BAND_KEYS)
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            return m[["doc_id_x", "doc_id_y"]].drop_duplicates().rename(
                columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"}
            )

    partial = bucketed_group_apply(banded, _BAND_KEYS, pairs_of, num_buckets)

    def distinct(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    # final cross-band dedup through the measured merge-plan chooser:
    # drop_duplicates is associative and SHRINKS at every tree level, so
    # the no-shuffle reduction tree (measured 1.7s vs the exchange's 5.1s
    # on 2.5M partial pairs) is safe while the candidate table stays
    # moderate; beyond small_rows the hash exchange takes over
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    return merge_partials(
        partial, ["doc_a", "doc_b"], distinct, distinct, num_buckets,
        small_rows=10_000_000,
    )


def connected_components(
    pairs, num_buckets: int = 64, max_iters: int = 64, method: str = "dataset"
):
    """Near-dup cluster resolution: (doc_a, doc_b) pair table ->
    (doc_id, cluster_id) with cluster_id = the MINIMUM doc_id reachable
    (the component representative). Only docs appearing in >= 1 pair are
    emitted; isolated docs are implicitly their own cluster.

    ``method="dataset"`` (default): pure Ray Data label propagation —
    re-ships the edge list through the exchange each round, the right
    trade for the 2-3-round near-star graphs LSH emits.
    ``method="actors"``: shard-actor variant (stages/cc_actors.py) that
    loads edge partitions ONCE and exchanges only label minima per round
    — equality-tested against this implementation and MEASURED 6x faster
    on real pair tables (645k LSH-star edges over 640k docs: 9.2s vs
    55.6s at 32 cpus), because the per-round Ray Data exchange dominates
    even at 3 rounds. Prefer it for any production-size graph.

    Distributed min-label propagation: each round every node's current
    label flows to its neighbors through a hash-partitioned exchange and
    each node adopts the minimum of held + received labels; convergence is
    detected with an exact changed-count (no fixed round budget). Rounds
    needed = component diameter: LSH ``star=True`` pairs (min-id hub per
    bucket) give near-star components that settle in ~2 rounds + 1
    verification round. Per round the exchange moves the 16-byte label
    table and the edge list — never document text. Doc ids must be
    non-negative (−1 is the internal union marker).

    This is the operator that turns the pair-emitting dedup family
    (MinHash-LSH / SimHash / Jaccard) into an end-to-end "keep one per
    near-dup cluster" corpus dedup — the reference's DropDuplicates
    (utils/pandas_utils.py:109-120) lifted to near-dup equivalence. Oracle:
    recursive-CTE transitive closure (oracles.DEDUP_CLUSTERS).
    """
    if method == "actors":
        import ray.data as rd

        from bio_re_with_entity_embeddings_ray.stages.cc_actors import (
            connected_components_actors,
        )

        # wrap to a Dataset so both methods return the same type
        return rd.from_pandas(
            connected_components_actors(
                pairs, num_shards=max(2, num_buckets // 8), max_iters=max_iters
            )
        )
    if method != "dataset":
        raise ValueError(f"unknown connected_components method {method!r}")

    def sym(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        return pd.DataFrame(
            {"node": np.concatenate([a, b]), "nbr": np.concatenate([b, a])}
        )

    edges = pairs.map_batches(sym, batch_format="pandas", batch_size=None).materialize()
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "cluster_id": pd.Series([], dtype="int64"),
        }
    )
    if edges.count() == 0:
        import ray.data as rd

        return rd.from_pandas(empty)

    # init: label(v) = min(v, min neighbor) — one propagation step for free
    def init_label(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("node", as_index=False)["nbr"].min()
        return pd.DataFrame(
            {"node": g["node"], "label": np.minimum(g["node"], g["nbr"])}
        )

    labels = bucketed_group_apply(edges, "node", init_label, num_buckets).materialize()

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"], "nbr": b["nbr"], "label": np.int64(-1)}
        )

    def tag_labels(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"], "nbr": np.int64(-1), "label": b["label"]}
        )

    def send(bucket: pd.DataFrame) -> pd.DataFrame:
        lab = bucket.loc[bucket["label"] >= 0, ["node", "label"]]
        ed = bucket.loc[bucket["label"] < 0, ["node", "nbr"]]
        m = ed.merge(lab, on="node")
        own = lab.assign(own=True)
        msg = pd.DataFrame({"node": m["nbr"], "label": m["label"], "own": False})
        return pd.concat([own, msg], ignore_index=True)

    def reduce_min(bucket: pd.DataFrame) -> pd.DataFrame:
        new = bucket.groupby("node", as_index=False)["label"].min()
        old = bucket.loc[bucket["own"], ["node", "label"]].rename(
            columns={"label": "old"}
        )
        out = new.merge(old, on="node")
        out["changed"] = (out["label"] < out["old"]).astype("int64")
        return out[["node", "label", "changed"]]

    for _ in range(max_iters):
        u = edges.map_batches(
            tag_edges, batch_format="pandas", batch_size=None
        ).union(labels.map_batches(tag_labels, batch_format="pandas", batch_size=None))
        cand = bucketed_group_apply(u, "node", send, num_buckets)
        stepped = bucketed_group_apply(cand, "node", reduce_min, num_buckets).materialize()
        n_changed = stepped.sum("changed")
        labels = stepped.drop_columns(["changed"]).materialize()
        if not n_changed:
            break
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iters} rounds "
            "(component diameter exceeds max_iters)"
        )

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["node"].astype("int64"),
                "cluster_id": b["label"].astype("int64"),
            }
        )

    return labels.map_batches(final, batch_format="pandas", batch_size=None)


def embedding_near_dup_ivf(emb, n_centroids: int = 8, threshold: float = 0.4,
                           centroids: str = "prefix", iters: int = 2):
    """Scale path for embedding near-dup: candidate pairs only WITHIN each
    IVF centroid bucket (coarse quantization — near-identical vectors land
    in the same bucket), instead of the all-pairs broadcast matmul of
    :func:`embedding_near_dup_pairs` which ships the full matrix to every
    task. Returns (vec_a, vec_b) with cosine >= threshold, vec_a < vec_b.
    Approximate: cross-bucket near-dups are missed by design (recall is
    the standard IVF trade; raise n_probe by lowering n_centroids).

    ``centroids="kmeans"`` swaps the vec_id-prefix codebook for the
    distributed Lloyd fit (same mode as
    :func:`~bio_re_with_entity_embeddings_ray.stages.scoring.ivf_assign`):
    Euclidean argmin on the RAW vectors, ties -> lowest centroid id —
    trained Voronoi cells group genuinely-similar vectors, improving
    within-bucket recall on clustered corpora."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages.scoring import _load_matrix

    if centroids == "kmeans":
        from bio_re_with_entity_embeddings_ray.stages.clustering import (
            kmeans_matrix,
        )

        Ck = kmeans_matrix(emb, k=n_centroids, iters=iters)
        kref = ray.put(Ck)

        class AssignRowsKm:
            def __init__(self, kref):
                self.C = ray.get(kref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                M = np.array(batch["embedding"].tolist(), dtype=np.float64)
                Cb = self.C
                d2 = (
                    (M * M).sum(axis=1, keepdims=True)
                    - 2.0 * (M @ Cb.T)
                    + (Cb * Cb).sum(axis=1)[None, :]
                )
                cent = d2.argmin(axis=1)  # raw vectors; ties -> lowest cid
                Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
                return pd.DataFrame(
                    {
                        "vec_id": batch["vec_id"].to_numpy(),
                        "centroid_id": cent.astype("int64"),
                        "embedding": [list(v) for v in Mn],
                    }
                )

        assigned = emb.map_batches(
            AssignRowsKm,
            fn_constructor_args=(kref,),
            batch_format="pandas",
            batch_size=2048,
            concurrency=(1, 8),
        )
    else:
        cpdf = (
            emb.filter(expr=f"vec_id < {n_centroids}")
            .to_pandas()
            .sort_values("vec_id")
        )
        if len(cpdf) == 0:
            raise ValueError(
                f"embedding_near_dup_ivf: no rows with vec_id < {n_centroids}"
            )
        cids, C = _load_matrix(cpdf)
        cref = ray.put((cids, C))

        class AssignRows:
            def __init__(self, cref):
                self.cids, self.C = ray.get(cref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                M = np.array(batch["embedding"].tolist(), dtype=np.float64)
                M /= np.linalg.norm(M, axis=1, keepdims=True)
                cent = self.cids[(M @ self.C.T).argmax(axis=1)]
                return pd.DataFrame(
                    {
                        "vec_id": batch["vec_id"].to_numpy(),
                        "centroid_id": cent.astype("int64"),
                        "embedding": [list(v) for v in M],
                    }
                )

        assigned = emb.map_batches(
            AssignRows,
            fn_constructor_args=(cref,),
            batch_format="pandas",
            batch_size=2048,
            concurrency=(1, 8),
        )

    def pairs_of(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("centroid_id", sort=False):
            ids = g["vec_id"].to_numpy()
            M = np.array(g["embedding"].tolist(), dtype=np.float64)
            S = M @ M.T
            ia, ib = np.where(np.triu(S >= threshold, k=1))
            a, b = ids[ia], ids[ib]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.extend(lo.tolist())
            out_b.extend(hi.tolist())
        return pd.DataFrame(
            {
                "vec_a": pd.Series(out_a, dtype="int64"),
                "vec_b": pd.Series(out_b, dtype="int64"),
            }
        ).drop_duplicates()

    return bucketed_group_apply(assigned, "centroid_id", pairs_of, 16)


def simhash_fingerprints(docs):
    """(doc_id, simhash) — 32-bit SimHash per document, multiset token
    semantics; pure per-batch map (no shuffle). Vectorized over the whole
    batch: md5 runs once per DISTINCT token (dictionary codes fan it back
    out), bit votes are one (tokens x 32) matrix summed per row by
    ``np.add.reduceat`` — identical bit-for-bit to per-doc
    textfns.simhash32 (property-tested)."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        from bio_re_with_entity_embeddings_ray.stages.textstats import (
            _flat_token_codes,
        )

        n_tok, _, codes, vocab = _flat_token_codes(batch["text"])
        n = len(n_tok)
        if n == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "simhash": pd.Series([], dtype="int64"),
                }
            )
        h = md5int8_array(vocab.tolist())[codes]
        contrib = (
            2 * ((h[:, None] >> np.arange(32)[None, :]) & 1) - 1
        ).astype(np.int32)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(n_tok[:-1], out=starts[1:])
        votes = np.add.reduceat(contrib, starts, axis=0)  # (n, 32)
        out = ((votes > 0).astype(np.int64) << np.arange(32)).sum(axis=1)
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": out})

    return docs.map_batches(fp, batch_format="pandas")


SIMHASH_BANDS = 4  # 32-bit simhash -> 4 bands of 8 bits
SIMHASH_MAX_HAMMING = 3  # pigeonhole: <=3 differing bits -> >=1 equal band


def simhash_near_dup_pairs(docs, max_hamming: int = SIMHASH_MAX_HAMMING):
    """(doc_a, doc_b) with hamming(simhash_a, simhash_b) <= max_hamming.

    Scale path: band the 32-bit simhash into SIMHASH_BANDS 8-bit slices
    and pair only within equal (band, slice) buckets — by pigeonhole any
    pair within max_hamming <= SIMHASH_BANDS - 1 bit flips shares at
    least one band, so banding finds EVERY qualifying pair (it is a
    candidate filter, not an approximation); candidates are then verified
    by exact popcount. Avoids the O(n^2) all-pairs join."""
    if max_hamming > SIMHASH_BANDS - 1:
        raise ValueError(
            f"simhash_near_dup_pairs: max_hamming={max_hamming} exceeds the "
            f"pigeonhole completeness bound of the {SIMHASH_BANDS}-band "
            f"filter (max {SIMHASH_BANDS - 1}); qualifying pairs would be "
            "silently dropped. Use more/smaller bands for larger radii."
        )
    fps = simhash_fingerprints(docs)

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.int64)
        ids = batch["doc_id"].to_numpy()
        n = len(h)
        return pd.DataFrame(
            {
                "doc_id": np.tile(ids, SIMHASH_BANDS),
                "simhash": np.tile(h, SIMHASH_BANDS),
                "band": np.repeat(np.arange(SIMHASH_BANDS, dtype=np.int64), n),
                "key": np.concatenate(
                    [(h >> (8 * b)) & 0xFF for b in range(SIMHASH_BANDS)]
                ),
            }
        )

    banded = fps.map_batches(bands, batch_format="pandas", batch_size=None)

    def pairs_of(bucket: pd.DataFrame) -> pd.DataFrame:
        m = bucket.merge(bucket, on=["band", "key"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                }
            )
        x = (m["simhash_x"].to_numpy() ^ m["simhash_y"].to_numpy()).astype(np.uint32)
        # vectorized popcount over uint32
        pc = np.unpackbits(x.view(np.uint8)).reshape(len(x), 4 * 8).sum(axis=1)
        keep = pc <= max_hamming
        out = m.loc[keep, ["doc_id_x", "doc_id_y"]].drop_duplicates()
        return out.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})

    partial = bucketed_group_apply(banded, ["band", "key"], pairs_of, 16)

    def distinct(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    # same tree-vs-exchange plan choice as minhash_lsh_pairs (see there)
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    return merge_partials(
        partial, ["doc_a", "doc_b"], distinct, distinct, 16,
        small_rows=10_000_000,
    )


def embedding_near_dup_pairs(emb, threshold: float = 0.4, block: int = 1024):
    """Near-dup (vec_a, vec_b) pairs by cosine >= threshold.

    Brute-force blocked matmul: the full (normalized) matrix is broadcast
    once via ``ray.put``; each batch multiplies against it. O(n^2) compute
    but O(n*d) shipped bytes — the baseline; the scale path bucketizes by
    IVF centroid first (see scoring.ivf_assign).
    """
    import ray

    pdf = emb.to_pandas()
    ids = pdf["vec_id"].to_numpy()
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    class Block:
        def __init__(self, ref):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            q = np.array(batch["embedding"].tolist(), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ self.M.T
            qa = batch["vec_id"].to_numpy()
            r, c = np.where(sims >= threshold)
            a, b = qa[r], self.ids[c]
            keep = a < b
            return pd.DataFrame(
                {
                    "vec_a": a[keep].astype("int64"),
                    "vec_b": b[keep].astype("int64"),
                }
            )

    return emb.map_batches(
        Block,
        fn_constructor_args=(ref,),
        batch_format="pandas",
        batch_size=block,
        concurrency=(1, 8),
    )


def duplicate_spans(docs, k: int = 3, num_buckets: int = 64):
    """Per-document exact-substring duplication coverage: the fraction of
    a document's k-token-gram POSITIONS whose gram also occurs in at
    least one OTHER document. Returns (doc_id, n_grams, dup_grams,
    dup_bp) for every doc with >= 1 gram (dup_bp = 10000 * dup //
    n_grams). The distributed recast of suffix-array exact-substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better" — their 50-token spans are this operator at k=50);
    gram identity is the repo-standard ``md5int8`` of the ' '-joined
    gram, shared bit-for-bit with the SQL oracle.

    Scale shape: the (gram, doc, occurrences) posting table IS the
    honest cost of exact-substring dedup — the suffix-array alternative
    is a global sort of comparable volume. One hash exchange keyed by
    gram computes per-gram distinct-doc counts and each doc's duplicated
    positions inside the bucket; a second, DOC-COUNT-sized exchange
    merges the per-bucket partials with each doc's total gram count.
    Positions never cross the wire (counts only), text never leaves the
    first map. A stopword gram shared by every doc is one hot bucket of
    COUNT rows, not positions — bounded by docs/bucket, the same blast
    radius as every bucketed merge here.
    """
    from bio_re_with_entity_embeddings_ray.functions.textfns import (
        md5int8_array,
        shingles,
        tokenize,
    )
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
    )

    def gram_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # per-block (g, doc_id, cnt) combiner; occurrences within a doc
        # collapse here so the exchange carries counts, not positions
        ids, gs = [], []
        for did, text in zip(batch["doc_id"].to_numpy(), batch["text"]):
            sh = shingles(tokenize(text), k)
            gs.extend(sh)
            ids.extend([did] * len(sh))
        if not gs:
            return pd.DataFrame(
                {
                    "g": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        df = pd.DataFrame({"g": md5int8_array(gs), "doc_id": np.asarray(ids)})
        out = df.groupby(["g", "doc_id"], as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype(
            {"g": "int64", "doc_id": "int64", "cnt": "int64"}
        )

    partials = docs.map_batches(gram_counts, batch_format="pandas", batch_size=None)

    def dup_partial(bucket: pd.DataFrame) -> pd.DataFrame:
        # bucket sees ALL rows of its grams: per-gram distinct-doc count,
        # then each doc's duplicated-position partial within this bucket
        b = bucket.groupby(["g", "doc_id"], as_index=False)["cnt"].sum()
        nd = b.groupby("g")["doc_id"].transform("nunique")
        dup = b[nd >= 2].groupby("doc_id", as_index=False)["cnt"].sum()
        return dup.rename(columns={"cnt": "v"}).assign(kind="dup")

    dups = bucketed_group_apply(partials, "g", dup_partial, num_buckets)

    def totals(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        n_tok = pc.list_value_length(
            pc.split_pattern(pa.array(batch["text"], type=pa.string()), " ")
        ).to_numpy().astype(np.int64)
        n_grams = np.maximum(n_tok - k + 1, 0)
        keep = n_grams > 0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[keep],
                "v": n_grams[keep],
                "kind": "tot",
            }
        )

    tot = docs.map_batches(totals, batch_format="pandas")

    def finish(bucket: pd.DataFrame) -> pd.DataFrame:
        p = bucket.pivot_table(
            index="doc_id", columns="kind", values="v", aggfunc="sum"
        )
        if "dup" not in p.columns:
            p["dup"] = 0
        n = p["tot"].fillna(0).astype("int64")
        d = p["dup"].fillna(0).astype("int64")
        keep = n > 0
        return pd.DataFrame(
            {
                "doc_id": p.index.to_numpy()[keep],
                "n_grams": n.to_numpy()[keep],
                "dup_grams": d.to_numpy()[keep],
                "dup_bp": (10000 * d // n).to_numpy()[keep].astype("int64"),
            }
        )

    return bucketed_group_apply(dups.union(tot), "doc_id", finish, num_buckets)


def paragraph_dedup(
    docs, para_tokens: int = 8, num_buckets: int = 64, plan: str = "auto"
):
    """Paragraph-level exact dedup, keep global first occurrence — the
    C4 / Dolma line-level dedup (Raffel et al. 2020 drop repeated
    three-sentence spans; Dolma dedupes at paragraph granularity). The
    corpus here is single-line word streams, so a "paragraph" is a fixed
    ``para_tokens``-token chunk of the whitespace token stream — the
    boundary rule is deterministic and mirrored exactly by the SQL
    oracle. A paragraph survives only in the lexicographically-smallest
    (doc_id, pidx) that contains its text; every other occurrence is
    dropped and the doc is reassembled from its surviving chunks.

    Returns (doc_id, n_paras, n_kept, text_dedup) for every doc with a
    non-empty token stream (text == '' has zero paragraphs, matching
    DuckDB's string_split('', ' ') = []). Docs that lose every paragraph
    stay in the output with n_kept = 0 and text_dedup = '' (exercised on
    the standard doubled corpus: the shifted copy loses everything).

    Scale shape: the paragraph table ships (doc_id, pidx, pkey) — 24
    B/paragraph, never text — through ONE pkey-hash exchange
    (first-occurrence winners) and one doc_id-keyed exchange packing each
    doc's surviving chunk indices (~4 B/paragraph strings). Reassembly
    joins that per-doc keep-list back to the corpus through the measured
    broadcast/hash plan (:func:`relational.hash_join`, how='left'): small
    surviving sets broadcast; past ``broadcast_max_rows`` the corpus makes
    one co-partitioned exchange — the only point text ever crosses the
    wire, inherent to reassembly. Paragraph identity is the repo-standard
    ``md5int8`` of the chunk text (collision odds ~n²/2³², shared
    bit-for-bit with the oracle's grouping).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from bio_re_with_entity_embeddings_ray.stages.aggregate import group_join
    from bio_re_with_entity_embeddings_ray.stages.relational import hash_join

    def _chunks(batch: pd.DataFrame):
        """(row local idx, pidx, para text) per non-empty doc — Arrow
        split + one C-level group_join, no per-row Python."""
        texts = pa.array(batch["text"], type=pa.string())
        nonempty = pc.not_equal(texts, "").to_numpy(zero_copy_only=False)
        rows = np.flatnonzero(nonempty)
        if len(rows) == 0:
            return pd.DataFrame(
                {
                    "r": pd.Series([], dtype="int64"),
                    "pidx": pd.Series([], dtype="int64"),
                    "para": pd.Series([], dtype="object"),
                }
            )
        lists = pc.split_pattern(pc.take(texts, pa.array(rows)), " ")
        par = pc.list_parent_indices(lists).to_numpy()
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        ords = np.arange(len(par), dtype=np.int64) - starts[par]
        f = pd.DataFrame(
            {
                "r": rows[par],
                "pidx": ords // para_tokens,
                "tok": pc.list_flatten(lists).to_pandas(),
            }
        )
        out = group_join(f, ["r", "pidx"], "tok", "para", sep=" ")
        return out.astype({"r": "int64", "pidx": "int64"})

    def para_table(batch: pd.DataFrame) -> pd.DataFrame:
        c = _chunks(batch)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[c["r"].to_numpy()],
                "pidx": c["pidx"].to_numpy(),
                "pkey": md5int8_array(list(c["para"])) if len(c) else
                    np.array([], dtype=np.int64),
            }
        )

    paras = docs.map_batches(para_table, batch_format="pandas", batch_size=None)

    def first_wins(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["pkey", "doc_id", "pidx"], kind="mergesort")
        k = b["pkey"].to_numpy()
        first = np.concatenate(([True], k[1:] != k[:-1])) if len(b) else \
            np.array([], dtype=bool)
        return b.loc[first, ["doc_id", "pidx"]]

    kept = bucketed_group_apply(paras, "pkey", first_wins, num_buckets)

    def pack(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["doc_id", "pidx"], kind="mergesort").copy(deep=False)
        b["pidx_s"] = b["pidx"].astype(str)
        return group_join(b, ["doc_id"], "pidx_s", "keep_pidx", sep=",")

    # map_groups emits ZERO-COLUMN blocks for empty sort partitions, which
    # the Arrow join rejects (and map_batches skips empty blocks, so they
    # can't be re-typed in a map). A split/merge repartition coalesces
    # them into typed blocks — cheap at this table's ~4 B/paragraph size.
    keep_lists = bucketed_group_apply(kept, "doc_id", pack, num_buckets).repartition(
        num_buckets
    )
    joined = hash_join(
        docs, keep_lists, "doc_id", plan=plan, num_buckets=num_buckets, how="left"
    )

    def rebuild(batch: pd.DataFrame) -> pd.DataFrame:
        c = _chunks(batch)
        r = c["r"].to_numpy()
        n_paras = np.bincount(r, minlength=len(batch)).astype(np.int64)
        # explode each row's keep-list into (r, pidx) pairs; inner merge
        # marks surviving chunks (all C-level, no per-row parsing)
        kl = pa.array(batch["keep_pidx"].fillna("").astype(str))
        klists = pc.split_pattern(kl, ",")
        kpar = pc.list_parent_indices(klists).to_numpy()
        kflat = pc.list_flatten(klists).to_pandas()
        ok = kflat != ""
        keep_pairs = pd.DataFrame(
            {"r": kpar[ok.to_numpy()], "pidx": kflat[ok].astype(np.int64).to_numpy()}
        )
        surv = c.merge(keep_pairs, on=["r", "pidx"], how="inner").sort_values(
            ["r", "pidx"], kind="mergesort"
        )
        n_kept = np.bincount(surv["r"].to_numpy(), minlength=len(batch)).astype(
            np.int64
        )
        texts = group_join(surv, ["r"], "para", "text_dedup", sep=" ")
        text_out = np.full(len(batch), "", dtype=object)
        text_out[texts["r"].to_numpy()] = texts["text_dedup"].to_numpy()
        has_paras = n_paras > 0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[has_paras],
                "n_paras": n_paras[has_paras],
                "n_kept": n_kept[has_paras],
                "text_dedup": text_out[has_paras],
            }
        )

    return joined.map_batches(rebuild, batch_format="pandas", batch_size=None)


def minhash_verified_pairs(
    docs,
    k: int = 3,
    threshold_bp: int = 5000,
    num_buckets: int = 64,
    max_df: int = NGRAM_MAX_DF,
):
    """The production near-dup chain: MinHash-LSH candidate generation +
    EXACT shingle-Jaccard verification — LSH supplies recall at banding
    cost, the exact pass restores precision (an LSH bucket collision is
    probabilistic; a verified pair is not). Returns the
    :func:`ngram_jaccard_pairs` schema (doc_a, doc_b, inter, size_a,
    size_b) restricted to pairs that ALSO share an LSH band bucket.

    Composition of two independently oracle-verified operators joined on
    the pair key through the measured
    :func:`~bio_re_with_entity_embeddings_ray.stages.relational.key_semi_anti_join`
    plan (broadcast while the candidate table fits — it is
    duplication-bounded, the curate keep-set regime — hash co-partition
    beyond). The exact side is bounded by the same hot-shingle ``max_df``
    cap as ngram_jaccard; a candidate-restricted intersection pass (skip
    exact counting for non-candidates) is the further optimization for
    corpora where verification dominates, at the cost of shipping the
    candidate set into the shingle buckets.
    """
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        key_semi_anti_join,
    )

    exact = ngram_jaccard_pairs(docs, k, threshold_bp, num_buckets, max_df)
    cands = minhash_lsh_pairs(docs, k, num_buckets)

    def pkey(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy(deep=False)
        out["pkey"] = (
            batch["doc_a"].astype(str) + "|" + batch["doc_b"].astype(str)
        )
        return out

    verified = key_semi_anti_join(
        exact.map_batches(pkey, batch_format="pandas", batch_size=None),
        cands.map_batches(pkey, batch_format="pandas", batch_size=None),
        "pkey",
        num_buckets=num_buckets,
        other_cols={
            "doc_a": np.int64(0), "doc_b": np.int64(0), "inter": np.int64(0),
            "size_a": np.int64(0), "size_b": np.int64(0),
        },
    )
    return verified.select_columns(["doc_a", "doc_b", "inter", "size_a", "size_b"])


def cluster_size_hist(docs, k: int = 3, num_buckets: int = 64):
    """Near-dup cluster-size histogram: resolve MinHash-LSH star pairs
    into connected components, then count clusters per size —
    (size, n_clusters), size >= 2 (singletons never enter the pair
    graph). The dedup QA dashboard number: how much of the corpus sits
    in 2-clusters vs giant blobs.

    Scale shape: composition of verified passes (star pairs -> CC) plus
    one cluster-keyed count combiner and a size-bounded tree merge —
    cluster ids never funnel through a single task until the final
    |distinct sizes|-row histogram."""
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    pairs = minhash_lsh_pairs(docs, k, num_buckets, star=True)
    cc = connected_components(pairs, num_buckets)

    def per_cluster(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("cluster_id", as_index=False).agg(
            size=("doc_id", "size")
        )
        g["size"] = g["size"].astype("int64")
        return g

    sizes = bucketed_group_apply(cc, "cluster_id", per_cluster, num_buckets)

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("size", as_index=False).agg(n_clusters=("size", "size"))
        g["n_clusters"] = g["n_clusters"].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("size", as_index=False)["n_clusters"].sum()

    return merge_partials(
        sizes.map_batches(hist_partial, batch_format="pandas", batch_size=None),
        "size", combine, lambda b: b, num_buckets, plan="tree",
    )


def sorted_neighborhood_pairs(
    docs,
    key_col: str = "n_chars",
    window: int = 3,
    num_ranges: int = 16,
    num_buckets: int = 16,
):
    """Sorted-neighborhood ER blocking: rank all documents by
    ``(key_col, doc_id)`` and emit every pair within ``window`` ranks —
    (doc_a, doc_b, rank_a, rank_b). The classic entity-resolution
    blocking strategy (Hernandez & Stolfo's merge/purge): candidate
    pairs are O(n·window) instead of O(n²), with the sort key chosen so
    likely duplicates land adjacent (here a numeric attribute; length
    blocking — near-duplicate documents have near-identical sizes).
    Complements the hash-bucketed families (LSH, simhash bands): those
    need near-EQUALITY of a signature, this catches near-ORDER.

    Scale shape: ranks come from :func:`ordered.global_rank`'s ranged
    prefix scan (O(num_ranges) driver state, narrow int64 exchange).
    Pairing never materializes the sorted corpus: each row is routed to
    its rank-window bucket ``(rank-1) // window`` AND the one below (the
    standard overlapping-window trick), so every qualifying pair
    co-locates in exactly one owning bucket; per bucket the join is a
    vectorized self-merge on rank+d for d in 1..window. Output is
    O(n·window) rows regardless of key skew — ties don't blow up,
    unlike equality blocking on a hot key."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply
    from bio_re_with_entity_embeddings_ray.stages.ordered import global_rank

    narrow = docs.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                key_col: b[key_col].astype("int64"),
            }
        ),
        batch_format="pandas",
        batch_size=None,
    )
    ranked = global_rank(narrow, [key_col, "doc_id"], num_ranges=num_ranges)

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch["rank"].to_numpy() - 1) // window
        home = pd.DataFrame(
            {"doc_id": batch["doc_id"], "rank": batch["rank"], "g": g}
        )
        below = home[home["g"] > 0].assign(g=lambda d: d["g"] - 1)
        return pd.concat([home, below], ignore_index=True)

    fanned = ranked.map_batches(fan_out, batch_format="pandas", batch_size=None)

    def pair_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        b = bucket[["doc_id", "rank", "g"]]
        for d in range(1, window + 1):
            right = b.rename(
                columns={"doc_id": "doc_b", "rank": "rank_b"}
            ).assign(rank=lambda x: x["rank_b"] - d)
            m = b.merge(right, on=["g", "rank"])
            # ownership: the pair belongs to the LEFT row's home bucket,
            # so each pair is emitted exactly once across buckets
            m = m[(m["rank"] - 1) // window == m["g"]]
            out.append(
                pd.DataFrame(
                    {
                        "doc_a": m["doc_id"].to_numpy(),
                        "doc_b": m["doc_b"].to_numpy(),
                        "rank_a": m["rank"].to_numpy(),
                        "rank_b": m["rank_b"].to_numpy(),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "doc_a": np.array([], np.int64),
                    "doc_b": np.array([], np.int64),
                    "rank_a": np.array([], np.int64),
                    "rank_b": np.array([], np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(fanned, "g", pair_bucket, num_buckets)


def minhash_jaccard_est(docs, k: int = 3, num_buckets: int = 64):
    """MinHash Jaccard ESTIMATES for the LSH candidate pairs:
    (doc_a, doc_b, est_bp) with ``est_bp = 10000 * matching_perms //
    NUM_PERMS`` — the estimator-calibration surface (compare against
    :func:`ngram_jaccard_pairs`' exact values to validate band/row
    settings before a crawl-scale run; `minhash_verified_pairs` is the
    production intersection, this exposes the raw estimate).

    Scale shape: candidates come from the banded LSH exchange (never
    all-pairs); the per-doc signatures (NUM_PERMS int64 = 128 B/doc)
    are broadcast once and the per-batch match count is one vectorized
    (pairs x NUM_PERMS) equality sum. Past ~10^8 candidate docs, swap
    the broadcast for a doc-keyed signature join (relational.hash_join),
    same note as the Jaccard size map."""
    import ray

    from bio_re_with_entity_embeddings_ray.functions.textfns import (
        MINHASH_NUM_PERMS,
    )

    cand = minhash_lsh_pairs(docs, k=k, num_buckets=num_buckets)

    def sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = _signatures_for_batch(batch["text"], k)
        ids, mats = [], []
        for did, s in zip(batch["doc_id"], sigs):
            if s is not None:
                ids.append(did)
                mats.append(s)
        if not ids:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "sig": pd.Series([], dtype="object")})
        return pd.DataFrame({"doc_id": ids, "sig": [m.tolist() for m in mats]})

    sig_df = docs.map_batches(
        sig_rows, batch_format="pandas"
    ).to_pandas()
    smap = {
        int(d): np.asarray(s, dtype=np.int64)
        for d, s in zip(sig_df["doc_id"], sig_df["sig"])
    }
    sref = ray.put(smap)

    class Estimate:
        def __init__(self, sref):
            self.sig = ray.get(sref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return pd.DataFrame(
                    {
                        "doc_a": pd.Series([], dtype="int64"),
                        "doc_b": pd.Series([], dtype="int64"),
                        "est_bp": pd.Series([], dtype="int64"),
                    }
                )
            A = np.stack([self.sig[int(d)] for d in batch["doc_a"]])
            B = np.stack([self.sig[int(d)] for d in batch["doc_b"]])
            m = (A == B).sum(axis=1).astype(np.int64)
            return pd.DataFrame(
                {
                    "doc_a": batch["doc_a"].to_numpy(),
                    "doc_b": batch["doc_b"].to_numpy(),
                    "est_bp": 10000 * m // MINHASH_NUM_PERMS,
                }
            )

    return cand.map_batches(
        Estimate,
        fn_constructor_args=(sref,),
        batch_format="pandas",
        concurrency=(1, 4),
    )
