"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All integer-output (basis points instead of float ratios) so the DuckDB
oracle matches bit-for-bit; all single-pass ``map_batches`` with
vectorized pandas/numpy bodies (no shuffle).

The shared token kernel (:func:`_flat_token_codes`) splits every row's
text with Arrow's ``split_pattern`` (byte-identical to Python
``text.split(" ")``, verified in tests) and dictionary-encodes the
flattened token stream in Arrow C++ — so per-row distinct counts,
stopword counts and marker membership are all integer-code numpy work.
No per-row Python lambdas anywhere in these full-corpus maps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array

# marker-word language heuristic: first matching marker wins, priority order
LANG_MARKERS: list[tuple[str, str]] = [
    ("the", "en"),
    ("le", "fr"),
    ("der", "de"),
    ("el", "es"),
]
STOPWORDS = ("the", "a", "of", "to", "and")


def _flat_token_codes(texts):
    """texts -> (n_tok, row_idx, codes, vocab): single-space tokens of all
    rows flattened and dictionary-encoded at C level.

    ``n_tok[i]`` = token count of row i; ``row_idx[j]`` = owning row of
    flat token j; ``codes[j]`` = integer id of flat token j into ``vocab``
    (a numpy object array of the batch's distinct tokens). Split semantics
    are identical to Python ``text.split(" ")`` including empty strings
    and consecutive separators."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(texts, type=pa.string())
    lists = pc.split_pattern(arr, " ")
    n_tok = pc.list_value_length(lists).to_numpy().astype(np.int64)
    row_idx = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    enc = pc.dictionary_encode(pc.list_flatten(lists))
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary.to_numpy(zero_copy_only=False)
    return n_tok, row_idx, codes, vocab


def _distinct_per_row(n_rows: int, row_idx: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Per-row distinct token count: sort the (row, code) pairs once and
    count group-change points — all C-level, no per-row set()."""
    if len(codes) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    order = np.lexsort((codes, row_idx))
    r, c = row_idx[order], codes[order]
    new = np.ones(len(r), dtype=bool)
    new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    return np.bincount(r[new], minlength=n_rows).astype(np.int64)


def token_quality_arrays(texts):
    """-> (n_tokens, n_distinct, n_stop) int64 arrays for each text row —
    the vectorized kernel behind :func:`quality_scores` and the curate
    pipelines' quality filter."""
    n_tok, row_idx, codes, vocab = _flat_token_codes(texts)
    n = len(n_tok)
    n_distinct = _distinct_per_row(n, row_idx, codes)
    # membership is decided once on the tiny batch vocabulary, then
    # propagated to the token stream by integer isin + bincount
    stop_codes = np.flatnonzero(np.isin(vocab, STOPWORDS))
    n_stop = np.bincount(
        row_idx[np.isin(codes, stop_codes)], minlength=n
    ).astype(np.int64)
    return n_tok, n_distinct, n_stop


def _lang_pred(n_rows: int, row_idx: np.ndarray, codes: np.ndarray, vocab: np.ndarray):
    """First-matching-marker language per row (priority order), via one
    vocabulary lookup + boolean scatter per marker."""
    pred = np.full(n_rows, "und", dtype=object)
    assigned = np.zeros(n_rows, dtype=bool)
    for marker, lang in LANG_MARKERS:
        mc = np.flatnonzero(vocab == marker)
        if len(mc) == 0:
            continue
        hit = np.zeros(n_rows, dtype=bool)
        hit[row_idx[codes == mc[0]]] = True
        sel = hit & ~assigned
        pred[sel] = lang
        assigned |= sel
    return pred


def token_counts(docs):
    """(doc_id, n_tokens, n_chars)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(batch["text"], type=pa.string())
        n_tok = (
            pc.list_value_length(pc.split_pattern(arr, " "))
            .to_numpy()
            .astype(np.int64)
        )
        n_chars = pc.utf8_length(arr).to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "n_tokens": n_tok, "n_chars": n_chars}
        )

    return docs.map_batches(fn, batch_format="pandas")


def quality_scores(docs):
    """(doc_id, n_tokens, n_distinct, distinct_bp, stop_bp).

    distinct_bp = floor(10000 * n_distinct / n_tokens) — integer basis
    points, the reference-free quality heuristics a pretraining pipeline
    filters on.
    """

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, n_distinct, n_stop = token_quality_arrays(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "n_distinct": n_distinct,
                "distinct_bp": 10000 * n_distinct // np.maximum(n_tok, 1),
                "stop_bp": 10000 * n_stop // np.maximum(n_tok, 1),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def lang_id(docs):
    """(doc_id, pred_lang) — marker-word heuristic, priority order."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        pred = _lang_pred(len(n_tok), row_idx, codes, vocab)
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})

    return docs.map_batches(fn, batch_format="pandas")


FP_MOD = 2305843009213693951  # 2^61 - 1


def _modsum(terms: np.ndarray, mod: int = FP_MOD) -> int:
    """Exact sum(terms) % mod without int64 overflow: pairwise tree fold
    with a mod at every level (each addition stays < 2*mod < 2^62)."""
    a = terms % mod
    while len(a) > 1:
        k = (len(a) + 1) // 2
        pad = np.zeros(k * 2, dtype=np.int64)
        pad[: len(a)] = a
        a = (pad[0::2] + pad[1::2]) % mod
    return int(a[0]) if len(a) else 0


def fingerprints(docs):
    """(doc_id, fingerprint) — position-weighted token-hash fingerprint
    ``sum(md5int8(w_i) * i) mod 2^61-1`` (1-based), an order-sensitive
    rolling-hash analog. The modulus makes engine and SQL agree exactly at
    any document length: per-term products stay < 2^49 (md5int8 < 2^32,
    position < 2^17 at sane doc sizes), the engine folds with a modular
    tree, and DuckDB's HUGEINT SUM then ``% mod`` lands on the same value
    instead of a signed-int64 wrap."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        # md5 once per DISTINCT token in the batch (the expensive part),
        # fanned back out to the token stream by integer indexing
        h = md5int8_array(vocab.tolist())[codes]
        starts = np.zeros(len(n_tok) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=starts[1:])
        pos = np.arange(len(codes), dtype=np.int64) - starts[:-1][row_idx] + 1
        terms = h * pos  # each < 2^49 (md5int8 < 2^32, pos < 2^17)
        out = np.empty(len(n_tok), dtype=np.int64)
        for j in range(len(n_tok)):  # per-row modular tree fold (exact)
            out[j] = _modsum(terms[starts[j] : starts[j + 1]])
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": out})

    return docs.map_batches(fn, batch_format="pandas")


def exact_quantiles(ds, col: str, qs_bp: list[int], num_buckets: int = 16):
    """Distributed EXACT quantiles of an integer metric column.

    Definition (mirrored bit-for-bit by the SQL oracle): the q-quantile is
    the value at 1-based position ``ceil(q * n)`` in ascending sorted
    order (q in basis points; q=0 maps to position 1). Returns
    (q_bp, value) — one row per requested quantile.

    Scale shape: a per-batch ``value_counts`` combiner collapses each
    block to one row per distinct value, a hash-partitioned merge sums
    counts per value, and only the (distinct value, count) table — small
    for any bounded metric like token counts or bp scores, regardless of
    corpus size — is collected for the cumulative scan. No global sort,
    no row shuffle; exact, not an approximation. For unbounded
    high-cardinality metrics, bound the domain first (round/clip), or the
    value table itself becomes the problem.
    """
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def local_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        return pd.DataFrame(
            {"value": vc.index.astype("int64"), "cnt": vc.to_numpy().astype("int64")}
        )

    partials = ds.map_batches(local_counts, batch_format="pandas", batch_size=None)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("value", as_index=False)["cnt"].sum()

    counts = (
        bucketed_group_apply(partials, "value", merge, num_buckets)
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    n = int(counts["cnt"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "q_bp": pd.Series([], dtype="int64"),
                "value": pd.Series([], dtype="int64"),
            }
        )
    cum = counts["cnt"].cumsum().to_numpy()
    vals = counts["value"].to_numpy()
    out_q, out_v = [], []
    for q in qs_bp:
        pos = max(1, -(-q * n // 10000))  # ceil(q*n/10000), floor at 1
        out_q.append(int(q))
        out_v.append(int(vals[np.searchsorted(cum, pos)]))
    return pd.DataFrame(
        {
            "q_bp": pd.Series(out_q, dtype="int64"),
            "value": pd.Series(out_v, dtype="int64"),
        }
    )


def lang_and_tokens(docs):
    """(doc_id, pred_lang, n_tokens) in ONE narrow map — both are pure
    functions of text, so computing them together avoids the doc_id join
    a lang_id ⋈ token_counts composition would need."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        pred = _lang_pred(len(n_tok), row_idx, codes, vocab)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pred,
                "n_tokens": n_tok,
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def exact_quantiles_by(ds, group_col: str, col: str, qs_bp: list[int], num_buckets: int = 16):
    """Distributed EXACT per-group quantiles of an integer metric:
    (group, q_bp, value) with the same position definition as
    :func:`exact_quantiles` (1-based ceil(q*n/10000), ascending order),
    applied within each group.

    Scale shape: per-block (group, value) count combiner, then ONE hash
    exchange keyed by group — each bucket computes its groups' cumulative
    histograms vectorized. Exchange volume is (groups x distinct values)
    count rows, independent of row count. Fully distributed end to end
    (no driver-side collection, unlike the global exact_quantiles whose
    final table is a single cumsum)."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    qs = sorted(set(int(q) for q in qs_bp))

    def local_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby([group_col, col]).size().reset_index(name="cnt")

    partials = ds.map_batches(local_counts, batch_format="pandas", batch_size=None)

    def per_group(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        c = bucket.groupby([group_col, col], as_index=False)["cnt"].sum()
        for grp, g in c.groupby(group_col, sort=False):
            g = g.sort_values(col)
            cum = g["cnt"].cumsum().to_numpy()
            vals = g[col].to_numpy()
            n = int(cum[-1])
            for q in qs:
                pos = max(1, -(-q * n // 10000))
                rows.append((grp, q, int(vals[np.searchsorted(cum, pos)])))
        out = pd.DataFrame(rows, columns=[group_col, "q_bp", "value"])
        out["q_bp"] = out["q_bp"].astype("int64")
        out["value"] = out["value"].astype("int64")
        return out

    return bucketed_group_apply(partials, group_col, per_group, num_buckets)


def vocab_topk(docs, k: int = 50, num_buckets: int = 16):
    """Global top-k most frequent tokens: (token, cnt, rank), ties broken
    by token. Per-block value_counts combiner -> token-keyed hash merge ->
    per-bucket partial top-k (each bucket ships only k rows) -> tiny
    driver-side final cut. The exchange volume is (distinct tokens x
    blocks) count rows; the driver sees num_buckets * k rows."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        _, _, codes, vocab = _flat_token_codes(batch["text"])
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        return pd.DataFrame({"token": vocab.astype(str), "cnt": cnt})

    partials = docs.map_batches(local, batch_format="pandas", batch_size=None)

    def merge_top(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("token", as_index=False)["cnt"].sum()
        g = g.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    per_bucket = bucketed_group_apply(partials, "token", merge_top, num_buckets)
    top = (
        per_bucket.to_pandas()
        .sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["cnt"] = top["cnt"].astype("int64")
    return top


def distinct_shingle_hashes_per_row(texts, k: int, return_codes: bool = False):
    """texts -> (n_rows, sh_row, sh_hash): for each row, its DISTINCT
    k-token shingle md5int8 hashes (``sh_row[i]`` owns ``sh_hash[i]``,
    non-decreasing). Shingle identity is resolved on integer token codes
    (one lexsort); md5 runs once per distinct shingle STRING in the
    batch, then fans out by code — the shared hot kernel behind MinHash
    signatures (stages/dedup) and benchmark decontamination
    (stages/safety).

    With ``return_codes=True`` the return is
    (n_rows, sh_row, sh_hash, uniq_hash, gid) where ``uniq_hash`` holds
    each distinct shingle's hash ONCE and ``gid`` maps every (row,
    shingle) incidence to its index — so callers can run per-shingle
    arithmetic on the (much smaller) unique set and fan results out by
    gather instead of recomputing per incidence."""
    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array

    def _empty(n):
        e = np.empty(0, dtype=np.int64)
        return (n, e, e, e, e) if return_codes else (n, e, e)

    n_tok, row_idx, codes, vocab = _flat_token_codes(texts)
    n = len(n_tok)
    if len(codes) < k:
        return _empty(n)
    L = len(codes) - k + 1
    valid = row_idx[:L] == row_idx[k - 1 :]
    cols = [codes[i : L + i][valid] for i in range(k)]
    kg_row = row_idx[:L][valid]
    if len(kg_row) == 0:
        return _empty(n)
    # distinct (row, tuple): lexsort once, keep group heads
    order = np.lexsort((*reversed(cols), kg_row))
    sr = kg_row[order]
    new = np.ones(len(sr), dtype=bool)
    new[1:] = sr[1:] != sr[:-1]
    scols = []
    for col in cols:
        sc = col[order]
        new[1:] |= sc[1:] != sc[:-1]
        scols.append(sc)
    heads = np.flatnonzero(new)
    h_row = sr[heads]
    h_cols = [sc[heads] for sc in scols]
    # md5 once per distinct shingle string across the whole batch: unique
    # the code-tuples globally, build strings only for those
    tup_order = np.lexsort(tuple(reversed(h_cols)))
    t_cols = [c[tup_order] for c in h_cols]
    t_new = np.zeros(len(tup_order), dtype=bool)
    t_new[0] = True
    for c in t_cols:
        t_new[1:] |= c[1:] != c[:-1]
    uniq_idx = np.flatnonzero(t_new)
    gid_sorted = np.cumsum(t_new) - 1  # group id per sorted tuple
    gid = np.empty(len(tup_order), dtype=np.int64)
    gid[tup_order] = gid_sorted
    vocab_obj = vocab.astype(object)
    parts = [vocab_obj[c[uniq_idx]] for c in t_cols]
    uniq_strings = parts[0]
    for p in parts[1:]:
        uniq_strings = uniq_strings + " " + p
    uniq_hash = md5int8_array(uniq_strings.tolist())
    if return_codes:
        return n, h_row, uniq_hash[gid], uniq_hash, gid
    return n, h_row, uniq_hash[gid]


def _max_run_per_row(n_rows: int, row_idx: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Per-row maximum token multiplicity: sort (row, code) once, measure
    run lengths at C level, then a grouped max per row."""
    out = np.zeros(n_rows, dtype=np.int64)
    if len(codes) == 0:
        return out
    order = np.lexsort((codes, row_idx))
    r, c = row_idx[order], codes[order]
    change = np.empty(len(r), dtype=bool)
    change[0] = True
    change[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    starts = np.flatnonzero(change)
    runs = np.diff(np.append(starts, len(r)))
    run_row = r[starts]
    row_change = np.empty(len(run_row), dtype=bool)
    row_change[0] = True
    row_change[1:] = run_row[1:] != run_row[:-1]
    row_starts = np.flatnonzero(row_change)
    out[run_row[row_starts]] = np.maximum.reduceat(runs, row_starts)
    return out


def repetition_scores(docs, k: int = 3):
    """Gopher-style repetition quality signals per document:
    (doc_id, n_tokens, n_kgrams, rep_kgram_bp, top_token_bp).

    ``rep_kgram_bp`` = 10000 * (n_kgrams - n_distinct_kgrams) // n_kgrams
    — the fraction of token k-grams that are repeats of an earlier k-gram
    (boilerplate / template text scores high). ``top_token_bp`` = 10000 *
    max token multiplicity // n_tokens — a single token dominating the
    document (spam / keyword stuffing). Both integer basis points so the
    DuckDB oracle matches bit-for-bit.

    Fully vectorized narrow map: the k-gram identity is the integer-code
    k-tuple from the shared dictionary-encoded token kernel (no k-gram
    strings are ever built), distinct counts are one lexsort over the
    (row, c0..c_{k-1}) columns, no shuffle. These are the per-document
    repetition rules of Rae et al. 2021 (Gopher) §A1.1, recast as
    streaming batch kernels."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, _ = _flat_token_codes(batch["text"])
        n = len(n_tok)
        n_kg = np.maximum(n_tok - k + 1, 0)
        # valid k-gram start j: all k member tokens belong to row j's row
        if len(codes) >= k:
            valid = row_idx[: len(codes) - k + 1] == row_idx[k - 1 :]
            cols = [codes[i : len(codes) - k + 1 + i][valid] for i in range(k)]
            kg_row = row_idx[: len(codes) - k + 1][valid]
            order = np.lexsort((*reversed(cols), kg_row))
            sr = kg_row[order]
            new = np.ones(len(sr), dtype=bool)
            new[1:] = sr[1:] != sr[:-1]
            for col in cols:
                sc = col[order]
                new[1:] |= sc[1:] != sc[:-1]
            n_distinct_kg = np.bincount(sr[new], minlength=n).astype(np.int64)
        else:
            n_distinct_kg = np.zeros(n, dtype=np.int64)
        top = _max_run_per_row(n, row_idx, codes)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "n_kgrams": n_kg,
                "rep_kgram_bp": 10000 * (n_kg - n_distinct_kg) // np.maximum(n_kg, 1),
                "top_token_bp": 10000 * top // np.maximum(n_tok, 1),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def tfidf_topk(docs, top: int = 3, num_buckets: int = 16):
    """Per-document top-``top`` terms by an integer tf-idf surrogate:
    (doc_id, token, tf, score_ppb, rank) with
    ``score_ppb = 10**9 * tf // (n_tokens * df)`` (term frequency
    normalized by document length, damped by corpus document frequency —
    all-integer so the SQL oracle agrees exactly). Ties by token asc.

    Scale shape: pass 1 computes the (token, df) table with a per-block
    distinct-(doc, token) combiner and a token-keyed hash merge — df rows
    are bounded by VOCABULARY size, not corpus size, so the table is
    broadcast (``ray.put`` once, mapped per batch via a C-level
    ``Series.map``). Pass 2 is a narrow map: per-doc tf from the
    dictionary codes, score, partial sort, top rows. For open-vocabulary
    corpora cap the broadcast with ``min_df`` (tokens below it can never
    score high enough to matter at sane ``top``)."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def local_df(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        n = len(n_tok)
        order = np.lexsort((codes, row_idx))
        r, c = row_idx[order], codes[order]
        new = np.ones(len(r), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        cnt = np.bincount(c[new], minlength=len(vocab)).astype(np.int64)
        return pd.DataFrame({"token": vocab.astype(str), "df": cnt})

    partials = docs.map_batches(local_df, batch_format="pandas", batch_size=None)

    def merge_df(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("token", as_index=False)["df"].sum()

    df_tab = bucketed_group_apply(partials, "token", merge_df, num_buckets).to_pandas()
    df_map = ray.put(pd.Series(df_tab["df"].to_numpy(), index=df_tab["token"]))

    class Score:
        def __init__(self, df_ref):
            self.df = ray.get(df_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
            order = np.lexsort((codes, row_idx))
            r, c = row_idx[order], codes[order]
            change = np.empty(len(r), dtype=bool)
            if len(r):
                change[0] = True
                change[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
            starts = np.flatnonzero(change)
            tf = np.diff(np.append(starts, len(r)))
            g_row, g_code = r[starts], c[starts]
            toks = vocab[g_code].astype(str)
            dfv = (
                pd.Series(toks).map(self.df).fillna(1).to_numpy().astype(np.int64)
            )
            score = 10**9 * tf // (n_tok[g_row] * dfv)
            out = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[g_row],
                    "token": toks,
                    "tf": tf.astype(np.int64),
                    "score_ppb": score.astype(np.int64),
                }
            )
            out = out.sort_values(
                ["doc_id", "score_ppb", "token"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
            out = out[out["rank"] <= top]
            out["rank"] = out["rank"].astype("int64")
            return out

    return docs.map_batches(
        Score,
        fn_constructor_args=(df_map,),
        batch_format="pandas",
        concurrency=(1, 8),
    )


def inverted_index(docs, max_postings: int = 8, num_buckets: int = 16):
    """Token -> postings inverted index: (token, df, postings) where
    ``postings`` is the ','-joined first ``max_postings`` doc_ids
    (ascending) containing the token and ``df`` the full document count.

    Scale shape: per-block distinct-(token, doc_id) combiner (so the
    exchange ships one row per token-doc incidence, no text), then ONE
    hash exchange keyed by token; each bucket sorts its postings and cuts
    to ``max_postings`` vectorized. A hot token's postings are capped, so
    no task ever holds an unbounded list — the standard truncated-postings
    contract of search indexes."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        order = np.lexsort((codes, row_idx))
        r, c = row_idx[order], codes[order]
        new = np.ones(len(r), dtype=bool)
        if len(r):
            new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        return pd.DataFrame(
            {
                "token": vocab[c[new]].astype(str),
                "doc_id": batch["doc_id"].to_numpy()[r[new]],
            }
        )

    partials = docs.map_batches(local, batch_format="pandas", batch_size=None)

    def build(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["token", "doc_id"], kind="mergesort")
        g = b.groupby("token", sort=False)
        df_cnt = g.size().rename("df")
        head = b[g.cumcount() < max_postings]
        postings = (
            head.astype({"doc_id": str})
            .groupby("token", sort=False)["doc_id"]
            .agg(",".join)
            .rename("postings")
        )
        out = pd.concat([df_cnt, postings], axis=1).reset_index()
        out["df"] = out["df"].astype("int64")
        return out[["token", "df", "postings"]]

    return bucketed_group_apply(partials, "token", build, num_buckets)


def bm25_topk(docs, query: str = "join sort window", k: int = 10,
              k1: float = 1.2, b: float = 0.75):
    """Top-``k`` documents for a fixed ``query`` under BM25 (Robertson et
    al., Okapi; Lucene's non-negative idf variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``). Returns
    (doc_id, score_fp, rank) with rank 1..k, ties by doc_id asc.

    Determinism contract (mirrored by the SQL oracle): each (doc, term)
    contribution ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` is
    floored to integer micro-units FIRST (``floor(contrib * 1e6)``), then
    summed — integer addition is order-independent, so the engine's
    per-token accumulation and the oracle's unordered SUM agree exactly
    (float SUM order would not). Ranking is by the integer score.

    Scale shape: pass 1 streams one tiny per-block partial — (df per
    QUERY term, block doc count, block token count); the merged stats
    table is bounded by the query length, not the vocabulary, so it lives
    on the driver like the kmeans k x d update. Pass 2 is a pure narrow
    map scoring each doc against the broadcast stats, with a per-block
    top-k combiner; only blocks x k candidate rows reach the final merge.
    No shuffle anywhere."""
    import ray

    q_terms = query.split(" ")

    def local_stats(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        rows = {"term": [], "df": []}
        vl = {t: i for i, t in enumerate(vocab)}
        for t in q_terms:
            code = vl.get(t)
            if code is None:
                rows["term"].append(t)
                rows["df"].append(0)
            else:
                mask = codes == code
                rows["term"].append(t)
                rows["df"].append(int(np.unique(row_idx[mask]).size))
        out = pd.DataFrame(rows)
        out["docs"] = np.int64(len(n_tok))
        out["toks"] = np.int64(n_tok.sum())
        return out

    stats = (
        docs.map_batches(local_stats, batch_format="pandas", batch_size=None)
        .to_pandas()  # len(q_terms) x blocks rows — query-bounded, not corpus
    )
    df_map = stats.groupby("term")["df"].sum()
    # per-block scalars repeat on every term row; take one term's rows
    one = stats[stats["term"] == q_terms[0]]
    n_docs = int(one["docs"].sum())
    n_toks = int(one["toks"].sum())
    avgdl = n_toks / n_docs
    idf = {
        t: float(np.log(1.0 + (n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5)))
        for t in q_terms
    }
    sref = ray.put((idf, avgdl))

    class Score:
        def __init__(self, sref):
            self.idf, self.avgdl = ray.get(sref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
            n = len(n_tok)
            score_fp = np.zeros(n, dtype=np.int64)
            vl = {t: i for i, t in enumerate(vocab)}
            dl = n_tok.astype(np.float64)
            for t in q_terms:
                code = vl.get(t)
                if code is None:
                    continue
                tf = np.bincount(row_idx[codes == code], minlength=n).astype(
                    np.float64
                )
                contrib = (
                    self.idf[t]
                    * tf
                    * (k1 + 1)
                    / (tf + k1 * (1 - b + b * dl / self.avgdl))
                )
                score_fp += np.floor(contrib * 1e6).astype(np.int64)
            keep = score_fp > 0
            out = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[keep],
                    "score_fp": score_fp[keep],
                }
            )
            # per-block top-k combiner: only k candidates leave the block
            out = out.sort_values(
                ["score_fp", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
            return out

    cand = docs.map_batches(
        Score,
        fn_constructor_args=(sref,),
        batch_format="pandas",
        batch_size=None,
        concurrency=(1, 8),
    ).to_pandas()  # blocks x k rows
    if len(cand) == 0:
        cand = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "score_fp": pd.Series([], dtype="int64"),
            }
        )
    cand = cand.sort_values(
        ["score_fp", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand.reset_index(drop=True)


def bigram_nll(docs, num_buckets: int = 16):
    """Per-document negative log-likelihood under a corpus bigram LM with
    Laplace smoothing — the quality-scoring idea of CCNet (Wenzek et al.
    2020: perplexity under a reference LM separates clean text from
    boilerplate/gibberish), with the corpus itself as the reference.
    Returns (doc_id, n_bigrams, nll_fp) for docs with >= 2 tokens, where
    ``nll_fp = sum over bigram positions of
    floor(-ln((c(w1,w2) + 1) / (c_ctx(w1) + V)) * 1e6)`` — each position's
    contribution is floored to integer micro-nats BEFORE the sum, so the
    oracle's unordered SQL SUM agrees exactly. Perplexity is
    ``exp(nll_fp / (1e6 * n_bigrams))`` for the caller.

    Scale shape: the bigram table is VOCABULARY^2-bounded (not corpus-
    bounded) — per-block (w1, w2, count) combiners, one token-keyed hash
    merge, then ONE broadcast (``ray.put``); context counts are row sums
    of that same table and V comes from a distinct-token merge whose
    exchange volume is vocabulary-bounded. Scoring is a pure narrow map
    (C-level Series.map lookups on joined keys). For open vocabularies
    cap the table by min count and bucket the tail into an <unk> row —
    the standard LM-table discipline."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    SEP = "\x01"

    def local_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        if len(codes) < 2:
            return pd.DataFrame(
                {
                    "w1": pd.Series([], dtype="object"),
                    "w2": pd.Series([], dtype="object"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        same = row_idx[:-1] == row_idx[1:]
        c1, c2 = codes[:-1][same], codes[1:][same]
        df = pd.DataFrame({"w1": vocab[c1], "w2": vocab[c2]})
        out = df.groupby(["w1", "w2"], as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype({"cnt": "int64"})

    bparts = docs.map_batches(local_bigrams, batch_format="pandas", batch_size=None)

    def merge_b(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["w1", "w2"], as_index=False)["cnt"].sum()

    btab = bucketed_group_apply(bparts, ["w1", "w2"], merge_b, num_buckets).to_pandas()

    def local_vocab(batch: pd.DataFrame) -> pd.DataFrame:
        _, _, _, vocab = _flat_token_codes(batch["text"])
        return pd.DataFrame({"token": vocab.astype(str)})

    vparts = docs.map_batches(local_vocab, batch_format="pandas", batch_size=None)
    V = int(
        bucketed_group_apply(
            vparts, "token", lambda b: b.drop_duplicates(), num_buckets
        ).count()
    )

    bser = pd.Series(
        btab["cnt"].to_numpy(),
        index=btab["w1"].astype(str) + SEP + btab["w2"].astype(str),
    )
    cser = btab.groupby("w1")["cnt"].sum()
    ref = ray.put((bser, cser, V))

    class Score:
        def __init__(self, ref):
            self.b, self.c, self.V = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
            n = len(n_tok)
            if len(codes) < 2:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "n_bigrams": pd.Series([], dtype="int64"),
                        "nll_fp": pd.Series([], dtype="int64"),
                    }
                )
            same = row_idx[:-1] == row_idx[1:]
            r = row_idx[:-1][same]
            w1 = pd.Series(vocab[codes[:-1][same]].astype(str))
            w2 = pd.Series(vocab[codes[1:][same]].astype(str))
            cb = (w1 + SEP + w2).map(self.b).to_numpy(dtype=np.float64)
            cc = w1.map(self.c).to_numpy(dtype=np.float64)
            nfp = np.floor(
                -np.log((cb + 1.0) / (cc + self.V)) * 1e6
            ).astype(np.int64)
            nll = np.bincount(r, weights=nfp, minlength=n).astype(np.int64)
            n_big = np.bincount(r, minlength=n).astype(np.int64)
            keep = n_big > 0
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[keep],
                    "n_bigrams": n_big[keep],
                    "nll_fp": nll[keep],
                }
            )

    return docs.map_batches(
        Score,
        fn_constructor_args=(ref,),
        batch_format="pandas",
        concurrency=(1, 8),
    )


# BPE-ish pre-tokenization: letter runs | digit runs | single
# non-alphanumeric marks (the GPT-2 pre-tokenizer's shape without the
# byte-level vocab). RE2 both sides: Arrow count_substring_regex in the
# engine, DuckDB regexp_extract_all in the oracle.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts_regex(docs):
    """(doc_id, n_tokens, n_bpe_tokens) — whitespace token count next to
    a BPE-ish regex pre-token count, one zero-copy Arrow map (both are
    C-level RE2/split kernels; no Python per row)."""

    def fn(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = batch["text"]
        n_tok = pc.list_value_length(pc.split_pattern(arr, " ")).cast(pa.int64())
        n_bpe = pc.count_substring_regex(arr, pattern=BPE_TOKEN_RE).cast(pa.int64())
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": n_tok, "n_bpe_tokens": n_bpe}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def winsorize(ds, col: str, lo_bp: int = 500, hi_bp: int = 9500,
              num_buckets: int = 16):
    """Percentile winsorization of an integer metric column: clip every
    value into [q_lo, q_hi] exact global quantiles (the
    :func:`exact_quantiles` position rule — mirrored by the oracle).
    Adds ``clipped``; keeps the original column for auditability.

    Scale shape: identical to ``curate_percentile`` — one histogram
    combiner pass yielding two scalars, then a pure narrow clip map.
    The standard outlier guard before computing means/ratios over
    heavy-tailed doc-length distributions."""
    # the quantile pass and the clip pass both consume ds: pin it once
    ds = ds.materialize()
    qs = exact_quantiles(ds, col, [lo_bp, hi_bp], num_buckets)
    lo = int(qs["value"].iloc[0])
    hi = int(qs["value"].iloc[1])

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["clipped"] = np.clip(
            batch[col].to_numpy(), lo, hi
        ).astype("int64")
        return batch

    return ds.map_batches(clip, batch_format="pandas")


def _deletion_keys(tokens: np.ndarray):
    """FastSS deletion neighborhood, vectorized across tokens per length
    group: for token t emit t itself plus every delete-one-char variant.
    Two distinct tokens are within edit distance 1 IFF they share a key
    (complete blocking for ED<=1; candidates still need verification —
    e.g. 'ab'/'ba' share keys at distance 2). Returns (keys, owners)."""
    lens = np.array([len(t) for t in tokens], dtype=np.int64)
    out_k: list = []
    out_t: list = []
    for L in np.unique(lens):
        grp = tokens[lens == L]
        out_k.append(grp)
        out_t.append(grp)
        if L < 2:
            continue
        A = grp.astype(f"<U{L}").view(np.uint32).reshape(len(grp), L)
        for i in range(L):
            D = np.ascontiguousarray(
                np.concatenate([A[:, :i], A[:, i + 1 :]], axis=1)
            )
            out_k.append(D.view(f"<U{L - 1}").ravel())
            out_t.append(grp)
    return np.concatenate(out_k), np.concatenate(out_t)


def _ed1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact edit-distance<=1 verification for candidate
    pairs with |len(a) - len(b)| <= 1, grouped by length pair (no
    per-pair Python DP)."""
    la = np.array([len(t) for t in a], dtype=np.int64)
    lb = np.array([len(t) for t in b], dtype=np.int64)
    ok = np.zeros(len(a), dtype=bool)
    for (x, y) in {(int(p), int(q)) for p, q in zip(la, lb)}:
        m = (la == x) & (lb == y)
        if not m.any():
            continue
        if x == y:
            A = a[m].astype(f"<U{x}").view(np.uint32).reshape(-1, x)
            B = b[m].astype(f"<U{x}").view(np.uint32).reshape(-1, x)
            ok[m] = (A != B).sum(axis=1) <= 1
        elif abs(x - y) == 1:
            s, t = (a[m], b[m]) if x < y else (b[m], a[m])
            Ls = min(x, y)
            S = s.astype(f"<U{Ls}").view(np.uint32).reshape(-1, Ls)
            T = t.astype(f"<U{Ls + 1}").view(np.uint32).reshape(-1, Ls + 1)
            # first mismatch position p vs the longer string's prefix;
            # then S[p:] must equal T[p+1:] (one insertion)
            eq = S == T[:, :Ls]
            p = np.where(eq.all(axis=1), Ls, eq.argmin(axis=1))
            J = np.broadcast_to(np.arange(Ls), S.shape)
            Bidx = J + (J >= p[:, None])
            ok[m] = (S == np.take_along_axis(T, Bidx, axis=1)).all(axis=1)
    return ok


FUZZY_MIN_LEN = 4


def fuzzy_token_pairs(docs, min_len: int = FUZZY_MIN_LEN,
                      num_buckets: int = 16):
    """Spelling-variant detection over the corpus vocabulary — the
    entity-resolution primitive (surface-form clustering) at token
    granularity: all DISTINCT token pairs (a < b) within edit distance 1,
    for tokens of at least ``min_len`` chars (short tokens produce noise
    and hot deletion keys; the oracle mirrors the cap).

    FastSS/SymSpell shape: vocabulary (combiner-distinct, bounded) →
    delete-one-char key fan-out (complete for ED<=1) → per-key candidate
    pairs (bucketed; a key's candidates are its collision set, not the
    corpus) → vectorized exact verification (:func:`_ed1_mask`) →
    cross-key distinct merge. The corpus streams once for the vocab
    pass; everything after is vocabulary-bounded.
    """
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def vocab_partial(batch: pd.DataFrame):
        import pyarrow as pa

        w = batch["text"].str.split(" ").explode()
        u = w[w.str.len() >= min_len].unique()
        # emit an Arrow-typed block so zero-row partials keep a string
        # schema (an empty pandas object column trips Ray's size probe)
        return pa.table({"w": pa.array(u, type=pa.string())})

    vocab = merge_partials(
        docs.map_batches(vocab_partial, batch_format="pandas"),
        "w",
        lambda b: b.drop_duplicates("w"),
        lambda b: b,
        num_buckets,
    )

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["w"].to_numpy()
        if len(toks) == 0:
            return pd.DataFrame(
                {"key": pd.Series([], dtype="object"),
                 "w": pd.Series([], dtype="object")}
            )
        keys, owners = _deletion_keys(toks)
        return pd.DataFrame({"key": keys, "w": owners})

    keyed = vocab.map_batches(fan_out, batch_format="pandas")

    def per_key_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="object"),
             "b": pd.Series([], dtype="object")}
        )
        if len(bucket) == 0:
            return empty
        b = bucket.drop_duplicates(["key", "w"]).sort_values(
            ["key", "w"], kind="mergesort"
        )
        w = b["w"].to_numpy()
        from bio_re_with_entity_embeddings_ray.stages.common import (
            segment_pairs,
        )

        a_idx, b_idx = segment_pairs(b["key"].to_numpy())
        if len(a_idx) == 0:
            return empty
        cand = pd.DataFrame({"a": w[a_idx], "b": w[b_idx]}).drop_duplicates()
        keep = _ed1_mask(cand["a"].to_numpy(), cand["b"].to_numpy())
        return cand[keep]

    pairs = bucketed_group_apply(keyed, "key", per_key_pairs, num_buckets)

    return merge_partials(
        pairs,
        ["a", "b"],
        lambda b: b.drop_duplicates(["a", "b"]),
        lambda b: b,
        num_buckets,
    )


def bpe_pair_counts(docs, k: int = 20, num_buckets: int = 16):
    """First merge round of BPE tokenizer training: the top-``k`` adjacent
    token pairs by corpus frequency (count DESC, then (w1, w2) ASC) —
    the counting kernel a distributed tokenizer-induction loop re-runs
    after every merge. Returns (w1, w2, n, rank).

    Scale shape: adjacent pairs are index arithmetic over the flat
    dictionary-encoded token stream (no pair strings until the per-batch
    C-level groupby); partials are one row per (pair, block), merged
    through the measured plan — the pair key space is vocabulary-bounded,
    not corpus-bounded."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        _, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        if len(codes) < 2:
            return pd.DataFrame(
                {
                    "w1": pd.Series([], dtype=str),
                    "w2": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        adj = row_idx[1:] == row_idx[:-1]
        c1, c2 = codes[:-1][adj], codes[1:][adj]
        g = (
            pd.DataFrame({"w1": vocab[c1], "w2": vocab[c2]})
            .groupby(["w1", "w2"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype("int64")
        return g

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["w1", "w2"], as_index=False)["n"].sum()

    def bucket_topk(combined: pd.DataFrame) -> pd.DataFrame:
        # per-bucket-SAFE partial for a global top-k: each hash bucket
        # holds the COMPLETE count for every key it owns, so its local
        # top-k is a superset-contributing candidate set; the global
        # top-k over <= k*num_buckets candidate rows runs in one final
        # single-block pass below (fixes the plan='auto' shuffle path,
        # which used to emit k rows PER bucket with duplicate ranks)
        b = combined.sort_values(
            ["n", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
        ).head(k)
        b = b.reset_index(drop=True)
        b["n"] = b["n"].astype("int64")
        return b

    def global_final(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(
            ["n", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
        ).head(k)
        b = b.reset_index(drop=True)
        b["n"] = b["n"].astype("int64")
        b["rank"] = np.arange(1, len(b) + 1, dtype=np.int64)
        return b

    partials = docs.map_batches(partial, batch_format="pandas")
    cand = merge_partials(partials, ["w1", "w2"], combine, bucket_topk, num_buckets)
    # <= k rows per bucket regardless of plan; one tiny final block
    return cand.repartition(1).map_batches(
        global_final, batch_format="pandas", batch_size=None
    )


def doc_entropy(docs):
    """Per-document unigram entropy in integer micro-nats:
    ``entropy_fp = SUM over distinct tokens w of floor(c_w * ln(n / c_w)
    * 1e6)`` where ``c_w`` is w's count and ``n`` the doc's token count —
    the vocabulary-diversity quality signal (low entropy = template/spam).

    Per-token-type contributions are floored to integers BEFORE the sum
    (the bm25/bigram_nll discipline) so the oracle's unordered SQL SUM
    matches the engine's accumulation order exactly. Single narrow pass,
    no shuffle; the per-row type counts come from one lexsort over the
    dictionary-encoded token stream."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, _ = _flat_token_codes(batch["text"])
        n_rows = len(n_tok)
        ent = np.zeros(n_rows, dtype=np.int64)
        if len(codes):
            order = np.lexsort((codes, row_idx))
            r, c = row_idx[order], codes[order]
            new = np.ones(len(r), dtype=bool)
            new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(r))).astype(np.int64)
            rows = r[starts]
            contrib = np.floor(
                cnt * np.log(n_tok[rows] / cnt) * 1_000_000
            ).astype(np.int64)
            # integer-valued float64 sums below 2^53 are exact in any order
            ent = np.bincount(rows, weights=contrib, minlength=n_rows).astype(
                np.int64
            )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "entropy_fp": ent,
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def chunk_documents(docs, size: int = 120, overlap: int = 24):
    """Fixed-size overlapping character chunking — the RAG / embedding
    prep step (split every document into ``size``-codepoint windows
    starting every ``step = size - overlap`` codepoints; the final chunk
    may be short, and an empty document yields one empty chunk). Rows:
    ``(doc_id, chunk_id, start, chunk_len, chunk_text)``.

    Scale shape: pure narrow map, no exchange — the ~len/step x fan-out
    streams straight to the consumer (an embedder actor pool or a
    partitioned parquet sink). Slicing is O(max_chunks_per_batch) Arrow
    ``utf8_slice_codeunits`` kernel calls over column-masked takes
    (codepoint-identical to Python slicing, unicode-safe), never a
    per-row Python loop."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap

    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "chunk_len": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        texts = batch["text"].combine_chunks()
        doc_ids = batch["doc_id"].combine_chunks().cast(pa.int64())
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        # chunks per doc: 1 for len<=size, else 1 + ceil((len-size)/step)
        m = 1 + np.maximum(0, (lens - size + step - 1) // step)
        pieces = []
        for j in range(int(m.max())):
            idx = pa.array(np.flatnonzero(m > j))
            tj = texts.take(idx)
            sliced = pc.utf8_slice_codeunits(
                tj, start=j * step, stop=j * step + size
            )
            n = len(idx)
            pieces.append(
                pa.table(
                    {
                        "doc_id": doc_ids.take(idx),
                        "chunk_id": pa.array(np.full(n, j, dtype=np.int64)),
                        "start": pa.array(np.full(n, j * step, dtype=np.int64)),
                        "chunk_len": pc.utf8_length(sliced).cast(pa.int64()),
                        "chunk_text": sliced,
                    }
                )
            )
        return pa.concat_tables(pieces)

    return docs.map_batches(fn, batch_format="pyarrow")


def similar_doc_pairs(docs, top: int = 20, num_buckets: int = 16,
                      w_scale: int = 1_000_000):
    """Sparse tf-idf-style document-pair similarity mining: the global
    top-``top`` document pairs by the EXACT integer weighted dot product
    ``dot(a, b) = SUM over shared tokens t of tf(a,t) * tf(b,t) * W(t)``
    with ``W(t) = w_scale // df(t)^2`` (an integer idf^2 surrogate),
    plus each side's norm ``SUM tf^2 * W`` — rank by (dot DESC, doc_a,
    doc_b). Cosine is a driver-side sqrt away; keeping the exact integers
    makes the oracle bit-stable.

    Scale shape: the df table is vocabulary-bounded (per-block distinct
    combiner + token-keyed merge). W(t) gives a PRINCIPLED hot-term
    bound: df(t) > sqrt(w_scale) => W = 0, and zero-weight postings are
    dropped BEFORE the per-token pair expansion, so the stopword-blowup
    guard is the scoring function itself, not an arbitrary cap (df = 1
    terms never pair either). Pair partials merge per hash bucket
    (complete per key), each bucket emits its local top as a combinable
    candidate, and one final single-block pass takes the global top —
    the bpe_pair_counts top-k discipline. Integer envelope: per-term
    contribution <= n_tok^2 * w_scale/4; document the corpus's max doc
    length vs int64 when raising ``w_scale``.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def local_postings(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        order = np.lexsort((codes, row_idx))
        r, c = row_idx[order], codes[order]
        change = np.ones(len(r), dtype=bool)
        change[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(change)
        tf = np.diff(np.append(starts, len(r))).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[r[starts]],
                "token": vocab[c[starts]].astype(str),
                "tf": tf,
            }
        )

    postings = docs.map_batches(
        local_postings, batch_format="pandas", batch_size=None
    ).materialize()  # two consumers: df merge + pair expansion

    def local_df(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("token", as_index=False).agg(df=("doc_id", "size"))
        g["df"] = g["df"].astype("int64")
        return g

    def merge_df(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("token", as_index=False)["df"].sum()

    df_tab = merge_partials(
        postings.map_batches(local_df, batch_format="pandas", batch_size=None),
        "token", merge_df, lambda b: b, num_buckets,
    ).to_pandas()
    w = w_scale // (df_tab["df"].to_numpy() ** 2)
    w_map = ray.put(pd.Series(w, index=df_tab["token"])[w > 0])

    def weighted(b: pd.DataFrame, _w=w_map) -> pd.DataFrame:
        wm = ray.get(_w)
        wv = b["token"].map(wm)
        out = b[wv.notna()].copy(deep=False)
        out["w"] = wv[wv.notna()].astype(np.int64)
        return out

    live = postings.map_batches(
        weighted, batch_format="pandas", batch_size=None
    ).materialize()  # consumers: norms + pairs

    def local_norm(b: pd.DataFrame) -> pd.DataFrame:
        t = b["tf"].to_numpy()
        contrib = t * t * b["w"].to_numpy()
        g = pd.DataFrame({"doc_id": b["doc_id"], "norm": contrib}).groupby(
            "doc_id", as_index=False
        )["norm"].sum()
        return g

    norms = merge_partials(
        live.map_batches(local_norm, batch_format="pandas", batch_size=None),
        "doc_id",
        lambda b: b.groupby("doc_id", as_index=False)["norm"].sum(),
        lambda b: b,
        num_buckets,
    ).to_pandas()
    norm_map = ray.put(pd.Series(norms["norm"].to_numpy(), index=norms["doc_id"]))

    def pairs_of(bucket: pd.DataFrame) -> pd.DataFrame:
        m = bucket.merge(bucket, on="token")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64),
                 "dot": np.array([], np.int64)}
            )
        dot = m["tf_x"].to_numpy() * m["tf_y"].to_numpy() * m["w_x"].to_numpy()
        g = pd.DataFrame(
            {"doc_a": m["doc_id_x"], "doc_b": m["doc_id_y"], "dot": dot}
        ).groupby(["doc_a", "doc_b"], as_index=False)["dot"].sum()
        return g

    partial = bucketed_group_apply(live, "token", pairs_of, num_buckets)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["doc_a", "doc_b"], as_index=False)["dot"].sum()

    def bucket_topk(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(["dot", "doc_a", "doc_b"],
                          ascending=[False, True, True], kind="mergesort")
            .head(top).reset_index(drop=True)
        )

    cand = merge_partials(
        partial, ["doc_a", "doc_b"], combine, bucket_topk, num_buckets
    )

    def global_final(b: pd.DataFrame, _n=norm_map) -> pd.DataFrame:
        nm = ray.get(_n)
        b = bucket_topk(b)
        b["norm_a"] = b["doc_a"].map(nm).astype("int64")
        b["norm_b"] = b["doc_b"].map(nm).astype("int64")
        b["rank"] = np.arange(1, len(b) + 1, dtype=np.int64)
        return b[["doc_a", "doc_b", "dot", "norm_a", "norm_b", "rank"]]

    return cand.repartition(1).map_batches(
        global_final, batch_format="pandas", batch_size=None
    )


def collocations(docs, top: int = 20, min_n: int = 3, num_buckets: int = 16,
                 scale: int = 10_000):
    """Collocation mining: the global top-``top`` adjacent-token bigrams
    by exact integer lift (observed/expected, the exp-PMI of
    :func:`~bio_re_with_entity_embeddings_ray.stages.pairs.pair_lift`
    applied to the token stream): ``lift_bp = scale * n_ab * B //
    (l_a * r_b)`` with ``n_ab`` the bigram count, ``B`` total bigram
    positions, ``l_a``/``r_b`` the counts of ``a`` as ANY bigram's left
    and ``b`` as ANY bigram's right. Bigrams below ``min_n`` are noise
    and excluded. Rank by (lift_bp DESC, w1, w2); returns
    (w1, w2, n, lift_bp, rank).

    Scale shape: bigram/marginal counts are per-block combiners (pair
    space vocabulary-bounded); marginals + the B scalar merge through
    the lazy tree and broadcast (``ray.put`` once) into the pair merge's
    per-bucket finalize, which emits a local top-k candidate; one final
    single-block pass takes the global top (the bpe_pair_counts
    discipline). Integer envelope: BOTH ``scale * n_ab * B`` (the
    numerator) and ``l_a * r_b`` (the denominator — product of two
    marginals, each up to ``B``, so it wraps first once ``B`` exceeds
    ~3e9) must stay below 2^63; the bucket finalize checks the actual
    maxima per bucket and falls back to exact Python-int arithmetic on
    that bucket's candidate rows (≤ the post-``min_n`` survivors) when
    either side could wrap, so web-scale corpora stay exact at the cost
    of a slower finalize on the few hot buckets.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def bigram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        _, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        if len(codes) < 2:
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=str), "w2": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64")}
            )
        adj = row_idx[1:] == row_idx[:-1]
        c1, c2 = codes[:-1][adj], codes[1:][adj]
        g = (
            pd.DataFrame({"w1": vocab[c1], "w2": vocab[c2]})
            .groupby(["w1", "w2"], as_index=False).size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype("int64")
        return g

    partials = docs.map_batches(
        bigram_partial, batch_format="pandas", batch_size=None
    ).materialize()  # 3 consumers: left marginal, right marginal, pairs

    def side_partial(col):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(col, as_index=False)["n"].sum()
            return g.rename(columns={col: "w", "n": "c"})

        return fn

    def side_merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("w", as_index=False)["c"].sum()

    marg = {}
    for col in ("w1", "w2"):
        tab = merge_partials(
            partials.map_batches(side_partial(col), batch_format="pandas",
                                 batch_size=None),
            "w", side_merge, lambda b: b, num_buckets, plan="tree",
        ).to_pandas()
        marg[col] = pd.Series(tab["c"].to_numpy(), index=tab["w"])
    B = int(marg["w1"].sum())
    l_ref, r_ref = ray.put(marg["w1"]), ray.put(marg["w2"])

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["w1", "w2"], as_index=False)["n"].sum()

    def bucket_topk(b: pd.DataFrame, _l=l_ref, _r=r_ref) -> pd.DataFrame:
        lm, rm = ray.get(_l), ray.get(_r)
        b = b[b["n"] >= min_n].copy()
        if not len(b):
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=str), "w2": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64"),
                 "lift_bp": pd.Series([], dtype="int64")}
            )
        la = b["w1"].map(lm).to_numpy().astype(np.int64)
        rb = b["w2"].map(rm).to_numpy().astype(np.int64)
        nv = b["n"].to_numpy().astype(np.int64)
        int63 = (1 << 63) - 1
        if (
            int(la.max()) * int(rb.max()) <= int63
            and scale * int(nv.max()) * B <= int63
        ):
            b["lift_bp"] = scale * nv * B // (la * rb)
        else:
            # int64 would wrap (numerator or la*rb): exact Python ints
            # over this bucket's candidate rows only
            b["lift_bp"] = np.fromiter(
                (scale * int(n_) * B // (int(a_) * int(r_))
                 for n_, a_, r_ in zip(nv, la, rb)),
                dtype=np.int64, count=len(nv),
            )
        return (
            b.sort_values(["lift_bp", "w1", "w2"],
                          ascending=[False, True, True], kind="mergesort")
            .head(top)[["w1", "w2", "n", "lift_bp"]].reset_index(drop=True)
        )

    cand = merge_partials(partials, ["w1", "w2"], combine, bucket_topk, num_buckets)

    def global_final(b: pd.DataFrame) -> pd.DataFrame:
        b = (
            b.sort_values(["lift_bp", "w1", "w2"],
                          ascending=[False, True, True], kind="mergesort")
            .head(top).reset_index(drop=True)
        )
        b["rank"] = np.arange(1, len(b) + 1, dtype=np.int64)
        return b

    return cand.repartition(1).map_batches(
        global_final, batch_format="pandas", batch_size=None
    )


def nearest_doc(docs, num_buckets: int = 16, w_scale: int = 1_000_000):
    """Per-document nearest neighbor under the
    :func:`similar_doc_pairs` weighted dot product: for every doc with
    at least one positive-dot partner, the argmax partner —
    (doc_id, best_doc, dot), ties by smallest best_doc. The per-item
    ANN answer next to similar_doc_pairs' global top-k.

    Scale shape: same inverted-index pair expansion; pair dots merge per
    pair-hash bucket, each pair then emits BOTH directions (doc_id,
    partner, dot) and a doc-keyed bucketed max-reduce picks the winner —
    two bounded exchanges, no driver state beyond the broadcast weights.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def local_postings(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        order = np.lexsort((codes, row_idx))
        r, c = row_idx[order], codes[order]
        change = np.ones(len(r), dtype=bool)
        change[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(change)
        tf = np.diff(np.append(starts, len(r))).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[r[starts]],
                "token": vocab[c[starts]].astype(str),
                "tf": tf,
            }
        )

    postings = docs.map_batches(
        local_postings, batch_format="pandas", batch_size=None
    ).materialize()

    def local_df(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("token", as_index=False).agg(df=("doc_id", "size"))
        g["df"] = g["df"].astype("int64")
        return g

    df_tab = merge_partials(
        postings.map_batches(local_df, batch_format="pandas", batch_size=None),
        "token",
        lambda b: b.groupby("token", as_index=False)["df"].sum(),
        lambda b: b,
        num_buckets,
    ).to_pandas()
    w = w_scale // (df_tab["df"].to_numpy() ** 2)
    w_map = ray.put(pd.Series(w, index=df_tab["token"])[w > 0])

    def weighted(b: pd.DataFrame, _w=w_map) -> pd.DataFrame:
        wm = ray.get(_w)
        wv = b["token"].map(wm)
        out = b[wv.notna()].copy(deep=False)
        out["w"] = wv[wv.notna()].astype(np.int64)
        return out

    live = postings.map_batches(weighted, batch_format="pandas", batch_size=None)

    def pairs_of(bucket: pd.DataFrame) -> pd.DataFrame:
        m = bucket.merge(bucket, on="token")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64),
                 "dot": np.array([], np.int64)}
            )
        dot = m["tf_x"].to_numpy() * m["tf_y"].to_numpy() * m["w_x"].to_numpy()
        return pd.DataFrame(
            {"doc_a": m["doc_id_x"], "doc_b": m["doc_id_y"], "dot": dot}
        ).groupby(["doc_a", "doc_b"], as_index=False)["dot"].sum()

    partial = bucketed_group_apply(live, "token", pairs_of, num_buckets)

    def pair_sum_both_dirs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["doc_a", "doc_b"], as_index=False)["dot"].sum()
        return pd.concat(
            [
                g.rename(columns={"doc_a": "doc_id", "doc_b": "partner"}),
                g.rename(columns={"doc_b": "doc_id", "doc_a": "partner"}),
            ],
            ignore_index=True,
        )[["doc_id", "partner", "dot"]]

    directed = bucketed_group_apply(
        partial, ["doc_a", "doc_b"], pair_sum_both_dirs, num_buckets
    )

    def best_of(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(
            ["doc_id", "dot", "partner"], ascending=[True, False, True],
            kind="mergesort",
        )
        first = b.groupby("doc_id", as_index=False).first()
        return pd.DataFrame(
            {
                "doc_id": first["doc_id"].astype("int64"),
                "best_doc": first["partner"].astype("int64"),
                "dot": first["dot"].astype("int64"),
            }
        )

    return bucketed_group_apply(directed, "doc_id", best_of, num_buckets)


def markov_next_token(docs, k: int = 3, min_n: int = 2, num_buckets: int = 16):
    """Per-token next-token model (the autocomplete / bigram-LM table):
    for every token with at least ``min_n`` adjacent continuations, its
    top-``k`` successors by count — (w1, w2, n, rank), rank per w1 by
    (n DESC, w2). The conditional-distribution view of
    :func:`collocations`' joint one.

    Scale shape: bigram count partials (vocabulary-bounded combiners)
    merge per w1-hash bucket — every w1's successors land in ONE bucket,
    so the per-bucket top-k is exact, no global pass needed."""
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def bigram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        _, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        if len(codes) < 2:
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=str), "w2": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64")}
            )
        adj = row_idx[1:] == row_idx[:-1]
        c1, c2 = codes[:-1][adj], codes[1:][adj]
        g = (
            pd.DataFrame({"w1": vocab[c1], "w2": vocab[c2]})
            .groupby(["w1", "w2"], as_index=False).size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype("int64")
        return g

    partials = docs.map_batches(
        bigram_partial, batch_format="pandas", batch_size=None
    )

    def per_w1(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["w1", "w2"], as_index=False)["n"].sum()
        tot = g.groupby("w1")["n"].transform("sum")
        g = g[tot >= min_n]
        if not len(g):
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=str), "w2": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64"),
                 "rank": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["w1", "n", "w2"], ascending=[True, False, True],
                          kind="mergesort")
        g["rank"] = g.groupby("w1", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        g["rank"] = g["rank"].astype("int64")
        return g.reset_index(drop=True)

    return bucketed_group_apply(partials, "w1", per_w1, num_buckets)


def lang_share(docs, scale: int = 10_000):
    """Corpus language mix: per detected language (the :func:`lang_id`
    marker heuristic), document count and share of the corpus in basis
    points — (lang, n_docs, share_bp), exact integer division.

    Scale shape: per-block language counts are |langs|-bounded partials;
    one tiny tree merge; the total is the sum of the merged counts (no
    second pass)."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(batch)
        _, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        pred = _lang_pred(n_rows, row_idx, codes, vocab)
        g = pd.DataFrame({"lang": pred}).groupby("lang", as_index=False).size()
        g = g.rename(columns={"size": "n_docs"})
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("lang", as_index=False)["n_docs"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = combine(b).sort_values("lang").reset_index(drop=True)
        total = int(b["n_docs"].sum())
        b["share_bp"] = (scale * b["n_docs"] // max(total, 1)).astype("int64")
        return b

    return merge_partials(
        docs.map_batches(partial, batch_format="pandas", batch_size=None),
        "lang", combine, finalize, plan="tree",
    )


def prefix_clusters(docs, k: int = 8, min_docs: int = 2, num_buckets: int = 16):
    """Boilerplate detection by shared token prefix: group documents on
    their first ``k`` whitespace tokens and keep prefixes covering at
    least ``min_docs`` documents — (prefix, n_docs, min_doc_id).

    Crawl curation uses this to surface template/boilerplate families
    (cookie banners, licence headers, scraped navigation) that exact
    dedup misses because the tails differ. Asymptotically it is a
    cheaper sibling of containment dedup: one narrow projection, one
    keyed merge over ~k-token strings instead of a shingle inverted
    index.

    Scale shape: the prefix extraction is a vectorized pandas split
    capped at k separators (no full tokenization), the exchange carries
    only (prefix, count, min_id) partials — combiner-first like every
    bounded-vocabulary aggregate here — and the ``min_docs`` filter
    applies AFTER the merge so partial counts stay associative."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pref = batch["text"].str.split(" ", n=k).str[:k].str.join(" ")
        g = (
            pd.DataFrame({"prefix": pref, "doc_id": batch["doc_id"]})
            .groupby("prefix", as_index=False)
            .agg(n_docs=("doc_id", "size"), min_doc_id=("doc_id", "min"))
        )
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("prefix", as_index=False).agg(
            n_docs=("n_docs", "sum"), min_doc_id=("min_doc_id", "min")
        )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = combine(b)
        b = b[b["n_docs"] >= min_docs]
        return b.sort_values("prefix").reset_index(drop=True)

    return merge_partials(
        docs.map_batches(partial, batch_format="pandas"),
        "prefix", combine, finalize, num_buckets,
    )


def rrf_fusion(docs, query: str = "join sort window", k: int = 10,
               rrf_k: int = 60):
    """Reciprocal-rank fusion of two retrieval rankings for the same
    ``query`` — the standard hybrid-search combiner (Cormack et al.):
    list 1 = BM25 top-k (:func:`bm25_topk`), list 2 = raw query-term-
    frequency top-k (the "sparse counting" ranker). Returns
    (doc_id, rrf_bp, n_lists, rank) over the union of both lists with
    ``rrf_bp = sum over lists of 10^9 // (rrf_k + rank_in_list)`` —
    integer-exact, so the oracle's unordered SUM matches bit-for-bit.

    Scale shape: both input rankings already reduce to <= blocks x k
    candidate rows via per-block top-k combiners; the fusion itself
    touches <= 2k rows on the driver (the knn/kmeans finalize
    economics). At 100 TB nothing changes — fusion cost is O(k), not
    corpus-sized, and the two source scans share the corpus read if the
    caller materializes it."""
    q_terms = query.split(" ")
    bm = bm25_topk(docs, query=query, k=k)[["doc_id", "rank"]]

    def qtf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        n = len(n_tok)
        qtf = np.zeros(n, dtype=np.int64)
        vl = {t: i for i, t in enumerate(vocab)}
        for t in q_terms:
            code = vl.get(t)
            if code is None:
                continue
            qtf += np.bincount(row_idx[codes == code], minlength=n)
        keep = qtf > 0
        out = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy()[keep], "qtf": qtf[keep]}
        )
        return out.sort_values(
            ["qtf", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = docs.map_batches(
        qtf_partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    if len(cand) == 0:
        cand = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "qtf": pd.Series([], dtype="int64"),
            }
        )
    cand = cand.sort_values(
        ["qtf", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)

    u = pd.concat(
        [bm[["doc_id", "rank"]], cand[["doc_id", "rank"]]], ignore_index=True
    )
    u["c"] = 10**9 // (rrf_k + u["rank"].to_numpy())
    s = u.groupby("doc_id", as_index=False).agg(
        rrf_bp=("c", "sum"), n_lists=("rank", "size")
    )
    s = s.sort_values(
        ["rrf_bp", "doc_id"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    s["rank"] = np.arange(1, len(s) + 1, dtype=np.int64)
    s["rrf_bp"] = s["rrf_bp"].astype("int64")
    s["n_lists"] = s["n_lists"].astype("int64")
    return s[["doc_id", "rrf_bp", "n_lists", "rank"]]


def lexical_diversity(docs):
    """Per-document lexical-diversity quality signals:
    (doc_id, n_tok, n_types, ttr_bp, hapax_bp) with
    ``ttr_bp = 10000 * n_types // n_tok`` (type-token ratio) and
    ``hapax_bp = 10000 * hapax // n_tok`` (share of tokens occurring
    exactly once). Low TTR flags repetitive/templated text, low hapax
    share flags keyword stuffing — standard curation features alongside
    :func:`quality_scores` and the Gopher repetition family.

    Purely per-block vectorized: one dictionary-encode + one lexsort of
    the (row, code) pairs gives types AND hapaxes as run-length
    statistics — no per-row set(), no exchange at all."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, _ = _flat_token_codes(batch["text"])
        n = len(n_tok)
        types = np.zeros(n, dtype=np.int64)
        hapax = np.zeros(n, dtype=np.int64)
        if len(codes):
            order = np.lexsort((codes, row_idx))
            r, c = row_idx[order], codes[order]
            new = np.ones(len(r), dtype=bool)
            new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
            starts = np.flatnonzero(new)
            run_len = np.diff(np.append(starts, len(r)))
            run_row = r[starts]
            types = np.bincount(run_row, minlength=n).astype(np.int64)
            hapax = np.bincount(
                run_row[run_len == 1], minlength=n
            ).astype(np.int64)
        nt = np.maximum(n_tok, 1)  # split('') yields [''], so n_tok >= 1
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tok": n_tok,
                "n_types": types,
                "ttr_bp": 10000 * types // nt,
                "hapax_bp": 10000 * hapax // nt,
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def nll_percentile_filter(docs, q_bp: int = 7500, num_buckets: int = 16):
    """CCNet-style perplexity filtering: score every document under the
    corpus bigram LM (:func:`bigram_nll`), compute each doc's mean
    per-bigram NLL in integer micro-nats (``nll_fp // n_bigrams``), and
    KEEP documents at or below the corpus ``q_bp`` quantile (exact
    ceil-position rule, :func:`exact_quantiles`) — the classic
    "drop the most surprising tail" quality cut. Returns
    (doc_id, mean_nll_fp).

    Scale shape: the NLL table is one row per doc (already reduced);
    it is materialized once for its two consumers (threshold scan +
    filter pass); the threshold reduction exchanges only distinct
    (mean, count) pairs; the final filter is a broadcast-scalar map."""

    nll = bigram_nll(docs, num_buckets=num_buckets)

    def mean_row(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "mean_nll_fp": (
                    b["nll_fp"].to_numpy().astype(np.int64)
                    // np.maximum(b["n_bigrams"].to_numpy().astype(np.int64), 1)
                ),
            }
        )

    means = nll.map_batches(
        mean_row, batch_format="pandas", batch_size=None
    ).materialize()
    thr_df = exact_quantiles(means, "mean_nll_fp", [q_bp], num_buckets)
    thr = int(thr_df["value"].iloc[0]) if len(thr_df) else 0

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["mean_nll_fp"].to_numpy() <= thr]

    return means.map_batches(keep, batch_format="pandas", batch_size=None)


def source_weights(docs, scale: int = 10000, num_buckets: int = 16):
    """Inverse-frequency sampling weights per source — the corpus
    REBALANCING table (upweight rare feeds, downweight the crawl blob):
    (source, n_docs, weight_bp) with
    ``weight_bp = (scale * N) // (S * n_docs)`` for N total docs over S
    sources — uniform-mix weights in integer basis points (a source at
    exactly its fair share gets ``scale``).

    Source-bounded combiner merge; the two scalars (N, S) come from the
    same merged table, never a second pass."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("source", as_index=False).agg(n_docs=("source", "size"))
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("source", as_index=False)["n_docs"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = combine(b)
        n, s = int(b["n_docs"].sum()), len(b)
        b["weight_bp"] = (
            scale * n // (s * np.maximum(b["n_docs"].to_numpy(), 1))
        ).astype("int64")
        return b.sort_values("source").reset_index(drop=True)

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    return merge_partials(
        docs.map_batches(partial, batch_format="pandas"),
        "source", combine, finalize, num_buckets, plan="tree",
    )


def novelty_scores(docs, num_buckets: int = 16):
    """Corpus-novelty score per document: the share of its bigram
    POSITIONS whose bigram occurs in no other position anywhere in the
    corpus (global count == 1) — (doc_id, n_bigrams, novel_bp).
    High novelty = original text; near-zero = boilerplate assembled
    from corpus-common phrases. The corpus-level complement of
    :func:`lexical_diversity` (which is doc-local).

    Scale shape: the bigram count table is vocabulary²-bounded (same
    economics as :func:`bigram_nll` — per-block combiners, one
    token-keyed merge, ONE broadcast); scoring is a narrow map with a
    C-level merge lookup per batch."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    SEP = "\x01"

    def local_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        if len(codes) < 2:
            return pd.DataFrame(
                {"bg": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64")}
            )
        same = row_idx[:-1] == row_idx[1:]
        c1, c2 = codes[:-1][same], codes[1:][same]
        v = vocab
        df = pd.DataFrame({"bg": pd.Series(v[c1]) + SEP + pd.Series(v[c2])})
        out = df.groupby("bg", as_index=False).size()
        return out.rename(columns={"size": "cnt"}).astype({"cnt": "int64"})

    counts = bucketed_group_apply(
        docs.map_batches(local_bigrams, batch_format="pandas"),
        "bg",
        lambda b: b.groupby("bg", as_index=False)["cnt"].sum(),
        num_buckets,
    ).to_pandas()
    hapax = set(counts.loc[counts["cnt"] == 1, "bg"])
    href = ray.put(hapax)

    class Score:
        def __init__(self, href):
            self.hapax = ray.get(href)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
            n = len(n_tok)
            nb = np.zeros(n, dtype=np.int64)
            nov = np.zeros(n, dtype=np.int64)
            if len(codes) >= 2:
                same = row_idx[:-1] == row_idx[1:]
                r = row_idx[:-1][same]
                c1, c2 = codes[:-1][same], codes[1:][same]
                bg = pd.Series(vocab[c1]) + SEP + pd.Series(vocab[c2])
                isnov = bg.isin(self.hapax).to_numpy()
                nb = np.bincount(r, minlength=n).astype(np.int64)
                nov = np.bincount(r[isnov], minlength=n).astype(np.int64)
            keep = nb > 0
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[keep],
                    "n_bigrams": nb[keep],
                    "novel_bp": 10000 * nov[keep] // nb[keep],
                }
            )

    return docs.map_batches(
        Score, fn_constructor_args=(href,), batch_format="pandas",
        concurrency=(1, 4),
    )


def corpus_summary(docs, num_buckets: int = 16):
    """One-row corpus DATASHEET: (n_docs, n_tokens, n_distinct_texts,
    dup_rate_bp, n_langs, n_sources) — the numbers a dataset card
    opens with, computed in one combiner pass + one hash-bucketed
    distinct count (nothing corpus-sized reaches the driver).

    Per-block partials carry (row count, token sum, lang set, source
    set, block-distinct md5s); the md5 distinct finishes bucketed; the
    lang/source distincts are vocabulary-bounded unions."""
    import hashlib

    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def hash_partial(b: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        return pd.DataFrame(
            {"h": list({md5(t.encode("utf-8")).hexdigest() for t in b["text"]})}
        )

    distinct_ds = bucketed_group_apply(
        docs.map_batches(hash_partial, batch_format="pandas"),
        "h",
        lambda b: pd.DataFrame({"n": [int(b["h"].nunique())]}),
        num_buckets,
    )
    n_distinct = int(distinct_ds.to_pandas()["n"].sum())

    def stat_partial(b: pd.DataFrame) -> pd.DataFrame:
        n_tok, _, _, _ = _flat_token_codes(b["text"])
        return pd.DataFrame(
            {
                "k": ["all"],
                "n_docs": [np.int64(len(b))],
                "n_tokens": [np.int64(n_tok.sum())],
                "langs": [";".join(sorted(set(b["lang"])))],
                "sources": [";".join(sorted(set(b["source"])))],
            }
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        langs = ";".join(
            sorted({x for row in b["langs"] for x in row.split(";") if x})
        )
        srcs = ";".join(
            sorted({x for row in b["sources"] for x in row.split(";") if x})
        )
        return pd.DataFrame(
            {
                "k": ["all"],
                "n_docs": [np.int64(b["n_docs"].sum())],
                "n_tokens": [np.int64(b["n_tokens"].sum())],
                "langs": [langs],
                "sources": [srcs],
            }
        )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = combine(b)
        nd = int(b["n_docs"].iloc[0])
        return pd.DataFrame(
            {
                "n_docs": [np.int64(nd)],
                "n_tokens": [b["n_tokens"].iloc[0]],
                "n_distinct_texts": [np.int64(n_distinct)],
                "dup_rate_bp": [
                    np.int64(10000 * (nd - n_distinct) // max(nd, 1))
                ],
                "n_langs": [np.int64(len([x for x in b["langs"].iloc[0].split(";") if x]))],
                "n_sources": [np.int64(len([x for x in b["sources"].iloc[0].split(";") if x]))],
            }
        )

    return merge_partials(
        docs.map_batches(stat_partial, batch_format="pandas"),
        "k", combine, finalize, num_buckets, plan="tree",
    )
