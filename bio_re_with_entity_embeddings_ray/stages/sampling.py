"""Deterministic sampling / corpus-mix operators for training-data
pipelines.

Sampling for a training mix must be REPRODUCIBLE — independent of run,
machine, block layout and parallelism — so these operators derive the
keep/drop decision from a salted content-free hash of the row key
(md5int8, the same primitive as the dedup family) instead of RNG state.
Every decision is a pure per-row function, so each operator is a narrow
``map_batches`` with an exact DuckDB mirror (oracles.HASH_SAMPLE /
CORPUS_MIX).

Reference analog: the reference subsamples corpora by id list files
(extract_articles.py:63-67); here the id set is implicit in the hash, so
no id list needs to exist or be shipped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array


def _keep_mask(keys: pd.Series, rate_bp: int, salt: str) -> np.ndarray:
    tagged = [f"{salt}:{k}" for k in keys.astype(str)]
    return (md5int8_array(tagged) % 10000) < rate_bp


def hash_sample(ds, rate_bp: int, key: str = "doc_id", salt: str = "sample"):
    """Keep rows where ``md5int8(salt + ':' + key) % 10000 < rate_bp`` —
    a deterministic ~rate_bp/10000 sample. Different ``salt`` values give
    independent samples; the same salt always selects the same rows.
    SQL: ``('0x' || substr(md5(salt || ':' || key), 1, 8))::BIGINT
    % 10000 < rate_bp``."""
    if not 0 <= rate_bp <= 10000:
        raise ValueError(f"rate_bp must be in [0, 10000], got {rate_bp}")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[_keep_mask(batch[key], rate_bp, salt)]

    return ds.map_batches(fn, batch_format="pandas", batch_size=None)


def hash_split(ds, val_bp: int, key: str = "doc_id", salt: str = "split"):
    """Deterministic train/validation split: returns ``(train, val)``
    datasets partitioned by the same salted hash — every row lands in
    exactly one side, stable across runs. The two sides are independent
    lazy pipelines over the same input (each filter is a narrow map)."""
    if not 0 <= val_bp <= 10000:
        raise ValueError(f"val_bp must be in [0, 10000], got {val_bp}")

    def val_fn(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[_keep_mask(batch[key], val_bp, salt)]

    def train_fn(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~_keep_mask(batch[key], val_bp, salt)]

    return (
        ds.map_batches(train_fn, batch_format="pandas", batch_size=None),
        ds.map_batches(val_fn, batch_format="pandas", batch_size=None),
    )


def mix_corpora(sources, key: str = "doc_id"):
    """Training-mix composition: ``sources`` is a list of
    ``(dataset, rate_bp, salt)`` triples; each source is hash-sampled at
    its rate and the results are unioned into one stream. Rates are
    per-source (not normalized): (A, 5000), (B, 10000) keeps ~half of A
    and all of B. Deterministic end to end; at 100 TB each source stays
    its own streaming read — no shuffle, no materialization."""
    sampled = [hash_sample(ds, rate_bp, key, salt) for ds, rate_bp, salt in sources]
    out = sampled[0]
    for s in sampled[1:]:
        out = out.union(s)
    return out


def cap_per_group(ds, group_col: str, n: int, key: str = "doc_id", salt: str = "cap", num_buckets: int = 32):
    """Deterministic per-group cap: keep at most ``n`` rows per group,
    chosen by smallest salted hash of the row key (ties by key) — the
    "cap documents per domain/source" operator of crawl curation. Being
    hash-ranked (not first-N-seen) makes the kept subset independent of
    block order and parallelism, and an unbiased sample of the group.

    One hash exchange keyed by ``group_col``; a per-block combiner first
    cuts each block's contribution to its local top-n, so a hot group
    ships n rows per block — never its whole membership. SQL mirror:
    row_number() OVER (PARTITION BY group ORDER BY md5int8(salt||':'||key), key) <= n.
    """

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy(deep=False)
        b["__h"] = md5int8_array([f"{salt}:{k}" for k in b[key].astype(str)])
        b = b.sort_values(["__h", key], kind="mergesort")
        return b.groupby(group_col, sort=False).head(n)

    def final_top(bucket: pd.DataFrame) -> pd.DataFrame:
        return local_top(bucket).drop(columns="__h")

    pre = ds.map_batches(
        lambda b: local_top(b).drop(columns="__h"),
        batch_format="pandas",
        batch_size=None,
    )
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    return bucketed_group_apply(pre, group_col, final_top, num_buckets)


def weighted_sample(ds, weight_col: str, scale: int = 10000,
                    key: str = "doc_id", salt: str = "wsample"):
    """Deterministic per-row WEIGHTED Bernoulli sampling: keep a row with
    probability ``weight / scale`` (weights are integers, e.g. a quality
    score in bp) — the weighted generalization of :func:`hash_sample`,
    same salted-hash discipline: keep iff
    ``md5int8(f"{salt}:{key}") % scale < weight``. Reproducible,
    parallelism-invariant, pure narrow map; a new epoch's sample is a
    new salt. Weights above ``scale`` always keep (clip semantics).

    This is quality-weighted corpus downsampling (keep good documents
    with higher probability) as one exact-mirror operator; for
    fixed-SIZE weighted reservoirs the composition is this plus a
    ``top_n`` on the hash — documented, not implemented, because
    training mixes specify rates, not exact counts."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        tagged = [f"{salt}:{k}" for k in batch[key].astype(str)]
        h = md5int8_array(tagged) % scale
        w = np.minimum(batch[weight_col].to_numpy().astype(np.int64), scale)
        return batch[h < w]

    return ds.map_batches(fn, batch_format="pandas", batch_size=None)


def stratified_sample(
    ds,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    stratum_col: str = "lang",
    key: str = "doc_id",
    salt: str = "strat",
):
    """Deterministic stratified sampling: each stratum (e.g. language) is
    kept at its own rate — the rebalancing step of a multilingual training
    mix (e.g. downsample English, keep everything else). Strata absent
    from ``rates_bp`` use ``default_bp``.

    Same salted-hash keep rule as :func:`hash_sample`, so the decision is
    per-row, reproducible, and layout-independent; the per-row rate lookup
    is a C-level ``Series.map``. Narrow map, no shuffle, exact SQL mirror
    (CASE over the rate table)."""
    for s, r in rates_bp.items():
        if not 0 <= r <= 10000:
            raise ValueError(f"rate for {s!r} must be in [0, 10000], got {r}")
    if not 0 <= default_bp <= 10000:
        raise ValueError(f"default_bp must be in [0, 10000], got {default_bp}")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rate = (
            batch[stratum_col]
            .map(rates_bp)
            .fillna(default_bp)
            .astype("int64")
            .to_numpy()
        )
        tagged = [f"{salt}:{k}" for k in batch[key].astype(str)]
        keep = (md5int8_array(tagged) % 10000) < rate
        return batch[keep]

    return ds.map_batches(fn, batch_format="pandas", batch_size=None)


def systematic_sample(docs, k: int = 7, num_ranges: int = 16):
    """Every-k-th-row sampling under the deterministic global doc_id
    order — rows whose ``ROW_NUMBER() OVER (ORDER BY doc_id)`` lands on
    1, k+1, 2k+1, ... Returns (doc_id, rank). The classic systematic
    (interval) sample: evenly spaced coverage of the keyspace, unlike
    the hash samples above which are uniform but clumpy; auditors and
    eval-set builders want the spacing guarantee.

    Scale shape: rides :func:`ordered.global_rank`'s ranged prefix scan
    (O(num_ranges) driver state, one ranged exchange of a narrow int64
    projection) and filters per block — no driver-side iteration, no
    global sort materialization."""
    import pandas as pd

    from bio_re_with_entity_embeddings_ray.stages.ordered import global_rank

    narrow = docs.map_batches(
        lambda b: b[["doc_id"]], batch_format="pandas", batch_size=None
    )
    ranked = global_rank(narrow, ["doc_id"], num_ranges=num_ranges)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["rank"].to_numpy() - 1) % k == 0
        return batch[keep][["doc_id", "rank"]]

    return ranked.map_batches(pick, batch_format="pandas", batch_size=None)
