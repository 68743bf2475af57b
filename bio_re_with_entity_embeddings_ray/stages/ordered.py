"""Order-dependent distributed operators: global prefix scan, training
sequence packing, deterministic corpus shuffle.

A training-data pipeline needs a handful of operators whose semantics
depend on a GLOBAL row order (concatenate-and-chunk sequence packing,
reproducible shuffling). Ray Data has no ordered-window primitive, so
these are built on the classic distributed prefix-scan shape
(Blelloch 1990):

1. range-partition rows by the (numeric) leading order key — an
   arithmetic range over the measured [min, max], no sampling pass;
2. per-range partial sums (a per-block combiner, then one tiny
   (ranges x blocks) table);
3. an exclusive scan over the per-range totals — O(num_ranges) values on
   the driver, the same bounded-driver-state contract as the measured
   merge-plan probes;
4. one hash exchange keyed by range: each range sorts its own rows and
   adds its offset — per-task memory is rows/num_ranges, exactly the
   bucketed_group_apply contract used by every other wide op here.

Skew note: arithmetic ranging is even for id-like and hash-valued keys
(the two callers below). A pathologically-skewed order key concentrates
rows in few ranges — correctness holds (each range is still complete),
only parallelism suffers; re-range on a salted hash of the key or raise
``num_ranges`` if that ever bites.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array

_RANGE_COL = "__range"


def ranged_prefix_scan(ds, order_cols: list[str], value_col: str, num_ranges: int = 16):
    """Add ``prefix_excl`` = sum of ``value_col`` over all rows strictly
    before this one in ``order_cols`` lexicographic order. The order key
    must be unique per row (callers use doc_id / (hash, doc_id)); the
    leading order column must be numeric (it defines the ranges).

    Returns a Dataset with columns ``[*order_cols, value_col,
    prefix_excl]``. Driver state is O(num_ranges); no full
    materialization anywhere."""
    import ray
    import ray.data  # noqa: F401  (aggregate import below needs it loaded)
    from ray.data.aggregate import Max, Min

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    lead = order_cols[0]
    mm = ds.aggregate(Min(lead), Max(lead))
    lo, hi = mm[f"min({lead})"], mm[f"max({lead})"]
    if lo is None:
        return ds  # empty input: nothing to scan
    lo, hi = int(lo), int(hi)
    span = hi - lo + 1

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        v = batch[lead].to_numpy().astype(np.int64)
        batch[_RANGE_COL] = ((v - lo) * num_ranges // span).astype(np.int64)
        return batch

    # materialize the SLIM tagged boundary (order cols + value + range —
    # never text) so the partial-sum probe and the ranged exchange both
    # read it instead of re-executing the upstream narrow map; with the
    # min/max probe above the upstream runs exactly twice
    tagged = ds.map_batches(tag, batch_format="pandas", batch_size=None).materialize()

    # per-block per-range partial sums -> tiny (ranges x blocks) table
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(_RANGE_COL, sort=False)[value_col].sum()
        return pd.DataFrame(
            {_RANGE_COL: g.index.to_numpy(), "s": g.to_numpy().astype(np.int64)}
        )

    parts = tagged.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    totals = np.zeros(num_ranges, dtype=np.int64)
    if len(parts):
        sums = parts.groupby(_RANGE_COL)["s"].sum()
        totals[sums.index.to_numpy()] = sums.to_numpy()
    offsets = np.concatenate(([0], np.cumsum(totals[:-1])))
    offsets_ref = ray.put(offsets)

    def scan(bucket: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        b = bucket.sort_values([_RANGE_COL, *order_cols], kind="mergesort")
        v = b[value_col].to_numpy().astype(np.int64)
        cum = np.cumsum(v) - v  # exclusive within the whole bucket
        r = b[_RANGE_COL].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], r[1:] != r[:-1])))
        # rebase each range's exclusive cumsum to 0, then add its offset
        base = cum[starts]
        b = b.drop(columns=[_RANGE_COL]).copy(deep=False)
        b["prefix_excl"] = cum - np.repeat(base, np.diff(np.append(starts, len(r)))) + offs[r]
        return b

    return bucketed_group_apply(tagged, _RANGE_COL, scan, num_ranges)


def pack_sequences(docs, budget: int = 512, num_ranges: int = 16):
    """Concatenate-and-chunk sequence packing: documents are laid out in
    doc_id order into an infinite token stream; each doc is assigned the
    training sequence its FIRST token falls in (seq length = ``budget``
    tokens). Returns (doc_id, n_tokens, seq_id, offset_in_seq) — the
    deterministic packing manifest a dataloader shards by seq_id.

    This is the standard GPT-style document packing (no shuffling of the
    stream here — compose with :func:`deterministic_shuffle` upstream for
    a shuffled layout). One narrow token-count map + one prefix scan; no
    text ever enters the exchange."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(batch["text"], type=pa.string())
        n_tok = (
            pc.list_value_length(pc.split_pattern(arr, " "))
            .to_numpy()
            .astype(np.int64)
        )
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_tokens": n_tok})

    tok = docs.map_batches(counts, batch_format="pandas", batch_size=None)
    scanned = ranged_prefix_scan(tok, ["doc_id"], "n_tokens", num_ranges)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        start = batch["prefix_excl"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "seq_id": (start // budget).astype(np.int64),
                "offset_in_seq": (start % budget).astype(np.int64),
            }
        )

    return scanned.map_batches(finish, batch_format="pandas", batch_size=None)


def pack_sequences_shuffled(
    docs, budget: int = 512, salt: str = "shuffle", num_ranges: int = 16
):
    """Shuffled-then-packed training layout — the composition a real
    pretraining dataloader consumes: documents are laid out in
    DETERMINISTIC-SHUFFLE order (rank under (md5int8(salt:doc_id),
    doc_id)) and then concatenate-and-chunk packed exactly like
    :func:`pack_sequences`. Returns (doc_id, n_tokens, seq_id,
    offset_in_seq); a new ``salt`` re-shuffles the layout per epoch.

    One narrow map (token counts + salted hash) and one prefix scan
    ordered by the hash — same O(num_ranges) driver state, and the
    hash order key makes the range partition uniform by construction."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(batch["text"], type=pa.string())
        n_tok = (
            pc.list_value_length(pc.split_pattern(arr, " "))
            .to_numpy()
            .astype(np.int64)
        )
        tagged = [f"{salt}:{k}" for k in batch["doc_id"].astype(str)]
        return pd.DataFrame(
            {
                "__h": md5int8_array(tagged),
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
            }
        )

    tok = docs.map_batches(counts, batch_format="pandas", batch_size=None)
    scanned = ranged_prefix_scan(tok, ["__h", "doc_id"], "n_tokens", num_ranges)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        start = batch["prefix_excl"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "seq_id": (start // budget).astype(np.int64),
                "offset_in_seq": (start % budget).astype(np.int64),
            }
        )

    return scanned.map_batches(finish, batch_format="pandas", batch_size=None)


def deterministic_shuffle(ds, key: str = "doc_id", salt: str = "shuffle", num_ranges: int = 16):
    """Reproducible global shuffle: (key, shuffle_pos) where
    ``shuffle_pos`` is the 0-based rank of the row under the order
    ``(md5int8(salt + ':' + key), key)`` — independent of run, block
    layout and parallelism, unlike ``Dataset.random_shuffle``. The salted
    hash is uniform, so the range partition is balanced by construction.

    Epoch reshuffles are just different salts. The rank is a prefix COUNT
    (value=1) through the same scan machinery as sequence packing."""

    def hashed(batch: pd.DataFrame) -> pd.DataFrame:
        tagged = [f"{salt}:{k}" for k in batch[key].astype(str)]
        return pd.DataFrame(
            {
                "__h": md5int8_array(tagged),
                key: batch[key],
                "__one": np.ones(len(batch), dtype=np.int64),
            }
        )

    h = ds.map_batches(hashed, batch_format="pandas", batch_size=None)
    scanned = ranged_prefix_scan(h, ["__h", key], "__one", num_ranges)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: batch[key],
                "shuffle_pos": batch["prefix_excl"].astype(np.int64),
            }
        )

    return scanned.map_batches(finish, batch_format="pandas", batch_size=None)


def global_rank(ds, order_cols: list[str], num_ranges: int = 16, tiles: int = 0):
    """Distributed ROW_NUMBER: ``rank`` = 1-based position of each row in
    the global ``order_cols`` lexicographic order (the leading order
    column must be numeric; the full key must be unique per row —
    SQL ``ROW_NUMBER() OVER (ORDER BY ...)``). With ``tiles`` > 0 also
    assigns ``tile`` = (rank-1) * tiles // total — an equi-depth bucket
    id (the deterministic cousin of NTILE, exact rather than
    remainder-balanced).

    Built on :func:`ranged_prefix_scan` over a constant 1 — O(num_ranges)
    driver state, one ranged exchange; the only extra cost over the scan
    is a count() pass for the tile denominator (skipped when tiles=0)."""
    import pandas as pd

    total = ds.count() if tiles else 0

    def one(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["one"] = np.int64(1)
        return batch

    scanned = ranged_prefix_scan(
        ds.map_batches(one, batch_format="pandas", batch_size=None),
        order_cols,
        "one",
        num_ranges,
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.drop(columns=["one"]).copy(deep=False)
        rank = batch["prefix_excl"].to_numpy() + 1
        out = out.drop(columns=["prefix_excl"])
        out["rank"] = rank.astype(np.int64)
        if tiles:
            out["tile"] = ((rank - 1) * tiles // total).astype(np.int64)
        return out

    return scanned.map_batches(finish, batch_format="pandas", batch_size=None)


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Interleave-ready bit spread: 16-bit int -> 32-bit with a zero bit
    between every payload bit (Morton 'Part1By1', magic-mask ladder)."""
    v = v & np.int64(0xFFFF)
    v = (v | (v << 8)) & np.int64(0x00FF00FF)
    v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
    v = (v | (v << 2)) & np.int64(0x33333333)
    v = (v | (v << 1)) & np.int64(0x55555555)
    return v


def zorder_index(events):
    """Z-order (Morton) curve value over (user_id, v_milli) — the
    locality-preserving multi-dimensional partitioning key:
    (event_id, user_id, v_milli, zval) with
    ``zval = interleave(user_id & 0xFFFF, v_milli & 0xFFFF)``.

    Why it exists at 100 TB: range-partitioning by a SINGLE column only
    prunes predicates on that column. Sorting/partitioning the layout by
    the z-value keeps rows close in BOTH dimensions close in the file
    order, so a reader with a 2-D range predicate (user range x value
    range) skips most partitions — the standard Delta/Iceberg
    OPTIMIZE-ZORDER trick, here as a first-class operator whose output
    feeds ``repartition``/``write_parquet(partition_cols=...)`` or
    :func:`global_rank` tiling.

    Purely per-row vectorized bit arithmetic (the magic-mask spread
    ladder, no Python loop), embarrassingly parallel, no exchange at
    all; the oracle reproduces the ladder with SQL bit ops."""
    import pandas as pd

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["user_id"].to_numpy().astype(np.int64)
        vm = np.round(batch["value"].to_numpy() * 1000).astype(np.int64)
        z = _spread_bits16(uid) | (_spread_bits16(vm) << 1)
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].to_numpy().astype(np.int64),
                "user_id": uid,
                "v_milli": vm,
                "zval": z,
            }
        )

    return events.map_batches(fn, batch_format="pandas", batch_size=None)
