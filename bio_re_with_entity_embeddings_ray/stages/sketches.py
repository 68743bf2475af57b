"""Mergeable cardinality sketches (HyperLogLog).

A 100 TB pipeline constantly needs approximate COUNT DISTINCT (unique
documents per source, unique tokens, unique users per window) without
paying a global distinct shuffle. HyperLogLog (Flajolet et al. 2007) is
the standard answer and is a perfect two-phase Ray aggregate: each block
folds its rows into a fixed 2^p-register array (a combiner output of
constant size), registers merge by elementwise max (associative and
commutative), and the estimate is a closed-form function of the final
registers.

Everything is DETERMINISTIC — the hash is the repo-wide md5int8 (no RNG,
no seeds) — so the registers themselves are oracle-checkable in SQL as
exact integers (`oracles.HLL_REGISTERS` mirrors the register/rank math
with integer CASE arithmetic); the float estimate stays engine-side,
pytest-pinned against exact counts. Exchange volume: 2^p ints per block,
independent of row count — the whole point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array

HLL_P = 8  # 2^8 = 256 registers; ~6.5% relative error (1.04/sqrt(m))
_HLL_BITS = 32  # md5int8 yields 32-bit hashes


def _fold_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """hashes (uint-valued int64, < 2^32) -> register array (2^p,) of max
    ranks. register = top p bits; rank = 1 + leading zeros of the
    remaining (32-p) bits (capped at 32-p+1 for rem == 0)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.int64)
    reg = h >> (_HLL_BITS - p)
    rem = h & ((1 << (_HLL_BITS - p)) - 1)
    # rank = (32 - p) - floor(log2(rem)) for rem > 0, else (32 - p) + 1
    nbits = np.zeros(len(rem), dtype=np.int64)
    nz = rem > 0
    # bit_length via float log2 is unsafe at exact powers; use frexp's
    # exact binary exponent instead
    _, exp = np.frexp(rem[nz].astype(np.float64))
    nbits[nz] = exp  # frexp exponent IS bit_length for positive ints
    rank = (_HLL_BITS - p) - nbits + 1
    np.maximum.at(regs, reg, rank)
    return regs


def hll_registers(ds, col: str, p: int = HLL_P, salt: str = "hll"):
    """Distributed HLL register table: (register, max_rank) with 2^p
    rows (zero-rank registers included). Per-block fold -> one
    ``repartition(1)``-free tree merge via elementwise max (the partial
    is CONSTANT-size, so the merge is a trivial reduction)."""

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        tagged = [f"{salt}:{v}" for v in batch[col].astype(str)]
        regs = _fold_registers(md5int8_array(tagged), p)
        return pd.DataFrame(
            {
                "register": np.arange(1 << p, dtype=np.int64),
                "max_rank": regs,
            }
        )

    parts = ds.map_batches(fold, batch_format="pandas", batch_size=None)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("register", as_index=False)["max_rank"].max()
        g["register"] = g["register"].astype("int64")
        g["max_rank"] = g["max_rank"].astype("int64")
        return g

    # constant-size partials: a repartition tree (split/coalesce, no hash
    # exchange) reduces them; two levels suffice at any block count
    merged = parts.repartition(8).map_batches(
        merge, batch_format="pandas", batch_size=None
    ).repartition(1).map_batches(merge, batch_format="pandas", batch_size=None)
    return merged


def hll_estimate(registers: pd.DataFrame, p: int = HLL_P) -> float:
    """Closed-form HLL estimate from a (register, max_rank) table, with
    the standard small-range (linear counting) correction."""
    m = 1 << p
    ranks = np.zeros(m, dtype=np.int64)
    ranks[registers["register"].to_numpy()] = registers["max_rank"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-ranks.astype(np.float64)))
    zeros = int((ranks == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def windowed_hll(events, width_s: int = 3600, key_col: str = "user_id",
                 p: int = HLL_P, salt: str = "hll"):
    """Approximate distinct-``key_col`` per tumbling event-time window:
    (window_start, register, max_rank) — the sketch-composition form of
    "unique users per hour" that at 100 TB replaces a (window, user)
    distinct shuffle with a constant 2^p ints per (window, block).

    Per-block fold groups rows by window and folds each group's hashes;
    the merge is max per (window, register) through the measured
    tree/exchange plan. Consumers call :func:`hll_estimate` per window
    (grouped estimate helper: :func:`windowed_hll_estimates`)."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("datetime64[s]").astype("int64")
        win = (epoch // width_s) * width_s
        out = []
        for w, grp in pd.DataFrame({"w": win, "v": batch[key_col]}).groupby(
            "w", sort=False
        ):
            tagged = [f"{salt}:{v}" for v in grp["v"].astype(str)]
            regs = _fold_registers(md5int8_array(tagged), p)
            nz = np.flatnonzero(regs)  # ship only touched registers
            out.append(
                pd.DataFrame(
                    {
                        "window_start": np.full(len(nz), w, dtype=np.int64),
                        "register": nz.astype(np.int64),
                        "max_rank": regs[nz],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "window_start": pd.Series([], dtype="int64"),
                    "register": pd.Series([], dtype="int64"),
                    "max_rank": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    partials = events.map_batches(fold, batch_format="pandas", batch_size=None)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["window_start", "register"], as_index=False)[
            "max_rank"
        ].max()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return g

    return merge_partials(
        partials, ["window_start", "register"], merge, lambda b: b, 16
    )


def windowed_hll_estimates(registers: pd.DataFrame, p: int = HLL_P) -> pd.DataFrame:
    """(window_start, est) from a windowed register table (small: one
    group per window)."""
    rows = []
    for w, grp in registers.groupby("window_start"):
        rows.append((int(w), hll_estimate(grp, p)))
    return pd.DataFrame(rows, columns=["window_start", "est"])


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_registers(ds, col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                  salt: str = "cms"):
    """Distributed Count-Min sketch (Cormode & Muthukrishnan 2005): a
    depth x width counter table for approximate per-key frequencies
    (point query: ``min_j regs[j][h_j(x)]``, an upper bound on the true
    count) — heavy-hitter screening without the per-key groupby.

    Same discipline as the HLL: deterministic repo-standard hashes
    (``md5int8(f"{salt}{j}:{value}")`` % width), so the counter table is
    oracle-checkable in SQL as EXACT integers; the sketch's approximation
    guarantees stay engine-side, pytest-pinned. The combiner output is a
    CONSTANT depth x width array per block (counts ADD, the cleanest
    mergeable sketch there is), reduced by the same repartition tree —
    exchange volume independent of row count.

    Returns (row, register, cnt) — dense depth x width rows.
    """

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        # hash once per DISTINCT value per depth row, weighted by its
        # multiplicity — md5 cost is bounded by block cardinality
        vc = batch[col].astype(str).value_counts()
        vals, weights = vc.index.to_numpy(), vc.to_numpy().astype(np.int64)
        regs = np.zeros((depth, width), dtype=np.int64)
        for j in range(depth):
            h = md5int8_array([f"{salt}{j}:{v}" for v in vals]) % width
            np.add.at(regs[j], h, weights)
        return pd.DataFrame(
            {
                "row": np.repeat(np.arange(depth, dtype=np.int64), width),
                "register": np.tile(np.arange(width, dtype=np.int64), depth),
                "cnt": regs.reshape(-1),
            }
        )

    parts = ds.map_batches(fold, batch_format="pandas", batch_size=None)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["row", "register"], as_index=False)["cnt"].sum()
        return g.astype({"row": "int64", "register": "int64", "cnt": "int64"})

    return (
        parts.repartition(8)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def cms_estimate(registers: pd.DataFrame, value, depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH, salt: str = "cms") -> int:
    """Point-query a (row, register, cnt) CMS table: min over depth rows
    of the value's counter — an UPPER bound on the true count."""
    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8

    regs = np.zeros((depth, width), dtype=np.int64)
    regs[registers["row"].to_numpy(), registers["register"].to_numpy()] = (
        registers["cnt"].to_numpy()
    )
    return int(
        min(regs[j][md5int8(f"{salt}{j}:{value}") % width] for j in range(depth))
    )


def grouped_hll(ds, group_col: str, key_col: str, p: int = HLL_P,
                salt: str = "hll", num_buckets: int = 16):
    """Approximate distinct-``key_col`` per ``group_col`` value:
    (group, register, max_rank) sparse register rows — the grouped form
    of :func:`hll_registers` (same register/rank definition, same SQL
    mirror). At 100 TB this replaces a (group, key) distinct exchange
    with <= 2^p ints per (group, block); a hot group ships one register
    set per block, never a row per member — the sketch IS the combiner.

    Estimates: ``windowed_hll_estimates``-style consumers group the
    result and call :func:`hll_estimate` per group."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, grp in batch[[group_col, key_col]].groupby(group_col, sort=False):
            tagged = [f"{salt}:{v}" for v in grp[key_col].astype(str)]
            regs = _fold_registers(md5int8_array(tagged), p)
            nz = np.flatnonzero(regs)
            out.append(
                pd.DataFrame(
                    {
                        group_col: np.repeat(g, len(nz)),
                        "register": nz.astype(np.int64),
                        "max_rank": regs[nz],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype="object"),
                    "register": pd.Series([], dtype="int64"),
                    "max_rank": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(fold, batch_format="pandas", batch_size=None)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby([group_col, "register"], as_index=False)[
            "max_rank"
        ].max()
        g["register"] = g["register"].astype("int64")
        g["max_rank"] = g["max_rank"].astype("int64")
        return g

    return merge_partials(
        partials, [group_col, "register"], merge, lambda b: b, num_buckets
    )
