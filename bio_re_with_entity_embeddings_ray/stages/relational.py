"""Generic relational / stream-shaped operators (SURVEY.md §2.2-2.7 analogs
exercised over the TPC-H-ish testdata tables).

M16 NotNull / M17 MapFunction / M18 RenameColumns -> Ray Data expressions;
J3 broadcast semi-join; J6 re-key + grouped union; A1-style grouped
aggregate; O2/O3 sort + limit; windowed aggregate + sessionization for the
events stream (Ray Data has no event-time windows — implemented as
key-partitioned group apply over ts-sorted groups, ordering assumption
documented per fn).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.common import (
    bucketed_group_apply,
    merge_partials,
)


def groupby_sum_counts(lineitem):
    """Pricing-summary-style aggregate with integer-exact sums:
    (l_returnflag, l_linestatus, n, sum_qty, sum_price_cents).

    Floats are cast to integer cents PER ROW before summing so the result
    is order-independent and exactly matches the SQL oracle.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(
            qty=batch["l_quantity"].round().astype("int64"),
            cents=(batch["l_extendedprice"] * 100).round().astype("int64"),
        )
        return b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n=("qty", "size"), sum_qty=("qty", "sum"), sum_price_cents=("cents", "sum")
        )

    partials = lineitem.map_batches(partial, batch_format="pandas")

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n=("n", "sum"),
            sum_qty=("sum_qty", "sum"),
            sum_price_cents=("sum_price_cents", "sum"),
        )

    # associative sum over partials: the measured plan chooser takes the
    # no-shuffle reduction tree for this tiny key space (6 groups)
    return merge_partials(
        partials, ["l_returnflag", "l_linestatus"], merge, lambda b: b, 8
    )


def top_orders(orders, k: int = 10):
    """Global top-k by total price (O3 analog: sort desc + limit), price in
    integer cents; deterministic tie-break on o_orderkey."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"],
                "price_cents": (batch["o_totalprice"] * 100).round().astype("int64"),
            }
        )

    proj = orders.map_batches(project, batch_format="pandas")
    top = proj.sort(["price_cents", "o_orderkey"], descending=[True, False]).limit(k)
    return top


def _key_semi_anti(
    customer,
    keys,
    anti: bool,
    plan: str,
    num_buckets: int,
    broadcast_max_keys: int,
):
    """Shared engine of semi_join_customers / anti_join_customers.

    Physical plans (J3 scale note, SURVEY.md):
    - ``broadcast``: collect the distinct key set once, ``ray.put`` it,
      filter the big side per batch with a vectorized ``isin`` — zero
      shuffle of the big side. Right whenever the key set fits the object
      store comfortably (~10^8-10^9 int keys).
    - ``hash``: co-partition BOTH sides by hash(key) and semi/anti-filter
      inside each bucket — no driver-side collection at all; the plan that
      scales when the key set itself outgrows broadcast
      (reference extract_articles.py:63-67 at 10^12-turn scale).
    - ``auto``: count the (already filtered, small-side) keys and pick:
      <= ``broadcast_max_keys`` -> broadcast, else hash. Measured, not
      guessed — same discipline as common.merge_partials.
    """
    import ray

    if plan == "auto":
        keys = keys.materialize()
        plan = "broadcast" if keys.count() <= broadcast_max_keys else "hash"
    if plan == "broadcast":
        key_set = set(
            int(k) for k in keys.to_pandas()["o_custkey"].unique()
        )
        ref = ray.put(key_set)

        class Filter:
            def __init__(self, ref):
                self.keys = ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                m = batch["c_custkey"].isin(self.keys)
                return batch[~m if anti else m][["c_custkey", "c_name"]]

        return customer.map_batches(
            Filter, fn_constructor_args=(ref,), batch_format="pandas", concurrency=(1, 4)
        )
    if plan != "hash":
        raise ValueError(f"unknown join plan {plan!r}")

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"],
                "c_name": b["c_name"],
                "side": np.int64(0),
            }
        )

    def tag_keys(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(b["o_custkey"])
        return pd.DataFrame({"c_custkey": u, "c_name": "", "side": np.int64(1)})

    u = customer.map_batches(tag_cust, batch_format="pandas", batch_size=None).union(
        keys.map_batches(tag_keys, batch_format="pandas", batch_size=None)
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        k = bucket.loc[bucket["side"] == 1, "c_custkey"].unique()
        c = bucket[bucket["side"] == 0]
        m = c["c_custkey"].isin(k)
        return c.loc[~m if anti else m, ["c_custkey", "c_name"]]

    return bucketed_group_apply(u, "c_custkey", per_bucket, num_buckets)


def semi_join_customers(
    customer,
    orders,
    status: str = "F",
    plan: str = "auto",
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
):
    """J3 semi-join: customers having >=1 order in ``status``; broadcast or
    hash co-partition plan, picked by measured key count (see
    :func:`_key_semi_anti`)."""
    keys = orders.filter(expr=f"o_orderstatus == '{status}'").select_columns(
        ["o_custkey"]
    )
    return _key_semi_anti(customer, keys, False, plan, num_buckets, broadcast_max_keys)


def rekey_grouped_union(customer, nation):
    """J6 re-key + grouped union: customers keyed by nation -> re-key 1->1
    to region via the broadcast nation->region map, union the per-key
    customer sets on collision (reference utils/pandas_utils.py:123-197:
    MeSH-keyed table re-keyed to DOID/DrugBank with article-set union).
    Returns (r_regionkey, custkeys ';;;'-sorted, n_cust)."""
    import ray

    n2r = nation.select_columns(["n_nationkey", "n_regionkey"]).to_pandas()
    ref = ray.put(dict(zip(n2r["n_nationkey"].astype(int), n2r["n_regionkey"].astype(int))))

    class Rekey:
        def __init__(self, ref):
            self.map = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rk = batch["c_nationkey"].map(self.map)
            keep = rk.notna()
            return pd.DataFrame(
                {
                    "r_regionkey": rk[keep].astype("int64"),
                    "c_custkey": batch["c_custkey"][keep].astype("int64"),
                }
            )

    rekeyed = customer.map_batches(
        Rekey, fn_constructor_args=(ref,), batch_format="pandas", concurrency=(1, 4)
    )

    def distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    def union_sets(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates().sort_values(
            ["r_regionkey", "c_custkey"], kind="mergesort"
        )
        g = b.groupby("r_regionkey", sort=False)["c_custkey"]
        out = g.agg(lambda s: ";;;".join(str(v) for v in s)).reset_index()
        out = out.rename(columns={"c_custkey": "custkeys"})
        out["n_cust"] = g.nunique().to_numpy().astype("int64")
        return out

    # distinct is the associative combine; the grouped pack happens once
    # on the key-complete merged frame (plan chooser: tree while small)
    return merge_partials(rekeyed, "r_regionkey", distinct, union_sets, 4)


def tumbling_window(events, width_s: int = 3600):
    """Tumbling event-time window aggregate per event_type:
    (event_type, window_start_epoch, n, value_cents). Pure partial+merge —
    the window key is derived per row, so no ordering assumption."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("datetime64[s]").astype("int64")
        b = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "window_start": (epoch // width_s) * width_s,
                "cents": (batch["value"] * 100).round().astype("int64"),
            }
        )
        return b.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("cents", "size"), value_cents=("cents", "sum")
        )

    partials = events.map_batches(partial, batch_format="pandas")

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("n", "sum"), value_cents=("value_cents", "sum")
        )

    # associative partial sums -> measured tree/exchange plan choice
    return merge_partials(
        partials, ["event_type", "window_start"], merge, lambda b: b, 16
    )


def top_n_per_group(orders, n: int = 3, num_buckets: int = 16):
    """Top-N rows per group by value (classic rank window): the N
    highest-priced orders per customer, rank 1..N, ties broken by
    o_orderkey. Per-block partial top-N (combiner) then per-group final —
    a hot customer ships N rows per block, not its whole history."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "price_cents": (batch["o_totalprice"] * 100)
                .round()
                .astype("int64"),
            }
        )

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(
            ["o_custkey", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return b.groupby("o_custkey", sort=False).head(n)

    pre = orders.map_batches(prep, batch_format="pandas", batch_size=None).map_batches(
        local_top, batch_format="pandas", batch_size=None
    )

    def final_top(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(
            ["o_custkey", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = b.groupby("o_custkey", sort=False).head(n).copy()
        out["rank"] = out.groupby("o_custkey", sort=False).cumcount() + 1
        return out

    # per-group top-n is associative (top_n(top_n(A) ∪ top_n(B)) ==
    # top_n(A ∪ B)), so the merge goes through the plan chooser
    return merge_partials(pre, "o_custkey", local_top, final_top, num_buckets)


def anti_join_customers(
    customer,
    orders,
    status: str = "F",
    plan: str = "auto",
    num_buckets: int = 32,
    broadcast_max_keys: int = 5_000_000,
):
    """Customers with NO order of the given status — the complement of
    semi_join_customers (reference set-difference A5 analog as a
    first-class relational op); same broadcast/hash plan choice."""
    keys = orders.filter(expr=f"o_orderstatus == '{status}'").select_columns(
        ["o_custkey"]
    )
    return _key_semi_anti(customer, keys, True, plan, num_buckets, broadcast_max_keys)


def hopping_window(events, width_s: int = 3600, hop_s: int = 1800):
    """Hopping (sliding) event-time window aggregate per event_type: each
    event lands in width_s/hop_s overlapping windows (flat-map 1->N window
    assignment inside the batch, then the same partial+merge as tumbling).
    Returns (event_type, window_start, n, value_cents)."""
    if width_s % hop_s != 0 or width_s <= 0 or hop_s <= 0:
        raise ValueError(
            f"hopping_window: width_s ({width_s}) must be a positive "
            f"multiple of hop_s ({hop_s}) — the hop-aligned window-start "
            "enumeration assumes width/hop windows cover each event"
        )
    n_win = width_s // hop_s

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("datetime64[s]").astype("int64").to_numpy()
        cents = (batch["value"] * 100).round().astype("int64").to_numpy()
        et = batch["event_type"].to_numpy()
        # window starts: the hop-aligned starts w with w <= t < w + width
        base = (epoch // hop_s) * hop_s
        frames = []
        for j in range(n_win):
            w = base - j * hop_s
            frames.append(
                pd.DataFrame({"event_type": et, "window_start": w, "cents": cents})
            )
        b = pd.concat(frames, ignore_index=True)
        return b.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("cents", "size"), value_cents=("cents", "sum")
        )

    partials = events.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("n", "sum"), value_cents=("value_cents", "sum")
        )

    return merge_partials(
        partials, ["event_type", "window_start"], merge, lambda b: b, 16
    )


def sessionize(events, gap_s: int = 1800):
    """Session windows per user (gap > gap_s starts a new session):
    (user_id, n_sessions, n_events). Ordering assumption: sessions are
    computed over ts-sorted events WITHIN each user partition — the
    partition key makes the sort local (no global order needed)."""

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts"], kind="mergesort")
        epoch = b["ts"].astype("datetime64[s]").astype("int64")
        new_user = b["user_id"].ne(b["user_id"].shift())
        gap = epoch.diff().fillna(0) > gap_s
        session_start = (new_user | gap).astype("int64")
        g = b.assign(ss=session_start).groupby("user_id", sort=False)
        out = g.agg(n_sessions=("ss", "sum"), n_events=("ss", "size")).reset_index()
        out["user_id"] = out["user_id"].astype("int64")
        return out

    ev = events.select_columns(["user_id", "ts"])
    return bucketed_group_apply(ev, "user_id", per_user, 32)


def asof_join_events(events, marker_type: str = "signup", num_buckets: int = 32):
    """As-of join — an operator Ray Data lacks natively: attach to every
    event the user's most recent ``marker_type`` event at or before its
    timestamp. Returns (event_id, ref_event_id, lag_s); -1 when the user
    has no prior marker.

    Implementation: both sides are projected to (user_id, ts_epoch, id),
    tagged and co-partitioned by user through ONE hash exchange; each
    bucket runs pandas ``merge_asof`` (direction='backward', by=user)
    over the ts-sorted bucket — C-speed, no per-row Python. The right
    side is deduped per (user, ts) keeping the max event_id so ties are
    deterministic on both engine and oracle (DuckDB ASOF LEFT JOIN,
    oracles.ASOF_JOIN). Partitioning assumption: a user's events fit one
    bucket's worker — the same per-key envelope as sessionize."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("datetime64[s]").astype("int64")
        left = pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "epoch": epoch,
                "event_id": batch["event_id"],
                "side": np.int64(0),
            }
        )
        is_m = (batch["event_type"] == marker_type).to_numpy()
        right = left.loc[is_m].assign(side=np.int64(1))
        return pd.concat([left, right], ignore_index=True)

    tagged = events.select_columns(
        ["event_id", "user_id", "ts", "event_type"]
    ).map_batches(project, batch_format="pandas", batch_size=None)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket[bucket["side"] == 0].sort_values(
            ["epoch", "event_id"], kind="mergesort"
        )
        r = (
            bucket[bucket["side"] == 1]
            .sort_values(["epoch", "event_id"], kind="mergesort")
            .drop_duplicates(subset=["user_id", "epoch"], keep="last")
            .rename(columns={"event_id": "ref_event_id", "epoch": "ref_epoch"})
        )
        if len(l) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "ref_event_id": pd.Series([], dtype="int64"),
                    "lag_s": pd.Series([], dtype="int64"),
                }
            )
        m = pd.merge_asof(
            l,
            r[["user_id", "ref_epoch", "ref_event_id"]],
            left_on="epoch",
            right_on="ref_epoch",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        ref = m["ref_event_id"].fillna(-1).astype("int64")
        lag = (m["epoch"] - m["ref_epoch"]).fillna(-1).astype("int64")
        lag[ref < 0] = -1
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "ref_event_id": ref,
                "lag_s": lag,
            }
        )

    return bucketed_group_apply(tagged, "user_id", per_bucket, num_buckets)


# static price bands for the range-join operator (lo inclusive, hi exclusive)
PRICE_BANDS = [
    (0, 0, 50_000),
    (1, 50_000, 150_000),
    (2, 150_000, 300_000),
    (3, 300_000, 1 << 60),
]


def range_join_orders(orders, bands=None):
    """Range (interval) join — each order matched to the price band whose
    [lo, hi) interval contains it. Returns (o_orderkey, band_id).

    The band table is tiny and BROADCAST (closure capture); assignment is
    one ``np.searchsorted`` against the sorted lower bounds per batch —
    no shuffle at all, the map-side interval join every binning pipeline
    needs. Bands must be non-overlapping and sorted (validated)."""
    bands = PRICE_BANDS if bands is None else bands
    ids = np.array([b[0] for b in bands], dtype=np.int64)
    los = np.array([b[1] for b in bands], dtype=np.int64)
    his = np.array([b[2] for b in bands], dtype=np.int64)
    if not (np.all(los[1:] >= his[:-1]) and np.all(los < his)):
        raise ValueError("range_join_orders: bands must be sorted and non-overlapping")

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cents_like = (batch["o_totalprice"] * 100).round().astype("int64") // 100
        v = cents_like.to_numpy()
        ix = np.searchsorted(los, v, side="right") - 1
        ok = (ix >= 0) & (v < his[np.clip(ix, 0, len(his) - 1)])
        out = pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy()[ok],
                "band_id": ids[ix[ok]],
            }
        )
        return out

    return orders.map_batches(assign, batch_format="pandas", batch_size=None)


def describe_cents(ds, col: str):
    """One-row distributed describe of a money-like double column in
    integer cents: (n, min_cents, max_cents, sum_cents, mean_cents).
    Per-row cast to cents BEFORE aggregating keeps every number exact
    (order-independent, bit-equal to the SQL oracle); mean is integer
    floor division. Combiner partials -> single merge block."""
    import ray.data as rd

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = (batch[col] * 100).round().astype("int64")
        if len(cents) == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype="int64"),
                    "mn": pd.Series([], dtype="int64"),
                    "mx": pd.Series([], dtype="int64"),
                    "sm": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "n": [len(cents)],
                "mn": [int(cents.min())],
                "mx": [int(cents.max())],
                "sm": [int(cents.sum())],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or batch["n"].sum() == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype="int64"),
                    "min_cents": pd.Series([], dtype="int64"),
                    "max_cents": pd.Series([], dtype="int64"),
                    "sum_cents": pd.Series([], dtype="int64"),
                    "mean_cents": pd.Series([], dtype="int64"),
                }
            )
        n = int(batch["n"].sum())
        sm = int(batch["sm"].sum())
        return pd.DataFrame(
            {
                "n": [n],
                "min_cents": [int(batch["mn"].min())],
                "max_cents": [int(batch["mx"].max())],
                "sum_cents": [sm],
                "mean_cents": [sm // n],
            }
        )

    return parts.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )
