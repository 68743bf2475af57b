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


_SIDE_COL = "__side"


def _schema_dummies(ds, key_col: str) -> dict:
    """Dtype-true dummy values for every non-key column of ``ds``, derived
    from its Arrow schema (NOTE: ``ds.schema()`` may execute part of a
    derived dataset's plan — callers on hot paths pass ``other_cols``
    explicitly instead)."""
    import pyarrow as pa

    out: dict = {}
    schema = ds.schema()
    for name, typ in zip(schema.names, schema.types):
        if name == key_col:
            continue
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            out[name] = ""
        elif pa.types.is_floating(typ):
            out[name] = np.zeros(1, dtype=typ.to_pandas_dtype())[0]
        elif pa.types.is_integer(typ):
            out[name] = np.zeros(1, dtype=typ.to_pandas_dtype())[0]
        elif pa.types.is_boolean(typ):
            out[name] = False
        elif pa.types.is_timestamp(typ):
            out[name] = pd.Timestamp(0)
        else:
            raise TypeError(
                f"key_semi_anti_join hash plan: no dummy for column {name!r} "
                f"of type {typ} — pass other_cols explicitly"
            )
    return out


def key_semi_anti_join(
    big,
    keys,
    key_col: str,
    keys_key_col: str | None = None,
    anti: bool = False,
    plan: str = "auto",
    num_buckets: int = 64,
    broadcast_max_keys: int = 5_000_000,
    other_cols: dict | None = None,
):
    """Generic distributed semi/anti join on one key column: keep (semi)
    or drop (anti) every big-side row whose ``key_col`` value appears in
    the ``keys`` dataset's ``keys_key_col`` (default: same name). Output =
    the big side's rows, filtered.

    Physical plans (J3 scale note, SURVEY.md; reference analog is the
    broadcast id-dict filter at extract_articles.py:63-67):
    - ``broadcast``: collect the distinct key set once, ``ray.put`` it,
      filter the big side per batch with a vectorized ``isin`` — ZERO
      shuffle of the big side. Right while the key set fits the object
      store comfortably (~10^8-10^9 int keys).
    - ``hash``: co-partition BOTH sides by hash(key) and semi/anti-filter
      inside each bucket — nothing ever materializes on the driver; the
      plan that scales when the key set itself outgrows broadcast. Costs
      one exchange of the big side (its rows cross the shuffle once).
    - ``auto``: count the keys (measured, not guessed — same discipline
      as common.merge_partials) and pick: <= ``broadcast_max_keys`` ->
      broadcast, else hash.

    ``other_cols`` maps every non-key big-side column to a DTYPE-TRUE
    dummy value (e.g. ``{"text": "", "n_tokens": 0}``; use numpy scalars
    like ``np.int32(0)`` for narrow ints). The hash plan needs it to give
    the tagged keys side the big side's block schema without probing
    ``big.schema()`` (which can trigger partial execution of a derived
    dataset); omitted, it is derived from the schema. The broadcast plan
    ignores it.
    """
    import ray

    kk = keys_key_col or key_col
    if plan == "auto":
        keys = keys.materialize()
        plan = "broadcast" if keys.count() <= broadcast_max_keys else "hash"
    if plan == "broadcast":
        import pyarrow as pa
        import pyarrow.compute as pc

        kdf = keys.to_pandas()
        # an all-empty keys side can be a zero-block dataset with no
        # schema — treat it as an empty key set
        vals = kdf[kk].unique() if kk in kdf.columns else []
        ref = ray.put(pa.array(vals))

        # task pool, not actor pool: ray.get of the broadcast key array is
        # deserialized once per WORKER PROCESS (Ray caches gets of the
        # same ref, and Arrow arrays deserialize zero-copy from the object
        # store), so tasks get actor-init economics with elastic
        # parallelism and no actor ramp-up. Pure-Arrow filter: zero-copy
        # input blocks, and no zero-row pandas object columns for Ray's
        # block-size probe to warn about.
        def bfilter(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            if len(ks) == 0:
                return batch if anti else batch.slice(0, 0)
            m = pc.is_in(batch[key_col], value_set=ks)
            if anti:
                m = pc.invert(m)
            return batch.filter(m)

        return big.map_batches(bfilter, batch_format="pyarrow", batch_size=None)
    if plan != "hash":
        raise ValueError(f"unknown join plan {plan!r}")

    if other_cols is None:
        other_cols = _schema_dummies(big, key_col)
    cols = [key_col] + list(other_cols)

    def tag_big(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols].copy(deep=False)
        b[_SIDE_COL] = np.int64(0)
        return b

    def tag_keys(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_col: pd.unique(b[kk])})
        for c, v in other_cols.items():
            out[c] = v
        out[_SIDE_COL] = np.int64(1)
        return out

    u = big.map_batches(tag_big, batch_format="pandas", batch_size=None).union(
        keys.map_batches(tag_keys, batch_format="pandas", batch_size=None)
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        k = bucket.loc[bucket[_SIDE_COL] == 1, key_col].unique()
        b = bucket[bucket[_SIDE_COL] == 0]
        m = b[key_col].isin(k)
        return b.loc[~m if anti else m, cols]

    return bucketed_group_apply(u, key_col, per_bucket, num_buckets)


def _key_semi_anti(
    customer,
    keys,
    anti: bool,
    plan: str,
    num_buckets: int,
    broadcast_max_keys: int,
):
    """Customer/orders front-end of :func:`key_semi_anti_join` (the keys
    side arrives keyed ``o_custkey``; output is (c_custkey, c_name))."""
    return key_semi_anti_join(
        customer.select_columns(["c_custkey", "c_name"]),
        keys,
        "c_custkey",
        keys_key_col="o_custkey",
        anti=anti,
        plan=plan,
        num_buckets=num_buckets,
        broadcast_max_keys=broadcast_max_keys,
        other_cols={"c_name": ""},
    )


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
        from bio_re_with_entity_embeddings_ray.stages.aggregate import (
            SET_SEP,
            group_join,
        )

        # NUMERIC sort first (the packed order is by custkey value, not
        # lexicographic), then the in-order C-level group join
        b = bucket.drop_duplicates().sort_values(
            ["r_regionkey", "c_custkey"], kind="mergesort"
        )
        b = b.assign(ck=b["c_custkey"].astype(str))
        out = group_join(b, ["r_regionkey"], "ck", "custkeys")
        out["n_cust"] = (out["custkeys"].str.count(SET_SEP) + 1).astype("int64")
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


def top_values(ds, col: str, k: int = 20, num_buckets: int = 16):
    """Generic hot-key histogram: (value, cnt, rank) — the top-``k`` most
    frequent values of any column, ties by value ascending. The skew
    diagnostic behind partitioning decisions (salt-or-not, bucket
    count): per-block ``value_counts`` combiner -> value-keyed hash merge
    with a per-bucket partial top-k -> ``num_buckets * k`` rows on the
    driver. Same shape as textstats.vocab_topk, for arbitrary columns."""
    import numpy as np

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        return pd.DataFrame(
            {"value": vc.index.to_numpy(), "cnt": vc.to_numpy().astype("int64")}
        )

    partials = ds.map_batches(local, batch_format="pandas", batch_size=None)

    def merge_top(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("value", as_index=False)["cnt"].sum()
        return g.sort_values(
            ["cnt", "value"], ascending=[False, True], kind="mergesort"
        ).head(k)

    per_bucket = bucketed_group_apply(partials, "value", merge_top, num_buckets)
    top = (
        per_bucket.to_pandas()
        .sort_values(["cnt", "value"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["cnt"] = top["cnt"].astype("int64")
    return top


def hash_join(
    left,
    right,
    key_col: str,
    right_key_col: str | None = None,
    plan: str = "auto",
    num_buckets: int = 64,
    broadcast_max_rows: int = 5_000_000,
    how: str = "inner",
):
    """Generic row-level equi-join (``how`` in {"inner", "left",
    "outer", "right"}), through the same measured plan choice as
    :func:`key_semi_anti_join` (J3 discipline):

    - ``broadcast``: collect the RIGHT side once (it is the dimension
      side by contract), ``ray.put`` the frame, per-batch C-level
      ``pd.merge`` — ZERO shuffle of the left side. Right while the
      right side fits the object store (~10^8 rows).
    - ``hash``: Ray Data's native shuffle join (`Dataset.join`) —
      co-partitions both sides by hash(key); the plan when BOTH sides
      are fact-scale. Costs one exchange of each side.
    - ``auto``: measured right-side count picks the plan.

    ``how="outer"`` (full outer) runs ONLY on the hash plan: a
    per-batch broadcast merge sees one left block at a time, so it
    cannot know which right rows matched nowhere — emitting them per
    batch would duplicate the unmatched right side. ``auto`` therefore
    forces the hash plan for outer joins; ``plan="broadcast"`` raises.

    Output: left columns + right columns (the join key once, under the
    left name — for outer joins with differently-named keys the left
    key column is null-coalesced with the right's so unmatched right
    rows keep their key); under ``how="left"``/``"outer"`` unmatched
    rows carry nulls in the other side's columns (integer columns
    therefore arrive as nullable — coalesce downstream). Skewed keys: a
    hot key's rows land in one partition — pre-aggregate or salt before
    joining two fact tables on a power-law key (same blast-radius note
    as bucketed_group_apply)."""
    import ray

    if how not in ("inner", "left", "outer", "right"):
        raise ValueError(f"unsupported how {how!r}")
    rk = right_key_col or key_col
    if how in ("outer", "right"):
        if plan == "broadcast":
            raise ValueError(
                f"{how} join cannot run on the broadcast plan (per-batch "
                "merge would duplicate unmatched right rows) — use plan="
                "'hash' or 'auto'"
            )
        plan = "hash"
    if plan == "auto":
        right = right.materialize()
        plan = "broadcast" if right.count() <= broadcast_max_rows else "hash"
    if plan == "broadcast":
        rdf_ref = ray.put(right.to_pandas())

        def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
            rdf = ray.get(rdf_ref)  # per-worker cached deserialization
            out = batch.merge(rdf, left_on=key_col, right_on=rk, how=how)
            if rk != key_col:
                out = out.drop(columns=[rk])
            return out

        return left.map_batches(join_batch, batch_format="pandas")
    if plan != "hash":
        raise ValueError(f"unknown plan {plan!r}")
    # same-name keys: passing right_on triggers an ambiguous FieldRef in
    # the Arrow join — omit it and let the shared name align both sides
    kw = {"right_on": (rk,)} if rk != key_col else {}
    joined = left.join(
        right,
        join_type={
            "inner": "inner",
            "left": "left_outer",
            "outer": "full_outer",
            "right": "right_outer",
        }[how],
        num_partitions=num_buckets,
        on=(key_col,),
        **kw,
    )
    if rk != key_col:
        if how in ("outer", "right"):
            # Ray 2.49 coalesces differently-named keys into ONE column:
            # full_outer keeps the left name, right_outer keeps only the
            # right name — normalize both (and guard versions that keep
            # both columns) so callers always see ``key_col``
            def coalesce(batch: pd.DataFrame) -> pd.DataFrame:
                if rk not in batch.columns:
                    return batch
                if key_col not in batch.columns:
                    return batch.rename(columns={rk: key_col})
                batch = batch.copy(deep=False)
                batch[key_col] = batch[key_col].fillna(batch[rk])
                return batch.drop(columns=[rk])

            return joined.map_batches(coalesce, batch_format="pandas")
        cols = [c for c in joined.columns() if c != rk]
        joined = joined.select_columns(cols)
    return joined


def rolling_per_key(
    events, k: int = 4, num_buckets: int = 32
):
    """Per-user rolling aggregate over the last ``k`` preceding events
    plus the current one (SQL ``ROWS BETWEEN k PRECEDING AND CURRENT
    ROW``): (event_id, user_id, roll_n, roll_sum_milli). Values are
    floored to integer milli-units BEFORE summation so the unordered SQL
    SUM agrees exactly with the engine's accumulation (same discipline
    as bm25/bigram_nll). Ordering inside a user is (ts, event_id) — the
    unique tiebreak both sides share.

    Scale shape: one narrow projection (4 int64 columns, never props),
    one user-keyed hash exchange; the per-bucket kernel is a single
    cumsum with per-user segment rebasing — no per-row Python, no global
    sort. Partitioning assumption: a user's events fit one bucket's
    worker, the same per-key envelope as sessionize/asof."""
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "ts": batch["ts"],
                "event_id": batch["event_id"].astype("int64"),
                "v_milli": np.round(batch["value"].to_numpy() * 1000).astype(
                    np.int64
                ),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v = b["v_milli"].to_numpy()
        u = b["user_id"].to_numpy()
        n = len(b)
        idx = np.arange(n, dtype=np.int64)
        new = np.concatenate(([True], u[1:] != u[:-1])) if n else np.array([], bool)
        starts = idx[new]
        gstart = np.repeat(starts, np.diff(np.append(starts, n)))
        lo = np.maximum(idx - (k + 1), gstart - 1)
        cum = np.cumsum(v)
        prev = np.where(lo >= 0, cum[np.clip(lo, 0, None)], 0)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": u.astype(np.int64),
                "roll_n": (idx - lo).astype(np.int64),
                "roll_sum_milli": (cum - prev).astype(np.int64),
            }
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


BLOOM_M = 4096  # bits
BLOOM_K = 3  # hash functions


def bloom_bits(keys, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K,
               num_buckets: int = 16):
    """Distributed Bloom-filter build over a key column: returns the
    sorted set-bit positions as a small DataFrame (pos) — at most ``m``
    rows however large the key set is.

    Deterministic hash family (SQL-mirrorable, no RNG):
    ``pos_j(x) = md5int8(f"bloom{j}:{x}") % m`` for j in 0..k-1. The
    per-batch partial is the DISTINCT positions touched (<= m rows per
    block — the filter IS the combiner, same economics as the HLL/CMS
    sketches); the merge is a distinct through the measured plan.
    """
    from bio_re_with_entity_embeddings_ray.functions.textfns import (
        md5int8_array,
    )
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[key_col].astype(str).to_numpy()
        pos = np.concatenate(
            [
                md5int8_array(np.char.add(f"bloom{j}:", vals.astype("U")))
                % m
                for j in range(k)
            ]
        )
        return pd.DataFrame({"pos": np.unique(pos).astype(np.int64)})

    return merge_partials(
        keys.map_batches(partial, batch_format="pandas"),
        "pos",
        lambda b: b.drop_duplicates("pos"),
        lambda b: b,
        num_buckets,
    ).to_pandas()


def bloom_semi_join(
    big,
    keys,
    key_col: str,
    keys_key_col: str | None = None,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    num_buckets: int = 16,
):
    """Bloom-filter semi-join: keep big-side rows whose key PROBABLY
    appears in the keys side — the classic shuffle-avoiding join
    pre-filter. Never drops a true match; keeps deterministic false
    positives at rate ~(1 - e^{-k n/m})^k, so it composes as a cheap
    pre-pass before an exact ``key_semi_anti_join`` (which then touches
    only the survivors) — at 100 TB that turns "exchange the whole fact
    table" into "exchange the ~matching slice plus epsilon".

    The m-bit filter is built distributed (:func:`bloom_bits`, bounded
    combiner), shipped once via ``ray.put`` as a numpy bool array
    (m/8 KB — broadcast-trivial at any scale), and probed with three
    vectorized gathers per batch. The hash family is md5-deterministic,
    so the DuckDB oracle reproduces the exact survivor set, false
    positives included.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.functions.textfns import (
        md5int8_array,
    )

    kk = keys_key_col or key_col
    bits_df = bloom_bits(keys, kk, m, k, num_buckets)
    bitvec = np.zeros(m, dtype=bool)
    bitvec[bits_df["pos"].to_numpy()] = True
    ref = ray.put(bitvec)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        bv = ray.get(ref)  # per-worker cached
        vals = batch[key_col].astype(str).to_numpy()
        keep = np.ones(len(batch), dtype=bool)
        for j in range(k):
            pos = md5int8_array(np.char.add(f"bloom{j}:", vals.astype("U"))) % m
            keep &= bv[pos]
        return batch[keep]

    return big.map_batches(probe, batch_format="pandas")


def pivot_counts(ds, group_col: str, pivot_col: str,
                 values: list[str] | None = None, num_buckets: int = 16):
    """Pivot aggregate: one row per ``group_col`` with a count column
    ``n_<v>`` per pivot value (the SQL ``SUM(CASE WHEN ...)`` /
    ``PIVOT`` shape). ``values`` fixes the output schema up front (the
    SQL-oracle-friendly form — like SQL PIVOT, static columns); None
    discovers the distinct pivot values with a combiner pass first
    (adds one tiny materialize; only sound when the pivot vocabulary is
    bounded — an unbounded pivot column is a modelling error, not a
    pivot).

    Scale shape: per-batch (group, value) count combiner, group-keyed
    merge, per-bucket C-level pivot_table. A hot group ships one row
    per (value, block)."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    if values is None:
        # discovery + the count pass both consume ds: pin it once so a
        # derived upstream is not executed twice
        ds = ds.materialize()
        vals = (
            ds.select_columns([pivot_col])
            .map_batches(
                lambda b: b.drop_duplicates(), batch_format="pandas",
                batch_size=None,
            )
            .to_pandas()[pivot_col]
            .unique()
        )
        values = sorted(vals)
    cols = [f"n_{v}" for v in values]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby([group_col, pivot_col], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype("int64")
        return g

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby([group_col, pivot_col], as_index=False, sort=False)[
            "n"
        ].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        wide = combined.pivot_table(
            index=group_col, columns=pivot_col, values="n",
            aggfunc="sum", fill_value=0,
        ).reindex(columns=values, fill_value=0)
        wide.columns = cols
        out = wide.reset_index()
        for c in cols:
            out[c] = out[c].astype("int64")
        return out

    return merge_partials(
        ds.map_batches(partial, batch_format="pandas"),
        group_col,
        combine,
        finalize,
        num_buckets,
    )


def revenue_by_nation(lineitem, orders, customer, nation,
                      num_buckets: int = 16):
    """Multi-way join rollup (TPC-H Q5 shape): revenue per nation through
    lineitem ⋈ orders ⋈ customer ⋈ nation, with the engine's standard
    disciplines composed:

    - lineitem (the fact table) is PRE-AGGREGATED per order inside
      ``map_batches`` before any join — the join input is one row per
      (orderkey, block), not one per line item;
    - each dimension hop goes through :func:`hash_join`'s measured
      broadcast/hash plan (orders and customer are broadcast-scale here;
      at fact-scale the same call flips to the native shuffle join);
    - revenue is integer cents per row before summation (order-
      independent, oracle-exact);
    - the final rollup is a bounded-key merge (25 nations) on the lazy
      tree plan.
    """
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].astype("int64"),
                "cents": (batch["l_extendedprice"] * 100)
                .round()
                .astype("int64"),
            }
        )
        return b.groupby("o_orderkey", as_index=False, sort=False)["cents"].sum()

    li = lineitem.map_batches(li_partial, batch_format="pandas")
    j1 = hash_join(
        li,
        orders.select_columns(["o_orderkey", "o_custkey"]),
        "o_orderkey",
        num_buckets=num_buckets,
    )
    j2 = hash_join(
        j1,
        customer.select_columns(["c_custkey", "c_nationkey"]),
        "o_custkey",
        right_key_col="c_custkey",
        num_buckets=num_buckets,
    )
    j3 = hash_join(
        j2,
        nation.select_columns(["n_nationkey", "n_name"]),
        "c_nationkey",
        right_key_col="n_nationkey",
        num_buckets=num_buckets,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("n_name", as_index=False, sort=False)[
            "cents"
        ].sum()

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("n_name", as_index=False, sort=False)[
            "cents"
        ].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined.rename(columns={"cents": "revenue_cents"})
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out.sort_values("n_name").reset_index(drop=True)

    return merge_partials(
        j3.map_batches(partial, batch_format="pandas"),
        "n_name",
        combine,
        finalize,
        num_buckets,
        plan="tree",
    )


def explode_list(ds, list_col: str, out_col: str):
    """Flatten an Arrow ``list<...>`` column to one row per element
    (SQL ``unnest``), keeping every other column — zero-copy on the
    Arrow path via ``pyarrow.ListArray`` offsets (parent rows are
    repeated with ``take``; no Python per-row loop). Rows with empty
    lists produce no output (unnest semantics)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        counts = pc.list_value_length(col).fill_null(0)
        parent = np.repeat(
            np.arange(len(batch), dtype=np.int64), counts.to_numpy()
        )
        others = batch.drop([list_col]).take(pa.array(parent))
        return others.append_column(out_col, flat)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def robust_outliers(events, k: int = 3, num_buckets: int = 16):
    """Robust (median/MAD) outlier detection over the event value
    stream: flag rows where ``|v - median| > k * MAD`` — the
    data-quality gate that, unlike mean/stddev, is not dragged by the
    outliers it is hunting. Exact integers end to end: values floor to
    milli-units once; the median and the MAD are EXACT distributed
    quantiles (the :func:`~bio_re_with_entity_embeddings_ray.stages.
    textstats.exact_quantiles` position rule, p50 twice), so the SQL
    oracle reproduces the flag set bit-for-bit.

    Scale shape: three streaming passes (median histogram → deviation
    histogram → flag filter), each a value-histogram combiner or a
    narrow map against two broadcast scalars — the same inherent
    two-pass structure as `curate_percentile`, plus one. Returns
    (event_id, v_milli, dev_milli) for flagged rows.
    """
    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        exact_quantiles,
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "v_milli": np.round(
                    batch["value"].to_numpy() * 1000
                ).astype(np.int64),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas").materialize()
    med = int(exact_quantiles(ev, "v_milli", [5000], num_buckets)["value"].iloc[0])

    def dev(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["dev_milli"] = np.abs(batch["v_milli"].to_numpy() - med)
        return batch

    dv = ev.map_batches(dev, batch_format="pandas").materialize()
    mad = int(
        exact_quantiles(dv, "dev_milli", [5000], num_buckets)["value"].iloc[0]
    )

    return dv.filter(expr=f"dev_milli > {k * mad}")


def windowed_topk(events, width_s: int = 3600, k: int = 3,
                  num_buckets: int = 16):
    """Trending items per tumbling window: the top-``k`` event types by
    count in each window, ranked (count DESC, type ASC). Combiner
    counts per (window, type) per block, window-keyed merge, per-window
    vectorized head-k — the "what's hot right now" query every event
    pipeline ships. Returns (window_start, event_type, n, rank)."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("datetime64[s]").astype("int64")
        b = pd.DataFrame(
            {
                "window_start": (epoch // width_s) * width_s,
                "event_type": batch["event_type"],
            }
        )
        g = b.groupby(["window_start", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(
            ["window_start", "event_type"], as_index=False
        )["n"].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        b = combined.sort_values(
            ["window_start", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        b = b.copy(deep=False)
        b["rank"] = b.groupby("window_start", sort=False).cumcount() + 1
        out = b[b["rank"] <= k].reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        out["rank"] = out["rank"].astype("int64")
        out["window_start"] = out["window_start"].astype("int64")
        return out

    return merge_partials(
        events.map_batches(partial, batch_format="pandas"),
        "window_start",
        combine,
        finalize,
        num_buckets,
    )


def union_by_name(a, b, fill: dict | None = None):
    """Schema-drift union (SQL ``UNION ALL BY NAME``): align two
    datasets on the union of their column names, padding columns a side
    lacks with ``fill`` values (default None/null) — the ingest reality
    of long-lived corpora whose shards gained columns over time. Narrow
    maps only; no shuffle.

    Columns are aligned to side ``a``'s order plus b-only columns
    appended sorted, so the output schema is deterministic regardless of
    which side is which."""
    fill = fill or {}
    cols_a = a.columns()
    cols_b = b.columns()
    all_cols = list(cols_a) + sorted(c for c in cols_b if c not in cols_a)

    def pad(cols_present):
        missing = [c for c in all_cols if c not in cols_present]

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy(deep=False)
            for c in missing:
                batch[c] = fill.get(c)
            return batch[all_cols]

        return fn

    return a.map_batches(pad(cols_a), batch_format="pandas").union(
        b.map_batches(pad(cols_b), batch_format="pandas")
    )


def turn_lag(transcripts, num_buckets: int = 16):
    """Per-conversation LAG: for every turn, the previous turn's role and
    the inter-turn latency in milliseconds (SQL ``LAG(...) OVER
    (PARTITION BY conv_id ORDER BY turn_idx)``) — the response-time /
    turn-taking feature every transcript analytics pipeline derives.

    First turn of a conversation gets sentinel ``prev_role=''`` /
    ``gap_ms=-1`` (typed sentinels keep the schema null-free).

    Scale shape: project to the four needed columns, ONE conv_id hash
    shuffle, then a vectorized sort+shift per bucket — a conversation's
    turns are bounded, the shuffle payload carries no text.
    """

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].astype("int32"),
                "role": batch["role"],
                "ts_ms": batch["ts"].astype("datetime64[ms]").astype("int64"),
            }
        )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=str),
                    "turn_idx": pd.Series([], dtype="int32"),
                    "role": pd.Series([], dtype=str),
                    "prev_role": pd.Series([], dtype=str),
                    "gap_ms": pd.Series([], dtype="int64"),
                }
            )
        cid = b["conv_id"].to_numpy()
        ms = b["ts_ms"].to_numpy()
        role = b["role"].to_numpy()
        same = np.zeros(n, dtype=bool)
        same[1:] = cid[1:] == cid[:-1]
        prev_ms = np.empty(n, dtype=np.int64)
        prev_ms[0] = 0
        prev_ms[1:] = ms[:-1]
        prev_role = np.empty(n, dtype=object)
        prev_role[0] = ""
        prev_role[1:] = role[:-1]
        return pd.DataFrame(
            {
                "conv_id": cid,
                "turn_idx": b["turn_idx"].to_numpy(),
                "role": role,
                "prev_role": np.where(same, prev_role, ""),
                "gap_ms": np.where(same, ms - prev_ms, np.int64(-1)).astype(
                    "int64"
                ),
            }
        )

    slimmed = transcripts.map_batches(slim, batch_format="pandas")
    return bucketed_group_apply(slimmed, "conv_id", per_bucket, num_buckets)


def role_transitions(transcripts, num_buckets: int = 16):
    """Markov transition counts over conversation roles: how often role B
    follows role A across the corpus (the turn-taking structure signal a
    dialogue-data pipeline monitors for format drift). SQL shape:
    ``LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)`` then
    ``GROUP BY prev_role, role`` — conversation-first turns excluded.

    Scale shape: project to (conv_id, turn_idx, role), ONE conv_id hash
    shuffle, per-bucket vectorized shift + C-level groupby count partials,
    then a lazy tree merge (the role vocabulary is tiny by construction,
    so the merged table is bounded at |roles|^2 rows)."""

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].astype("int32"),
                "role": batch["role"],
            }
        )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    "prev_role": pd.Series([], dtype=str),
                    "role": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        cid = b["conv_id"].to_numpy()
        role = b["role"].to_numpy()
        same = np.zeros(n, dtype=bool)
        same[1:] = cid[1:] == cid[:-1]
        prev = np.empty(n, dtype=object)
        prev[0] = ""
        prev[1:] = role[:-1]
        t = pd.DataFrame({"prev_role": prev[same], "role": role[same]})
        g = t.groupby(["prev_role", "role"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    slimmed = transcripts.map_batches(slim, batch_format="pandas")
    partials = bucketed_group_apply(slimmed, "conv_id", per_bucket, num_buckets)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["prev_role", "role"], as_index=False)["n"].sum()

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined.sort_values(["prev_role", "role"]).reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        return out

    return merge_partials(
        partials, ["prev_role", "role"], combine, finalize, num_buckets,
        plan="tree",
    )


def drop_repeated_turns(transcripts, num_buckets: int = 16):
    """Transcript cleaning: drop a turn when its text is byte-identical to
    the immediately preceding turn of the same conversation (consecutive-
    duplicate removal — stuttered tool retries, double-submitted user
    messages). SQL shape: ``LAG(text) OVER (PARTITION BY conv_id ORDER BY
    turn_idx)`` + keep where different or first.

    One conv_id hash shuffle; the comparison is a vectorized shifted
    equality per bucket. Text crosses the exchange once (it IS the output
    payload), never twice."""

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = len(b)
        if n == 0:
            return bucket
        cid = b["conv_id"].to_numpy()
        txt = b["text"].to_numpy()
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (cid[1:] == cid[:-1]) & (txt[1:] == txt[:-1])
        return b[~dup]

    return bucketed_group_apply(transcripts, "conv_id", per_bucket, num_buckets)


def conv_stats(transcripts, num_buckets: int = 16):
    """Per-conversation feature row: (conv_id, n_turns, n_user, n_tool,
    n_roles, duration_ms) — the conversation-level profile table KG and
    curation stages key decisions on (e.g. drop single-turn convs, cap
    tool-heavy ones).

    Combiner shape: per-block partial aggregates (counts, distinct-role
    packed set, min/max ts) shuffle ONE row per (conv, block) — no text,
    no per-turn rows — then a conv-keyed merge. The packed-role set goes
    through the C-level pack/explode helpers (aggregate.pack_sorted_
    distinct), never a per-group Python lambda."""
    from bio_re_with_entity_embeddings_ray.stages.aggregate import (
        SET_SEP,
        explode_packed,
        pack_sorted_distinct,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "role": batch["role"],
                "is_user": (batch["role"] == "user").astype("int64"),
                "is_tool": (batch["role"] == "tool").astype("int64"),
                "ts_ms": batch["ts"].astype("datetime64[ms]").astype("int64"),
            }
        )
        g = b.groupby("conv_id", as_index=False).agg(
            n_turns=("role", "size"),
            n_user=("is_user", "sum"),
            n_tool=("is_tool", "sum"),
            ts_min=("ts_ms", "min"),
            ts_max=("ts_ms", "max"),
        )
        roles = pack_sorted_distinct(b, ["conv_id"], "role", "roles")
        return g.merge(roles, on="conv_id")

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        nums = batch.groupby("conv_id", as_index=False).agg(
            n_turns=("n_turns", "sum"),
            n_user=("n_user", "sum"),
            n_tool=("n_tool", "sum"),
            ts_min=("ts_min", "min"),
            ts_max=("ts_max", "max"),
        )
        roles = pack_sorted_distinct(
            explode_packed(batch, ["conv_id"], "roles"),
            ["conv_id"],
            "roles",
            "roles",
        )
        return nums.merge(roles, on="conv_id")

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        out = combined.copy(deep=False)
        out["n_roles"] = (out["roles"].str.count(SET_SEP) + 1).astype("int64")
        out["duration_ms"] = (out["ts_max"] - out["ts_min"]).astype("int64")
        out["n_turns"] = out["n_turns"].astype("int64")
        out["n_user"] = out["n_user"].astype("int64")
        out["n_tool"] = out["n_tool"].astype("int64")
        return out[
            ["conv_id", "n_turns", "n_user", "n_tool", "n_roles", "duration_ms"]
        ]

    partials = transcripts.map_batches(partial, batch_format="pandas")
    return merge_partials(partials, "conv_id", combine, finalize, num_buckets)


def set_op(a, b, op: str, key: str, num_buckets: int = 16):
    """Distinct set operations between two keyed datasets (SQL
    ``INTERSECT`` / ``EXCEPT``): keys present in both sides, or in ``a``
    but not ``b``. Output is DISTINCT keys (set semantics), one column.

    Combiner shape: each side pre-DISTINCTs per block and ships
    (key, side-presence flags) partial rows — one row per (key, block) —
    then a key-complete merge ORs the flags and applies the predicate.
    Neither side's payload columns ever cross the exchange."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be intersect|except, got {op!r}")

    def tag(side_a: bool):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            k = batch[key].drop_duplicates()
            return pd.DataFrame(
                {
                    key: k,
                    "in_a": np.int64(1) if side_a else np.int64(0),
                    "in_b": np.int64(0) if side_a else np.int64(1),
                }
            )

        return fn

    partials = a.map_batches(tag(True), batch_format="pandas").union(
        b.map_batches(tag(False), batch_format="pandas")
    )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(key, as_index=False).agg(
            in_a=("in_a", "max"), in_b=("in_b", "max")
        )

    def finalize(combined: pd.DataFrame) -> pd.DataFrame:
        if op == "intersect":
            keep = (combined["in_a"] == 1) & (combined["in_b"] == 1)
        else:
            keep = (combined["in_a"] == 1) & (combined["in_b"] == 0)
        return combined.loc[keep, [key]].reset_index(drop=True)

    return merge_partials(partials, key, combine, finalize, num_buckets)


def rollup_counts(docs, num_buckets: int = 16):
    """Grouping-sets aggregate (SQL ``GROUP BY ROLLUP(lang, source)``):
    document count + exact char sum at three granularities — (lang,
    source), (lang), and the grand total — with ``'*'`` as the rolled-up
    sentinel (the synthetic values never contain it).

    Scale shape: ONE finest-grain combiner pass over the corpus; the
    coarser levels are derived from the finest AGGREGATE (bounded at
    |lang|x|source| rows), never from a second corpus pass — the classic
    rollup-from-cube trick."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "n_chars": batch["n_chars"].astype("int64"),
            }
        )
        g = b.groupby(["lang", "source"], as_index=False).agg(
            n=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return g

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["lang", "source"], as_index=False).agg(
            n=("n", "sum"), sum_chars=("sum_chars", "sum")
        )

    def finalize(fine: pd.DataFrame) -> pd.DataFrame:
        lvl1 = fine.groupby("lang", as_index=False).agg(
            n=("n", "sum"), sum_chars=("sum_chars", "sum")
        )
        lvl1["source"] = "*"
        lvl0 = pd.DataFrame(
            {
                "lang": ["*"],
                "source": ["*"],
                "n": [fine["n"].sum()],
                "sum_chars": [fine["sum_chars"].sum()],
            }
        )
        out = pd.concat(
            [fine, lvl1[["lang", "source", "n", "sum_chars"]], lvl0],
            ignore_index=True,
        )
        out["n"] = out["n"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return out.sort_values(["lang", "source"]).reset_index(drop=True)

    partials = docs.map_batches(partial, batch_format="pandas")
    # |lang| x |source| is a bounded vocabulary: lazy tree merge
    return merge_partials(
        partials, ["lang", "source"], combine, finalize, num_buckets,
        plan="tree",
    )


def running_total(events, num_buckets: int = 32):
    """Per-user unbounded running total (SQL ``SUM ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND CURRENT ROW``): (event_id, user_id, cum_n,
    cum_sum_milli), ordered inside a user by (ts, event_id) — the
    lifetime-value / balance-so-far scan of event analytics.

    Same scale shape as :func:`rolling_per_key`: narrow int64 projection,
    one user-keyed exchange, segment-rebased cumsum per bucket. Values
    floored to milli-units before summation (exact SQL mirror)."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "ts": batch["ts"],
                "event_id": batch["event_id"].astype("int64"),
                "v_milli": np.round(batch["value"].to_numpy() * 1000).astype(
                    np.int64
                ),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v = b["v_milli"].to_numpy()
        u = b["user_id"].to_numpy()
        n = len(b)
        idx = np.arange(n, dtype=np.int64)
        new = np.concatenate(([True], u[1:] != u[:-1])) if n else np.array([], bool)
        starts = idx[new]
        gstart = np.repeat(starts, np.diff(np.append(starts, n)))
        cum = np.cumsum(v)
        prev = np.where(gstart > 0, cum[np.clip(gstart - 1, 0, None)], 0)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": u.astype(np.int64),
                "cum_n": (idx - gstart + 1).astype(np.int64),
                "cum_sum_milli": (cum - prev).astype(np.int64),
            }
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


def funnel_counts(
    events,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    num_buckets: int = 32,
):
    """Ordered funnel analysis: for each user, the greedy
    earliest-completion depth through ``steps`` (step i+1 must occur
    STRICTLY after the chosen occurrence of step i); returns
    (depth, n_users) for depth 0..len(steps) — the conversion-funnel
    query of product analytics.

    Scale shape: narrow projection (user, type, ts), one user-keyed
    exchange, per-bucket vectorized greedy via masked per-user groupby
    minima (one pass per step, all C-level), then a tiny depth-histogram
    merge."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"].isin(steps)]
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "event_type": b["event_type"],
                "ts": b["ts"],
            }
        )

    # all users (incl. those with zero funnel events) get a depth row
    def users_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": batch["user_id"].astype("int64").drop_duplicates()}
        )

    ev = events.map_batches(prep, batch_format="pandas")
    all_users = events.map_batches(users_partial, batch_format="pandas")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        users = bucket["user_id"].drop_duplicates().to_numpy()
        cur = pd.Series(
            pd.Timestamp.min.as_unit("us"), index=users
        )  # step-(i-1) completion time; Timestamp.min < all data
        depth = pd.Series(np.int64(0), index=users)
        alive = pd.Series(True, index=users)
        for i, step in enumerate(steps):
            s = bucket[bucket["event_type"] == step]
            prev = s["user_id"].map(cur)
            s = s[s["ts"] > prev.to_numpy()]
            t = s.groupby("user_id")["ts"].min()
            # users still alive at depth i that completed step i
            hit = t.index.intersection(alive.index[alive])
            alive = pd.Series(False, index=users)
            alive[hit] = True
            depth[hit] = i + 1
            cur = pd.Series(pd.Timestamp.max.as_unit("us"), index=users)
            cur[hit] = t[hit]
        return pd.DataFrame(
            {
                "depth": depth.to_numpy(),
                "n_users": np.ones(len(users), dtype=np.int64),
            }
        )

    # union the funnel events with sentinel rows for every user so users
    # with no funnel events land in depth 0
    def sentinel(batch: pd.DataFrame) -> pd.DataFrame:
        # the sentinel type never matches a step, so its ts is inert —
        # epoch 0 stays inside every Arrow timestamp unit's range
        return pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "event_type": "\x00none",
                "ts": pd.Timestamp(0).as_unit("us"),
            }
        )

    combined = ev.union(all_users.map_batches(sentinel, batch_format="pandas"))
    per_user_depth = bucketed_group_apply(
        combined, "user_id", per_bucket, num_buckets
    )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("depth", as_index=False)["n_users"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b.sort_values("depth").reset_index(drop=True)
        out["depth"] = out["depth"].astype("int64")
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return merge_partials(
        per_user_depth, "depth", combine, finalize, num_buckets, plan="tree"
    )


def k_anonymity(ds, quasi_cols: list[str], k: int = 5, num_buckets: int = 16):
    """Privacy audit: quasi-identifier combinations carried by FEWER than
    ``k`` rows (the k-anonymity violations a release gate must suppress
    or generalize). Returns (quasi_cols..., n) for violating groups.

    Count combiner per block -> key-complete merge -> HAVING n < k; the
    exchange carries one row per (combination, block)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(quasi_cols, as_index=False).size()
        return g.rename(columns={"size": "n"})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(quasi_cols, as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b[b["n"] < k].sort_values(quasi_cols).reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return merge_partials(partials, quasi_cols, combine, finalize, num_buckets)


def column_profile(ds, cols: list[str], num_buckets: int = 16):
    """Data-profiling summary per column: (column, n, n_null, n_distinct,
    min_str, max_str) — the first query run against any new corpus
    delivery. min/max are lexicographic over the string rendering (a
    profiling identity check, not numeric stats — numeric mins belong to
    describe/quantiles).

    Scale shape: each block melts to DISTINCT (column, value) partial
    rows with per-value counts — the exchange volume is bounded by the
    distinct-value count, not the row count (the honest cost of exact
    distinct); null counts ride along as a sentinel value row."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            s = batch[c]
            isnull = s.isna()
            vals = s[~isnull].astype(str)
            g = vals.groupby(vals).size()
            frames.append(
                pd.DataFrame(
                    {
                        "column": c,
                        "v": g.index.to_numpy(dtype=object),
                        "n": g.to_numpy().astype(np.int64),
                        "is_null": np.int64(0),
                    }
                )
            )
            nn = int(isnull.sum())
            if nn:
                frames.append(
                    pd.DataFrame(
                        {
                            "column": [c],
                            "v": [""],
                            "n": np.array([nn], dtype=np.int64),
                            "is_null": np.array([1], dtype=np.int64),
                        }
                    )
                )
        return pd.concat(frames, ignore_index=True)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["column", "v", "is_null"], as_index=False)["n"].sum()

    def bucket_profile(b: pd.DataFrame) -> pd.DataFrame:
        # each (column, v) pair lives in exactly ONE bucket after the
        # merge, so per-bucket stats are themselves combinable partials:
        # n_distinct sums, min/max nest, counts sum
        vals = b[b["is_null"] == 0]
        nulls = b[b["is_null"] == 1].groupby("column")["n"].sum()
        g = vals.groupby("column").agg(
            n=("n", "sum"), n_distinct=("v", "size"), min_str=("v", "min"),
            max_str=("v", "max"),
        )
        out = g.reset_index()
        out["n_null"] = out["column"].map(nulls).fillna(0).astype("int64")
        cols_only_null = nulls.index.difference(out["column"])
        if len(cols_only_null):
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "column": cols_only_null,
                            "n": 0,
                            "n_distinct": 0,
                            "min_str": np.nan,
                            "max_str": np.nan,
                            "n_null": nulls[cols_only_null].to_numpy(),
                        }
                    ),
                ],
                ignore_index=True,
            )
        return out

    per_bucket = merge_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["column", "v"],
        combine,
        bucket_profile,
        num_buckets,
    )

    def combine2(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("column", as_index=False).agg(
            n=("n", "sum"),
            n_distinct=("n_distinct", "sum"),
            min_str=("min_str", "min"),
            max_str=("max_str", "max"),
            n_null=("n_null", "sum"),
        )

    def finalize2(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy(deep=False)
        out["n"] = (out["n"] + out["n_null"]).astype("int64")
        out["n_distinct"] = out["n_distinct"].astype("int64")
        out["n_null"] = out["n_null"].astype("int64")
        out["min_str"] = out["min_str"].fillna("")  # all-null column
        out["max_str"] = out["max_str"].fillna("")
        return out[
            ["column", "n", "n_null", "n_distinct", "min_str", "max_str"]
        ].sort_values("column").reset_index(drop=True)

    # the per-column partial set is bounded at |cols| x num_buckets rows
    return merge_partials(per_bucket, "column", combine2, finalize2, plan="tree")


def interval_coalesce(events, gap_s: int = 600, num_buckets: int = 32):
    """Gaps-and-islands interval table: each event spans
    ``[ts, ts + gap_s)``; overlapping/touching spans per user merge into
    one island. Returns (user_id, start_s, end_s, n_events) — the
    interval form of sessionization (sessionize only counts sessions;
    this emits them).

    New island when ``s > prev_s + gap_s`` strictly (with fixed-length
    spans the running max of ends is the previous start + gap, so one
    LAG suffices — same rule as the SQL mirror). Integer epoch seconds
    end to end; one user-keyed exchange of a two-int64 projection."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "s": batch["ts"].astype("datetime64[s]").astype("int64"),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "s"], kind="mergesort")
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "start_s": pd.Series([], dtype="int64"),
                    "end_s": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                }
            )
        u = b["user_id"].to_numpy()
        s = b["s"].to_numpy()
        brk = np.ones(n, dtype=np.int64)
        brk[1:] = ((u[1:] != u[:-1]) | (s[1:] > s[:-1] + gap_s)).astype(np.int64)
        island = np.cumsum(brk)
        g = pd.DataFrame({"user_id": u, "s": s, "island": island}).groupby(
            ["user_id", "island"], as_index=False
        ).agg(start_s=("s", "min"), end_s=("s", "max"), n_events=("s", "size"))
        g["end_s"] = (g["end_s"] + gap_s).astype("int64")
        return g[["user_id", "start_s", "end_s", "n_events"]].astype(
            {"n_events": "int64"}
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


def cohort_retention(events, bucket_s: int = 86400, num_buckets: int = 32):
    """Cohort retention matrix: a user's cohort is their first active
    time bucket (day by default); for each (cohort, bucket) the count of
    cohort users active in that bucket — the retention table every
    product-analytics pipeline derives.

    Scale shape: narrow (user, bucket) projection, ONE user-keyed
    exchange (per-user cohort = min bucket, then distinct (cohort,
    bucket) rows per user), then a (cohort, bucket)-keyed count merge —
    the matrix is time-bounded, never user-bounded."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "bucket": batch["ts"].astype("datetime64[s]").astype("int64")
                // bucket_s,
            }
        )
        return b.drop_duplicates()

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates()
        cohort = b.groupby("user_id")["bucket"].transform("min")
        out = pd.DataFrame(
            {"cohort": cohort.to_numpy(), "bucket": b["bucket"].to_numpy()}
        )
        g = out.groupby(["cohort", "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n_users"})

    partials = bucketed_group_apply(ev, "user_id", per_user, num_buckets)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["cohort", "bucket"], as_index=False)[
            "n_users"
        ].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b.sort_values(["cohort", "bucket"]).reset_index(drop=True)
        out["cohort"] = out["cohort"].astype("int64")
        out["bucket"] = out["bucket"].astype("int64")
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return merge_partials(
        partials, ["cohort", "bucket"], combine, finalize, num_buckets
    )


def cross_join(fact, dim_df, num_buckets: int = 16):
    """Cross join against a broadcast DIMENSION side (every fact row
    paired with every dimension row) — the parameter-sweep / calendar
    expansion join. The dimension side must be small (it is broadcast
    via ``ray.put`` once and re-read per task, never re-shipped per
    batch); the fact side streams.

    Output columns: fact columns then dimension columns (callers
    disambiguate names beforehand)."""
    import ray

    ref = ray.put(dim_df.reset_index(drop=True))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(ref)
        n, m = len(batch), len(dim)
        if n == 0 or m == 0:
            return pd.concat(
                [batch.iloc[:0], dim.iloc[:0]], axis=1
            )
        left = batch.reset_index(drop=True).loc[
            np.repeat(np.arange(n), m)
        ].reset_index(drop=True)
        right = dim.loc[np.tile(np.arange(m), n)].reset_index(drop=True)
        return pd.concat([left, right], axis=1)

    return fact.map_batches(fn, batch_format="pandas")


def throttle_events(events, window_s: int = 86400, num_buckets: int = 32):
    """Rate-limit cleanup: drop an event when the PREVIOUS event of the
    same (user, type) — kept or not — is less than ``window_s`` seconds
    before it (pure LAG semantics, the SQL-expressible debounce).
    Returns the surviving (event_id, user_id, event_type, s).

    One (user, type)-keyed exchange of a narrow int64 projection;
    per-bucket vectorized shifted comparison, ties broken by event_id
    exactly as the SQL mirror orders them."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "user_id": batch["user_id"].astype("int64"),
                "event_type": batch["event_type"],
                "s": batch["ts"].astype("datetime64[s]").astype("int64"),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(
            ["user_id", "event_type", "s", "event_id"], kind="mergesort"
        )
        n = len(b)
        if n == 0:
            return b
        u = b["user_id"].to_numpy()
        t = b["event_type"].to_numpy()
        s = b["s"].to_numpy()
        same = np.zeros(n, dtype=bool)
        same[1:] = (u[1:] == u[:-1]) & (t[1:] == t[:-1])
        prev = np.empty(n, dtype=np.int64)
        prev[0] = 0
        prev[1:] = s[:-1]
        drop = same & (s - prev < window_s)
        return b[~drop]

    return bucketed_group_apply(ev, ["user_id", "event_type"], per_key, num_buckets)


def json_field_int(ds, col: str, field: str, out_col: str = "v"):
    """Semi-structured extraction: pull an integer scalar ``field`` out of
    a JSON-object string column — the "parse the props blob" ingest step
    every event pipeline runs first.

    Scale shape: a pure NARROW map, zero exchange. The hot path is Arrow's
    RE2 ``extract_regex`` (one compiled scan per batch, no per-row
    ``json.loads``) — rows missing the field yield null, like SQL
    ``json_extract``. Non-integer numbers (``12.5``, ``1e3``) yield null
    rather than a truncated integer prefix (the greedy digit run is
    followed by a captured tail char; a ``.``/``e`` tail nulls the row).

    CONTRACT: the blob must be a FLAT object of scalar fields. A regex
    scan cannot see nesting depth — a key that also appears inside a
    nested object or inside a string value ('{"a": {"k": 1}}',
    '{"s": "\\"k\\": 1"}') matches anywhere in the blob and is OUT of
    contract; use a real JSON parser stage for nested documents.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    # \d+ is greedy, so tail can only catch a following '.', 'e'/'E'
    # (fraction/exponent => not an integer) or be empty
    pat = '"' + field + '"\\s*:\\s*(?P<v>-?\\d+)(?P<tail>[.eE]?)'

    def fn(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch.column(col), pat)
        v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        tail = pc.struct_field(ex, "tail")
        v = pc.if_else(pc.equal(tail, ""), v, pa.nulls(len(v), pa.int64()))
        cols = [c for c in batch.column_names if c != col]
        out = batch.select(cols) if cols else pa.table({})
        return out.append_column(out_col, v)

    return ds.map_batches(fn, batch_format="pyarrow")


def unpivot(ds, id_cols: list[str], value_cols: list[str]):
    """Wide->long melt: one output row per (input row, measure column),
    with columns ``id_cols + (measure, value)``. Values must be int64
    (callers quantize floats first, per the repo's integer discipline).

    Scale shape: a pure NARROW map (pd.melt per batch, C-level), zero
    exchange; output is |value_cols| x input rows but streams block by
    block."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.melt(
            id_vars=id_cols,
            value_vars=value_cols,
            var_name="measure",
            value_name="value",
        )
        out["value"] = out["value"].astype("int64")
        return out

    return ds.map_batches(fn, batch_format="pandas")


def histogram(ds, col: str, width: float, num_buckets: int = 16):
    """Equi-width histogram over a numeric column: ``bin = floor(col /
    width)`` (IEEE double division + floor — bit-identical in any engine),
    count per occupied bin.

    Scale shape: per-batch bincount partials (bounded at occupied-bins
    rows per block), lazy tree merge — the histogram itself is
    value-range-bounded, never data-bounded."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(batch[col].to_numpy() / width).astype("int64")
        bins, n = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": bins, "n": n.astype("int64")})

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("bin", as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b.sort_values("bin").reset_index(drop=True)
        return out.astype({"bin": "int64", "n": "int64"})

    return merge_partials(partials, "bin", combine, finalize, plan="tree")


def window_deltas(events, bucket_s: int = 86400):
    """Aggregate-then-LAG: per (event_type, day) counts plus the delta vs
    the type's PREVIOUS OBSERVED day (null on each type's first day) —
    the day-over-day trend table.

    Scale shape: per-batch (type, day) count partials (time-bounded), one
    tiny tree merge; the LAG runs in the finalize over the key-complete
    frame. The merged table is |types| x |days| — never event-bounded."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "day": batch["ts"].astype("datetime64[s]").astype("int64")
                // bucket_s,
            }
        )
        return b.groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    partials = events.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["event_type", "day"], as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b.sort_values(["event_type", "day"], kind="mergesort").reset_index(
            drop=True
        )
        prev = out.groupby("event_type")["n"].shift(1)
        # first observed day per type has no predecessor -> delta 0 (kept
        # integer, not null, so the unordered hash compare is dtype-exact)
        out["delta"] = (out["n"] - prev).fillna(0).astype("int64")
        out["day"] = out["day"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    return merge_partials(
        partials, ["event_type", "day"], combine, finalize, plan="tree"
    )


def dense_counts(events, bucket_s: int = 86400):
    """Gap-filled time series: per (event_type, day) counts with every
    missing day inside the type's [min_day, max_day] range emitted as 0 —
    the densification step before any rolling/forecast pass.

    Scale shape: same time-bounded partial+tree-merge as window_deltas;
    the fill is a vectorized per-type arange in the finalize (output is
    range-bounded, not event-bounded)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "day": batch["ts"].astype("datetime64[s]").astype("int64")
                // bucket_s,
            }
        )
        return b.groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    partials = events.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["event_type", "day"], as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["event_type", "day"], kind="mergesort")
        frames = []
        for et, g in b.groupby("event_type", sort=True):
            lo, hi = int(g["day"].min()), int(g["day"].max())
            full = np.arange(lo, hi + 1, dtype=np.int64)
            n = np.zeros(len(full), dtype=np.int64)
            n[g["day"].to_numpy() - lo] = g["n"].to_numpy()
            frames.append(
                pd.DataFrame({"event_type": et, "day": full, "n": n})
            )
        return pd.concat(frames, ignore_index=True)

    return merge_partials(
        partials, ["event_type", "day"], combine, finalize, plan="tree"
    )


def tpch_q3(customer, orders, lineitem, segment: str = "BUILDING",
            cutoff: str = "1998-06-01", k: int = 10, num_buckets: int = 64):
    """Shipping-priority composition (TPC-H Q3 shape, adapted to this
    schema's columns): revenue per open order for one market segment —
    a 3-table join + aggregate + global top-k, the classic multi-join
    probe of an engine's plan quality.

    Scale shape: customer keys are filtered FIRST and flow through the
    measured broadcast/hash semi-join (the fact side never shuffles on
    the broadcast plan); lineitem revenue is pre-aggregated per orderkey
    with a per-batch combiner BEFORE the join (the exchange carries one
    row per (orderkey, block), never per line item); the joined table is
    order-bounded, and the top-k is a sort+limit on it. Revenue is
    floor(extprice * (1 - disc) * 100) cents PER ROW — IEEE-identical in
    any engine, order-independent under integer summation."""
    cutoff_ts = pd.Timestamp(cutoff)

    def cust_keys(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["c_mktsegment"] == segment]
        return b[["c_custkey"]]

    keys = customer.map_batches(cust_keys, batch_format="pandas")

    def ord_proj(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["o_orderdate"] < cutoff_ts]
        return b[["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]]

    open_orders = key_semi_anti_join(
        orders.map_batches(ord_proj, batch_format="pandas"),
        keys,
        "o_custkey",
        "c_custkey",
        num_buckets=num_buckets,
        other_cols={
            "o_orderkey": np.int64(0),
            "o_orderdate": pd.Timestamp(0),
            "o_orderpriority": "",
        },
    )

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_shipdate"] > cutoff_ts]
        rev = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy())
            * 100.0
        ).astype("int64")
        return pd.DataFrame(
            {"l_orderkey": b["l_orderkey"].to_numpy(), "rev": rev}
        ).groupby("l_orderkey", as_index=False)["rev"].sum()

    partials = lineitem.map_batches(li_partial, batch_format="pandas")
    revenue = merge_partials(
        partials,
        "l_orderkey",
        lambda b: b.groupby("l_orderkey", as_index=False)["rev"].sum(),
        lambda b: b.astype({"l_orderkey": "int64", "rev": "int64"}),
        num_buckets,
    )

    joined = hash_join(
        revenue, open_orders, "l_orderkey", "o_orderkey",
        num_buckets=num_buckets,
    )

    def out_proj(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].astype("int64"),
                "revenue_cents": batch["rev"].astype("int64"),
                "o_orderdate_s": batch["o_orderdate"]
                .astype("datetime64[s]")
                .astype("int64"),
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    return (
        joined.map_batches(out_proj, batch_format="pandas")
        .sort(
            ["revenue_cents", "o_orderdate_s", "l_orderkey"],
            descending=[True, False, False],
        )
        .limit(k)
    )


def anomaly_days(events, bucket_s: int = 86400, trail: int = 7,
                 factor: int = 2, num_buckets: int = 16):
    """Integer-exact spike detection over the gap-filled daily series:
    a (type, day) is a spike when ``trail * n > factor * trailing_sum``
    (its count exceeds ``factor``x the trailing-``trail``-day mean,
    cross-multiplied so no division ever happens). Only days with a FULL
    trailing window are emitted.

    Scale shape: the dense series is time-bounded (dense_counts); the
    trailing sum is a per-type cumsum diff over contiguous gap-filled
    days — one tiny type-keyed pass."""
    dense = dense_counts(events, bucket_s)

    def per_type(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["event_type", "day"], kind="mergesort")
        frames = []
        for et, g in b.groupby("event_type", sort=True):
            n = g["n"].to_numpy()
            if len(n) <= trail:
                continue
            c = np.concatenate(([0], np.cumsum(n)))
            # trailing sum over days [i-trail, i-1] (full windows only)
            tsum = c[trail:-1] - c[:-trail - 1]
            day = g["day"].to_numpy()[trail:]
            nn = n[trail:]
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": et,
                        "day": day,
                        "n": nn,
                        "trail_sum": tsum,
                        "is_spike": (trail * nn > factor * tsum).astype(
                            "int64"
                        ),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "day": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "trail_sum": pd.Series([], dtype="int64"),
                    "is_spike": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    return bucketed_group_apply(dense, "event_type", per_type, num_buckets)


def mode_per_group(events, num_buckets: int = 32):
    """Per-user modal event type (the most frequent; ties broken by the
    lexicographically smallest type) — the categorical argmax every
    feature pipeline computes.

    Scale shape: per-batch (user, type) count partials (the combiner
    bounds the exchange at users x types x blocks rows), user-keyed
    merge, vectorized argmax in the user-complete finalize."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(
            ["user_id", "event_type"], as_index=False
        ).size().rename(columns={"size": "n"})

    partials = events.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["user_id", "event_type"], as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = b.groupby("user_id", as_index=False).first()
        out = out.rename(columns={"event_type": "mode_type"})
        out["user_id"] = out["user_id"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "mode_type", "n"]]

    return merge_partials(partials, "user_id", combine, finalize, num_buckets)


def forward_fill(events, bucket_s: int = 86400, num_buckets: int = 16):
    """Per-type daily last-observed value, gap-filled and carried forward
    (LOCF) — the densify-then-ffill step before any time-series model.
    The day's value is the LAST event's (by ts then event_id) value in
    integer milli-units; missing days repeat the previous observed day's.

    Scale shape: per-batch keep-max combiner (one row per (type, day,
    block)), type-keyed merge, vectorized arange + repeat fill in the
    type-complete finalize. Output is range-bounded."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["ts"].astype("datetime64[s]").astype("int64")
        b = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "day": s // bucket_s,
                "s": s,
                "event_id": batch["event_id"].astype("int64"),
                "v_milli": np.round(
                    batch["value"].to_numpy() * 1000
                ).astype("int64"),
            }
        )
        b = b.sort_values(["s", "event_id"], kind="mergesort")
        return b.groupby(["event_type", "day"], as_index=False).last()

    partials = events.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["s", "event_id"], kind="mergesort")
        return b.groupby(["event_type", "day"], as_index=False).last()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["event_type", "day"], kind="mergesort")
        frames = []
        for et, g in b.groupby("event_type", sort=True):
            lo, hi = int(g["day"].min()), int(g["day"].max())
            full = np.arange(lo, hi + 1, dtype=np.int64)
            # index of the last observed day at or before each day:
            # searchsorted over the observed days (LOCF)
            obs = g["day"].to_numpy()
            idx = np.searchsorted(obs, full, side="right") - 1
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": et,
                        "day": full,
                        "v_milli": g["v_milli"].to_numpy()[idx],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return merge_partials(partials, "event_type", combine, finalize,
                          num_buckets)


def share_bp(events):
    """Ratio-to-report: each event type's share of ALL events in integer
    basis points (floor(n * 10000 / total)) — the percent-of-total window
    aggregate, exact under integer floor division.

    Scale shape: per-batch count partials, lazy TREE merge (the type
    space is bounded, so the finalize sees the key-complete frame and the
    global total is computable without a second pass)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("event_type", as_index=False).size().rename(
            columns={"size": "n"}
        )

    partials = events.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("event_type", as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        total = int(b["n"].sum())
        out = b.sort_values("event_type").reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        out["share_bp"] = (out["n"] * 10000 // total).astype("int64")
        return out

    return merge_partials(partials, "event_type", combine, finalize,
                          plan="tree")


def attribution(events, target_type: str = "purchase",
                num_buckets: int = 32):
    """Last-touch attribution: for every ``target_type`` event, the type
    of the user's most recent STRICTLY-PRECEDING non-target event (order
    (ts, event_id)) — the conversion-attribution join every funnel
    pipeline runs. Target events with no preceding touch are excluded.

    Scale shape: narrow projection, ONE user-keyed exchange; inside the
    bucket the last-touch index is a masked ``np.maximum.accumulate``
    (segment-reset by comparing against each user's segment start), no
    per-row scan."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "user_id": batch["user_id"].astype("int64"),
                "event_type": batch["event_type"],
                "s": batch["ts"].astype("datetime64[s]").astype("int64"),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["user_id", "s", "event_id"], kind="mergesort")
        n = len(b)
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "attrib_type": pd.Series([], dtype="object"),
            }
        )
        if n == 0:
            return empty
        u = b["user_id"].to_numpy()
        et = b["event_type"].to_numpy()
        idx = np.arange(n, dtype=np.int64)
        # segment start index of each row's user run
        change = np.concatenate(([True], u[1:] != u[:-1]))
        seg_start = np.repeat(idx[change], np.diff(np.append(idx[change], n)))
        src_idx = np.where(et != target_type, idx, -1)
        acc = np.maximum.accumulate(src_idx)
        prev_acc = np.concatenate(([-1], acc[:-1]))
        is_target = et == target_type
        valid = is_target & (prev_acc >= seg_start)
        if not valid.any():
            return empty
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy()[valid],
                "user_id": u[valid],
                "s": b["s"].to_numpy()[valid],
                "attrib_type": et[prev_acc[valid]],
            }
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


def approx_quantile_hist(ds, col: str, qs_bp: list[int], width: float,
                         fanin: int = 16):
    """Histogram-sketch quantiles: bin-resolution quantile estimates from
    an equi-width histogram — the fixed-memory scale path next to
    textstats.exact_quantiles (error bounded by ``width``, one streaming
    pass, combiner state bounded by occupied bins). The q-th quantile is
    the smallest bin whose cumulative count reaches ``ceil(q * total)``
    (integer rank arithmetic, deterministic).

    Returns (q_bp, bin) — callers map bin -> value range via width."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(batch[col].to_numpy() / width).astype("int64")
        bins, n = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": bins, "n": n.astype("int64")})

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("bin", as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("bin").reset_index(drop=True)
        cum = b["n"].to_numpy().cumsum()
        total = int(cum[-1]) if len(cum) else 0
        rows = []
        for q in qs_bp:
            rank = (q * total + 9999) // 10000  # ceil
            i = int(np.searchsorted(cum, rank, side="left"))
            rows.append((int(q), int(b["bin"].iloc[min(i, len(b) - 1)])))
        return pd.DataFrame(rows, columns=["q_bp", "bin"]).astype(
            {"q_bp": "int64", "bin": "int64"}
        )

    return merge_partials(partials, "bin", combine, finalize, plan="tree",
                          fanin=fanin)


def rank_in_group(events, num_buckets: int = 32):
    """Per-user value ranking — SQL ``RANK()`` / ``DENSE_RANK()`` /
    ``PERCENT_RANK()`` over ``(PARTITION BY user_id ORDER BY v_milli
    DESC, event_id)`` with gap/dense tie semantics on the value alone
    (event_id only fixes row order). ``pr_bp`` = floor((rank-1) * 10000
    / (n-1)) with 0 for single-row groups (SQL PERCENT_RANK in basis
    points, exact under integer floor).

    Scale shape: narrow int64 projection, one user-keyed exchange
    (:func:`bucketed_group_apply`), vectorized segment-rebased tie-group
    arithmetic per bucket — no per-row Python."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "v_milli": np.round(batch["value"].to_numpy() * 1000).astype(
                    np.int64
                ),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.copy(deep=False)
        b["__negv"] = -b["v_milli"].to_numpy()
        b = b.sort_values(["user_id", "__negv", "event_id"], kind="mergesort")
        u = b["user_id"].to_numpy()
        v = b["v_milli"].to_numpy()
        n = len(b)
        idx = np.arange(n, dtype=np.int64)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": np.array([], np.int64),
                    "user_id": np.array([], np.int64),
                    "rank": np.array([], np.int64),
                    "dense_rank": np.array([], np.int64),
                    "pr_bp": np.array([], np.int64),
                }
            )
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        new_tie = new_user | np.concatenate(([True], v[1:] != v[:-1]))
        gstart = np.repeat(idx[new_user], np.diff(np.append(idx[new_user], n)))
        tstart = np.repeat(idx[new_tie], np.diff(np.append(idx[new_tie], n)))
        rank = tstart - gstart + 1  # tie group shares its first row's rank
        dense = np.cumsum(new_tie)  # global tie-group counter ...
        dense = dense - np.repeat(
            dense[new_user], np.diff(np.append(idx[new_user], n))
        ) + 1  # ... rebased to 1 at each user start
        gsize = np.repeat(
            np.diff(np.append(idx[new_user], n)), np.diff(np.append(idx[new_user], n))
        )
        pr = np.where(gsize > 1, (rank - 1) * 10000 // np.maximum(gsize - 1, 1), 0)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": u,
                "rank": rank.astype(np.int64),
                "dense_rank": dense.astype(np.int64),
                "pr_bp": pr.astype(np.int64),
            }
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


def skyline(orders, fanin: int = 16):
    """Distributed skyline (Pareto front): orders not dominated by any
    other order on (higher-or-equal price, earlier-or-equal date, strict
    somewhere) — the multi-criteria "best trade-offs" query. Rows:
    ``(o_orderkey, price_cents, d_days)``; exact-duplicate points are
    both kept (neither strictly dominates).

    Scale shape: the skyline of a union is the skyline of the per-part
    skylines, so the per-block combiner IS the operator — each block
    reduces to its own (typically tiny, ~log n for independent dims)
    front, then a lazy reduction tree re-applies it to one block. No
    all-pairs comparison anywhere: the per-block front is one sort
    (price desc, date asc) + a prefix-min dominance sweep."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        d = (
            batch["o_orderdate"]
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].astype("int64"),
                "price_cents": np.round(
                    batch["o_totalprice"].to_numpy() * 100
                ).astype(np.int64),
                "d_days": d,
            }
        )

    def front(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        b = b.copy(deep=False)
        b["__negp"] = -b["price_cents"].to_numpy()
        b = b.sort_values(["__negp", "d_days", "o_orderkey"], kind="mergesort")
        p = b["price_cents"].to_numpy()
        d = b["d_days"].to_numpy()
        newrun = np.concatenate(([True], p[1:] != p[:-1]))
        run_id = np.cumsum(newrun) - 1
        run_first_d = d[newrun]  # min date per equal-price run (d asc in run)
        # min date among STRICTLY higher-price points = prefix-min of the
        # preceding runs' minima
        prev = np.concatenate(
            ([np.iinfo(np.int64).max], np.minimum.accumulate(run_first_d)[:-1])
        )
        dominated = (prev[run_id] <= d) | (d > run_first_d[run_id])
        return b.loc[~dominated, ["o_orderkey", "price_cents", "d_days"]]

    partials = orders.map_batches(
        lambda b: front(prep(b)), batch_format="pandas"
    )
    return merge_partials(
        partials, "price_cents", front, front, plan="tree", fanin=fanin
    )


def snapshot_diff(old_docs, new_docs, num_buckets: int = 64):
    """CDC between two corpus snapshots keyed by ``doc_id``: one row per
    differing doc with ``status`` in {'added', 'removed', 'changed'}
    (docs whose text is identical in both snapshots are dropped) — the
    incremental-ingest primitive that turns a full recrawl into a delta.

    Scale shape: each side reduces to (doc_id, md5int15(text), side) in a
    narrow map first (60-bit digest: a 32-bit one silently classifies a
    changed doc as unchanged with ~2^-32 per-doc odds — real at billions
    of docs), so the doc_id-keyed exchange ships ~24 B/doc and
    text never crosses it; the full-outer merge + classification is a
    C-level ``pd.merge`` per key-complete bucket
    (:func:`~bio_re_with_entity_embeddings_ray.stages.common.bucketed_group_apply`
    — whose buckets stay schema-typed when empty, unlike Ray's native
    ``Dataset.join`` which fails on empty shuffle partitions for tiny or
    skewed inputs). Complements :func:`keep_latest` (which compacts a
    changelog; this derives one)."""
    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int15_array
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def dig(side):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "h": md5int15_array(batch["text"].tolist()),
                    "side": np.full(len(batch), side, dtype=np.int64),
                }
            )

        return fn

    both = old_docs.map_batches(dig(0), batch_format="pandas").union(
        new_docs.map_batches(dig(1), batch_format="pandas")
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        o = b.loc[b["side"] == 0, ["doc_id", "h"]]
        n = b.loc[b["side"] == 1, ["doc_id", "h"]]
        m = o.merge(n, on="doc_id", how="outer", suffixes=("_old", "_new"))
        ho, hn = m["h_old"], m["h_new"]
        status = np.where(
            ho.isna(), "added", np.where(hn.isna(), "removed", "changed")
        )
        keep = (ho.isna() | hn.isna() | (ho != hn)).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": m["doc_id"].astype("int64"),
                "status": pd.Series(status, dtype=object),
            }
        )[keep]

    return bucketed_group_apply(both, "doc_id", per_bucket, num_buckets)


def event_paths(events, k: int = 3, top: int = 20, num_buckets: int = 32):
    """Top user journeys: each user's first ``k`` event types (order
    (ts, event_id)) joined with '>' into a path, counted across users,
    global top-``top`` by (count desc, path) — the Sankey / entry-flow
    query of product analytics.

    Scale shape: narrow projection, one user-keyed exchange; each
    key-complete bucket emits (path, n) COUNT PARTIALS (bounded by
    |event_types|^k rows per bucket, not users), which tree-merge to the
    tiny global top-k. Path assembly is positional-pivot numpy string
    adds, not per-user Python joins."""
    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "ts": batch["ts"],
                "event_id": batch["event_id"].astype("int64"),
                "event_type": batch["event_type"],
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame(
                {"path": pd.Series([], dtype=object),
                 "n": np.array([], np.int64)}
            )
        b = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = b["user_id"].to_numpy()
        n = len(b)
        idx = np.arange(n, dtype=np.int64)
        new = np.concatenate(([True], u[1:] != u[:-1]))
        starts = idx[new]
        pos = idx - np.repeat(starts, np.diff(np.append(starts, n)))
        b = b[pos < k]
        pos = pos[pos < k]
        # positional pivot: one object-array string add per position
        et = b["event_type"].to_numpy()
        uu = b["user_id"].to_numpy()
        users, first_row = np.unique(uu, return_index=True)
        path = np.full(len(users), "", dtype=object)
        owner = np.searchsorted(users, uu)
        for j in range(k):
            sel = pos == j
            add = et[sel].astype(object)
            if j > 0:
                add = ">" + add
            path[owner[sel]] = path[owner[sel]] + add
        out = pd.DataFrame({"path": path})
        g = out.groupby("path", as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    partials = bucketed_group_apply(ev, "user_id", per_bucket, num_buckets)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("path", as_index=False)["n"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["__negn"] = -b["n"].to_numpy()
        b = b.sort_values(["__negn", "path"], kind="mergesort").head(top)
        return b[["path", "n"]].astype({"n": "int64"}).reset_index(drop=True)

    return merge_partials(partials, "path", combine, finalize, plan="tree")


def scd2_history(events, num_buckets: int = 32):
    """Slowly-changing-dimension TYPE-2 history from an event changelog:
    per user, order by (ts, event_id), collapse consecutive repeats of
    the same ``event_type`` (state), and emit one validity interval per
    state change — (user_id, state, valid_from, valid_to, is_current)
    with ``valid_to`` = the next change's ``valid_from`` (NULL on the
    open current row). The warehouse primitive that turns an append-only
    changelog into an as-of-queryable dimension (complements
    :func:`keep_latest`, which is the type-1 compaction, and
    :func:`snapshot_diff`, which derives the changelog).

    Scale shape: one user-keyed exchange of a narrow projection; per
    key-complete bucket the change points and interval ends are one
    mergesort + two shifted comparisons — no per-user Python."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_type": batch["event_type"],
                "ts": batch["ts"],
                "event_id": batch["event_id"].astype("int64"),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas", batch_size=None)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "user_id": np.array([], np.int64),
                    "state": pd.Series([], dtype=object),
                    "valid_from": pd.Series([], dtype="datetime64[us]"),
                    "valid_to": pd.Series([], dtype="datetime64[us]"),
                    "is_current": np.array([], np.int64),
                }
            )
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = b["user_id"].to_numpy()
        t = b["event_type"].to_numpy()
        n = len(b)
        change = np.ones(n, dtype=bool)
        change[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
        s = b[change]
        su = s["user_id"].to_numpy()
        ts = s["ts"].to_numpy()
        last = np.ones(len(s), dtype=bool)
        last[:-1] = su[:-1] != su[1:]
        vto = np.empty(len(s), dtype=ts.dtype)
        vto[:-1] = ts[1:]
        out = pd.DataFrame(
            {
                "user_id": su,
                "state": s["event_type"].to_numpy(),
                "valid_from": ts,
                "valid_to": pd.Series(vto).mask(last, pd.NaT),
                "is_current": last.astype(np.int64),
            }
        )
        return out

    return bucketed_group_apply(ev, "user_id", per_bucket, num_buckets)


def event_state_asof(events, num_buckets: int = 32):
    """As-of dimension join: every event annotated with the SCD2 state
    (see :func:`scd2_history`) valid at its timestamp — ``state`` is the
    most recent event_type CHANGE with ``valid_from <= ts`` (interval
    semantics: a zero-length interval from two same-ts changes never
    wins). Returns (event_id, user_id, ts, state).

    Scale shape: ONE user-keyed exchange; each key-complete bucket
    derives the change points (the scd2 kernel) and assigns states with
    a per-user-rebased ``searchsorted`` over the change timestamps — no
    second exchange and no interval table materialization."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_type": batch["event_type"],
                "ts": batch["ts"],
                "event_id": batch["event_id"].astype("int64"),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas", batch_size=None)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "event_id": np.array([], np.int64),
                    "user_id": np.array([], np.int64),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "state": pd.Series([], dtype=object),
                }
            )
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = b["user_id"].to_numpy()
        t = b["event_type"].to_numpy()
        n = len(b)
        # change flags are defined by (ts, event_id) order (scd2 kernel)
        change = np.ones(n, dtype=bool)
        change[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
        # interval semantics: EVERY event at ts T (change rows included)
        # sees the LAST change with valid_from <= T — same-ts double
        # changes collapse to the later one (the earlier is the
        # zero-length interval the SQL join also drops). So each row's
        # state is the change-index cummax evaluated at the LAST row of
        # its (user, ts) group.
        idx = np.arange(n, dtype=np.int64)
        cm = np.maximum.accumulate(np.where(change, idx, 0))
        tsv = b["ts"].to_numpy()
        grp_new = np.ones(n, dtype=bool)
        grp_new[1:] = (u[1:] != u[:-1]) | (tsv[1:] != tsv[:-1])
        starts = np.flatnonzero(grp_new)
        ends = np.append(starts[1:], n) - 1
        sizes = np.diff(np.append(starts, n))
        end_of_row = np.repeat(ends, sizes)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": u,
                "ts": tsv,
                "state": t[cm[end_of_row]],
            }
        )

    return bucketed_group_apply(ev, "user_id", per_bucket, num_buckets)


def tool_latency(transcripts, num_buckets: int = 32):
    """Per-tool response-latency stats over the transcript stream: for
    every tool turn, the latency to the NEXT turn in its conversation
    (the tool's execution+response gap); aggregated per tool as
    (tool, n_calls, total_ms, max_ms) — exact integers (mean is the
    caller's one division). Tool turns that end their conversation have
    no next turn and are excluded.

    Scale shape: one conv-keyed exchange of a narrow (conv_id, turn_idx,
    tool, ts) projection; per-bucket shifted diff; per-tool partials are
    tool-vocabulary bounded and tree-merge."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].astype("int64"),
                "tool": batch["tool"],
                "ts": batch["ts"],
            }
        )

    ts = transcripts.map_batches(prep, batch_format="pandas", batch_size=None)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "tool": pd.Series([], dtype=object),
                "n_calls": np.array([], np.int64),
                "total_ms": np.array([], np.int64),
                "max_ms": np.array([], np.int64),
            }
        )
        if not len(b):
            return empty
        b = b.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        c = b["conv_id"].to_numpy()
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        tool = b["tool"].to_numpy()
        n = len(b)
        has_next = np.zeros(n, dtype=bool)
        has_next[:-1] = c[:-1] == c[1:]
        is_call = pd.notna(b["tool"]).to_numpy() & has_next
        if not is_call.any():
            return empty
        # millisecond BOUNDARY count (SQL date_diff semantics; differs
        # from floor((b-a)/1000) on sub-millisecond components)
        lat_ms = np.empty(n, dtype=np.int64)
        lat_ms[:-1] = t[1:] // 1000 - t[:-1] // 1000
        g = pd.DataFrame(
            {"tool": tool[is_call], "ms": lat_ms[is_call]}
        ).groupby("tool", as_index=False).agg(
            n_calls=("ms", "size"), total_ms=("ms", "sum"), max_ms=("ms", "max")
        )
        for col in ("n_calls", "total_ms", "max_ms"):
            g[col] = g[col].astype("int64")
        return g

    partials = bucketed_group_apply(ts, "conv_id", per_bucket, num_buckets)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("tool", as_index=False).agg(
            n_calls=("n_calls", "sum"),
            total_ms=("total_ms", "sum"),
            max_ms=("max_ms", "max"),
        )

    return merge_partials(
        partials, "tool", combine, lambda b: b, num_buckets, plan="tree"
    )


def time_to_first(events, target_type: str = "purchase", num_buckets: int = 32):
    """Conversion latency: per user, milliseconds from their FIRST event
    (any type) to their first ``target_type`` event — (user_id, ms);
    users who never convert are excluded (the SQL inner-join semantics).

    Scale shape: one user-keyed exchange of a narrow projection;
    per-bucket vectorized first/first-target via one mergesort + segment
    boundaries."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_type": batch["event_type"],
                "ts": batch["ts"],
                "event_id": batch["event_id"].astype("int64"),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas", batch_size=None)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": np.array([], np.int64), "ms": np.array([], np.int64)}
        )
        if not len(b):
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = b["user_id"].to_numpy()
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(b)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        first_ts = t[np.flatnonzero(new)]  # per segment
        seg = np.cumsum(new) - 1
        is_t = (b["event_type"] == target_type).to_numpy()
        if not is_t.any():
            return empty
        # first target row per segment: stable order => first hit wins
        ti = np.flatnonzero(is_t)
        keep = np.ones(len(ti), dtype=bool)
        keep[1:] = seg[ti[1:]] != seg[ti[:-1]]
        hit = ti[keep]
        # millisecond BOUNDARY count (SQL date_diff semantics:
        # floor(b/1000) - floor(a/1000), not floor((b-a)/1000) — they
        # differ when timestamps carry sub-millisecond components)
        return pd.DataFrame(
            {
                "user_id": u[hit],
                "ms": t[hit] // 1000 - first_ts[seg[hit]] // 1000,
            }
        )

    return bucketed_group_apply(ev, "user_id", per_bucket, num_buckets)


def late_orders_by_priority(orders, lineitem, num_buckets: int = 32):
    """TPC-H Q4 shape adapted to this schema: per ``o_orderpriority``,
    the number of orders with at least one lineitem shipped AFTER the
    order date (the late-shipment audit). Returns (o_orderpriority,
    n_late_orders).

    Scale shape: both sides project to (orderkey, date[, priority]) and
    co-partition by orderkey hash (tagged union — the EXISTS probe needs
    the order's own date, so it is a join, not a semi-join); per-bucket
    vectorized any-late per order; priority-bounded count partials tree
    merge."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype("int64"),
                "dt": b["o_orderdate"],
                "pri": b["o_orderpriority"],
                "side": np.int64(0),
            }
        )

    def tag_lines(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype("int64"),
                "dt": b["l_shipdate"],
                "pri": "",
                "side": np.int64(1),
            }
        )

    u = orders.map_batches(tag_orders, batch_format="pandas", batch_size=None).union(
        lineitem.map_batches(tag_lines, batch_format="pandas", batch_size=None)
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        o = b[b["side"] == 0]
        l = b[b["side"] == 1]
        m = o.merge(l, on="orderkey", suffixes=("_o", "_l"))
        late = m[m["dt_l"] > m["dt_o"]].drop_duplicates("orderkey")
        g = late.groupby("pri_o", as_index=False).agg(
            n_late_orders=("orderkey", "size")
        )
        g = g.rename(columns={"pri_o": "o_orderpriority"})
        g["n_late_orders"] = g["n_late_orders"].astype("int64")
        return g

    partials = bucketed_group_apply(u, "orderkey", per_bucket, num_buckets)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_orderpriority", as_index=False)["n_late_orders"].sum()

    return merge_partials(
        partials, "o_orderpriority", combine, lambda b: b, num_buckets,
        plan="tree",
    )


def priority_line_counts(orders, lineitem, num_buckets: int = 32):
    """TPC-H Q12 shape adapted to this schema: per ``l_returnflag``, how
    many lineitems belong to HIGH-priority orders (1-URGENT / 2-HIGH)
    vs lower — (l_returnflag, high_line_count, low_line_count).

    Scale shape: the order->priority side reduces to (orderkey,
    is_high int) and co-partitions with the lineitem projection by
    orderkey; per-bucket C-level join + bincount; flag-bounded tree
    merge."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        hi = b["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        return pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype("int64"),
                "flag": "",
                "hi": hi.to_numpy().astype(np.int64),
                "side": np.int64(0),
            }
        )

    def tag_lines(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype("int64"),
                "flag": b["l_returnflag"],
                "hi": np.int64(0),
                "side": np.int64(1),
            }
        )

    u = orders.map_batches(tag_orders, batch_format="pandas", batch_size=None).union(
        lineitem.map_batches(tag_lines, batch_format="pandas", batch_size=None)
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        o = b.loc[b["side"] == 0, ["orderkey", "hi"]]
        l = b.loc[b["side"] == 1, ["orderkey", "flag"]]
        m = l.merge(o, on="orderkey")
        g = m.groupby("flag", as_index=False).agg(
            high_line_count=("hi", "sum"),
            n=("hi", "size"),
        )
        g["low_line_count"] = (g["n"] - g["high_line_count"]).astype("int64")
        g["high_line_count"] = g["high_line_count"].astype("int64")
        return g.rename(columns={"flag": "l_returnflag"})[
            ["l_returnflag", "high_line_count", "low_line_count"]
        ]

    partials = bucketed_group_apply(u, "orderkey", per_bucket, num_buckets)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_returnflag", as_index=False).agg(
            high_line_count=("high_line_count", "sum"),
            low_line_count=("low_line_count", "sum"),
        )

    return merge_partials(
        partials, "l_returnflag", combine, lambda b: b, num_buckets,
        plan="tree",
    )


def promo_revenue_share(lineitem, part, num_buckets: int = 32):
    """TPC-H Q14 shape adapted to this schema: revenue share of PROMO
    parts in basis points — one row
    (promo_cents, total_cents, promo_bp) with per-row
    ``floor(l_extendedprice * (1 - l_discount) * 100)`` cents (the
    rel_q3 discipline) summed exactly.

    Scale shape: the promo partkey set is dimension-bounded and
    broadcasts once (``ray.put`` Arrow array + ``pc.is_in``); ONE narrow
    lineitem pass emits two int64 partial sums per block; tree merge."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    promo = part.map_batches(
        lambda b: b.loc[b["p_type"] == "PROMO", ["p_partkey"]],
        batch_format="pandas", batch_size=None,
    ).to_pandas()
    ref = ray.put(pa.array(promo["p_partkey"].astype("int64").to_numpy()))

    def partial(batch: pd.DataFrame, _r=ref) -> pd.DataFrame:
        keys = ray.get(_r)
        cents = np.floor(
            batch["l_extendedprice"].to_numpy()
            * (1 - batch["l_discount"].to_numpy()) * 100
        ).astype(np.int64)
        is_promo = pc.is_in(
            pa.array(batch["l_partkey"].astype("int64").to_numpy()),
            value_set=keys,
        ).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "k": np.zeros(1, dtype=np.int64),
                "promo_cents": [cents[is_promo].sum()],
                "total_cents": [cents.sum()],
            }
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("k", as_index=False).sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = combine(b)
        b["promo_bp"] = (
            10000 * b["promo_cents"] // b["total_cents"].clip(lower=1)
        ).astype("int64")
        return b.drop(columns=["k"])

    return merge_partials(
        lineitem.map_batches(partial, batch_format="pandas"),
        "k", combine, finalize, num_buckets, plan="tree",
    )


def role_token_stats(transcripts, num_buckets: int = 16):
    """Per-role turn/token aggregates over the transcript stream:
    (role, n_turns, total_tokens, max_tokens) — the corpus observability
    numbers a training-data pipeline reports per ingest. Pure narrow
    pass (whitespace token counts via the Arrow list-length kernel),
    role-bounded tree merge."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(batch["text"], " ")
        ).cast(pa.int64())
        t = pa.table({"role": batch["role"], "n_tok": n_tok})
        g = t.group_by("role").aggregate(
            [("n_tok", "count"), ("n_tok", "sum"), ("n_tok", "max")]
        )
        # Rename by the aggregate's actual output names, not position:
        # the key column's position in group_by().aggregate() output has
        # moved across pyarrow major versions.
        out_names = {"n_tok_count": "n_turns", "n_tok_sum": "total_tokens",
                     "n_tok_max": "max_tokens"}
        g = g.rename_columns([out_names.get(c, c) for c in g.column_names])
        return g.select(["role", "n_turns", "total_tokens", "max_tokens"])

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("role", as_index=False).agg(
            n_turns=("n_turns", "sum"),
            total_tokens=("total_tokens", "sum"),
            max_tokens=("max_tokens", "max"),
        )

    return merge_partials(
        transcripts.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "role", combine, lambda b: b, num_buckets, plan="tree",
    )


def cube_counts(docs, num_buckets: int = 16):
    """Grouping-sets aggregate (SQL ``GROUP BY CUBE(lang, source)``):
    document count + exact char sum at FOUR granularities — (lang,
    source), (lang), (source), and the grand total — with ``'*'`` as
    the rolled-up sentinel (the synthetic values never contain it).
    The CUBE sibling of :func:`rollup_counts`, which omits the
    source-only level.

    Scale shape identical: ONE finest-grain combiner pass over the
    corpus; all three coarser levels derive from the finest AGGREGATE
    (bounded at |lang| x |source| rows), never a second corpus pass."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "n_chars": batch["n_chars"].astype("int64"),
            }
        ).groupby(["lang", "source"], as_index=False).agg(
            n=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["lang", "source"], as_index=False).agg(
            n=("n", "sum"), sum_chars=("sum_chars", "sum")
        )

    def finalize(fine: pd.DataFrame) -> pd.DataFrame:
        by_lang = fine.groupby("lang", as_index=False).agg(
            n=("n", "sum"), sum_chars=("sum_chars", "sum")
        )
        by_lang["source"] = "*"
        by_src = fine.groupby("source", as_index=False).agg(
            n=("n", "sum"), sum_chars=("sum_chars", "sum")
        )
        by_src["lang"] = "*"
        total = pd.DataFrame(
            {
                "lang": ["*"],
                "source": ["*"],
                "n": [fine["n"].sum()],
                "sum_chars": [fine["sum_chars"].sum()],
            }
        )
        cols = ["lang", "source", "n", "sum_chars"]
        out = pd.concat(
            [fine[cols], by_lang[cols], by_src[cols], total[cols]],
            ignore_index=True,
        )
        out["n"] = out["n"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return out.sort_values(["lang", "source"]).reset_index(drop=True)

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    return merge_partials(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], combine, finalize, num_buckets, plan="tree",
    )


def ntile_buckets(events, n: int = 4, num_buckets: int = 32):
    """Per-user value quantile bucketing — SQL ``NTILE(n) OVER
    (PARTITION BY user_id ORDER BY v_milli DESC, event_id)`` —
    (event_id, user_id, bucket). The standard "split each group into n
    equal tiles" primitive (score quartiles per user, per-source
    quality deciles for curation thresholds).

    NTILE semantics exactly: with group size g, the first ``g % n``
    tiles hold ``g // n + 1`` rows, the rest ``g // n`` (ties follow
    row order, unlike RANK). Scale shape: narrow int64 projection, one
    user-keyed exchange, vectorized segment arithmetic per bucket."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "v_milli": np.round(batch["value"].to_numpy() * 1000).astype(
                    np.int64
                ),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    "event_id": np.array([], np.int64),
                    "user_id": np.array([], np.int64),
                    "bucket": np.array([], np.int64),
                }
            )
        b = bucket.copy(deep=False)
        b["__negv"] = -b["v_milli"].to_numpy()
        b = b.sort_values(["user_id", "__negv", "event_id"], kind="mergesort")
        u = b["user_id"].to_numpy()
        m = len(b)
        idx = np.arange(m, dtype=np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gsize = np.diff(np.append(idx[new_user], m))
        g = np.repeat(gsize, gsize)  # group size per row
        i = idx - np.repeat(idx[new_user], gsize)  # 0-based pos in group
        q, r = g // n, g % n
        cut = r * (q + 1)  # rows below cut sit in the big tiles
        tile = np.where(
            i < cut, i // np.maximum(q + 1, 1), r + (i - cut) // np.maximum(q, 1)
        ) + 1
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": u,
                "bucket": tile.astype(np.int64),
            }
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


def ema_smoothed(transcripts, num_buckets: int = 16, scale: int = 10**6):
    """Per-conversation exponential moving average of turn token counts
    (alpha = 1/4), integer fixed-point so the recursive-CTE oracle
    agrees bit-for-bit: ``ema_1 = x_1 * scale``;
    ``ema_i = (3 * ema_{i-1} + x_i * scale) // 4``. Returns
    (conv_id, turn_idx, n_tok, ema_mu) — the smoothed verbosity signal
    (drift detection, "is this conversation getting longer-winded").

    The recurrence is inherently sequential per conversation, but never
    per-row Python: each bucket lays its conversations out in
    (conv, turn) order and runs ONE vectorized numpy update per turn
    POSITION (`ema[rows at depth p] from rows at depth p-1`), so the
    loop count is the maximum conversation length (bounded, ~tens),
    not the row count. One conv-keyed exchange of (conv, turn, n_tok)
    int64 triples; conversations never split across buckets."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def prep(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(batch["text"], " ")
        ).cast(pa.int64())
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
                "n_tok": n_tok,
            }
        )

    ts = transcripts.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=bucket["conv_id"].dtype),
                    "turn_idx": np.array([], np.int64),
                    "n_tok": np.array([], np.int64),
                    "ema_mu": np.array([], np.int64),
                }
            )
        b = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        c = b["conv_id"].to_numpy()
        x = b["n_tok"].to_numpy().astype(np.int64) * scale
        m = len(b)
        idx = np.arange(m, dtype=np.int64)
        new_conv = np.concatenate(([True], c[1:] != c[:-1]))
        gsize = np.diff(np.append(idx[new_conv], m))
        depth = idx - np.repeat(idx[new_conv], gsize)  # 0-based turn pos
        ema = x.copy()
        for p in range(1, int(depth.max()) + 1 if m else 0):
            sel = idx[depth == p]
            ema[sel] = (3 * ema[sel - 1] + x[sel]) // 4
        return pd.DataFrame(
            {
                "conv_id": c,
                "turn_idx": b["turn_idx"].to_numpy(),
                "n_tok": b["n_tok"].to_numpy(),
                "ema_mu": ema,
            }
        )

    return bucketed_group_apply(ts, "conv_id", per_conv, num_buckets)


def large_volume_orders(
    orders, lineitem, customer, min_qty_centi: int = 20000, num_buckets: int = 32
):
    """TPC-H Q18 shape adapted to this schema ("large volume customer"):
    orders whose total lineitem quantity exceeds the threshold, joined
    back to the customer dimension — (c_name, o_custkey, o_orderkey,
    d_days, price_cents, sum_qty_centi). Quantities/prices carried as
    exact integer centi-units; order date as days since epoch.

    Scale shape: lineitem collapses to (orderkey, qty) per-block
    partials FIRST (combiner — the fact table never crosses the wire
    at row grain), merges on an orderkey-keyed exchange, and the
    HAVING filter runs at merge so only qualifying orders survive.
    That surviving set is selectivity-bounded (the threshold's whole
    point), so it broadcasts into one orders pass; the customer
    dimension broadcasts the same way (classic small-side pattern —
    measured crossover to hash joins lives in ``relational._key_semi_anti``
    for when a dimension outgrows the object store)."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype("int64"),
                "qc": np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64),
            }
        ).groupby("orderkey", as_index=False)["qc"].sum()

    def qty_combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("orderkey", as_index=False)["qc"].sum()

    def qty_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = qty_combine(b)
        return b[b["qc"] > min_qty_centi]

    big = merge_partials(
        lineitem.map_batches(qty_partial, batch_format="pandas"),
        "orderkey", qty_combine, qty_filter, num_buckets,
    ).to_pandas()
    qty_ref = ray.put(dict(zip(big["orderkey"], big["qc"])))
    names = customer.map_batches(
        lambda b: b[["c_custkey", "c_name"]], batch_format="pandas"
    ).to_pandas()
    name_ref = ray.put(dict(zip(names["c_custkey"], names["c_name"])))

    class PickOrders:
        def __init__(self, qty_ref, name_ref):
            self.qty = ray.get(qty_ref)
            self.names = ray.get(name_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ok = b["o_orderkey"].astype("int64")
            qc = ok.map(self.qty)
            keep = qc.notna().to_numpy()
            b, qc = b[keep], qc[keep]
            epoch = np.datetime64("1970-01-01")
            d_days = (
                (b["o_orderdate"].to_numpy().astype("datetime64[D]") - epoch)
                .astype(np.int64)
            )
            return pd.DataFrame(
                {
                    "c_name": b["o_custkey"].map(self.names),
                    "o_custkey": b["o_custkey"].astype("int64"),
                    "o_orderkey": b["o_orderkey"].astype("int64"),
                    "d_days": d_days,
                    "price_cents": np.round(
                        b["o_totalprice"].to_numpy() * 100
                    ).astype(np.int64),
                    "sum_qty_centi": qc.to_numpy().astype(np.int64),
                }
            )

    return orders.map_batches(
        PickOrders,
        fn_constructor_args=(qty_ref, name_ref),
        batch_format="pandas",
        concurrency=(1, 4),
    )


def late_arrivals(events, num_buckets: int = 32, salt: str = "arr"):
    """Out-of-order (late) event accounting — the streaming watermark
    primitive: an event is LATE when its timestamp is strictly older
    than the running max timestamp of earlier-ARRIVING events of the
    same user. Returns one row per late event: (event_id, user_id,
    lag_ms) with the millisecond-BOUNDARY lag behind the watermark
    (floor(wm/1000) - floor(ts/1000), the funnel_counts date_diff
    discipline).

    The fixture carries no separate ingestion sequence (its ts is
    monotone in event_id per user, so "arrival = event_id" is vacuously
    in-order); arrival order is therefore SIMULATED deterministically
    as ``(md5int8(salt:event_id), event_id)`` — the
    ``deterministic_shuffle`` discipline, a reproducible stand-in for
    network reordering. A real deployment passes its ingestion-sequence
    column instead.

    Why it matters at scale: ingestion pipelines size their
    allowed-lateness windows from exactly this distribution; computing
    it is one user-keyed exchange of narrow int64 rows and a segmented
    running max per bucket (C-level grouped cummax/shift, no per-row
    Python)."""
    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        eid = batch["event_id"].astype("int64")
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": eid,
                "h": md5int8_array([f"{salt}:{e}" for e in eid]),
                "ts_us": batch["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    "event_id": np.array([], np.int64),
                    "user_id": np.array([], np.int64),
                    "lag_ms": np.array([], np.int64),
                }
            )
        b = bucket.sort_values(["user_id", "h", "event_id"], kind="mergesort")
        g = b.groupby("user_id", sort=False)["ts_us"]
        wm = g.cummax().groupby(b["user_id"], sort=False).shift(1)
        ts = b["ts_us"].to_numpy()
        late = wm.notna().to_numpy() & (wm.to_numpy() > ts)
        wmv = wm.to_numpy()[late].astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy()[late],
                "user_id": b["user_id"].to_numpy()[late],
                "lag_ms": wmv // 1000 - ts[late] // 1000,
            }
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


def conv_role_balance(transcripts, num_buckets: int = 16):
    """Per-conversation role token balance: (conv_id, n_tok, user_bp,
    assistant_bp, tool_bp) — each role's share of the conversation's
    tokens in integer basis points. The conversation-health signal SFT
    curation filters on (all-assistant monologues, user-only fragments,
    tool-spam) before packing examples.

    Scale shape: per-block (conv, role) token-sum partials FIRST, then
    one conv-keyed exchange; the per-bucket pivot is a vectorized
    unstack over at most 3 role columns. No text crosses the wire."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def prep(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(batch["text"], " ")
        ).cast(pa.int64())
        t = pa.table(
            {"conv_id": batch["conv_id"], "role": batch["role"], "n_tok": n_tok}
        )
        g = t.group_by(["conv_id", "role"]).aggregate([("n_tok", "sum")])
        names = {"n_tok_sum": "n_tok"}
        return g.rename_columns([names.get(c, c) for c in g.column_names])

    partials = transcripts.map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["conv_id", "role"], as_index=False)["n_tok"].sum()
        p = g.pivot_table(
            index="conv_id", columns="role", values="n_tok",
            aggfunc="sum", fill_value=0,
        )
        for r in ("user", "assistant", "tool"):
            if r not in p.columns:
                p[r] = 0
        total = (
            p[["user", "assistant", "tool"]].sum(axis=1).astype("int64")
        )
        nz = np.maximum(total.to_numpy(), 1)
        return pd.DataFrame(
            {
                "conv_id": p.index.to_numpy(),
                "n_tok": total.to_numpy(),
                "user_bp": 10000 * p["user"].to_numpy().astype(np.int64) // nz,
                "assistant_bp": 10000
                * p["assistant"].to_numpy().astype(np.int64) // nz,
                "tool_bp": 10000 * p["tool"].to_numpy().astype(np.int64) // nz,
            }
        )

    return bucketed_group_apply(partials, "conv_id", per_conv, num_buckets)


def orders_by_month(orders, num_buckets: int = 16):
    """Calendar-month rollup of the orders fact table:
    (ym, n_orders, revenue_cents) with ``ym = year * 100 + month`` —
    the time-bucketed reporting aggregate (calendar buckets, unlike the
    fixed-width tumbling/hopping ms windows elsewhere).

    Scale shape: month extraction is vectorized datetime64[M] integer
    arithmetic; per-block (ym, count, cents) partials tree-merge — the
    month vocabulary is bounded by the date span, so this is the
    cheapest possible exchange."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            b["o_orderdate"].to_numpy().astype("datetime64[M]").astype(np.int64)
        )  # months since 1970-01
        ym = (1970 + m // 12) * 100 + (m % 12 + 1)
        cents = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return (
            pd.DataFrame({"ym": ym, "n_orders": np.int64(1), "revenue_cents": cents})
            .groupby("ym", as_index=False)
            .agg(n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("ym", as_index=False).agg(
            n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum")
        )

    return merge_partials(
        orders.map_batches(partial, batch_format="pandas"),
        "ym", combine, lambda b: b, num_buckets, plan="tree",
    )


def user_ltv_quantiles(events, qs_bp=(2500, 5000, 7500, 9500),
                       num_buckets: int = 16):
    """Exact quantiles of per-user lifetime value (sum of value in
    integer milli-units): (q_bp, value). Two-level aggregate — the
    classic "distribution of per-entity totals" question — built by
    composing the user-keyed sum with :func:`textstats.exact_quantiles`'
    distinct-value-count scan (no global sort; both exchanges narrow
    int64)."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials
    from bio_re_with_entity_embeddings_ray.stages.textstats import exact_quantiles

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "v": np.round(b["value"].to_numpy() * 1000).astype(np.int64),
            }
        ).groupby("user_id", as_index=False)["v"].sum()

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", as_index=False)["v"].sum()

    sums = merge_partials(
        events.map_batches(partial, batch_format="pandas"),
        "user_id", combine, lambda b: b, num_buckets,
    )
    return exact_quantiles(sums, "v", list(qs_bp), num_buckets)


def conv_entity_density(transcripts, mentions, num_buckets: int = 16):
    """Mentions-per-token density per conversation: (conv_id, n_tok,
    n_mentions, density_bp) with ``density_bp = 10000 * mentions //
    tokens`` — the KG-coverage signal (is the extractor finding
    anything in this conversation, is a conversation all boilerplate).
    Conversations with zero mentions are INCLUDED at density 0.

    Scale shape: both sides collapse to per-block per-conv int64 counts
    before ONE shared conv-keyed exchange (tagged union, the Q4
    pattern); the per-bucket combine is a fill-zero merge."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def tok_partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(batch["text"], " ")
        ).cast(pa.int64())
        t = pa.table({"conv_id": batch["conv_id"], "c": n_tok})
        g = t.group_by("conv_id").aggregate([("c", "sum")])
        g = g.rename_columns(
            ["c" if c == "c_sum" else c for c in g.column_names]
        )
        return g.append_column("side", pa.array([0] * len(g), pa.int64()))

    def men_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("conv_id", as_index=False).agg(c=("entity_id", "size"))
        g["c"] = g["c"].astype("int64")
        g["side"] = np.int64(1)
        return g

    u = transcripts.map_batches(
        tok_partial, batch_format="pyarrow", batch_size=None
    ).union(mentions.map_batches(men_partial, batch_format="pandas"))

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["conv_id", "side"], as_index=False)["c"].sum()
        tok = g[g["side"] == 0].set_index("conv_id")["c"]
        men = g[g["side"] == 1].set_index("conv_id")["c"]
        men = men.reindex(tok.index, fill_value=0)
        nz = np.maximum(tok.to_numpy(), 1)
        return pd.DataFrame(
            {
                "conv_id": tok.index.to_numpy(),
                "n_tok": tok.to_numpy().astype(np.int64),
                "n_mentions": men.to_numpy().astype(np.int64),
                "density_bp": 10000 * men.to_numpy().astype(np.int64) // nz,
            }
        )

    return bucketed_group_apply(u, "conv_id", per_conv, num_buckets)


def regional_revenue(lineitem, orders, customer, supplier, nation, region,
                     region_name: str = "ASIA", num_buckets: int = 32):
    """TPC-H Q5 shape adapted to this schema: revenue per nation from
    lineitems where the ordering CUSTOMER and the SUPPLIER sit in the
    same nation of the chosen region — (n_name, revenue_units) with the
    exact integer ``price_cents * (10000 - discount_bp)`` revenue
    (envelope: cents < 2^40 and the sum over one nation must stay below
    2^63 — ~9e18, i.e. ~90 B lineitems per nation at average prices;
    past that, split the aggregate into (cents, discount) partial sums).

    Scale shape: the snowflake dimension chain region → nation →
    {customer, supplier} collapses DRIVER-side to two small key→nation
    maps (region/nation are constant-size; customer/supplier are
    dimension-scale — broadcast here, with the measured hash-join
    crossover of relational._key_semi_anti as the documented fallback
    when a dimension outgrows the object store). The two FACT tables
    never meet in a global join: orders project to (orderkey,
    cust_nation) and lineitems to (orderkey, supp_nation, rev) behind
    broadcast filters, then ONE orderkey-keyed co-partitioned exchange
    (tagged union) joins them per bucket; nation-bounded revenue
    partials tree-merge."""
    import ray

    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    reg = region.to_pandas()
    nat = nation.to_pandas()
    rk = set(
        reg.loc[reg["r_name"] == region_name, "r_regionkey"].astype(int)
    )
    nat = nat[nat["n_regionkey"].astype(int).isin(rk)]
    nkeys = set(nat["n_nationkey"].astype(int))
    names = dict(
        zip(nat["n_nationkey"].astype(int), nat["n_name"])
    )

    cust = customer.map_batches(
        lambda b: b[["c_custkey", "c_nationkey"]], batch_format="pandas"
    ).to_pandas()
    cmap = {
        int(k): int(v)
        for k, v in zip(cust["c_custkey"], cust["c_nationkey"])
        if int(v) in nkeys
    }
    supp = supplier.map_batches(
        lambda b: b[["s_suppkey", "s_nationkey"]], batch_format="pandas"
    ).to_pandas()
    smap = {
        int(k): int(v)
        for k, v in zip(supp["s_suppkey"], supp["s_nationkey"])
        if int(v) in nkeys
    }
    cref, sref = ray.put(cmap), ray.put(smap)

    class TagOrders:
        def __init__(self, cref):
            self.cmap = ray.get(cref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            nk = b["o_custkey"].map(self.cmap)
            keep = nk.notna().to_numpy()
            return pd.DataFrame(
                {
                    "orderkey": b["o_orderkey"].to_numpy()[keep].astype(np.int64),
                    "nk": nk.to_numpy()[keep].astype(np.int64),
                    "rev": np.zeros(int(keep.sum()), dtype=np.int64),
                    "side": np.int64(0),
                }
            )

    class TagLines:
        def __init__(self, sref):
            self.smap = ray.get(sref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            nk = b["l_suppkey"].map(self.smap)
            keep = nk.notna().to_numpy()
            cents = np.round(
                b["l_extendedprice"].to_numpy()[keep] * 100
            ).astype(np.int64)
            disc = np.round(
                b["l_discount"].to_numpy()[keep] * 10000
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "orderkey": b["l_orderkey"].to_numpy()[keep].astype(np.int64),
                    "nk": nk.to_numpy()[keep].astype(np.int64),
                    "rev": cents * (10000 - disc),
                    "side": np.int64(1),
                }
            )

    u = orders.map_batches(
        TagOrders, fn_constructor_args=(cref,), batch_format="pandas",
        concurrency=(1, 4),
    ).union(
        lineitem.map_batches(
            TagLines, fn_constructor_args=(sref,), batch_format="pandas",
            concurrency=(1, 4),
        )
    )

    def per_order(b: pd.DataFrame) -> pd.DataFrame:
        o = b[b["side"] == 0][["orderkey", "nk"]]
        l = b[b["side"] == 1][["orderkey", "nk", "rev"]]
        m = o.merge(l, on="orderkey", suffixes=("_c", "_s"))
        m = m[m["nk_c"] == m["nk_s"]]
        g = m.groupby("nk_c", as_index=False)["rev"].sum()
        return g.rename(columns={"nk_c": "nk"})

    partials = bucketed_group_apply(u, "orderkey", per_order, num_buckets)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("nk", as_index=False)["rev"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = combine(b)
        out = pd.DataFrame(
            {
                "n_name": b["nk"].map(names),
                "revenue_units": b["rev"].astype("int64"),
            }
        )
        return out.sort_values("n_name").reset_index(drop=True)

    return merge_partials(
        partials, "nk", combine, finalize, num_buckets, plan="tree",
    )


def churn_users(events, idle_days: int = 7, num_buckets: int = 16):
    """Churn cohort: users whose LAST event is at least ``idle_days``
    day-boundaries older than the corpus's most recent event —
    (user_id, last_day, idle_days) with day = floor(epoch_us / 86.4e9).
    The standard retention counterpart of cohort_retention (who is
    still here) — this is who LEFT.

    Scale shape: one user-keyed max-merge (combiner-first, int64 pairs
    only), one driver scalar for the global max (reduced from the same
    partials, not a second corpus pass), one bounded filter at
    finalize."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    DAY_US = 86_400_000_000

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame(
                {"user_id": b["user_id"].astype("int64"), "ts_us": t}
            )
            .groupby("user_id", as_index=False)["ts_us"]
            .max()
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", as_index=False)["ts_us"].max()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = combine(b)
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "last_day": pd.Series([], dtype="int64"),
                    "idle_days": pd.Series([], dtype="int64"),
                }
            )
        day = b["ts_us"].to_numpy() // DAY_US
        gmax = int(day.max())
        idle = gmax - day
        keep = idle >= idle_days
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy()[keep],
                "last_day": day[keep],
                "idle_days": idle[keep],
            }
        )

    return merge_partials(
        events.map_batches(partial, batch_format="pandas"),
        "user_id", combine, finalize, num_buckets,
    )


def token_bucket(events, capacity_mu: int = 3_000_000, cost_mu: int = 1_000_000,
                 refill_div_us: int = 36_000, num_buckets: int = 32):
    """Token-bucket admission control — the real rate limiter (burst
    capacity + steady refill), complementing the fixed-window
    :func:`throttle_events`: per user, a bucket starts FULL
    (``capacity_mu`` micro-tokens), refills ``(dt_us // refill_div_us)``
    micro-tokens between consecutive events (integer floor — with the
    36000 default that is 1 token per 10 hours at cost 1 token/event,
    tuned so the fixture's ~65-minute inter-event gaps exercise BOTH
    admission branches: ~15% of sf0.01 events get rejected), and an
    event is admitted iff the refilled level covers ``cost_mu``.
    Returns (event_id, user_id, admitted) with admitted in {0, 1}.

    The recurrence is sequential per user (admission mutates the
    level), but never per-row Python: events are laid out in
    (user, ts, event_id) order and ONE vectorized numpy step per event
    DEPTH updates every user's bucket at that position — loop count =
    max events per user (99 at sf0.1), not the row count. The
    recursive-CTE oracle replays the identical integer floors."""
    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "t": batch["ts"].to_numpy().astype("datetime64[us]")
                .astype(np.int64),
            }
        )

    ev = events.map_batches(prep, batch_format="pandas")

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {
                    "event_id": np.array([], np.int64),
                    "user_id": np.array([], np.int64),
                    "admitted": np.array([], np.int64),
                }
            )
        b = bucket.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = b["user_id"].to_numpy()
        t = b["t"].to_numpy()
        m = len(b)
        idx = np.arange(m, dtype=np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gsize = np.diff(np.append(idx[new_user], m))
        depth = idx - np.repeat(idx[new_user], gsize)
        rem = np.zeros(m, dtype=np.int64)       # level AFTER this event
        adm = np.zeros(m, dtype=np.int64)
        first = depth == 0
        adm[first] = 1 if capacity_mu >= cost_mu else 0
        rem[first] = capacity_mu - (cost_mu if capacity_mu >= cost_mu else 0)
        for p in range(1, int(depth.max()) + 1):
            sel = idx[depth == p]
            avail = np.minimum(
                capacity_mu,
                rem[sel - 1] + (t[sel] - t[sel - 1]) // refill_div_us,
            )
            ok = avail >= cost_mu
            adm[sel] = ok.astype(np.int64)
            rem[sel] = avail - np.where(ok, cost_mu, 0)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": u,
                "admitted": adm,
            }
        )

    return bucketed_group_apply(ev, "user_id", per_user, num_buckets)


def dedup_stats_by_source(docs, num_buckets: int = 16):
    """Per-source duplication report: (source, n_docs, n_distinct,
    dup_rate_bp) — the curation dashboard row that tells you WHICH feed
    is sending duplicates before you spend a full dedup pass on it.

    Scale shape: row counts are a source-bounded combiner merge; the
    distinct-content counts exchange only (source, md5) pairs BUCKETED
    BY HASH (each bucket sees every copy of a given content, so its
    local distinct is globally correct), then source-bounded count
    partials tree-merge. Text never crosses the wire."""
    import hashlib

    from bio_re_with_entity_embeddings_ray.stages.common import (
        bucketed_group_apply,
        merge_partials,
    )

    def hash_rows(b: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        return pd.DataFrame(
            {
                "source": b["source"],
                "h": [md5(t.encode("utf-8")).hexdigest() for t in b["text"]],
            }
        )

    hashed = docs.map_batches(hash_rows, batch_format="pandas").materialize()

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("source", as_index=False).agg(n_docs=("h", "size"))
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    def count_combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("source", as_index=False)["n_docs"].sum()

    totals = merge_partials(
        hashed.map_batches(count_partial, batch_format="pandas"),
        "source", count_combine, lambda b: b, num_buckets, plan="tree",
    ).to_pandas()

    def distinct_in_bucket(b: pd.DataFrame) -> pd.DataFrame:
        d = b.drop_duplicates(["source", "h"])
        g = d.groupby("source", as_index=False).agg(n_distinct=("h", "size"))
        g["n_distinct"] = g["n_distinct"].astype("int64")
        return g

    dpart = bucketed_group_apply(hashed, "h", distinct_in_bucket, num_buckets)

    def d_combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("source", as_index=False)["n_distinct"].sum()

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        d = d_combine(b).merge(totals, on="source")
        nz = np.maximum(d["n_docs"].to_numpy(), 1)
        d["dup_rate_bp"] = (
            10000 * (d["n_docs"] - d["n_distinct"]).to_numpy() // nz
        ).astype("int64")
        return d[["source", "n_docs", "n_distinct", "dup_rate_bp"]].sort_values(
            "source"
        ).reset_index(drop=True)

    return merge_partials(
        dpart, "source", d_combine, finalize, num_buckets, plan="tree",
    )


def conv_features(transcripts, mentions, num_buckets: int = 16):
    """Denormalized per-conversation FEATURE TABLE — the single wide
    row downstream selection filters scan instead of re-joining five
    aggregates: (conv_id, n_turns, n_tok, n_user_turns, n_tool_turns,
    n_mentions, n_entities). The "feature store" composition pattern:
    every column is a per-conv aggregate, so ALL of them ride ONE
    conv-keyed exchange of per-block partials (tagged union) — never
    five separate shuffles + a five-way join.

    Scale shape: transcripts collapse per block to (conv, counts...)
    int64 rows; mentions collapse per block to (conv, mention count,
    block-distinct entity partial); distinct entities finish per bucket
    (a conversation's rows co-locate). Text never ships."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from bio_re_with_entity_embeddings_ray.stages.common import bucketed_group_apply

    def t_partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(batch["text"], " ")
        ).cast(pa.int64())
        role = batch["role"]
        t = pa.table(
            {
                "conv_id": batch["conv_id"],
                "n_turns": pa.array([1] * len(batch), pa.int64()),
                "n_tok": n_tok,
                "n_user_turns": pc.cast(
                    pc.equal(role, "user"), pa.int64()
                ),
                "n_tool_turns": pc.cast(
                    pc.equal(role, "tool"), pa.int64()
                ),
            }
        )
        g = t.group_by("conv_id").aggregate(
            [("n_turns", "sum"), ("n_tok", "sum"),
             ("n_user_turns", "sum"), ("n_tool_turns", "sum")]
        )
        names = {"n_turns_sum": "n_turns", "n_tok_sum": "n_tok",
                 "n_user_turns_sum": "n_user_turns",
                 "n_tool_turns_sum": "n_tool_turns"}
        g = g.rename_columns([names.get(c, c) for c in g.column_names])
        out = g.append_column("side", pa.array([0] * len(g), pa.int64()))
        out = out.append_column(
            "entity_id", pa.array([""] * len(g), pa.string())
        )
        return out

    def m_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[["conv_id", "entity_id"]].copy(deep=False)
        g = d.groupby("conv_id", as_index=False).agg(
            n_turns=("entity_id", "size")  # reuse column: mention count
        )
        g = g.rename(columns={})
        g["n_tok"] = np.int64(0)
        g["n_user_turns"] = np.int64(0)
        g["n_tool_turns"] = np.int64(0)
        g["side"] = np.int64(1)
        g["entity_id"] = ""
        # block-distinct (conv, entity) rows ride along for the exact
        # distinct-entity count finished per bucket
        dd = d.drop_duplicates()
        dd = pd.DataFrame(
            {
                "conv_id": dd["conv_id"],
                "n_turns": np.int64(0),
                "n_tok": np.int64(0),
                "n_user_turns": np.int64(0),
                "n_tool_turns": np.int64(0),
                "side": np.int64(2),
                "entity_id": dd["entity_id"],
            }
        )
        g["n_turns"] = g["n_turns"].astype("int64")
        return pd.concat(
            [g[dd.columns.tolist()], dd], ignore_index=True
        )

    u = transcripts.map_batches(
        t_partial, batch_format="pyarrow", batch_size=None
    ).union(mentions.map_batches(m_partial, batch_format="pandas"))

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        t = bucket[bucket["side"] == 0]
        tg = t.groupby("conv_id", as_index=False).agg(
            n_turns=("n_turns", "sum"), n_tok=("n_tok", "sum"),
            n_user_turns=("n_user_turns", "sum"),
            n_tool_turns=("n_tool_turns", "sum"),
        )
        m = bucket[bucket["side"] == 1]
        mg = m.groupby("conv_id", as_index=False).agg(
            n_mentions=("n_turns", "sum")
        )
        e = bucket[bucket["side"] == 2][["conv_id", "entity_id"]]
        eg = (
            e.drop_duplicates()
            .groupby("conv_id", as_index=False)
            .agg(n_entities=("entity_id", "size"))
        )
        out = tg.merge(mg, on="conv_id", how="left").merge(
            eg, on="conv_id", how="left"
        )
        for c in ("n_mentions", "n_entities"):
            out[c] = out[c].fillna(0).astype("int64")
        for c in ("n_turns", "n_tok", "n_user_turns", "n_tool_turns"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_group_apply(u, "conv_id", per_conv, num_buckets)


def hourly_activity(events, num_buckets: int = 16):
    """Diurnal activity profile: (hour, event_type, n_events) with hour
    = UTC hour-of-day 0-23 — the load-shape table capacity planning and
    anomaly baselines read (the calendar complement of the tumbling /
    monthly buckets). Hour extraction is vectorized int64 arithmetic on
    epoch microseconds; the exchange is a 24 x |event_type|-bounded
    combiner tree merge — the cheapest shape in the repo."""
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        hour = (t // 3_600_000_000) % 24
        g = (
            pd.DataFrame({"hour": hour, "event_type": b["event_type"]})
            .groupby(["hour", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n_events"})
        )
        g["n_events"] = g["n_events"].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["hour", "event_type"], as_index=False)[
            "n_events"
        ].sum()

    return merge_partials(
        events.map_batches(partial, batch_format="pandas"),
        ["hour", "event_type"], combine, lambda b: b, num_buckets,
        plan="tree",
    )
