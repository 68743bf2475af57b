"""Round-5 session-2 operator tests: containment pairs, prefix clusters,
personalized PageRank, CUBE counts, NTILE, integer EMA, systematic
sampling, Q18 — each against a hand-computed or brute-force reference."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def test_containment_catches_subset_jaccard_misses(ray_session):
    """A short doc fully contained in a long one: containment fires,
    symmetric Jaccard at the same threshold does not."""
    from bio_re_with_entity_embeddings_ray.stages import dedup

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": [short, long]})
    )
    cont = dedup.containment_pairs(
        docs, k=3, threshold_bp=8000, num_buckets=4
    ).to_pandas()
    assert set(zip(cont["doc_a"], cont["doc_b"])) == {(1, 2)}
    # every shingle of the short doc appears in the long one
    row = cont.iloc[0]
    assert row["inter"] == min(row["size_a"], row["size_b"])
    jac = dedup.ngram_jaccard_pairs(
        docs, k=3, threshold_bp=8000, num_buckets=4
    ).to_pandas()
    assert len(jac) == 0


def test_containment_brute_force(ray_session):
    from bio_re_with_entity_embeddings_ray.functions.textfns import shingles
    from bio_re_with_entity_embeddings_ray.stages import dedup

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(6, 20)))
        for _ in range(15)
    ]
    # token-prefix truncations: shingle-subset by construction, so the
    # brute force must find containment = 1.0 for each (i, 15+i) pair
    texts += [" ".join(t.split(" ")[: max(4, len(t.split(" ")) // 2)])
              for t in texts[:15]]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(30), "text": texts})
    )
    got = (
        dedup.containment_pairs(docs, k=3, threshold_bp=8000, num_buckets=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    sets = {i: set(shingles(t.split(" "), 3)) for i, t in enumerate(texts)}
    rows = []
    for a in range(30):
        for b in range(a + 1, 30):
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if 10000 * inter >= 8000 * min(len(sets[a]), len(sets[b])):
                rows.append((a, b, inter, len(sets[a]), len(sets[b])))
    exp = pd.DataFrame(
        rows, columns=["doc_a", "doc_b", "inter", "size_a", "size_b"]
    )
    assert len(got) == len(exp)
    if len(exp):
        pd.testing.assert_frame_equal(
            got.astype("int64"), exp.astype("int64")
        )


def test_prefix_clusters(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import prefix_clusters

    boiler = "this site uses cookies to improve your experience"
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    boiler + " page one content",
                    boiler + " totally different tail",
                    "unique document with its own opening line here",
                    "short",  # fewer than k tokens: prefix = whole text
                ],
            }
        )
    )
    got = prefix_clusters(docs, k=8, min_docs=2, num_buckets=4).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["prefix"] == " ".join(boiler.split(" ")[:8])
    assert got.iloc[0]["n_docs"] == 2
    assert got.iloc[0]["min_doc_id"] == 1


def test_pagerank_personalized_seed_mass_and_sinks(ray_session):
    """Directed chain A->B->C with seed A: rank flows down the chain,
    non-seed restart is zero, and the dst-only sink node C is handled
    (the ADVICE sink-node fix applies here too)."""
    from bio_re_with_entity_embeddings_ray.stages.graph import (
        pagerank_personalized,
    )

    edges = rd.from_pandas(
        pd.DataFrame({"src": ["SEED:a", "b"], "dst": ["b", "c"]})
    )
    got = (
        pagerank_personalized(edges, "SEED:", iters=2, num_buckets=2)
        .set_index("node")["rank_mu"]
    )
    scale, unit = 10**12, 10**12  # one seed
    base_seed = (15 * unit) // 100
    # iter 1: r(a)=base, r(b)=0+85%*unit, r(c)=0
    # iter 2: r(a)=base, r(b)=85%*base_seed... recompute exactly:
    r = {"SEED:a": unit, "b": 0, "c": 0}
    deg = {"SEED:a": 1, "b": 1, "c": 0}
    for _ in range(2):
        share = {u: (r[u] // deg[u]) if deg[u] else 0 for u in r}
        contrib = {u: (85 * share[u]) // 100 for u in r}
        nxt = {
            "SEED:a": base_seed,
            "b": contrib["SEED:a"],
            "c": contrib["b"],
        }
        r = nxt
    assert dict(got) == r


def test_cube_counts_levels(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import cube_counts

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "fr"],
            "source": ["web", "chat", "web", "web", "chat"],
            "n_chars": [10, 20, 30, 40, 50],
        }
    )
    got = cube_counts(rd.from_pandas(df), num_buckets=2).to_pandas()
    key = got.set_index(["lang", "source"])
    assert key.loc[("*", "*"), "n"] == 5
    assert key.loc[("*", "*"), "sum_chars"] == 150
    assert key.loc[("en", "*"), "n"] == 2
    assert key.loc[("*", "web"), "sum_chars"] == 80
    assert key.loc[("de", "web"), "n"] == 2
    # CUBE = fine + |lang| + |source| + 1 rows
    assert len(got) == 4 + 3 + 2 + 1


def test_ntile_exact_sql_semantics(ray_session):
    """Group of 7 with n=4: tile sizes 2,2,2,1 in descending value
    order (remainder-first), ties broken by event_id."""
    from bio_re_with_entity_embeddings_ray.stages.relational import ntile_buckets

    ev = pd.DataFrame(
        {
            "event_id": range(7),
            "user_id": [1] * 7,
            "event_type": ["x"] * 7,
            "value": [0.7, 0.6, 0.5, 0.7, 0.3, 0.2, 0.1],
            "ts": pd.to_datetime([0] * 7, unit="s"),
            "props": [""] * 7,
        }
    )
    got = (
        ntile_buckets(rd.from_pandas(ev), n=4, num_buckets=2)
        .to_pandas()
        .set_index("event_id")["bucket"]
    )
    # order: (0.7,e0),(0.7,e3),(0.6,e1),(0.5,e2),(0.3,e4),(0.2,e5),(0.1,e6)
    assert got[0] == 1 and got[3] == 1
    assert got[1] == 2 and got[2] == 2
    assert got[4] == 3 and got[5] == 3
    assert got[6] == 4


def test_ema_fixed_point_recurrence(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import ema_smoothed

    ts = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3 + ["c2"] * 2,
            "turn_idx": [0, 1, 2, 0, 1],
            "text": ["a b c", "a", "a b c d e f g", "x y", "x"],
        }
    )
    got = (
        ema_smoothed(rd.from_pandas(ts), num_buckets=2)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    S = 10**6
    e1 = 3 * S
    e2 = (3 * e1 + 1 * S) // 4
    e3 = (3 * e2 + 7 * S) // 4
    f1 = 2 * S
    f2 = (3 * f1 + 1 * S) // 4
    assert got["ema_mu"].tolist() == [e1, e2, e3, f1, f2]
    assert got["n_tok"].tolist() == [3, 1, 7, 2, 1]


def test_systematic_sample_spacing(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.sampling import (
        systematic_sample,
    )

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [5, 1, 9, 3, 7, 2, 8, 4, 6, 10],
                      "text": ["t"] * 10})
    )
    got = (
        systematic_sample(docs, k=3, num_ranges=4)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert got["rank"].tolist() == [1, 4, 7, 10]
    assert got["doc_id"].tolist() == [1, 4, 7, 10]  # sorted doc_id order


def test_large_volume_orders(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        large_volume_orders,
    )

    orders = pd.DataFrame(
        {
            "o_orderkey": [100, 200, 300],
            "o_custkey": [1, 2, 1],
            "o_orderdate": pd.to_datetime(["1995-01-02", "1995-03-04", "1996-05-06"]),
            "o_totalprice": [1000.10, 2000.25, 3000.50],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [100, 100, 200, 300],
            "l_quantity": [150.0, 100.0, 50.0, 201.0],
        }
    )
    customer = pd.DataFrame(
        {"c_custkey": [1, 2], "c_name": ["Customer#1", "Customer#2"]}
    )
    got = (
        large_volume_orders(
            rd.from_pandas(orders),
            rd.from_pandas(lineitem),
            rd.from_pandas(customer),
            min_qty_centi=20000,
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    # order 100: 250.0 qty > 200 -> kept; 200: 50 -> dropped; 300: 201 -> kept
    assert got["o_orderkey"].tolist() == [100, 300]
    assert got["sum_qty_centi"].tolist() == [25000, 20100]
    assert got["c_name"].tolist() == ["Customer#1", "Customer#1"]
    epoch = np.datetime64("1970-01-01")
    assert got["d_days"].tolist() == [
        int((np.datetime64("1995-01-02") - epoch).astype(int)),
        int((np.datetime64("1996-05-06") - epoch).astype(int)),
    ]
    assert got["price_cents"].tolist() == [100010, 300050]


def test_min_label_prop_bounded_rounds(ray_session):
    """Undirected path a-b-c-d-e: after 2 rounds each node's label is
    the min id within 2 hops — e gets 'c', not 'a' (bounded, not CC)."""
    from bio_re_with_entity_embeddings_ray.stages.graph import min_label_prop

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": [x for p in und for x in p],
                "dst": [x for p in und for x in reversed(p)],
            }
        )
    )
    got = (
        min_label_prop(edges, rounds=2, num_buckets=2)
        .set_index("node")["label"]
    )
    assert dict(got) == {"a": "a", "b": "a", "c": "a", "d": "b", "e": "c"}


def test_sorted_neighborhood_brute_force(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.dedup import (
        sorted_neighborhood_pairs,
    )

    rng = np.random.default_rng(7)
    n = 60
    df = pd.DataFrame(
        {"doc_id": range(n), "n_chars": rng.integers(10, 40, size=n)}
    )
    got = (
        sorted_neighborhood_pairs(
            rd.from_pandas(df), key_col="n_chars", window=3,
            num_ranges=4, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["rank_a", "rank_b"])
        .reset_index(drop=True)
    )
    order = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    rows = []
    for a in range(n):
        for b in range(a + 1, min(a + 4, n)):
            rows.append(
                (order["doc_id"][a], order["doc_id"][b], a + 1, b + 1)
            )
    exp = pd.DataFrame(rows, columns=["doc_a", "doc_b", "rank_a", "rank_b"])
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64")
    )


def test_zorder_interleave(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.ordered import zorder_index

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [0b1010, 0xFFFF, 7],
            "event_type": ["x"] * 3,
            "value": [0.005, 0.0, 65.535],  # v_milli = 5, 0, 65535
            "ts": pd.to_datetime([0] * 3, unit="s"),
            "props": [""] * 3,
        }
    )
    got = (
        zorder_index(rd.from_pandas(ev))
        .to_pandas()
        .set_index("event_id")["zval"]
    )

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got[1] == morton(0b1010, 5)
    assert got[2] == morton(0xFFFF, 0)
    assert got[3] == morton(7, 65535)


def test_rrf_fusion_integer_scores(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        bm25_topk,
        rrf_fusion,
    )

    texts = [
        "join sort window join",        # hits all terms
        "join join join filler filler", # heavy on one term
        "sort window",                  # two terms
        "nothing relevant here",        # no terms
        "window",                       # one term
    ]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(5), "text": texts})
    )
    got = rrf_fusion(docs, query="join sort window", k=3)
    bm = bm25_topk(docs, query="join sort window", k=3)
    # qtf ranking: doc0 qtf=4, doc1 qtf=3, doc2 qtf=2 -> top-3
    qtf_rank = {0: 1, 1: 2, 2: 3}
    exp = {}
    for _, r in bm.iterrows():
        exp[r["doc_id"]] = exp.get(r["doc_id"], 0) + 10**9 // (60 + r["rank"])
    for d, rk in qtf_rank.items():
        exp[d] = exp.get(d, 0) + 10**9 // (60 + rk)
    got_map = dict(zip(got["doc_id"], got["rrf_bp"]))
    assert got_map == exp
    # rank is dense by (rrf desc, doc_id)
    srt = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got.sort_values("rank")["doc_id"].tolist() == [d for d, _ in srt]
    # doc 3 (no query terms) appears in neither list
    assert 3 not in got_map


def test_late_arrivals_watermark(ray_session):
    from bio_re_with_entity_embeddings_ray.functions.textfns import (
        md5int8_array,
    )
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        late_arrivals,
    )

    n = 40
    ev = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [i % 3 for i in range(n)],
            "event_type": ["x"] * n,
            "value": [0.0] * n,
            # ts monotone in event_id; lateness comes from hash order
            "ts": pd.to_datetime([1000 + 7 * i for i in range(n)], unit="ms"),
            "props": [""] * n,
        }
    )
    got = (
        late_arrivals(rd.from_pandas(ev), num_buckets=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # single-process reference with the same deterministic arrival hash
    h = md5int8_array([f"arr:{e}" for e in ev["event_id"]])
    ref_rows = []
    for u in sorted(ev["user_id"].unique()):
        sub = ev[ev["user_id"] == u].copy()
        sub["h"] = h[sub.index]
        sub = sub.sort_values(["h", "event_id"])
        wm = None
        for _, r in sub.iterrows():
            t = r["ts"].value // 1000  # ns -> us
            if wm is not None and wm > t:
                ref_rows.append(
                    (r["event_id"], u, wm // 1000 - t // 1000)
                )
            wm = t if wm is None else max(wm, t)
    exp = (
        pd.DataFrame(ref_rows, columns=["event_id", "user_id", "lag_ms"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(exp) > 0  # hash order must actually reorder something
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_lexical_diversity(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        lexical_diversity,
    )

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b a c a",          # 5 tok, 3 types, hapax {b, c} = 2
                    "x x x x",            # 4 tok, 1 type, 0 hapax
                    "unique words only",  # 3 tok, 3 types, 3 hapax
                ],
            }
        )
    )
    got = (
        lexical_diversity(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_tok"].tolist() == [5, 4, 3]
    assert got["n_types"].tolist() == [3, 1, 3]
    assert got["ttr_bp"].tolist() == [6000, 2500, 10000]
    assert got["hapax_bp"].tolist() == [4000, 0, 10000]


def test_conv_role_balance(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        conv_role_balance,
    )

    ts = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3 + ["c2"],
            "turn_idx": [0, 1, 2, 0],
            "role": ["user", "assistant", "tool", "user"],
            "text": ["a b c", "d e", "f", "x y z w"],
        }
    )
    got = (
        conv_role_balance(rd.from_pandas(ts), num_buckets=2)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got["n_tok"].tolist() == [6, 4]
    assert got["user_bp"].tolist() == [10000 * 3 // 6, 10000]
    assert got["assistant_bp"].tolist() == [10000 * 2 // 6, 0]
    assert got["tool_bp"].tolist() == [10000 * 1 // 6, 0]


def test_orders_by_month(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        orders_by_month,
    )

    o = pd.DataFrame(
        {
            "o_orderdate": pd.to_datetime(
                ["1995-01-15", "1995-01-31", "1995-02-01", "1996-12-25"]
            ),
            "o_totalprice": [10.10, 20.20, 5.00, 1.99],
        }
    )
    got = (
        orders_by_month(rd.from_pandas(o), num_buckets=2)
        .to_pandas()
        .sort_values("ym")
        .reset_index(drop=True)
    )
    assert got["ym"].tolist() == [199501, 199502, 199612]
    assert got["n_orders"].tolist() == [2, 1, 1]
    assert got["revenue_cents"].tolist() == [3030, 500, 199]


def test_user_ltv_quantiles(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        user_ltv_quantiles,
    )

    # users 1..4 with LTVs 1000, 2000, 3000, 4000 milli
    ev = pd.DataFrame(
        {
            "event_id": range(8),
            "user_id": [1, 1, 2, 2, 3, 3, 4, 4],
            "event_type": ["x"] * 8,
            "value": [0.4, 0.6, 1.0, 1.0, 1.5, 1.5, 2.0, 2.0],
            "ts": pd.to_datetime([0] * 8, unit="s"),
            "props": [""] * 8,
        }
    )
    got = (
        user_ltv_quantiles(rd.from_pandas(ev), num_buckets=2)
        .sort_values("q_bp")
        .reset_index(drop=True)
    )
    # n=4: pos(2500)=1, pos(5000)=2, pos(7500)=3, pos(9500)=ceil(3.8)=4
    assert got["value"].tolist() == [1000, 2000, 3000, 4000]


def test_conv_entity_density_zero_mention_convs(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        conv_entity_density,
    )

    ts = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": [0, 1, 0],
            "role": ["user", "assistant", "user"],
            "text": ["a b c d", "e f", "x y"],
        }
    )
    mentions = pd.DataFrame(
        {"conv_id": ["c1", "c1", "c1"], "entity_id": ["E1", "E2", "E1"]}
    )
    got = (
        conv_entity_density(
            rd.from_pandas(ts), rd.from_pandas(mentions), num_buckets=2
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == ["c1", "c2"]
    assert got["n_tok"].tolist() == [6, 2]
    assert got["n_mentions"].tolist() == [3, 0]
    assert got["density_bp"].tolist() == [10000 * 3 // 6, 0]


def test_embedding_quantize_roundtrip_error(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.scoring import (
        embedding_quantize,
    )

    emb = pd.DataFrame(
        {
            "vec_id": [1, 2],
            "embedding": [
                [0.0, 1.0, 0.5, 0.25],
                [3.0, 3.0, 3.0, 3.0],  # constant vector -> all codes 0
            ],
        }
    )
    got = (
        embedding_quantize(rd.from_pandas(emb))
        .to_pandas()
        .sort_values(["vec_id", "i"])
        .reset_index(drop=True)
    )
    assert got[got["vec_id"] == 2]["code"].tolist() == [0, 0, 0, 0]
    v1 = got[got["vec_id"] == 1]["code"].to_numpy()
    # v=1.0 -> 255 (clamped from floor(255.0)=255); 0.0 -> 0
    assert v1.tolist() == [0, 255, int(0.5 * 255), int(0.25 * 255)]
    # reconstruction error bound: one quantization step
    recon = 0.0 + v1 * (1.0 - 0.0) / 255.0
    assert np.abs(recon - np.array([0.0, 1.0, 0.5, 0.25])).max() <= 1 / 255


def test_regional_revenue_same_nation_only(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        regional_revenue,
    )

    region = pd.DataFrame(
        {"r_regionkey": [0, 1], "r_name": ["ASIA", "EUROPE"]}
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": [10, 11, 20],
            "n_name": ["JAPAN", "INDIA", "FRANCE"],
            "n_regionkey": [0, 0, 1],
        }
    )
    customer = pd.DataFrame(
        {"c_custkey": [1, 2, 3], "c_nationkey": [10, 11, 20]}
    )
    supplier = pd.DataFrame(
        {"s_suppkey": [5, 6], "s_nationkey": [10, 20]}
    )
    orders = pd.DataFrame(
        {"o_orderkey": [100, 200, 300], "o_custkey": [1, 2, 3]}
    )
    lineitem = pd.DataFrame(
        {
            # order 100 (cust JAPAN): supp 5 JAPAN -> counts;
            # order 200 (cust INDIA): supp 5 JAPAN -> nation mismatch;
            # order 300 (cust FRANCE, not ASIA) -> filtered at orders
            "l_orderkey": [100, 200, 300],
            "l_suppkey": [5, 5, 5],
            "l_extendedprice": [100.00, 50.00, 70.00],
            "l_discount": [0.10, 0.0, 0.0],
        }
    )
    got = regional_revenue(
        rd.from_pandas(lineitem), rd.from_pandas(orders),
        rd.from_pandas(customer), rd.from_pandas(supplier),
        rd.from_pandas(nation), rd.from_pandas(region),
        region_name="ASIA", num_buckets=2,
    ).to_pandas()
    assert got["n_name"].tolist() == ["JAPAN"]
    assert got["revenue_units"].tolist() == [10000 * (10000 - 1000)]


def test_minhash_jaccard_est_bounds_and_exact_dup(ray_session):
    from bio_re_with_entity_embeddings_ray.stages import dedup

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon zeta",  # exact dup -> est 10000
        3: "alpha beta gamma delta epsilon eta",   # near dup
        4: "completely different tokens over here now",
    }
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = dedup.minhash_jaccard_est(docs, k=3, num_buckets=4).to_pandas()
    est = dict(zip(zip(got["doc_a"], got["doc_b"]), got["est_bp"]))
    assert est[(1, 2)] == 10000  # identical signatures
    assert (1, 3) in est or (2, 3) in est  # near dup banded together
    assert all(0 <= v <= 10000 for v in est.values())


def test_churn_users_day_boundaries(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import churn_users

    ev = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": [1, 1, 2, 3],
            "event_type": ["x"] * 4,
            "value": [0.0] * 4,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-03", "2024-01-10", "2024-01-09"]
            ),
            "props": [""] * 4,
        }
    )
    got = (
        churn_users(rd.from_pandas(ev), idle_days=2, num_buckets=2)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # global max day = 2024-01-10; user 1 idle 7d, user 3 idle 1d (<2)
    assert got["user_id"].tolist() == [1]
    assert got["idle_days"].tolist() == [7]


def test_curate_to_pack_composition(ray_session):
    """The fused chain equals pack_sequences applied to curate's output
    row set (offsets contiguous, seq boundaries at budget)."""
    from bio_re_with_entity_embeddings_ray.pipelines.curate import curate
    from bio_re_with_entity_embeddings_ray.stages.ordered import pack_sequences

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "text": [
                    "a b c d e f g h",     # kept
                    "a b c d e f g h",     # exact dup -> dropped
                    "x x x",               # low distinct + short -> dropped
                    "one two three four five six",  # kept
                    "p q r s t u v w x y", # kept
                    "m n o p q",           # kept
                ],
            }
        )
    )
    kept = curate(docs, num_buckets=2)
    got = (
        pack_sequences(kept, budget=10, num_ranges=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 3, 4, 5]
    assert got["n_tokens"].tolist() == [8, 6, 10, 5]
    # stream starts: 0, 8, 14, 24 -> seq 0,0,1,2; offsets 0,8,4,4
    assert got["seq_id"].tolist() == [0, 0, 1, 2]
    assert got["offset_in_seq"].tolist() == [0, 8, 4, 4]


def test_token_bucket_recurrence(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import token_bucket

    # one user, events every 30 min; capacity 3 tokens, refill 1/hour,
    # cost 1 -> levels (µtok): start 3.0M
    # e0: avail=3.0 admit rem=2.0 | e1 (+0.5h): 2.5 admit rem=1.5
    # e2: 2.0 admit rem=1.0 | e3: 1.5 admit rem=0.5 | e4: 1.0 admit rem=0
    # e5: 0.5 REJECT rem=0.5 | e6: 1.0 admit rem=0 | e7: 0.5 REJECT
    ev = pd.DataFrame(
        {
            "event_id": range(8),
            "user_id": [1] * 8,
            "event_type": ["x"] * 8,
            "value": [0.0] * 8,
            "ts": pd.to_datetime([i * 1800 for i in range(8)], unit="s"),
            "props": [""] * 8,
        }
    )
    got = (
        token_bucket(
            rd.from_pandas(ev), capacity_mu=3_000_000, cost_mu=1_000_000,
            refill_div_us=3600, num_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["admitted"].tolist() == [1, 1, 1, 1, 1, 0, 1, 0]


def test_dedup_stats_by_source(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        dedup_stats_by_source,
    )

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "source": ["a", "a", "a", "b", "b", "b"],
                "text": ["t1", "t1", "t2", "u1", "u2", "u3"],
            }
        )
    )
    got = (
        dedup_stats_by_source(docs, num_buckets=2)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert got["n_docs"].tolist() == [3, 3]
    assert got["n_distinct"].tolist() == [2, 3]
    assert got["dup_rate_bp"].tolist() == [10000 * 1 // 3, 0]


def test_nll_percentile_filter_drops_surprising_tail(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        bigram_nll,
        nll_percentile_filter,
    )

    # 9 docs from a tight template + 1 gibberish doc: the gibberish doc
    # has the highest mean NLL and must be the one cut at p90
    texts = [f"the cat sat on the mat number {i}" for i in range(9)]
    texts.append("zq xv jk wp lm qr st uv")
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": range(10), "text": texts})
    )
    kept = nll_percentile_filter(docs, q_bp=9000, num_buckets=4).to_pandas()
    assert 9 not in set(kept["doc_id"])
    assert len(kept) == 9
    # kept means match bigram_nll floor division
    nll = bigram_nll(docs, num_buckets=4).to_pandas().set_index("doc_id")
    for _, r in kept.iterrows():
        d = int(r["doc_id"])
        assert r["mean_nll_fp"] == nll.loc[d, "nll_fp"] // nll.loc[d, "n_bigrams"]


def test_conv_features_wide_row(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import conv_features

    ts = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3 + ["c2"],
            "turn_idx": [0, 1, 2, 0],
            "role": ["user", "assistant", "tool", "user"],
            "text": ["a b", "c d e", "f", "x y z"],
        }
    )
    mentions = pd.DataFrame(
        {"conv_id": ["c1", "c1", "c1"], "entity_id": ["E1", "E1", "E2"]}
    )
    got = (
        conv_features(rd.from_pandas(ts), rd.from_pandas(mentions), 2)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == ["c1", "c2"]
    assert got["n_turns"].tolist() == [3, 1]
    assert got["n_tok"].tolist() == [6, 3]
    assert got["n_user_turns"].tolist() == [1, 1]
    assert got["n_tool_turns"].tolist() == [1, 0]
    assert got["n_mentions"].tolist() == [3, 0]
    assert got["n_entities"].tolist() == [2, 0]


def test_source_weights_uniform_mix(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import source_weights

    docs = rd.from_pandas(
        pd.DataFrame({"source": ["a"] * 6 + ["b"] * 2})
    )
    got = (
        source_weights(docs, num_buckets=2)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    # N=8, S=2: fair share 4/source -> a weight 10000*8//(2*6)=6666,
    # b weight 10000*8//(2*2)=20000
    assert got["weight_bp"].tolist() == [6666, 20000]


def test_novelty_scores(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import novelty_scores

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b c",      # bigrams (a,b),(b,c) — (a,b) shared with doc2
                    "a b d",      # (a,b) shared, (b,d) unique
                    "q r s",      # all unique
                ],
            }
        )
    )
    got = (
        novelty_scores(docs, num_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_bigrams"].tolist() == [2, 2, 2]
    assert got["novel_bp"].tolist() == [5000, 5000, 10000]


def test_corpus_summary_single_row(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.textstats import corpus_summary

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "text": ["a b", "a b", "c d e"],
                "lang": ["en", "en", "de"],
                "source": ["web", "chat", "web"],
            }
        )
    )
    got = corpus_summary(docs, num_buckets=2).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_docs"] == 3 and r["n_tokens"] == 7
    assert r["n_distinct_texts"] == 2
    assert r["dup_rate_bp"] == 10000 * 1 // 3
    assert r["n_langs"] == 2 and r["n_sources"] == 2


def test_hourly_activity(ray_session):
    from bio_re_with_entity_embeddings_ray.stages.relational import (
        hourly_activity,
    )

    ev = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": [1] * 4,
            "event_type": ["a", "a", "b", "a"],
            "value": [0.0] * 4,
            "ts": pd.to_datetime(
                ["2024-01-01 09:15", "2024-01-02 09:59",
                 "2024-01-01 09:30", "2024-01-01 23:59"]
            ),
            "props": [""] * 4,
        }
    )
    got = (
        hourly_activity(rd.from_pandas(ev), num_buckets=2)
        .to_pandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [[9, "a", 2], [9, "b", 1], [23, "a", 1]]
