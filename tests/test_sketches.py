"""HyperLogLog sketch: register fold pinned to brute force, merge
associativity, and estimate accuracy against exact counts."""

import numpy as np
import pandas as pd
import ray.data as rd

from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array
from bio_re_with_entity_embeddings_ray.stages import sketches


def _brute_registers(values, p=8, salt="hll"):
    regs = np.zeros(1 << p, dtype=np.int64)
    for v in values:
        h = int(md5int8_array([f"{salt}:{v}"])[0])
        reg = h >> (32 - p)
        rem = h & ((1 << (32 - p)) - 1)
        rank = (32 - p) - rem.bit_length() + 1
        regs[reg] = max(regs[reg], rank)
    return regs


def test_fold_matches_brute_force():
    rng = np.random.RandomState(7)
    vals = [str(v) for v in rng.randint(0, 10**9, size=2000)]
    tagged = md5int8_array([f"hll:{v}" for v in vals])
    got = sketches._fold_registers(tagged, 8)
    assert np.array_equal(got, _brute_registers(vals))


def test_merge_is_elementwise_max():
    rng = np.random.RandomState(3)
    a = [str(v) for v in rng.randint(0, 10**6, size=500)]
    b = [str(v) for v in rng.randint(0, 10**6, size=500)]
    ra = _brute_registers(a)
    rb = _brute_registers(b)
    assert np.array_equal(np.maximum(ra, rb), _brute_registers(a + b))


def test_distributed_registers_and_estimate(ray_session):
    n_distinct = 5000
    df = pd.DataFrame({"v": [str(i % n_distinct) for i in range(20000)]})
    regs = sketches.hll_registers(rd.from_pandas(df), "v", p=8).to_pandas()
    assert len(regs) == 256
    assert np.array_equal(
        regs.sort_values("register")["max_rank"].to_numpy(),
        _brute_registers([str(i) for i in range(n_distinct)]),
    )
    est = sketches.hll_estimate(regs, p=8)
    assert abs(est - n_distinct) / n_distinct < 0.2  # ~6.5% expected error


def test_windowed_hll_estimates_close_to_exact(ray_session):
    rng = np.random.RandomState(11)
    n = 20000
    ts = pd.to_datetime(rng.randint(0, 4 * 3600, size=n), unit="s")
    users = rng.randint(0, 800, size=n)
    df = pd.DataFrame({"ts": ts, "user_id": users})
    regs = sketches.windowed_hll(
        rd.from_pandas(df), width_s=3600, key_col="user_id", p=8
    ).to_pandas()
    est = sketches.windowed_hll_estimates(regs, p=8).set_index("window_start")
    epoch = ts.astype("datetime64[s]").astype("int64")
    for w in sorted(set((epoch // 3600) * 3600)):
        exact = len(set(users[(epoch // 3600) * 3600 == w]))
        assert abs(est.loc[w, "est"] - exact) / exact < 0.25, (w, exact)


def test_cms_point_query_upper_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages.sketches import (
        cms_estimate,
        cms_registers,
    )

    rng = np.random.RandomState(5)
    # zipf-ish: key 0 is hot
    keys = np.concatenate(
        [np.zeros(400, dtype=np.int64), rng.randint(1, 200, size=600)]
    )
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(5)
    regs = cms_registers(ds, "k", depth=4, width=256).to_pandas()
    assert regs.shape == (4 * 256, 3)
    assert regs["cnt"].sum() == 4 * len(keys)  # each row counted per depth
    true = pd.Series(keys).value_counts()
    for key in (0, int(true.index[1]), 199):
        t = int(true.get(key, 0))
        est = cms_estimate(regs, key, depth=4, width=256)
        assert est >= t  # CMS never underestimates
        assert est <= t + len(keys) // 64  # epsilon*N slack at width 256
    # the hot key's estimate is exact with overwhelming probability
    assert cms_estimate(regs, 0, depth=4, width=256) == 400


def test_grouped_hll_matches_per_group_fold(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8_array
    from bio_re_with_entity_embeddings_ray.stages.sketches import (
        HLL_P,
        _fold_registers,
        grouped_hll,
        hll_estimate,
    )

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 500),
            "u": rng.randint(0, 120, 500).astype(np.int64),
        }
    )
    got = grouped_hll(
        rd.from_pandas(df).repartition(5), "g", "u", num_buckets=4
    ).to_pandas()
    for g, grp in df.groupby("g"):
        regs = _fold_registers(
            md5int8_array([f"hll:{v}" for v in grp["u"].astype(str)]), HLL_P
        )
        sub = got[got["g"] == g]
        exp = dict(zip(np.flatnonzero(regs), regs[np.flatnonzero(regs)]))
        assert dict(zip(sub["register"], sub["max_rank"])) == exp
        # estimate within 15% of the exact distinct count
        exact = grp["u"].nunique()
        est = hll_estimate(sub.rename(columns={"g": "window_start"}), HLL_P)
        assert abs(est - exact) / exact < 0.15
