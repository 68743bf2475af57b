"""Engine vs single-process reference-semantics oracle on the pathological
synthetic fixture (FIXTURES.md): triples P/R (target exact), mapping
tables, reassembly, per-turn text invariant, determinism across
parallelism levels."""

from __future__ import annotations

import pandas as pd
import pytest

import oracle as ref_oracle
from bio_re_with_entity_embeddings_ray.functions import normalize as nz
from bio_re_with_entity_embeddings_ray.sources.fixtures import MESH2DRUGBANK
from bio_re_with_entity_embeddings_ray.stages import aggregate, pairs, reassembly
from bio_re_with_entity_embeddings_ray.stages.mentions import verify_annotations

NORMALIZERS = {
    "drug": nz.make_normalize_drug(MESH2DRUGBANK),
    "disease": nz.make_normalize_disease(None),
}


@pytest.fixture(scope="module")
def engine_and_oracle(fixture_tables):
    import ray.data as rd

    transcripts_t, annotations_t = fixture_tables
    o = ref_oracle.run(
        transcripts_t.select(["conv_id", "turn_idx", "text"]).to_pylist(),
        annotations_t.drop(["valid"]).to_pylist(),
    )
    ts = rd.from_arrow(transcripts_t)
    ann = rd.from_arrow(annotations_t.drop(["valid"]))
    mentions = verify_annotations(ann, ts, NORMALIZERS, num_partitions=8)
    return ts, mentions, o


def _triples_df(mentions, subj, obj, pred, nb=8) -> pd.DataFrame:
    return pairs.triples(mentions, subj, obj, pred, num_buckets=nb).to_pandas()


@pytest.mark.parametrize(
    "subj,obj,pred",
    [("mutation", "disease", "associated_with"), ("drug", "disease", "treats")],
)
def test_triples_match_oracle_exactly(engine_and_oracle, subj, obj, pred):
    _, mentions, o = engine_and_oracle
    got = _triples_df(mentions, subj, obj, pred)
    exp = o["triples"](subj, obj, pred)
    got_keys = set(zip(got["subj_id"], got["pred"], got["obj_id"]))
    exp_keys = set(exp.keys())
    # small fixture vocab: full cross product is 6 triples per type pair
    assert len(exp_keys) >= 4  # fixture is non-trivial
    # P/R target from BASELINE.md is >= 0.95; we assert exact match
    assert got_keys == exp_keys
    # provenance conv lists and support also exact
    for _, row in got.iterrows():
        key = (row["subj_id"], row["pred"], row["obj_id"])
        assert row["conv_ids"].split(";;;") == exp[key]
        assert row["support"] == len(exp[key])


def test_conv2entity_matches_oracle(engine_and_oracle):
    _, mentions, o = engine_and_oracle
    got = aggregate.conv2entity(mentions, num_buckets=8).to_pandas()
    exp = o["conv2entity"]
    assert dict(zip(got["conv_id"], got["entity_ids"])) == {
        k: ";;;".join(v) for k, v in exp.items()
    }


def test_entity2conv_matches_oracle(engine_and_oracle):
    _, mentions, o = engine_and_oracle
    got = aggregate.entity2conv(mentions, num_buckets=8).to_pandas()
    exp = o["entity2conv"]
    got_map = {
        (r["entity_id"], r["entity_type"]): r["conv_ids"].split(";;;")
        for _, r in got.iterrows()
    }
    assert got_map == exp


def test_span_verification_drops_corrupt_only(fixture_tables):
    """Every corrupt annotation (valid=False) is dropped; every valid one
    with a non-empty normalization survives."""
    import ray.data as rd

    transcripts_t, annotations_t = fixture_tables
    ts = rd.from_arrow(transcripts_t)
    ann = rd.from_arrow(annotations_t.drop(["valid"]))
    got = verify_annotations(ann, ts, NORMALIZERS, num_partitions=8).to_pandas()
    got_spans = set(
        zip(got["conv_id"], got["turn_idx"], got["start"], got["entity_id"])
    )

    apd = annotations_t.to_pandas()
    for _, a in apd.iterrows():
        canon = ref_oracle.normalize(a["entity_type"], a["raw_id"])
        for c in canon:
            span = (a["conv_id"], a["turn_idx"], a["start"], c)
            if a["valid"]:
                assert span in got_spans
            else:
                assert span not in got_spans


def test_reassembly_per_turn_text_equality(fixture_tables):
    """Per-row invariant: the reassembled conversation equals the oracle's
    stable-sorted join AND splits back into the original (byte-identical)
    turn texts."""
    import ray.data as rd

    transcripts_t, _ = fixture_tables
    ts = rd.from_arrow(transcripts_t)
    got = reassembly.conversations(ts, num_buckets=8).to_pandas()
    o = ref_oracle.run(
        transcripts_t.select(["conv_id", "turn_idx", "text"]).to_pylist(), []
    )
    assert dict(zip(got["conv_id"], got["text"])) == o["conversations"]

    # byte-identical turn reconstruction
    tpd = transcripts_t.to_pandas().sort_values(["conv_id", "turn_idx"])
    joined = dict(zip(got["conv_id"], got["text"]))
    for cid, g in tpd.groupby("conv_id"):
        turns = list(g["text"])
        assert joined[cid] == " ".join(turns)
        assert joined[cid].split(" ") == " ".join(turns).split(" ")


def test_determinism_across_bucket_counts(engine_and_oracle):
    """Identical results at different partitioning granularity (the
    single-node analog of different cluster sizes)."""
    _, mentions, _ = engine_and_oracle
    a = (
        _triples_df(mentions, "drug", "disease", "treats", nb=3)
        .sort_values(["subj_id", "obj_id"])
        .reset_index(drop=True)
    )
    b = (
        _triples_df(mentions, "drug", "disease", "treats", nb=13)
        .sort_values(["subj_id", "obj_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_temporal_triples_windows_cover_supports(ray_session):
    import pandas as pd

    from bio_re_with_entity_embeddings_ray.sources.transcripts import (
        derive_transcripts,
    )
    from bio_re_with_entity_embeddings_ray.stages import pairs as pstage
    from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions

    tr = derive_transcripts("/root/testdata/sf0.001")
    got = pstage.temporal_triples(tr, "op", "res", "applies_to", 4).to_pandas()
    assert len(got) > 0
    assert (got["first_s"] <= got["last_s"]).all()
    # brute force: per-conv pair expansion + conv ts ranges
    tdf = tr.to_pandas()
    m = scan_mentions(tr, include_tool=True).to_pandas()
    dm = m[["conv_id", "entity_type", "entity_id"]].drop_duplicates()
    src = dm[dm["entity_type"] == "op"].rename(columns={"entity_id": "subj_id"})
    tgt = dm[dm["entity_type"] == "res"].rename(columns={"entity_id": "obj_id"})
    cp = src.merge(tgt, on="conv_id")[["conv_id", "subj_id", "obj_id"]]
    e = tdf.assign(s=tdf["ts"].astype("datetime64[s]").astype("int64"))
    cts = e.groupby("conv_id", as_index=False).agg(
        first_s=("s", "min"), last_s=("s", "max")
    )
    exp = (
        cp.merge(cts, on="conv_id")
        .groupby(["subj_id", "obj_id"], as_index=False)
        .agg(support=("conv_id", "size"), first_s=("first_s", "min"),
             last_s=("last_s", "max"))
    )
    key = lambda df: df.sort_values(["subj_id", "obj_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(got[["subj_id", "obj_id", "support", "first_s", "last_s"]]),
        key(exp).astype({"support": "int64"}),
    )


def test_triple_negatives_deterministic_and_type_consistent(ray_session):
    from bio_re_with_entity_embeddings_ray.functions.textfns import md5int8
    from bio_re_with_entity_embeddings_ray.sources.transcripts import (
        derive_transcripts,
    )
    from bio_re_with_entity_embeddings_ray.stages import pairs as pstage
    from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions

    tr = derive_transcripts("/root/testdata/sf0.001")
    m = scan_mentions(tr, include_tool=True)
    trip = pstage.triples(m, "op", "res", "applies_to", 4)
    got = pstage.triple_negatives(
        trip.select_columns(["subj_id", "obj_id"])
    ).to_pandas()
    assert len(got) > 0
    import numpy as np

    vocab = np.sort(got["obj_id"].unique())
    n = len(vocab)
    for r in got.itertuples():
        h = md5int8(f"neg:{r.subj_id}|{r.obj_id}") % n
        exp = vocab[h] if vocab[h] != r.obj_id else vocab[(h + 1) % n]
        assert r.neg_obj_id == exp
        assert r.neg_obj_id != r.obj_id  # never the true object


def test_fused_pack_engines_agree(ray_session):
    """The Arrow fused pack (_combined_arrow) and the pandas composition
    (_cross_and_pack + pack_sorted_distinct) must emit identical
    (kind, a, b, conv_ids, n_convs) content over raw (duplicate-bearing)
    mention batches — the 6x-faster kernel is a plan change, never a
    semantics change."""
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.pipelines.kg import (
        nodes_and_triples_bucketed,
    )
    from bio_re_with_entity_embeddings_ray.sources.fixtures import generate
    from bio_re_with_entity_embeddings_ray.stages.mentions import scan_mentions

    ts = rd.from_arrow(generate(n_convs=60, seed=5)[0])
    m = scan_mentions(ts, include_tool=True)
    outs = {}
    for eng in ("arrow", "pandas"):
        edges, nodes, pp, np_, tagged = nodes_and_triples_bucketed(
            m, "op", "res", "applies_to", 4,
            assume_unsplit_blocks=True, pack_engine=eng,
        )
        outs[eng] = (
            tagged.to_pandas()
            .sort_values(["kind", "a", "b"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["arrow"], outs["pandas"][outs["arrow"].columns])
