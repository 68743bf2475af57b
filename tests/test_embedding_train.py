"""Distributed hashed-PPMI embedding trainer: determinism across block
layouts, similarity structure (co-occurring tags closer than disjoint
ones), and the export sink."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import embedding_train as et


def _input():
    # tags A and B share document vocabulary; C lives in a different one
    rows = [
        ("c1", "A;;;B", "alpha beta gamma alpha"),
        ("c2", "A", "alpha beta delta"),
        ("c3", "B", "beta gamma alpha"),
        ("c4", "C", "omega psi chi omega psi"),
        ("c5", "C", "psi chi omega"),
    ]
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "tags": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
        }
    )


def _vectors(ds):
    out = {r["tag"]: np.asarray(r["vector"]) for r in ds.take_all()}
    return out


def test_similarity_structure_and_norm():
    vecs = _vectors(et.train_entity_embeddings(rd.from_arrow(_input()), dim=32, num_buckets=4))
    assert set(vecs) == {"A", "B", "C"}
    for v in vecs.values():
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-5)
    sim_ab = float(vecs["A"] @ vecs["B"])
    sim_ac = float(vecs["A"] @ vecs["C"])
    assert sim_ab > sim_ac + 0.3  # shared vocab -> much closer


def test_deterministic_across_block_layouts():
    one = _vectors(et.train_entity_embeddings(rd.from_arrow(_input()), dim=16, num_buckets=4))
    tbl = _input()
    split = rd.from_arrow([tbl.slice(0, 2), tbl.slice(2, 2), tbl.slice(4, 1)])
    many = _vectors(et.train_entity_embeddings(split, dim=16, num_buckets=8))
    for t in one:
        np.testing.assert_allclose(one[t], many[t], rtol=1e-6)


def test_export_roundtrip(tmp_path):
    ds = et.train_entity_embeddings(rd.from_arrow(_input()), dim=8, num_buckets=2)
    path = et.export_embeddings(ds, str(tmp_path / "emb"))
    back = rd.read_parquet(path).to_pandas()
    assert set(back["tag"]) == {"A", "B", "C"}
    assert all(len(v) == 8 for v in back["vector"])


def test_full_pipeline_artifacts(tmp_path):
    """E1+E2+E3 composition writes all six Parquet artifact tables (incl.
    the nested adjacency index) and the learned-embedding scorer attaches
    scores to every triple."""
    from bio_re_with_entity_embeddings_ray.pipelines import kg

    counts = kg.full_pipeline(
        "/root/testdata/sf0.001", str(tmp_path / "kg"), num_buckets=4, embedding_dim=16
    )
    assert set(counts) == {
        "nodes", "triples", "doc2vec_input", "embeddings", "scored", "adjacency"
    }
    assert counts["adjacency"] > 0
    assert counts["scored"] == counts["triples"] > 0
    assert counts["embeddings"] > 0
    scored = rd.read_parquet(str(tmp_path / "kg" / "scored")).to_pandas()
    assert "score" in scored.columns
    # cosine over nonnegative PPMI vectors: never negative, and entity
    # pairs sharing document vocabulary score positive for most pairs
    assert (scored["score"] >= 0).all()
    assert (scored["score"] > 0).mean() > 0.5
