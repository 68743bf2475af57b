"""Multimodal (binary-column) stage tests: real Ray plumbing — schema,
actor-pool signatures, 1->N frame fan-out — with the decode step stubbed
deterministically (the libraries are absent by design)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from bio_re_with_entity_embeddings_ray.stages import multimodal as mm


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    ["alpha beta", "x" * 700, "y" * 600, "short", "zz", "v" * 300],
                    pa.string(),
                ),
            }
        )
    )


def test_attach_media_schema_and_determinism():
    media = mm.attach_media(_docs()).take_all()
    assert [r["kind"] for r in media] == [
        "image", "audio", "video", "image", "audio", "video",
    ]
    r0 = media[0]
    assert r0["payload"] == b"alpha beta"
    assert r0["width"] == 16 and r0["height"] == 16
    # payload is a real binary column
    sch = mm.attach_media(_docs()).schema()
    assert sch.types[sch.names.index("payload")] == pa.binary()


def test_featurizer_actor_pool_features():
    feats = {r["doc_id"]: r for r in mm.featurize_media(mm.attach_media(_docs()), concurrency=2).take_all()}
    assert feats[1]["n_bytes"] == 700
    assert feats[3]["aspect_bp"] == (16 + 3) * 10000 // (16 + 3 % 33)
    assert set(feats[0].keys()) == {
        "doc_id", "kind", "n_bytes", "width", "height", "aspect_bp",
    }


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.MediaFeaturizer(real_decode=True)
    with pytest.raises(NotImplementedError):
        mm.MediaResizer(real_decode=True)


def test_frame_sampler_fanout_and_bytes():
    frames = mm.sample_frames(mm.attach_media(_docs()), concurrency=2).take_all()
    # only 'video' docs (ids 2, 5) produce frames
    assert {r["doc_id"] for r in frames} == {2, 5}
    d2 = sorted((r for r in frames if r["doc_id"] == 2), key=lambda r: r["frame_idx"])
    # 600 bytes -> frames 0,1,2 of 256/256/88; stride 2 keeps 0 and 2
    assert [r["frame_idx"] for r in d2] == [0, 2]
    assert [r["n_bytes"] for r in d2] == [256, 88]
    assert d2[0]["frame"] == b"y" * 256
    assert d2[1]["frame"] == b"y" * 88


def test_resize_fits_bounding_box_and_truncates_payload():
    rows = {r["doc_id"]: r for r in mm.resize_media(mm.attach_media(_docs()), max_dim=20).take_all()}
    # doc 4: w=16+4=20, h=16+4=20 -> fits, unchanged
    assert (rows[4]["width"], rows[4]["height"]) == (20, 20)
    # doc 1: w=17, h=17 -> fits; doc 5: w=21, h=21 -> scaled to 20x20
    assert (rows[5]["width"], rows[5]["height"]) == (20, 20)
    assert rows[5]["n_bytes"] == min(300, 20 * 20)
    assert len(rows[5]["payload"]) == rows[5]["n_bytes"]
