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


def _gradient_rgb(w: int, h: int):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)), (x + y) % 256],
        axis=2,
    ).astype(np.uint8)


def test_ppm_codec_roundtrip_and_comments():
    import numpy as np

    img = _gradient_rgb(7, 5)
    payload = mm.encode_ppm(img)
    w, h, back = mm.decode_ppm(payload)
    assert (w, h) == (7, 5)
    assert np.array_equal(back, img)
    # header tolerance: comments + extra whitespace
    hdr = b"P6\n# a comment\n 7  5 \n# another\n255\n" + payload.split(b"255\n", 1)[1]
    w2, h2, back2 = mm.decode_ppm(hdr)
    assert (w2, h2) == (7, 5) and np.array_equal(back2, img)
    with pytest.raises(ValueError):
        mm.decode_ppm(b"JFIF....")
    with pytest.raises(ValueError):
        mm.decode_ppm(payload[:-4])  # truncated raster


def _ppm_media(imgs):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(imgs))), pa.int64()),
                "kind": pa.array(["image"] * len(imgs), pa.string()),
                "payload": pa.array([mm.encode_ppm(i) for i in imgs], pa.binary()),
                # metadata deliberately WRONG so the test proves dimensions
                # come from the decoded pixels on the real path
                "width": pa.array([1] * len(imgs), pa.int32()),
                "height": pa.array([1] * len(imgs), pa.int32()),
            }
        )
    )


def test_real_decode_featurize_and_resize_ppm():
    import numpy as np

    imgs = [_gradient_rgb(48, 24), _gradient_rgb(10, 40), _gradient_rgb(8, 8)]
    media = _ppm_media(imgs)
    feats = {r["doc_id"]: r for r in mm.featurize_media(media, real_decode=True).take_all()}
    assert (feats[0]["width"], feats[0]["height"]) == (48, 24)
    assert (feats[1]["width"], feats[1]["height"]) == (10, 40)
    assert feats[0]["aspect_bp"] == 48 * 10000 // 24

    rows = {r["doc_id"]: r for r in mm.resize_media(media, max_dim=16, real_decode=True).take_all()}
    # 48x24 -> 16x8; 10x40 -> 4x16; 8x8 fits untouched
    assert (rows[0]["width"], rows[0]["height"]) == (16, 8)
    assert (rows[1]["width"], rows[1]["height"]) == (4, 16)
    assert (rows[2]["width"], rows[2]["height"]) == (8, 8)
    w, h, small = mm.decode_ppm(rows[0]["payload"])
    assert (w, h) == (16, 8)
    # nearest-neighbor contract: sampled pixels equal source pixels
    src = imgs[0]
    ys = (np.arange(8) * 24) // 8
    xs = (np.arange(16) * 48) // 16
    assert np.array_equal(small, src[ys][:, xs])
    # untouched image round-trips bit-exact
    assert rows[2]["payload"] == mm.encode_ppm(imgs[2])


def test_real_decode_falls_back_per_row_for_non_ppm():
    # mixed batch: non-PPM payloads keep the metadata stub path
    feats = {r["doc_id"]: r for r in mm.featurize_media(mm.attach_media(_docs()), real_decode=True).take_all()}
    assert feats[1]["n_bytes"] == 700
    assert (feats[0]["width"], feats[0]["height"]) == (16, 16)


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


def test_wav_roundtrip_and_validation():
    import numpy as np
    import pytest

    from bio_re_with_entity_embeddings_ray.stages.multimodal import (
        decode_wav,
        encode_wav,
    )

    x = ((np.arange(512) * 7 + 42 * 31) % 65536 - 32768).astype(np.int16)
    payload = encode_wav(x, 12000)
    sr, y = decode_wav(payload)
    assert sr == 12000 and (x == y).all()
    with pytest.raises(ValueError):
        decode_wav(b"OGGS" + payload[4:])  # bad magic
    with pytest.raises(ValueError):
        decode_wav(payload[:50])  # truncated raster


def test_audio_features_from_decoded_samples(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import multimodal

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64), "text": [""] * 20})
    )
    out = (
        multimodal.featurize_audio(multimodal.attach_audio(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for did in (0, 7, 19):
        n = 256 + (did % 16) * 32
        sr = 8000 + (did % 3) * 4000
        i = np.arange(n, dtype=np.int64)
        x = (did * 31 + i * 7) % 65536 - 32768
        row = out[out["doc_id"] == did].iloc[0]
        assert row["n_samples"] == n and row["sample_rate"] == sr
        assert row["duration_ms"] == n * 1000 // sr
        assert row["peak"] == np.abs(x).max()
        assert row["rms_milli"] == int(np.floor(np.sqrt((x * x).sum() / n) * 1000))


def test_png_roundtrip_and_filters():
    """Roundtrip our encoder, then hand-filter scanlines with every PNG
    filter type (Sub/Up/Average/Paeth) and check the decoder reconstructs
    the same pixels — the decoder must read real adaptive-filter PNGs,
    not just its own filter-0 output."""
    import struct
    import zlib

    import numpy as np

    from bio_re_with_entity_embeddings_ray.stages import multimodal as mm

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert mm.decode_png(mm.encode_png(rgb))[2].tolist() == rgb.tolist()

    # hand-build a PNG whose rows use filters 1..4 (+0 for row 0)
    h, w = rgb.shape[:2]
    bpp, filters = 3, [0, 1, 2, 3, 4, 0][:h]
    lines = []
    prior = np.zeros(w * bpp, dtype=np.int64)
    for y, flt in enumerate(filters):
        cur = rgb[y].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        pleft = np.concatenate([np.zeros(bpp, np.int64), prior[:-bpp]])
        if flt == 0:
            f = cur
        elif flt == 1:
            f = cur - left
        elif flt == 2:
            f = cur - prior
        elif flt == 3:
            f = cur - (left + prior) // 2
        else:
            p = left + prior - pleft
            pa_, pb, pc_ = abs(p - left), abs(p - prior), abs(p - pleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prior, pleft)
            )
            f = cur - pred
        lines.append(bytes([flt]) + (f % 256).astype(np.uint8).tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + mm._png_chunk(b"IEND", b"")
    )
    dw, dh, got = mm.decode_png(payload)
    assert (dw, dh) == (w, h)
    assert got.tolist() == rgb.tolist()


def test_png_rejects_bad_payloads():
    import numpy as np
    import pytest

    from bio_re_with_entity_embeddings_ray.stages import multimodal as mm

    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"JUNK")
    good = mm.encode_png(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(ValueError):
        mm.decode_png(good[:30])  # truncated chunk


def test_image_features_formula(ray_session):
    """Engine decodes the real PNG container; expected values recomputed
    from the attach_images pixel formula (the oracle's view)."""
    import numpy as np
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.stages import multimodal as mm

    docs = rd.from_items([{"doc_id": i} for i in range(12)])
    got = {r["doc_id"]: r for r in mm.image_features(docs, concurrency=2).take_all()}
    for did in range(12):
        w, h = 4 + did % 5, 3 + did % 4
        j = np.arange(w * h * 3, dtype=np.int64)
        s = int(((did * 7 + j * 11) % 256).sum())
        r = got[did]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["sum_rgb"] == s and r["mean_milli"] == 1000 * s // (w * h * 3)


def test_apng_roundtrip_and_multi_fdat():
    """encode_apng -> decode_apng is exact per frame; a plain PNG decodes
    as one frame; fdAT frames split across multiple chunks reassemble."""
    import struct
    import zlib

    import numpy as np

    from bio_re_with_entity_embeddings_ray.stages.multimodal import (
        _PNG_SIG, _png_chunk, decode_apng, encode_apng, encode_png,
    )

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (4, 6, 3)).astype(np.uint8) for _ in range(3)]
    w, h, out = decode_apng(encode_apng(frames))
    assert (w, h, len(out)) == (6, 4, 3)
    for a, b in zip(frames, out):
        assert (a == b).all()

    w, h, out = decode_apng(encode_png(frames[0]))
    assert len(out) == 1 and (out[0] == frames[0]).all()

    # hand-build an APNG whose second frame spans TWO fdAT chunks
    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0)
    def raw(f):
        return np.concatenate(
            [np.zeros((4, 1), np.uint8), f.reshape(4, 18)], axis=1
        ).tobytes()
    z2 = zlib.compress(raw(frames[1]))
    cut = len(z2) // 2
    fctl = lambda seq: struct.pack(">IIIIIHHBB", seq, 6, 4, 0, 0, 1, 10, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"acTL", struct.pack(">II", 2, 0))
        + _png_chunk(b"fcTL", fctl(0))
        + _png_chunk(b"IDAT", zlib.compress(raw(frames[0])))
        + _png_chunk(b"fcTL", fctl(1))
        + _png_chunk(b"fdAT", struct.pack(">I", 2) + z2[:cut])
        + _png_chunk(b"fdAT", struct.pack(">I", 3) + z2[cut:])
        + _png_chunk(b"IEND", b"")
    )
    w, h, out = decode_apng(payload)
    assert len(out) == 2
    assert (out[0] == frames[0]).all() and (out[1] == frames[1]).all()


def test_apng_frame_features_samples_every_other_frame(ray_session):
    import ray.data as rd
    import pandas as pd

    from bio_re_with_entity_embeddings_ray.stages.multimodal import (
        apng_frame_features,
    )

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [0, 1, 2, 7]}))
    got = apng_frame_features(docs).to_pandas().sort_values(
        ["doc_id", "frame_idx"]
    ).reset_index(drop=True)
    # n_frames = 2 + doc_id % 3 -> sampled idx {0} for n=2, {0,2} for n=3,4
    import numpy as np
    exp = []
    for did in (0, 1, 2, 7):
        w, h, n = 4 + did % 5, 3 + did % 4, 2 + did % 3
        for f in range(0, n, 2):
            j = np.arange(w * h * 3, dtype=np.int64)
            s = int(((did * 7 + f * 13 + j * 11) % 256).sum())
            exp.append((did, f, w, h, s, 1000 * s // (w * h * 3)))
    exp = pd.DataFrame(
        exp, columns=["doc_id", "frame_idx", "width", "height",
                      "sum_rgb", "mean_milli"]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
