"""Multimodal (binary-column) stages.

The reference pipeline is text-only, but a 100 TB training-data engine must
carry image/audio/video payloads through the same Dataset plumbing. Media
travel as opaque Arrow ``binary`` columns plus typed metadata (kind, width,
height); every transform below is an actor-pool ``map_batches`` stage so a
real decoder (PIL / libav) would be loaded ONCE per actor in ``__init__``.

Those decode libraries are not in this container, so the *decode* step is
stubbed two ways, both deterministic and documented:

- ``real_decode=True``  -> ``NotImplementedError`` at actor construction
  (the production hook point: swap in PIL/torchaudio there);
- ``real_decode=False`` -> a deterministic fake "decode" computed purely
  from the payload bytes + metadata, so schemas, batch sizing, actor
  signatures and output layout are all real and oracle-testable.

Media batches are large per row: callers should pass a small
``batch_size`` (``MEDIA_BATCH_SIZE``) so batch x concurrency fits in a
worker heap (SURVEY.md: memory-aware batch sizing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Small batches: rows carry whole payloads. At 100 TB, payload blocks are
# further bounded by DataContext.target_max_block_size + block splitting.
MEDIA_BATCH_SIZE = 256

FRAME_BYTES = 256  # fake "frame" size for video payloads
FRAME_STRIDE = 2  # sample every 2nd frame

_KINDS = np.array(["image", "audio", "video"])


def attach_media(docs) -> "object":
    """documents(doc_id, text) -> media(doc_id, kind, payload, width, height).

    Deterministic synthetic media table: the payload is the document text's
    UTF-8 bytes (stands in for encoded pixels/samples); kind and dimensions
    derive from doc_id alone. This is the engine's canonical media schema —
    a production source would read the same shape from object storage with
    ``ray.data.read_parquet`` / ``read_binary_files``.
    """

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "kind": pa.array(_KINDS[ids % 3], pa.string()),
                "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
                "width": pa.array(16 + ids % 49, pa.int32()),
                "height": pa.array(16 + ids % 33, pa.int32()),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


class MediaFeaturizer:
    """Actor-pool stage: media -> per-item feature row.

    ``__init__`` is the once-per-actor model/codec load point. With
    ``real_decode`` the constructor demands a decoder library (absent in
    this container -> NotImplementedError, the documented stub); otherwise
    features are deterministic functions of (payload length, metadata):
    ``n_bytes``, ``aspect_bp`` = width*10000//height.
    """

    def __init__(self, real_decode: bool = False):
        self.decoder = None
        if real_decode:
            try:  # pragma: no cover - library absent by design
                import PIL.Image as decoder  # noqa: F401

                self.decoder = decoder
            except ImportError:
                raise NotImplementedError(
                    "real media decode requires an image/audio library "
                    "(PIL/torchaudio) not present in this environment; "
                    "run with real_decode=False for the deterministic stub"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_bytes = pc.binary_length(batch["payload"]).cast(pa.int64())
        w = batch["width"].to_numpy().astype(np.int64)
        h = batch["height"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kind": batch["kind"],
                "n_bytes": n_bytes,
                "width": batch["width"],
                "height": batch["height"],
                "aspect_bp": pa.array(w * 10000 // h, pa.int64()),
            }
        )


def featurize_media(media, concurrency: int = 4, real_decode: bool = False):
    """media -> features via a MediaFeaturizer actor pool."""
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"real_decode": real_decode},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool stage: video payloads -> sampled frame rows (1->N flat map).

    A payload is cut into FRAME_BYTES-sized frames; every FRAME_STRIDE-th
    frame is emitted as its own row ``(doc_id, frame_idx, frame, n_bytes)``.
    Real video decoding would replace the byte-slicing in ``_frames`` only;
    the fan-out/actor/output plumbing is production-shaped.
    """

    def __init__(self, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def _frames(self, payload: bytes):
        fb = self.frame_bytes
        n = (len(payload) + fb - 1) // fb
        for i in range(0, n, self.stride):
            yield i, payload[i * fb : (i + 1) * fb]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        mask = np.asarray(batch["kind"].to_numpy(zero_copy_only=False) == "video")
        for doc_id, payload in zip(
            batch["doc_id"].to_numpy()[mask],
            np.asarray(batch["payload"].to_pylist(), dtype=object)[mask],
        ):
            for i, fr in self._frames(payload):
                ids.append(doc_id)
                idxs.append(i)
                frames.append(fr)
        frame_arr = pa.array(frames, pa.binary())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": frame_arr,
                "n_bytes": pa.compute.binary_length(frame_arr).cast(pa.int64())
                if len(frames)
                else pa.array([], pa.int64()),
            }
        )


def sample_frames(media, concurrency: int = 4):
    """media -> sampled video frames via a FrameSampler actor pool."""
    return media.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


class MediaResizer:
    """Actor-pool stage: fit media into a ``max_dim`` bounding box.

    Metadata math is the real resize contract (integer scale preserving
    aspect); the pixel operation is faked as payload truncation to
    new_width*new_height bytes. ``real_decode=True`` is the PIL hook and
    raises NotImplementedError here, like MediaFeaturizer.
    """

    def __init__(self, max_dim: int = 32, real_decode: bool = False):
        if real_decode:
            raise NotImplementedError(
                "real resize requires PIL; use real_decode=False for the stub"
            )
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.int64)
        h = batch["height"].to_numpy().astype(np.int64)
        md = self.max_dim
        scale_w = np.where(w >= h, md, w * md // h)
        scale_h = np.where(w >= h, h * md // w, md)
        over = np.maximum(w, h) > md
        nw = np.where(over, scale_w, w).astype(np.int64)
        nh = np.where(over, scale_h, h).astype(np.int64)
        payloads = batch["payload"].to_pylist()
        cap = nw * nh
        out = [p[: int(c)] for p, c in zip(payloads, cap)]
        out_arr = pa.array(out, pa.binary())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kind": batch["kind"],
                "payload": out_arr,
                "width": pa.array(nw, pa.int32()),
                "height": pa.array(nh, pa.int32()),
                "n_bytes": pa.compute.binary_length(out_arr).cast(pa.int64()),
            }
        )


def resize_media(media, max_dim: int = 32, concurrency: int = 4):
    """media -> resized media via a MediaResizer actor pool."""
    return media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_dim": max_dim},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


def media_stats(media):
    """Oracle-comparable projection of the media table (blob excluded —
    its identity is carried by n_bytes)."""

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kind": batch["kind"],
                "n_bytes": pc.binary_length(batch["payload"]).cast(pa.int64()),
                "width": batch["width"],
                "height": batch["height"],
            }
        )

    return media.map_batches(project, batch_format="pyarrow")
