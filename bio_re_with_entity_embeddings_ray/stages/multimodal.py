"""Multimodal (binary-column) stages.

The reference pipeline is text-only, but a 100 TB training-data engine must
carry image/audio/video payloads through the same Dataset plumbing. Media
travel as opaque Arrow ``binary`` columns plus typed metadata (kind, width,
height); every transform below is an actor-pool ``map_batches`` stage so a
real decoder (PIL / libav) would be loaded ONCE per actor in ``__init__``.

General decode libraries are not in this container, so decode has two
real-ness levels, both deterministic and documented:

- ``real_decode=True``  -> ACTUAL pixel decode: PIL if importable, else
  the built-in pure-numpy binary-PPM (P6) codec below — payloads that
  start with ``P6`` are decoded to H x W x 3 uint8 pixels and
  featurized/resized from the pixels; non-PPM payloads in the same batch
  fall back to the metadata stub per row (a production build dispatches
  per codec at the same point);
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


# ------------------------------------------------------------------ PPM codec
# Pure-numpy binary-PPM (P6): the no-dependency real decoder behind
# real_decode=True. PPM is the simplest real image container (netpbm);
# a production deployment swaps PIL/libav in at the same hook.


def encode_ppm(rgb: np.ndarray) -> bytes:
    """H x W x 3 uint8 pixels -> binary PPM (P6) bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"encode_ppm expects HxWx3, got {rgb.shape}")
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        rgb, dtype=np.uint8
    ).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) bytes -> (width, height, H x W x 3 uint8). Handles
    arbitrary whitespace and '#' comments in the header."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, n, vals = 2, len(payload), []
    while len(vals) < 3:
        if pos >= n:
            raise ValueError("truncated PPM header")
        ch = payload[pos : pos + 1]
        if ch.isspace():
            pos += 1
        elif ch == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
        else:
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval, then raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    if n - pos < w * h * 3:
        raise ValueError("truncated PPM raster")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, data.reshape(h, w, 3)


def _is_ppm(payload: bytes) -> bool:
    return payload[:2] == b"P6"


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
    ``real_decode`` the actor loads PIL when importable and otherwise the
    built-in pure-numpy PPM codec; PPM payloads are then decoded and
    their width/height/aspect come from the PIXELS (non-PPM rows fall
    back to metadata per row). Without it, features are deterministic
    functions of (payload length, metadata): ``n_bytes``, ``aspect_bp``
    = width*10000//height.
    """

    def __init__(self, real_decode: bool = False):
        self.decode = None
        if real_decode:
            try:  # pragma: no cover - library absent in this container
                import PIL.Image  # noqa: F401
                import io

                def _pil_decode(payload: bytes):
                    img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
                    a = np.asarray(img, dtype=np.uint8)
                    return img.width, img.height, a

                self.decode = _pil_decode
            except ImportError:
                self.decode = decode_ppm  # built-in no-dependency codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_bytes = pc.binary_length(batch["payload"]).cast(pa.int64())
        w = batch["width"].to_numpy().astype(np.int64).copy()
        h = batch["height"].to_numpy().astype(np.int64).copy()
        if self.decode is not None:
            for i, payload in enumerate(batch["payload"].to_pylist()):
                if _is_ppm(payload):
                    dw, dh, _ = self.decode(payload)
                    w[i], h[i] = dw, dh
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kind": batch["kind"],
                "n_bytes": n_bytes,
                "width": pa.array(w.astype(np.int32), pa.int32()),
                "height": pa.array(h.astype(np.int32), pa.int32()),
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
    aspect). Without ``real_decode`` the pixel operation is faked as
    payload truncation to new_width*new_height bytes; with it, PPM
    payloads are decoded (built-in numpy codec), nearest-neighbor
    downsampled to the SAME target box (dimensions taken from the decoded
    raster, not the metadata) and re-encoded as PPM — a full
    decode -> transform -> encode loop with zero external dependencies.
    """

    def __init__(self, max_dim: int = 32, real_decode: bool = False):
        self.max_dim = max_dim
        self.real_decode = real_decode

    @staticmethod
    def _fit(w, h, md):
        scale_w = np.where(w >= h, md, w * md // h)
        scale_h = np.where(w >= h, h * md // w, md)
        over = np.maximum(w, h) > md
        nw = np.where(over, np.maximum(scale_w, 1), w).astype(np.int64)
        nh = np.where(over, np.maximum(scale_h, 1), h).astype(np.int64)
        return nw, nh

    def _resize_ppm(self, payload: bytes) -> tuple[bytes, int, int]:
        w, h, img = decode_ppm(payload)
        nw, nh = self._fit(np.array([w]), np.array([h]), self.max_dim)
        nw, nh = int(nw[0]), int(nh[0])
        ys = (np.arange(nh, dtype=np.int64) * h) // nh
        xs = (np.arange(nw, dtype=np.int64) * w) // nw
        small = img[ys][:, xs]
        return encode_ppm(small), nw, nh

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.int64)
        h = batch["height"].to_numpy().astype(np.int64)
        nw, nh = self._fit(w, h, self.max_dim)
        payloads = batch["payload"].to_pylist()
        cap = nw * nh
        out = [p[: int(c)] for p, c in zip(payloads, cap)]
        if self.real_decode:
            for i, p in enumerate(payloads):
                if _is_ppm(p):
                    out[i], rw, rh = self._resize_ppm(p)
                    nw[i], nh[i] = rw, rh
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


def resize_media(media, max_dim: int = 32, concurrency: int = 4, real_decode: bool = False):
    """media -> resized media via a MediaResizer actor pool."""
    return media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_dim": max_dim, "real_decode": real_decode},
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


# ------------------------------------------------------------------ WAV codec
# Pure-numpy RIFF/WAVE PCM16 mono: the no-dependency real AUDIO decoder.
# WAV is the simplest real audio container; the same actor seam swaps in
# soundfile/librosa when present (neither is in this sandbox).


def encode_wav(pcm: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE (PCM16 LE) bytes."""
    import struct

    if pcm.dtype != np.int16:
        raise ValueError(f"encode_wav expects int16, got {pcm.dtype}")
    data = pcm.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE (PCM16 LE mono) bytes -> (sample_rate, int16 samples).
    A real header parse — bad magic, compression, or truncation raise."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    fmt_size, audio_fmt, channels, sample_rate = struct.unpack(
        "<IHHI", payload[16:28]
    )
    bits = struct.unpack("<H", payload[34:36])[0]
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 mono supported (fmt={audio_fmt}, ch={channels}, bits={bits})"
        )
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    n_bytes = struct.unpack("<I", payload[40:44])[0]
    raw = payload[44 : 44 + n_bytes]
    if len(raw) < n_bytes:
        raise ValueError("truncated WAV raster")
    return sample_rate, np.frombuffer(raw, dtype="<i2")


def _is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def attach_audio(docs) -> "object":
    """documents(doc_id, ...) -> audio(doc_id, payload) with REAL WAV bytes.

    Deterministic synthetic PCM (mirrored arithmetically by the SQL
    oracle, which cannot parse WAV): ``n = 256 + (doc_id % 16) * 32``
    samples at ``sr = 8000 + (doc_id % 3) * 4000`` Hz, sample
    ``x[i] = ((doc_id * 31 + i * 7) % 65536) - 32768``. Because the
    oracle recomputes features from this formula while the ENGINE only
    sees the encoded container, the comparison validates the actual
    header parse + PCM decode end to end."""

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        payloads = []
        for did in ids:
            n = 256 + (int(did) % 16) * 32
            sr = 8000 + (int(did) % 3) * 4000
            i = np.arange(n, dtype=np.int64)
            x = ((int(did) * 31 + i * 7) % 65536 - 32768).astype(np.int16)
            payloads.append(encode_wav(x, sr))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


class AudioFeaturizer:
    """Actor-pool stage: audio(doc_id, payload) -> per-clip feature row
    (sample_rate, n_samples, duration_ms, rms_milli, peak) from the
    DECODED samples. ``rms_milli = floor(sqrt(sum(x^2)/n) * 1000)`` —
    the sum of squares is exact int64, only the final sqrt is float, so
    the SQL oracle agrees (same discipline as the bp projections)."""

    def __init__(self):
        self.decode = decode_wav  # the once-per-actor codec load seam

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        out = {k: [] for k in ("sample_rate", "n_samples", "duration_ms",
                               "rms_milli", "peak")}
        for payload in batch["payload"].to_pylist():
            sr, x = self.decode(payload)
            xi = x.astype(np.int64)
            n = len(xi)
            ss = int((xi * xi).sum())
            out["sample_rate"].append(sr)
            out["n_samples"].append(n)
            out["duration_ms"].append(n * 1000 // sr)
            out["rms_milli"].append(
                int(np.floor(np.sqrt(ss / n) * 1000)) if n else 0
            )
            out["peak"].append(int(np.abs(xi).max()) if n else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                **{k: pa.array(v, pa.int64()) for k, v in out.items()},
            }
        )


def featurize_audio(audio, concurrency: int = 4):
    """audio -> features via an AudioFeaturizer actor pool."""
    return audio.map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )
