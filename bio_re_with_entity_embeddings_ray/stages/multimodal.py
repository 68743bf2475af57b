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
                # built-in no-dependency codecs (PPM + stdlib-zlib PNG)
                def _builtin_decode(payload: bytes):
                    if _is_ppm(payload):
                        return decode_ppm(payload)
                    return decode_png(payload)

                self.decode = _builtin_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_bytes = pc.binary_length(batch["payload"]).cast(pa.int64())
        w = batch["width"].to_numpy().astype(np.int64).copy()
        h = batch["height"].to_numpy().astype(np.int64).copy()
        if self.decode is not None:
            for i, payload in enumerate(batch["payload"].to_pylist()):
                if _is_ppm(payload) or _is_png(payload):
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


# ------------------------------------------------------------------ PNG codec
# Pure-stdlib (zlib) RGB8 PNG: the real image container next to the PPM
# teaching codec — gives the image path the same "actual bytes parsed"
# status as the audio family's RIFF/WAV codec (round-3 review item). The
# decoder handles all five PNG scanline filters, so it reads PNGs from
# real adaptive-filter encoders, not just its own output.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """H x W x 3 uint8 pixels -> 8-bit truecolor PNG bytes (filter 0
    scanlines, one zlib-deflated IDAT)."""
    import struct
    import zlib

    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError(f"encode_png expects HxWx3 uint8, got {rgb.shape}")
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8, no interlace
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(flt: int, line: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one scanline (int32 in, uint8 out). None/Up are vector
    adds, Sub is a per-channel cumsum mod 256; Average/Paeth depend on the
    reconstructed left neighbor and run a per-pixel loop (they only occur
    in externally-encoded PNGs — our encoder writes filter 0)."""
    n = len(line)
    if flt == 0:
        return line.astype(np.uint8)
    if flt == 2:
        return ((line + prior) % 256).astype(np.uint8)
    if flt == 1:
        out = line.reshape(-1, bpp)
        return (np.cumsum(out, axis=0, dtype=np.int64) % 256).astype(
            np.uint8
        ).reshape(n)
    out = np.zeros(n, dtype=np.int64)
    if flt == 3:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (line[i] + (left + prior[i]) // 2) % 256
        return out.astype(np.uint8)
    if flt == 4:
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            out[i] = (line[i] + pred) % 256
        return out.astype(np.uint8)
    raise ValueError(f"unknown PNG filter {flt}")


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes -> (width, height, H x W x 3 uint8). Supports 8-bit
    truecolor (color type 2), no interlace, multi-IDAT, all five scanline
    filters; anything else (palette, alpha, 16-bit, truncation) raises."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    h = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"only 8-bit truecolor non-interlaced PNG supported "
                    f"(depth={depth}, color={ctype}, interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * 3 + 1
    if len(raw) != h * stride:
        raise ValueError("PNG raster size mismatch")
    raw = raw.reshape(h, stride).astype(np.int32)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    prior = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        rec = _png_unfilter(int(raw[y, 0]), raw[y, 1:].astype(np.int64), prior, 3)
        out[y] = rec
        prior = rec.astype(np.int64)
    return w, h, out.reshape(h, w, 3)


def _is_png(payload: bytes) -> bool:
    return payload[: len(_PNG_SIG)] == _PNG_SIG


def attach_images(docs) -> "object":
    """documents(doc_id, ...) -> images(doc_id, payload) with REAL PNG
    bytes. Deterministic synthetic RGB (mirrored arithmetically by the
    SQL oracle, which cannot inflate a PNG): ``w = 4 + doc_id % 5``,
    ``h = 3 + doc_id % 4``, flat pixel value
    ``v[j] = (doc_id * 7 + j * 11) % 256`` over j in [0, w*h*3). The
    oracle recomputes features from the formula while the ENGINE only
    sees the encoded container — the comparison validates the actual
    chunk parse + inflate + unfilter end to end (the audio family's
    attach_audio discipline)."""

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        payloads = []
        for did in ids:
            did = int(did)
            w, h = 4 + did % 5, 3 + did % 4
            j = np.arange(w * h * 3, dtype=np.int64)
            rgb = ((did * 7 + j * 11) % 256).astype(np.uint8).reshape(h, w, 3)
            payloads.append(encode_png(rgb))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


class ImageFeaturizer:
    """Actor-pool stage: images(doc_id, payload) -> per-image feature row
    (width, height, n_pixels, sum_rgb, mean_milli) from the DECODED
    pixels. ``mean_milli = 1000 * sum_rgb // (w*h*3)`` — exact int64, so
    the SQL oracle agrees without float ordering concerns."""

    def __init__(self):
        self.decode = decode_png  # the once-per-actor codec load seam

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("width", "height", "n_pixels", "sum_rgb",
                               "mean_milli")}
        for payload in batch["payload"].to_pylist():
            w, h, rgb = self.decode(payload)
            s = int(rgb.astype(np.int64).sum())
            out["width"].append(w)
            out["height"].append(h)
            out["n_pixels"].append(w * h)
            out["sum_rgb"].append(s)
            out["mean_milli"].append(1000 * s // (w * h * 3))
        cols = {"doc_id": batch["doc_id"]}
        cols.update({k: pa.array(v, pa.int64()) for k, v in out.items()})
        return pa.table(cols)


def image_features(docs, concurrency: int = 4):
    """documents -> attach_images -> ImageFeaturizer actor pool."""
    return attach_images(docs).map_batches(
        ImageFeaturizer,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


# ----------------------------------------------------------------- APNG
# Animated PNG: the real video-container decode path (round-5 verdict
# item — makes the multimodal family uniformly real alongside WAV/PNG).
# Reuses the round-4 stdlib-zlib PNG machinery: per the APNG spec each
# frame's data (the IDAT set for frame 0, the fdAT set per later frame)
# is its own complete zlib stream over filtered scanlines.


def encode_apng(frames: list[np.ndarray]) -> bytes:
    """List of H x W x 3 uint8 frames (same dims) -> APNG bytes
    (acTL + per-frame fcTL, frame 0 in IDAT, later frames in fdAT;
    full-frame replace: offsets 0, dispose/blend 0, filter 0 lines)."""
    import struct
    import zlib

    if not frames:
        raise ValueError("encode_apng needs at least one frame")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be identical HxWx3 uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, f in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0
        )  # seq, dims, offsets, delay 1/10s, dispose none, blend source
        out += _png_chunk(b"fcTL", fctl)
        seq += 1
        raw = np.concatenate(
            [np.zeros((h, 1), np.uint8), f.reshape(h, w * 3)], axis=1
        ).tobytes()
        z = zlib.compress(raw)
        if i == 0:
            out += _png_chunk(b"IDAT", z)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """APNG bytes -> (width, height, [H x W x 3 uint8 frame, ...]).
    Supports what :func:`encode_apng` writes plus multi-IDAT/multi-fdAT
    frames and all five scanline filters (via ``_png_unfilter``); a plain
    PNG (no acTL) decodes as a single frame. Palette/alpha/16-bit/
    interlaced payloads raise, as in :func:`decode_png`."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG/APNG payload")
    pos, w, h = len(_PNG_SIG), None, None
    streams: list[bytearray] = []  # one zlib stream per frame
    saw_fctl_after_idat = False
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated APNG chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    "only 8-bit truecolor non-interlaced APNG supported"
                )
        elif tag == b"fcTL":
            (fw, fh, fx, fy) = struct.unpack(">IIII", data[4:20])
            if (fw, fh, fx, fy) != (w, h, 0, 0):
                raise ValueError("only full-frame APNG regions supported")
            if streams:  # fcTL after frame 0's data opens the next frame
                saw_fctl_after_idat = True
        elif tag == b"IDAT":
            if not streams:
                streams.append(bytearray())
            streams[0].extend(data)
        elif tag == b"fdAT":
            if saw_fctl_after_idat:
                streams.append(bytearray())
                saw_fctl_after_idat = False
            if len(streams) < 2:
                raise ValueError("fdAT before any fcTL-opened frame")
            streams[-1].extend(data[4:])  # strip the sequence number
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not streams:
        raise ValueError("missing IHDR/IDAT")
    stride = w * 3 + 1
    frames = []
    for z in streams:
        raw = np.frombuffer(zlib.decompress(bytes(z)), dtype=np.uint8)
        if len(raw) != h * stride:
            raise ValueError("APNG frame raster size mismatch")
        raw = raw.reshape(h, stride).astype(np.int32)
        out = np.zeros((h, w * 3), dtype=np.uint8)
        prior = np.zeros(w * 3, dtype=np.int64)
        for y in range(h):
            rec = _png_unfilter(
                int(raw[y, 0]), raw[y, 1:].astype(np.int64), prior, 3
            )
            out[y] = rec
            prior = rec.astype(np.int64)
        frames.append(out.reshape(h, w, 3))
    return w, h, frames


def attach_videos(docs) -> "object":
    """documents(doc_id, ...) -> videos(doc_id, payload) with REAL APNG
    bytes. Deterministic synthetic frames (mirrored arithmetically by the
    SQL oracle, which cannot inflate an APNG): ``w = 4 + doc_id % 5``,
    ``h = 3 + doc_id % 4``, ``n_frames = 2 + doc_id % 3``, frame f pixel
    ``v[j] = (doc_id * 7 + f * 13 + j * 11) % 256`` over j in [0, w*h*3).
    The oracle recomputes per-frame features from the formula while the
    ENGINE only sees the encoded container — the green row proves the
    chunk parse + per-frame inflate + unfilter end to end."""

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        payloads = []
        for did in ids:
            did = int(did)
            w, h = 4 + did % 5, 3 + did % 4
            n = 2 + did % 3
            j = np.arange(w * h * 3, dtype=np.int64)
            frames = [
                ((did * 7 + f * 13 + j * 11) % 256)
                .astype(np.uint8).reshape(h, w, 3)
                for f in range(n)
            ]
            payloads.append(encode_apng(frames))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)


class ApngFrameSampler:
    """Actor-pool stage: videos(doc_id, payload) -> one row per SAMPLED
    decoded frame (every ``stride``-th): (doc_id, frame_idx, width,
    height, sum_rgb, mean_milli) — the ImageFeaturizer projection per
    frame, exact int64 so the SQL oracle agrees bit-for-bit."""

    def __init__(self, stride: int = FRAME_STRIDE):
        self.stride = stride
        self.decode = decode_apng  # once-per-actor codec seam

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("doc_id", "frame_idx", "width", "height",
                                "sum_rgb", "mean_milli")}
        for did, payload in zip(
            batch["doc_id"].to_numpy(), batch["payload"].to_pylist()
        ):
            w, h, frames = self.decode(payload)
            for f in range(0, len(frames), self.stride):
                s = int(frames[f].astype(np.int64).sum())
                cols["doc_id"].append(int(did))
                cols["frame_idx"].append(f)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["sum_rgb"].append(s)
                cols["mean_milli"].append(1000 * s // (w * h * 3))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in cols.items()}
        )


def apng_frame_features(docs, stride: int = FRAME_STRIDE, concurrency: int = 4):
    """documents -> attach_videos -> ApngFrameSampler actor pool."""
    return attach_videos(docs).map_batches(
        ApngFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )
