"""Multimodal (image/audio/video) column plumbing — real Ray-side topology,
with BOTH a deterministic fake backend and a real stdlib-codec backend.

Binary media travel as opaque ``binary`` columns with typed metadata
(mime, width/height or sample rate). Decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (payload bytes, not row count, bound the block).

Backends (VERDICT r4 next-round #8):
- ``backend="fake"``: features derived deterministically from payload
  bytes — the schema/batching/actor plumbing oracle, value-checked by
  the two oracled media gate queries.
- ``backend="real"``: actual decode via ``functions/codecs.py`` (pure
  stdlib: minimal PNG codec over zlib, WAV via ``wave``) — real pixel /
  sample features, real nearest-neighbor resize + re-encode, real
  chunk-walk frame splitting. When PIL / soundfile exist in a richer
  deployment they are preferred for the mimes the stdlib codecs don't
  cover (import-guarded in ``__init__``, once per actor; skip-tested
  here where they're absent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..text import fnv1a64

MEDIA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (binary payloads of varying size)."""
    gen = np.random.Generator(np.random.Philox(key=seed))
    ids = np.arange(n, dtype=np.int64)
    mimes = [["image/png", "image/jpeg", "audio/wav"][i % 3] for i in range(n)]
    payloads = [gen.integers(0, 256, size=int(gen.integers(64, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array((ids % 640 + 32).astype(np.int32), pa.int32()),
            "height": pa.array((ids % 480 + 32).astype(np.int32), pa.int32()),
        },
        schema=MEDIA,
    )


MEDIA_MIMES = ["image/png", "image/jpeg", "audio/wav"]

# real-backend synth rules (closed-form from doc_id/text so invariants can
# recompute expected pixel/sample stats WITHOUT going through the codec)
REAL_KINDS = ["image/png", "image/png;rgb", "audio/wav", "video/png-seq"]


def real_media_dims(doc_id: int) -> tuple[int, int]:
    return int(doc_id % 24 + 8), int(doc_id % 16 + 8)  # (w, h)


def real_media_bytes(text: str | None, n: int) -> np.ndarray:
    """The pre-codec ground truth: utf-8 text bytes tiled to length n
    (zeros for empty text). Pixel values / audio samples derive from
    this, so a decode that recovers them exactly proves the codec."""
    b = np.frombuffer((text or "").encode("utf-8"), np.uint8)
    if len(b) == 0:
        return np.zeros(n, np.uint8)
    reps = n // len(b) + 1
    return np.tile(b, reps)[:n]


def _real_payload(doc_id: int, text: str | None) -> tuple[str, bytes, int, int]:
    """(mime, payload, width, height) — real encoded media, 1:1 per doc.
    For audio, width carries the sample rate and height the frame count
    (the MEDIA schema's dims columns are modality-typed metadata)."""
    from ..functions.codecs import encode_png, encode_wav

    kind = REAL_KINDS[doc_id % 4]
    w, h = real_media_dims(doc_id)
    if kind == "image/png":
        arr = real_media_bytes(text, w * h).reshape(h, w)
        return "image/png", encode_png(arr), w, h
    if kind == "image/png;rgb":
        arr = real_media_bytes(text, w * h * 3).reshape(h, w, 3)
        return "image/png;rgb", encode_png(arr), w, h
    if kind == "audio/wav":
        n = int(doc_id % 500 + 100)
        rate = int(8000 + (doc_id % 4) * 4000)
        samples = (
            real_media_bytes(text, n).astype(np.int16) - 128
        ) * 256  # full int16 swing
        return "audio/wav", encode_wav(samples, rate), rate, n
    # video: n_frames concatenated PNGs, frame f's pixels offset by f
    n_frames = int(doc_id % 4 + 2)
    base = real_media_bytes(text, w * h)
    payload = b"".join(
        encode_png(((base.astype(np.int64) + f) % 256).astype(np.uint8).reshape(h, w))
        for f in range(n_frames)
    )
    return "video/png-seq", payload, w, h


def real_media_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """documents -> 1:1 REAL media table: payloads are actual PNG / WAV /
    concatenated-PNG bytes encoded from the closed-form byte rule above.
    Encode runs distributed (it is itself a real encode workload)."""
    from ..sources import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        mimes, payloads, ws, hs = [], [], [], []
        for i, t in zip(ids, texts):
            m, p, w, h = _real_payload(int(i), t)
            mimes.append(m)
            payloads.append(p)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(mimes, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(np.array(ws, np.int32), pa.int32()),
                "height": pa.array(np.array(hs, np.int32), pa.int32()),
            },
            schema=MEDIA,
        )

    # small batches: payload bytes, not row count, bound the block
    return docs.map_batches(to_media, batch_format="pyarrow", batch_size=256)


def media_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """documents -> 1:1 media table (the input-wired media-column path):
    payload = utf-8 text bytes, mime cycles by media_id, dims deterministic.
    Like the pages table, the 1:1 derivation keeps DuckDB oracles over
    ``documents`` valid for media pipelines (payload byte stats and digests
    are SQL-expressible via octet_length/md5)."""
    from ..sources import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mimes = np.array(MEDIA_MIMES, dtype=object)[ids % 3]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mime": pa.array(list(mimes), pa.string()),
                "payload": batch["text"].cast(pa.binary()),
                "width": pa.array((ids % 640 + 32).astype(np.int32), pa.int32()),
                "height": pa.array((ids % 480 + 32).astype(np.int32), pa.int32()),
            },
            schema=MEDIA,
        )

    return docs.map_batches(to_media, batch_format="pyarrow", batch_size=1024)


class DecodeFeaturesActor:
    """payload binary -> fixed-size feature vector + byte stats/digest.

    ``__init__`` is where a real backend would load its model/codec once per
    actor; ``__call__`` is per batch. The fake backend derives features
    deterministically from the payload hash (stable across processes);
    ``n_bytes``/``payload_md5`` are real and DuckDB-oracle-able."""

    def __init__(self, backend: str = "fake", feature_dim: int = FEATURE_DIM):
        self.backend = backend
        self.feature_dim = feature_dim
        if backend == "real":
            # once-per-actor codec setup: prefer PIL / soundfile when the
            # deployment has them; the stdlib codecs are always available
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                self._pil = None
            try:
                import soundfile  # noqa: F401

                self._soundfile = soundfile
            except ImportError:
                self._soundfile = None
        elif backend != "fake":
            raise ValueError(f"unknown backend {backend!r}")

    def _fake_features(self, payload: bytes) -> np.ndarray:
        gen = np.random.Generator(np.random.Philox(key=fnv1a64(payload)))
        return gen.standard_normal(self.feature_dim).astype(np.float32)

    def _real_features(self, payload: bytes, mime: str) -> np.ndarray:
        """Decode and extract a FEATURE_DIM summary: 8 scalar stats then an
        8-bin value histogram (density). Deterministic: plain numpy
        reductions over the decoded array."""
        from ..functions.codecs import decode_png, decode_wav, split_png_frames

        f = np.zeros(self.feature_dim, np.float32)
        if mime.startswith("image/png"):
            arr = decode_png(payload)
            chans = 1 if arr.ndim == 2 else arr.shape[2]
            vals = arr.astype(np.float64).ravel()
            f[:8] = [arr.shape[1], arr.shape[0], chans, vals.mean(), vals.std(),
                     vals.min(), vals.max(), np.median(vals)]
            hist = np.histogram(vals, bins=8, range=(0, 256))[0]
            f[8:16] = hist / max(1, len(vals))
            return f
        if mime.startswith("image/"):
            if self._pil is None:
                raise NotImplementedError(
                    f"mime {mime}: needs PIL (absent in this environment)"
                )
            import io

            arr = np.asarray(self._pil.open(io.BytesIO(payload)))
            vals = arr.astype(np.float64).ravel()
            chans = 1 if arr.ndim == 2 else arr.shape[2]
            f[:8] = [arr.shape[1], arr.shape[0], chans, vals.mean(), vals.std(),
                     vals.min(), vals.max(), np.median(vals)]
            f[8:16] = np.histogram(vals, bins=8, range=(0, 256))[0] / max(1, len(vals))
            return f
        if mime == "audio/wav":
            samples, rate = decode_wav(payload)
            ch = 1 if samples.ndim == 1 else samples.shape[1]
            vals = samples.astype(np.float64).ravel()
            zc = int(np.count_nonzero(np.diff(np.signbit(vals))))
            f[:8] = [len(samples), rate, ch, vals.mean(),
                     np.sqrt((vals ** 2).mean()), vals.min(), vals.max(), zc]
            f[8:16] = np.histogram(vals, bins=8, range=(-32768, 32768))[0] / max(1, len(vals))
            return f
        if mime.startswith("audio/"):
            if self._soundfile is None:
                raise NotImplementedError(
                    f"mime {mime}: needs soundfile (absent in this environment)"
                )
            import io

            vals, rate = self._soundfile.read(io.BytesIO(payload))
            vals = np.asarray(vals, np.float64).ravel()
            f[:8] = [len(vals), rate, 1, vals.mean(),
                     np.sqrt((vals ** 2).mean()), vals.min(), vals.max(), 0]
            return f
        if mime == "video/png-seq":
            frames = split_png_frames(payload)
            first = decode_png(frames[0])
            vals = first.astype(np.float64).ravel()
            f[:8] = [first.shape[1], first.shape[0], len(frames), vals.mean(),
                     vals.std(), vals.min(), vals.max(), np.median(vals)]
            f[8:16] = np.histogram(vals, bins=8, range=(0, 256))[0] / max(1, len(vals))
            return f
        raise NotImplementedError(f"mime {mime}: no codec")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        payloads = batch["payload"].to_pylist()
        zero = np.zeros(self.feature_dim, np.float32)
        if self.backend == "real":
            mimes = batch["mime"].to_pylist()
            rows = [
                self._real_features(p, m) if p is not None else zero
                for p, m in zip(payloads, mimes)
            ]
        else:
            # null payloads -> null stats/digest (matches SQL md5(NULL) IS
            # NULL) and a zero feature vector
            rows = [
                self._fake_features(p) if p is not None else zero
                for p in payloads
            ]
        feats = (
            np.stack(rows) if rows else np.empty((0, self.feature_dim), np.float32)
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "n_bytes": pa.array(
                    [len(p) if p is not None else None for p in payloads], pa.int64()
                ),
                "payload_md5": pa.array(
                    [hashlib.md5(p).hexdigest() if p is not None else None for p in payloads],
                    pa.string(),
                ),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), self.feature_dim
                ),
            }
        )


def decode_features(
    media: "ray.data.Dataset",
    backend: str = "fake",
    batch_size: int = 32,           # small: payload bytes bound the block
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return media.map_batches(
        DecodeFeaturesActor,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ResizeActor:
    """image payload -> resized payload with updated dims (actor pool; a
    real backend decodes + resamples per batch; the fake backend derives a
    deterministic fixed-size payload from the source bytes so downstream
    schema/size invariants are testable)."""

    def __init__(self, width: int = 64, height: int = 64, backend: str = "fake"):
        self.backend = backend
        self.width, self.height = width, height
        self.out_bytes = max(16, (width * height) // 64)  # fake: bounded thumbnail

    def _real_resize(self, payload: bytes) -> bytes:
        """decode -> nearest-neighbor resample -> re-encode (all real)."""
        from ..functions.codecs import decode_png, encode_png

        arr = decode_png(payload)
        h, w = arr.shape[:2]
        rows = (np.arange(self.height, dtype=np.int64) * h) // self.height
        cols = (np.arange(self.width, dtype=np.int64) * w) // self.width
        return encode_png(arr[rows][:, cols])

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            if payload is None:
                out.append(None)
            elif self.backend == "real":
                out.append(self._real_resize(payload))
            elif len(payload) >= self.out_bytes:
                out.append(payload[: self.out_bytes])
            else:  # tile deterministically up to size
                reps = self.out_bytes // max(1, len(payload)) + 1
                out.append((payload * reps)[: self.out_bytes])
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array(np.full(n, self.width, np.int32), pa.int32()),
                "height": pa.array(np.full(n, self.height, np.int32), pa.int32()),
            },
            schema=MEDIA,
        )


def resize_media(
    media: "ray.data.Dataset", width: int = 64, height: int = 64, batch_size: int = 32,
    backend: str = "fake",
) -> "ray.data.Dataset":
    return media.map_batches(
        ResizeActor,
        fn_constructor_kwargs={"width": width, "height": height, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 2),
    )


class FrameSampleActor:
    """video payload -> every-nth-frame sample rows (flat_map-shaped batch
    expansion). Fake backend slices the payload deterministically."""

    def __init__(self, every_n: int = 10, backend: str = "fake"):
        self.backend = backend
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import split_png_frames

        ids, frames, blobs = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            if payload is None:
                continue  # no decodable frames; SQL series over NULL is empty
            if self.backend == "real":
                # real container parse: chunk-length walk to each IEND
                for f, frame in enumerate(split_png_frames(payload)):
                    if f % self.every_n == 0:
                        ids.append(mid)
                        frames.append(f)
                        blobs.append(frame)
                continue
            n_frames = max(1, len(payload) // 256)  # fake: 256 bytes/frame
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                frames.append(f)
                blobs.append(payload[f * 256 : (f + 1) * 256])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frames, pa.int32()),
                "frame": pa.array(blobs, pa.binary()),
            }
        )


def sample_frames(
    media: "ray.data.Dataset", every_n: int = 10, batch_size: int = 16,
    backend: str = "fake",
) -> "ray.data.Dataset":
    return media.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"every_n": every_n, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 2),
    )
