"""Multimodal (image/audio/video) column plumbing — real Ray-side topology,
stubbed codecs.

Binary media travel as opaque ``binary`` columns with typed metadata
(mime, width/height or sample rate). Decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (payload bytes, not row count, bound the block). The actual codec
calls are stubbed (no imaging/audio libs in this container): ``backend=
"fake"`` produces deterministic features from the payload bytes so the
schema/batching/actor plumbing is fully testable; ``backend="real"``
raises ``NotImplementedError`` at the exact call site a codec would fill.
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
            # a real deployment would do: self.model = load_image_model(...)
            raise NotImplementedError(
                "no imaging/audio codecs in this environment; use backend='fake'"
            )

    def _fake_features(self, payload: bytes) -> np.ndarray:
        gen = np.random.Generator(np.random.Philox(key=fnv1a64(payload)))
        return gen.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        payloads = batch["payload"].to_pylist()
        # null payloads -> null stats/digest (matches SQL md5(NULL) IS NULL)
        # and a zero feature vector
        feats = (
            np.stack(
                [self._fake_features(p) if p is not None else np.zeros(self.feature_dim, np.float32) for p in payloads]
            )
            if payloads
            else np.empty((0, self.feature_dim), np.float32)
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
        if backend == "real":
            # a real deployment: self.codec = load_image_codec(...)
            raise NotImplementedError("no imaging codecs in this environment")
        self.width, self.height = width, height
        self.out_bytes = max(16, (width * height) // 64)  # fake: bounded thumbnail

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            if payload is None:
                out.append(None)
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
    media: "ray.data.Dataset", width: int = 64, height: int = 64, batch_size: int = 32
) -> "ray.data.Dataset":
    return media.map_batches(
        ResizeActor,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 2),
    )


class FrameSampleActor:
    """video payload -> every-nth-frame sample rows (flat_map-shaped batch
    expansion). Fake backend slices the payload deterministically."""

    def __init__(self, every_n: int = 10, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError("no video codecs in this environment")
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, blobs = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            if payload is None:
                continue  # no decodable frames; SQL series over NULL is empty
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


def sample_frames(media: "ray.data.Dataset", every_n: int = 10, batch_size: int = 16) -> "ray.data.Dataset":
    return media.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 2),
    )
