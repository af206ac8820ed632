"""Stdlib media codecs (functions/codecs.py) + the real multimodal backend.

The PNG decoder is tested against an INDEPENDENT test-side forward
filterer (each of the five spec filters applied per the RFC 2083
formulas), not against the encoder alone — round-tripping filter 0 and
unfiltering 1-4 are separately proven.
"""

import struct
import zlib

import numpy as np
import pytest

import ray

from duke_ray.functions.codecs import (
    PNG_SIG,
    _chunk,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    png_frame_end,
    split_png_frames,
)


# ---------- PNG round trip (filter 0 path) ----------

@pytest.mark.parametrize("shape", [(1, 1), (7, 13), (16, 16), (5, 3, 3), (11, 24, 3)])
def test_png_roundtrip(shape):
    gen = np.random.Generator(np.random.Philox(key=sum(shape)))
    arr = gen.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_png_encode_deterministic():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert encode_png(arr) == encode_png(arr.copy())


# ---------- PNG filters 1-4: independent forward filterer ----------

def _paeth(a, b, c):
    p = a + b - c
    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    if pb_ <= pc_:
        return b
    return c


def _forward_filter(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply the spec's per-scanline forward filters to a (h, w[,3]) image
    and build a full PNG stream around the result."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch).astype(int)
    raw = bytearray()
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        raw.append(f)
        for x in range(w * ch):
            cur = flat[y, x]
            left = flat[y, x - ch] if x >= ch else 0
            up = flat[y - 1, x] if y > 0 else 0
            ul = flat[y - 1, x - ch] if (y > 0 and x >= ch) else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - left
            elif f == 2:
                v = cur - up
            elif f == 3:
                v = cur - ((left + up) >> 1)
            else:
                v = cur - _paeth(left, up, ul)
            raw.append(v & 0xFF)
    color_type = 0 if ch == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_decode_all_filters(ftypes, channels):
    gen = np.random.Generator(np.random.Philox(key=ftypes[0] * 10 + channels))
    shape = (9, 14) if channels == 1 else (9, 14, 3)
    arr = gen.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(_forward_filter(arr, ftypes))
    assert np.array_equal(out, arr)


def test_png_rejects_bad_inputs():
    with pytest.raises(ValueError):
        decode_png(b"notapng")
    arr = np.zeros((4, 4), np.uint8)
    # 16-bit depth unsupported
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    bad = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(bad)
    with pytest.raises(ValueError):
        encode_png(arr[:0])  # empty image


# ---------- WAV ----------

@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    gen = np.random.Generator(np.random.Philox(key=ch))
    shape = (777,) if ch == 1 else (777, 2)
    s = gen.integers(-32768, 32768, size=shape, dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, rate=22050))
    assert rate == 22050
    assert np.array_equal(out, s)


# ---------- frame container ----------

def test_split_png_frames():
    imgs = [np.full((3, 5), v, np.uint8) for v in (0, 7, 200)]
    payload = b"".join(encode_png(i) for i in imgs)
    frames = split_png_frames(payload)
    assert len(frames) == 3
    for f, img in zip(frames, imgs):
        assert np.array_equal(decode_png(f), img)
    assert png_frame_end(payload) == len(frames[0])
    with pytest.raises(ValueError):
        split_png_frames(payload + b"garbage")


# ---------- real backend over Ray (closed-form ground truth) ----------

def test_real_media_features(ray_session, sf_dir):
    from duke_ray.stages.multimodal import (
        decode_features,
        real_media_bytes,
        real_media_dims,
        real_media_from_documents,
    )

    media = real_media_from_documents(sf_dir).materialize()
    feats = {r["media_id"]: r for r in decode_features(media, backend="real").take_all()}
    from duke_ray.sources import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).take_all()
    assert len(feats) == len(docs)
    checked = {k: 0 for k in range(4)}
    for d in docs[:200]:
        did, text = int(d["doc_id"]), d["text"]
        r = feats[did]
        f = np.asarray(r["features"], np.float64)
        w, h = real_media_dims(did)
        kind = did % 4
        checked[kind] += 1
        if kind == 0:  # gray png: decoded pixels == pre-codec byte rule
            truth = real_media_bytes(text, w * h).astype(np.float64)
            assert f[0] == w and f[1] == h and f[2] == 1
            assert f[3] == pytest.approx(truth.mean(), rel=1e-6)
            assert f[5] == truth.min() and f[6] == truth.max()
        elif kind == 1:  # rgb png
            truth = real_media_bytes(text, w * h * 3).astype(np.float64)
            assert f[0] == w and f[1] == h and f[2] == 3
            assert f[3] == pytest.approx(truth.mean(), rel=1e-6)
        elif kind == 2:  # wav: n_samples / rate / sample stats per rule
            n = did % 500 + 100
            rate = 8000 + (did % 4) * 4000
            truth = (real_media_bytes(text, n).astype(np.float64) - 128) * 256
            assert f[0] == n and f[1] == rate and f[2] == 1
            assert f[3] == pytest.approx(truth.mean(), rel=1e-6)
        else:  # video: frame count + first-frame stats
            truth = real_media_bytes(text, w * h).astype(np.float64)
            assert f[0] == w and f[1] == h and f[2] == did % 4 + 2
            assert f[3] == pytest.approx(truth.mean(), rel=1e-6)
    assert all(v > 0 for v in checked.values()), "a modality went unexercised"


def test_real_resize(ray_session):
    from duke_ray.stages.multimodal import MEDIA, resize_media

    import pyarrow as pa

    # checkerboard 8x8 -> 4x4 nearest-neighbor expectation, computed by hand
    board = np.indices((8, 8)).sum(0) % 2 * np.uint8(255)
    media = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "mime": pa.array(["image/png"], pa.string()),
                "payload": pa.array([encode_png(board.astype(np.uint8))], pa.binary()),
                "width": pa.array([8], pa.int32()),
                "height": pa.array([8], pa.int32()),
            },
            schema=MEDIA,
        )
    )
    out = resize_media(media, width=4, height=4, backend="real").take_all()
    assert out[0]["width"] == 4 and out[0]["height"] == 4
    got = decode_png(out[0]["payload"])
    rows = (np.arange(4) * 8) // 4
    assert np.array_equal(got, board.astype(np.uint8)[rows][:, rows])


def test_real_frame_sampling(ray_session, sf_dir):
    from duke_ray.stages.multimodal import (
        real_media_bytes,
        real_media_dims,
        real_media_from_documents,
        sample_frames,
    )
    from duke_ray.sources import read_table

    media = real_media_from_documents(sf_dir).filter(
        lambda r: r["mime"] == "video/png-seq"
    )
    frames = sample_frames(media, every_n=2, backend="real").take_all()
    assert frames
    docs = {
        int(d["doc_id"]): d["text"]
        for d in read_table(sf_dir, "documents", columns=["doc_id", "text"]).take_all()
    }
    by_media = {}
    for r in frames:
        by_media.setdefault(int(r["media_id"]), []).append(r)
    for mid, rs in list(by_media.items())[:40]:
        n_frames = mid % 4 + 2
        want = list(range(0, n_frames, 2))
        assert sorted(x["frame_no"] for x in rs) == want
        w, h = real_media_dims(mid)
        base = real_media_bytes(docs[mid], w * h).astype(np.int64)
        for x in rs:
            img = decode_png(x["frame"])
            assert np.array_equal(
                img, ((base + x["frame_no"]) % 256).astype(np.uint8).reshape(h, w)
            )


def test_pil_optional_path():
    pytest.importorskip("PIL")
    # when PIL exists, a real JPEG decodes through the optional path
    from duke_ray.stages.multimodal import DecodeFeaturesActor

    actor = DecodeFeaturesActor(backend="real")
    assert actor._pil is not None
