"""Pure-numpy media codecs + feature kernel (kernels/media.py).

The decoder must read real-world 8-bit PNGs, so round-trips cover every
scanline filter type (0/1/2/3/4), not just the encoder's filter-0 output.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from biblib_spark.kernels.media import (
    _fake_embedding,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    media_feature_row,
    synth_media_row,
)


def _rng_img(h, w, c, seed=7):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8).reshape(h, w, c)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_roundtrip_channels(c):
    img = _rng_img(13, 17, c)
    assert np.array_equal(decode_png(encode_png(img)), img)


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Hand-build a PNG whose every scanline uses filter ``ftype`` — the
    encoder only writes filter 0, but real encoders use all five."""
    h, w, c = img.shape
    colortype = {1: 0, 3: 2, 4: 6}[c]
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        filt = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            left = int(line[x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if ftype == 0:
                filt[x] = line[x]
            elif ftype == 1:
                filt[x] = (line[x] - left) & 0xFF
            elif ftype == 2:
                filt[x] = (line[x] - up) & 0xFF
            elif ftype == 3:
                filt[x] = (line[x] - ((left + up) >> 1)) & 0xFF
            else:
                filt[x] = (line[x] - paeth(left, up, ul)) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        sig + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filters(ftype):
    img = _rng_img(9, 11, 3, seed=ftype)
    assert np.array_equal(decode_png(_png_with_filter(img, ftype)), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    rng = np.random.RandomState(3)
    s = rng.randint(-30000, 30000, size=(777, channels)).astype(np.int16)
    out, rate = decode_wav(encode_wav(s if channels > 1 else s[:, 0], 16000))
    assert rate == 16000
    assert np.array_equal(out, s)


def test_wav_rejects_non_pcm16():
    blob = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    # corrupt bits-per-sample to 8
    idx = blob.index(b"fmt ") + 8 + 14
    blob[idx] = 8
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))


def test_image_features_real_decode():
    # flat gray 100 image: mean_luma exactly 100, centered embedding ~ zero
    img = np.full((16, 16, 3), 100, dtype=np.uint8)
    f = media_feature_row("image", encode_png(img))
    assert f["decoded"] is True
    assert f["width"] == 16 and f["height"] == 16
    assert f["mean_luma"] == 100.0
    # structured image: unit-norm embedding that differs from another image
    f2 = media_feature_row("image", encode_png(_rng_img(16, 16, 3, seed=1)))
    f3 = media_feature_row("image", encode_png(_rng_img(16, 16, 3, seed=2)))
    e2, e3 = np.array(f2["embedding"]), np.array(f3["embedding"])
    assert abs(np.linalg.norm(e2) - 1.0) < 1e-9
    # centered embeddings of unrelated noise images are near-orthogonal —
    # the property cosine dedup needs (uncentered block means would sit at
    # cosine ~0.99 because brightness dominates)
    assert abs(float(e2 @ e3)) < 0.5


def test_audio_features_real_decode():
    rate, n = 8000, 1600
    t = np.arange(n)
    wave = (np.sin(2 * np.pi * 200 * t / rate) * 10000).astype(np.int16)
    f = media_feature_row("audio", encode_wav(wave, rate))
    assert f["decoded"] is True
    assert f["duration_ms"] == 200
    # sine RMS = amplitude / sqrt(2)
    assert abs(f["rms"] - 10000 / np.sqrt(2)) < 100
    # 200 Hz at 8 kHz: one zero crossing per half period = 400/s -> zcr 0.05
    assert abs(f["zcr"] - 0.05) < 0.005
    assert abs(np.linalg.norm(f["embedding"]) - 1.0) < 1e-9


def test_video_falls_back_labeled():
    f = media_feature_row("video", b"\x00\x01\x02mp4-ish" * 30)
    assert f["decoded"] is False
    assert f["width"] is None and f["rms"] is None
    emb = np.array(f["embedding"])
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-5
    assert np.allclose(emb, _fake_embedding(b"\x00\x01\x02mp4-ish" * 30))


def test_undecodable_image_falls_back():
    f = media_feature_row("image", b"not a png at all")
    assert f["decoded"] is False and f["width"] is None
    assert f["n_bytes"] == 16


def test_synth_rows_deterministic_and_dup_structured():
    a = synth_media_row(0)
    b = synth_media_row(2)  # copies item 0
    c = synth_media_row(1)
    assert a["data"] == b["data"] and a["data"] != c["data"]
    assert a["kind"] == "image" and a["mime"] == "image/png"
    # the synthesized PNG really decodes to the declared dimensions
    px = decode_png(a["data"])
    assert px.shape == (a["height"], a["width"], 3)
    # audio rows decode too
    audio = next(
        synth_media_row(i) for i in range(40) if synth_media_row(i)["kind"] == "audio"
    )
    samples, rate = decode_wav(audio["data"])
    assert rate == 8000
    assert audio["duration_ms"] == int(round(len(samples) * 1000 / rate))
    assert synth_media_row(5) == synth_media_row(5)
