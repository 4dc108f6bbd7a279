"""Real media decode, pure numpy + stdlib — no codec libraries needed.

Round-3 verdict "Next #7": the container has no PIL/ffmpeg, but PNG is
zlib (stdlib) + per-scanline filters and WAV is a RIFF header + PCM16 —
both decodable in pure numpy. This module provides:

- a minimal PNG codec: 8-bit gray / RGB / RGBA, non-interlaced; the
  ENCODER writes filter-0 scanlines, the DECODER undoes all five filter
  types (None/Sub/Up/Average/Paeth, PNG spec §9), so it reads real-world
  8-bit PNGs, not just its own output;
- a minimal WAV codec: PCM16, mono/stereo, RIFF chunk walk;
- deterministic media synthesis (``synth_media_row``) producing REAL
  PNG/WAV blobs (mp4 stays an opaque deterministic blob — a video
  container parser is out of scope and stays an honestly-labeled stub);
- ``media_feature_row``: the per-item feature kernel (decode -> numeric
  features + a small perceptual embedding) shared VERBATIM by the Spark
  Arrow UDF (operators/multimodal.py), the DuckDB oracle fixture builder
  (fixtures.ensure_media_fixture) and tests — fixture parity by
  construction, the codefixtures.py pattern.

Everything here is per-item CPU work with no Spark dependency: at 100 TB
it runs inside mapInPandas where the executor count, not this code,
decides the throughput.

reference: the reference engine has no media path (SURVEY.md §2.10 —
north_rule training-data extension, not reference parity). PNG format per
the public PNG specification (ISO/IEC 15948); WAV per RIFF/WAVE.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import struct
import subprocess
import tempfile
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype -> channels for the supported 8-bit subset
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLORTYPE = {1: 0, 3: 2, 4: 6}


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (8-bit, filter 0, no interlace)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    colortype = _COLORTYPE[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    # filter byte 0 per scanline
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8. Supports bit depth 8, colortypes
    0/2/6, interlace 0 — the overwhelmingly common subset; anything else
    raises ValueError (callers treat that item as undecodable)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = 0
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or colortype not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={colortype}"
                    f" interlace={interlace})"
                )
            channels = _CHANNELS[colortype]
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("bad PNG scanline payload")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — vectorized
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need the running left
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    rec[x] = (line[x] + left) & 0xFF
                elif ftype == 3:
                    rec[x] = (line[x] + ((left + up) >> 1)) & 0xFF
                else:
                    rec[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, channels)


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (N,) or (N, channels) -> PCM16 WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    payload = s.tobytes()  # interleaved little-endian
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((N, channels) int16, sample_rate). PCM16 only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    sample_rate = n_ch = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, n_ch, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", chunk
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
        elif tag == b"data":
            payload = chunk
    if sample_rate is None or payload is None:
        raise ValueError("truncated WAV")
    s = np.frombuffer(payload, dtype="<i2")
    return s.reshape(-1, n_ch), sample_rate


# --------------------------------------------------------------------------
# Deterministic synthesis (real blobs)
# --------------------------------------------------------------------------

def _u32s(seed_material: bytes, n: int) -> np.ndarray:
    """n deterministic uint32s from sha256 counter mode — stable across
    numpy versions (np.random guarantees none)."""
    out = b"".join(
        hashlib.sha256(seed_material + struct.pack("<I", i)).digest()
        for i in range((n * 4 + 31) // 32)
    )
    return np.frombuffer(out[: n * 4], dtype="<u4").copy()


def synth_media_row(i: int, seed: int = 42) -> dict:
    """Deterministic media item ``i``: every third item repeats the blob of
    ``i - i % 3`` (exact-dup structure); kind cycles image/audio/video by
    base. Images are REAL PNGs, audio REAL WAVs, video an opaque blob."""
    base = i - (i % 3) if i % 3 == 2 else i
    kind = ["image", "audio", "video"][(base // 3) % 3]
    mat = f"media|{seed}|{base}".encode()
    if kind == "image":
        w = 8 + base % 17
        h = 8 + base % 13
        px = _u32s(mat, w * h * 3) % 256
        blob = encode_png(px.astype(np.uint8).reshape(h, w, 3))
        return {
            "media_id": i, "kind": kind, "mime": "image/png", "data": blob,
            "width": w, "height": h, "duration_ms": None,
        }
    if kind == "audio":
        rate = 8000
        n = 400 + base % 1600
        t = np.arange(n, dtype=np.float64)
        freq = 100.0 + (base % 40) * 25.0
        wave = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
        blob = encode_wav(wave, rate)
        return {
            "media_id": i, "kind": kind, "mime": "audio/wav", "data": blob,
            "width": None, "height": None,
            "duration_ms": int(round(n * 1000 / rate)),
        }
    blob = hashlib.sha256(mat).digest() * 8
    return {
        "media_id": i, "kind": kind, "mime": "video/mp4", "data": blob,
        "width": None, "height": None, "duration_ms": 3000 + base % 9000,
    }


# --------------------------------------------------------------------------
# Capability probes: the sandbox has no ffmpeg/PIL, a real cluster usually
# does. Each probe runs ONCE per process (each executor's Python workers
# probe independently — cheap, and no driver-side state to ship). The
# feature schema is IDENTICAL with or without the capability; only
# ``decoded`` and the derived numeric fields change.
# --------------------------------------------------------------------------

_VIDEO_DECODER: str | None | bool = False  # False = not probed yet


def video_decoder() -> str | None:
    """'ffmpeg' if a working ffmpeg binary is on PATH, else None.

    Gates the mp4 path: with ffmpeg, frames are really decoded
    (``decode_video_frames``); without it, video items keep the honest
    ``decoded=false`` content-hash fallback. Probe result is cached for
    the process lifetime. Set SPARK_GRAFT_NO_FFMPEG=1 to force the
    fallback even where ffmpeg exists (determinism escape hatch: frame
    decode output can differ across ffmpeg builds)."""
    global _VIDEO_DECODER
    if _VIDEO_DECODER is False:
        _VIDEO_DECODER = None
        if os.environ.get("SPARK_GRAFT_NO_FFMPEG") != "1":
            exe = shutil.which("ffmpeg")
            if exe is not None:
                try:
                    subprocess.run(
                        [exe, "-version"], capture_output=True, timeout=10,
                        check=True,
                    )
                    _VIDEO_DECODER = "ffmpeg"
                except (OSError, subprocess.SubprocessError):
                    pass
    return _VIDEO_DECODER


def _pil_module():
    """PIL.Image if importable, else None — used only for image formats the
    pure-numpy PNG codec does not cover (JPEG, 16-bit/paletted PNG, ...)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _split_png_stream(stream: bytes) -> list[bytes]:
    """ffmpeg's image2pipe concatenates PNGs back-to-back; split on the
    8-byte signature."""
    out = []
    start = stream.find(_PNG_SIG)
    while start != -1:
        nxt = stream.find(_PNG_SIG, start + 8)
        out.append(stream[start:] if nxt == -1 else stream[start:nxt])
        start = nxt
    return out


def decode_video_frames(
    data: bytes, max_frames: int = 8, timeout_s: float = 60.0
) -> list[np.ndarray] | None:
    """Up to ``max_frames`` evenly-spread frames as (H, W, 3) uint8 arrays,
    or None when no decoder is available / the item is undecodable.

    ffmpeg emits PNGs over a pipe (``-f image2pipe -vcodec png``) and the
    pure-numpy PNG codec above parses them — no PIL needed even on the
    decode path. The blob goes through a temp file because mp4 needs a
    seekable input (moov atom can trail the data)."""
    if video_decoder() is None:
        return None
    tmp = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
    try:
        tmp.write(data)
        tmp.close()
        proc = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-i", tmp.name,
                # thumbnail-ish spread: decimate to ~max_frames via select
                "-vf", f"select='not(mod(n\\,{max(1, 30 // max_frames)}))'",
                "-frames:v", str(max_frames), "-vsync", "vfr",
                "-f", "image2pipe", "-vcodec", "png", "-",
            ],
            capture_output=True, timeout=timeout_s,
        )
        if proc.returncode != 0 or not proc.stdout:
            return None
        frames = []
        for png in _split_png_stream(proc.stdout):
            try:
                px = decode_png(png)
            except ValueError:
                continue
            if px.shape[2] == 1:
                px = np.repeat(px, 3, axis=2)
            frames.append(px[:, :, :3])
        return frames or None
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        try:
            os.unlink(tmp.name)
        except OSError:
            pass


# --------------------------------------------------------------------------
# Feature kernel (shared by UDF, fixture, tests)
# --------------------------------------------------------------------------

EMB_DIM = 64


def _fake_embedding(data: bytes, dim: int = EMB_DIM) -> np.ndarray:
    """Deterministic stand-in for kinds with no decoder (video): unit-norm
    vector seeded from content — identical bytes, identical embedding."""
    h = hashlib.sha256(data).digest()
    raw = np.frombuffer(
        b"".join(hashlib.sha256(h + bytes([i])).digest() for i in range(dim // 8 + 1)),
        dtype=np.uint8,
    )[: dim * 2]
    vec = raw.astype(np.float32).reshape(dim, 2).sum(axis=1) - 255.0
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def _center_unit(v: np.ndarray) -> np.ndarray:
    """Mean-center then unit-normalize: embeddings must encode the PATTERN,
    not overall brightness/loudness — without centering every uniform-ish
    item is near-parallel to every other and cosine dedup over-merges."""
    v = v - v.mean()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _block_mean_8x8(gray: np.ndarray) -> np.ndarray:
    """(H, W) float -> 64-dim centered block-mean embedding (aHash
    geometry)."""
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    out = np.empty(64, dtype=np.float64)
    for by in range(8):
        for bx in range(8):
            blk = gray[ys[by] : max(ys[by + 1], ys[by] + 1),
                       xs[bx] : max(xs[bx + 1], xs[bx] + 1)]
            out[by * 8 + bx] = blk.mean()
    return _center_unit(out)


def media_feature_row(kind: str, data: bytes) -> dict:
    """One media item -> numeric features. Real decode for PNG and WAV;
    video keeps the labeled fake embedding (no mp4 parser in scope). All
    floats rounded to 4dp so engines hash identically."""
    out = {
        "n_bytes": len(data),
        "content_crc": zlib.crc32(data),
        "width": None, "height": None, "duration_ms": None,
        "mean_luma": None, "rms": None, "zcr": None,
        "decoded": False,
        "embedding": None,
    }
    try:
        if kind == "image":
            try:
                px = decode_png(data)
            except ValueError:
                # formats outside the pure-numpy codec's subset (JPEG,
                # 16-bit / paletted PNG, ...): PIL if the cluster has it,
                # else fall through to the labeled content-hash embedding
                pil = _pil_module()
                if pil is None:
                    raise
                import io  # noqa: PLC0415

                img = pil.open(io.BytesIO(data)).convert("RGB")
                px = np.asarray(img, dtype=np.uint8)
            h, w, c = px.shape
            f = px.astype(np.float64)
            luma = (
                0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
                if c >= 3
                else f[:, :, 0]
            )
            out.update(
                width=w, height=h,
                mean_luma=round(float(luma.mean()), 4),
                decoded=True,
                embedding=[float(x) for x in _block_mean_8x8(luma)],
            )
            return out
        if kind == "audio":
            samples, rate = decode_wav(data)
            mono = samples.astype(np.float64).mean(axis=1)
            n = len(mono)
            rms = float(np.sqrt((mono**2).mean())) if n else 0.0
            zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
            # 64-bin centered abs-envelope embedding
            bins = np.array_split(np.abs(mono), EMB_DIM)
            env = np.array([b.mean() if len(b) else 0.0 for b in bins])
            out.update(
                duration_ms=int(round(n * 1000 / rate)),
                rms=round(rms, 4), zcr=round(zcr, 4),
                decoded=True,
                embedding=[float(x) for x in _center_unit(env)],
            )
            return out
        if kind == "video":
            frames = decode_video_frames(data)
            if frames:
                lumas = [
                    0.299 * f[:, :, 0].astype(np.float64)
                    + 0.587 * f[:, :, 1].astype(np.float64)
                    + 0.114 * f[:, :, 2].astype(np.float64)
                    for f in frames
                ]
                h, w = lumas[0].shape
                embs = np.stack([_block_mean_8x8(lm) for lm in lumas])
                out.update(
                    width=w, height=h,
                    mean_luma=round(
                        float(np.mean([lm.mean() for lm in lumas])), 4
                    ),
                    decoded=True,
                    embedding=[
                        float(x) for x in _center_unit(embs.mean(axis=0))
                    ],
                )
                return out
            # no ffmpeg on this host (the sandbox), or the item is not a
            # decodable video: the honest labeled fallback below
    except (ValueError, struct.error, zlib.error, OSError):
        pass  # undecodable item falls through to the content-hash embedding
    out["embedding"] = [float(x) for x in _fake_embedding(data)]
    return out
