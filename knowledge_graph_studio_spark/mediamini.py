"""Minimal pure-Python media decoders (the multimodal fallback codecs).

Real decoding for the uncompressed container formats whose specs are small
and public: PPM/PGM (netpbm P6/P5), BMP (BITMAPINFOHEADER, 24-bit,
uncompressed) and WAV (RIFF, PCM 16-bit). Compressed codecs (JPEG/PNG/MP4/
Opus...) need external libraries — install one and register it through
``operators.multimodal.set_decoder``; these fallbacks make the Spark-side
multimodal plumbing genuinely end-to-end testable without any of them.

Outputs: images -> float64 pixel array in [0, 1], flattened row-major
(grayscale keeps one channel, color interleaves RGB); audio -> float64
samples in [-1, 1] (channels interleaved). Format knowledge: netpbm man
pages, Windows BMP file format, RIFF/WAVE spec — all public.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(data: bytes) -> str | None:
    """Identify a supported container by magic bytes."""
    if not data:
        return None
    if data[:2] in (b"P6", b"P5") and (len(data) > 2 and data[2:3].isspace()):
        return "ppm" if data[:2] == b"P6" else "pgm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def _pnm_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens after the magic,
    skipping '#' comments; returns (tokens, offset just past the single
    whitespace byte that terminates the last token)."""
    toks: list[int] = []
    i = 2  # past magic
    cur = b""
    while i < len(data) and len(toks) < n:
        c = data[i:i + 1]
        if c == b"#":
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
                if len(toks) == n:
                    i += 1
                    break
        else:
            cur += c
        i += 1
    if len(toks) < n:
        raise ValueError("truncated PNM header")
    return toks, i


def decode_pnm(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm -> float64 in [0,1], flattened."""
    channels = 3 if data[:2] == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(data, 3)
    count = w * h * channels
    if maxval < 256:
        px = np.frombuffer(data, dtype=np.uint8, count=count, offset=off)
        return px.astype(np.float64) / maxval
    px = np.frombuffer(data, dtype=">u2", count=count, offset=off)
    return px.astype(np.float64) / maxval


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> float64 RGB in [0,1], flattened row-major
    (top-down; BMP stores rows bottom-up with 4-byte padding)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        src = h - 1 - r if bottom_up else r
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3,
                            offset=pix_off + src * stride).reshape(w, 3)
        rows.append(row[:, ::-1])  # BGR -> RGB
    return np.concatenate(rows).astype(np.float64).ravel() / 255.0


def decode_wav(data: bytes) -> np.ndarray:
    """RIFF/WAVE PCM (16-bit or 8-bit) -> float64 samples in [-1, 1]."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    fmt = None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        size = struct.unpack_from("<I", data, i + 4)[0]
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, _ch, _rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format {audio_fmt}")
            fmt = bits
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data before fmt chunk")
            if fmt == 16:
                s = np.frombuffer(body, dtype="<i2")
                return s.astype(np.float64) / 32768.0
            if fmt == 8:
                s = np.frombuffer(body, dtype=np.uint8)
                return (s.astype(np.float64) - 128.0) / 128.0
            raise ValueError(f"unsupported PCM bit depth {fmt}")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV data chunk not found")


_DECODERS = {"ppm": decode_pnm, "pgm": decode_pnm,
             "bmp": decode_bmp, "wav": decode_wav}


def decode(payload: bytes) -> np.ndarray | None:
    """Decode a supported uncompressed container; None if unrecognized
    (caller falls back to its stub/fake or a registered real codec)."""
    kind = sniff(payload or b"")
    if kind is None:
        return None
    return _DECODERS[kind](payload)
