"""Stdlib media codecs: PNG (zlib + struct) and WAV PCM16 (wave module).

Purpose: the multimodal operators' REAL decode/resize/audio paths were
dependency-gated on PIL / soundfile, which many minimal clusters (and this
container) don't ship.  PNG and RIFF/WAV are simple enough to implement
with nothing but the standard library, so those two formats get a real,
always-available codec; PIL/soundfile remain the fast path when installed
and the only path for other formats (JPEG, FLAC, ...).

Scope notes (deliberate):
- PNG: 8-bit RGB and RGBA, all five scanline filters on decode, filter-0
  on encode, no interlacing, no palette.  That covers PNGs this engine
  writes and the common screenshot/render case; anything else raises
  ValueError and the caller falls back to PIL or reports the format.
- WAV: PCM 8/16/32-bit int via the stdlib ``wave`` reader; float WAVs are
  out of scope (soundfile territory).

Pure per-item CPU work with bytes in / bytes out — exactly what runs
inside the Arrow ``mapInPandas`` workers (multimodal.py), so there is no
Spark dependency in this module.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(kind: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw 8-bit RGB bytes (row-major, 3 bytes/pixel) as a PNG
    (filter 0 scanlines, zlib default level)."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb payload {len(rgb)} != {width}x{height}x3 bytes"
        )
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG into (width, height, raw RGB bytes).  Supports 8-bit
    RGB/RGBA (alpha dropped), all five filter types, no interlace/palette."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, channels = 8, 0, 0, 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if kind == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8 or color not in (2, 6) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace}); needs 8-bit RGB/RGBA"
                )
            channels = 3 if color == 2 else 4
        elif kind == b"IDAT":
            idat.extend(payload)
        elif kind == b"IEND":
            break
    if not width or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    bpp = channels
    stride = width * channels
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        fty = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if fty == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif fty == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif fty == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif fty == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif fty != 0:
            raise ValueError(f"bad PNG filter type {fty}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if channels == 4:  # drop alpha
        rgb = bytearray(width * height * 3)
        for px in range(width * height):
            rgb[px * 3 : px * 3 + 3] = out[px * 4 : px * 4 + 3]
        return width, height, bytes(rgb)
    return width, height, bytes(out)


def rgb_resize_nearest(
    width: int, height: int, rgb: bytes, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resize of raw RGB bytes — deterministic, stdlib."""
    out = bytearray(tw * th * 3)
    for ty in range(th):
        sy = min(height - 1, ty * height // th)
        for tx in range(tw):
            sx = min(width - 1, tx * width // tw)
            s = (sy * width + sx) * 3
            d = (ty * tw + tx) * 3
            out[d : d + 3] = rgb[s : s + 3]
    return bytes(out)


def wav_encode(samples: list[float], rate: int = 16000) -> bytes:
    """Encode [-1, 1] float samples as mono PCM16 WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        pcm = b"".join(
            struct.pack(
                "<h", max(-32768, min(32767, int(round(s * 32767.0))))
            )
            for s in samples
        )
        w.writeframes(pcm)
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[list[float], int]:
    """Decode a PCM WAV into ([-1, 1] float samples (channel-averaged to
    mono), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        vals = struct.unpack(f"<{len(frames) // 2}h", frames)
        scale = 32768.0
    elif width == 4:
        vals = struct.unpack(f"<{len(frames) // 4}i", frames)
        scale = 2147483648.0
    elif width == 1:  # unsigned 8-bit
        vals = [b - 128 for b in frames]
        scale = 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:  # average channels to mono
        vals = [
            sum(vals[i : i + n_ch]) / n_ch for i in range(0, len(vals), n_ch)
        ]
    return [v / scale for v in vals], rate


def split_png_stream(data: bytes) -> list[bytes]:
    """Split a concatenated-PNG byte stream ("motion PNG": frames stored
    back-to-back, the PNG analog of MJPEG) into individual PNG payloads.
    Frames are delimited by the PNG signature and their own IEND chunk, so
    the split is exact — no guessing, no resynchronization heuristics."""
    frames = []
    pos = 0
    while True:
        start = data.find(_PNG_SIG, pos)
        if start < 0:
            break
        p = start + 8
        while p + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[p : p + 4])
            kind = data[p + 4 : p + 8]
            p += 12 + ln
            if kind == b"IEND":
                break
        frames.append(data[start:p])
        pos = p
    return frames
