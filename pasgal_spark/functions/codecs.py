"""Real media codecs over stdlib only (zlib / struct / wave) — no PIL/ffmpeg.

The container has no media libraries, but PNG, BMP and WAV are fully
decodable with the standard library: PNG is zlib-deflated filtered
scanlines (RFC 2083), BMP is raw BGR rows, WAV is RIFF-framed PCM. These
codecs turn ``functions.multimodal``'s decode stage from an import-gated
stub into a real decode path: payload bytes in, pixel/sample arrays out,
byte-exact round-trips pinned by tests.

Scope (honest about what a 60-line stdlib decoder covers):

- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
  non-interlaced; all five scanline filters on decode, filter 0 on encode.
  This matches what the deterministic synthesizer emits and what a
  screenshot-ish corpus mostly contains; anything else raises loudly.
- BMP: uncompressed 24-bit BI_RGB, the classic bottom-up row order.
- WAV: PCM16 mono/stereo via the stdlib ``wave`` module.
- Video: a length-prefixed PNG frame container (``PVC1``) — a stand-in
  for a real container format with *real* image frames inside, so
  frame-sampling decodes actual pixels rather than slicing opaque bytes.

Everything is NumPy-vectorized except the PNG filters that are
sequentially data-dependent along a scanline (Sub/Paeth look at the
reconstructed left pixel); those run per-row-pixel in Python, which is
fine for the thumbnail-scale payloads this pipeline feature-extracts
(decode cost is per-byte-linear either way, and at 100 TB the decode
stage is embarrassingly parallel inside ``mapInPandas`` — per-image cost
is what matters, not driver cost).

Reference parity note: the reference engine has no media path at all;
this module exists for the LLM-data-pipeline surface the brief adds on
top (multimodal columns with real decode / resize / frame-sample).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def encode_png(arr: np.ndarray) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 to PNG bytes.

    Filter type 0 (None) on every scanline — simplest valid stream; any
    standards-compliant decoder (including :func:`decode_png`) reads it.
    """
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape for PNG: {arr.shape}")
    h, w = a.shape[:2]
    # prepend the per-scanline filter byte (0 = None)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * channels)], axis=1
    ).tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a HxW[xC] uint8 array (see module scope)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, color_type = 8, 0, 0, 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or color_type not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color_type} "
                    f"interlace={interlace}); codec scope is 8-bit "
                    "gray/RGB/RGBA non-interlaced"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: scanline payload size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 1:  # Sub
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + left) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ftype}")
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit)
# ---------------------------------------------------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode a HxWx3 uint8 RGB array as an uncompressed 24-bit BMP."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"BMP encoder wants HxWx3 RGB, got {arr.shape}")
    h, w = a.shape[:2]
    row = w * 3
    pad = (-row) % 4
    # bottom-up rows, BGR channel order, 4-byte-aligned rows
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += a[y, :, ::-1].tobytes() + b"\x00" * pad
    pixel_off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to HxWx3 uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    size, w, h, planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={compression})")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)[:, :row]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1].copy() if flip else img.copy()


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Sniff the container (BMP magic vs PNG) and decode — the single
    dispatch point for every image-consuming kernel, so adding a format
    means touching one function, not every mapInPandas call site."""
    return decode_bmp(data) if data[:2] == b"BM" else decode_png(data)


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float samples in [-1, 1] (n,) or (n, ch) as PCM16 WAV."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(a.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM16 WAV bytes -> (float64 samples in [-1, 1] (n, ch), rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {w.getsampwidth()}")
        rate = w.getframerate()
        n, ch = w.getnframes(), w.getnchannels()
        raw = w.readframes(n)
    pcm = np.frombuffer(raw, dtype="<i2").reshape(n, ch)
    return pcm.astype(np.float64) / 32767.0, rate


# ---------------------------------------------------------------------------
# Video container: length-prefixed PNG frames
# ---------------------------------------------------------------------------

_PVC_MAGIC = b"PVC1"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Pack RGB frames as a PVC1 container (length-prefixed PNGs)."""
    out = bytearray(_PVC_MAGIC + struct.pack("<I", len(frames)))
    for f in frames:
        png = encode_png(f)
        out += struct.pack("<I", len(png)) + png
    return bytes(out)


def decode_video_frames(
    data: bytes, *, every_n: int = 1
) -> list[tuple[int, np.ndarray]]:
    """Unpack a PVC1 container, decoding every ``every_n``-th frame.

    Returns [(frame_idx, HxWxC array), ...]. Skipped frames are *seeked*
    over without decoding — the property a real container-aware sampler
    has (frame sampling must not pay full decode).
    """
    if data[:4] != _PVC_MAGIC:
        raise ValueError("not a PVC1 container")
    (n_frames,) = struct.unpack_from("<I", data, 4)
    pos, out = 8, []
    for idx in range(n_frames):
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if idx % every_n == 0:
            out.append((idx, decode_png(data[pos : pos + length])))
        pos += length
    return out


# ---------------------------------------------------------------------------
# Pixel/sample transforms (the post-decode feature stage)
# ---------------------------------------------------------------------------

def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling), any channel count."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[ys][:, xs]


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, uint8 in/out."""
    if img.ndim == 2:
        return img
    coef = np.array([0.299, 0.587, 0.114])
    return np.clip(
        np.round(img[:, :, :3].astype(np.float64) @ coef), 0, 255
    ).astype(np.uint8)
