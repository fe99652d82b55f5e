"""Codec unit tests — pure Python, no Spark session needed.

Round-trips pin the encoders; hand-filtered PNG streams pin every decoder
filter path (the encoder only emits filter 0, so Sub/Up/Average/Paeth are
exercised by constructing spec-compliant streams directly).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pasgal_spark.functions import codecs


def _img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_roundtrip(c):
    img = _img(13, 17, c, seed=c)
    out = codecs.decode_png(codecs.encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_png(b"\x00" * 64)


def _png_with_filters(img, filter_types):
    """Assemble a valid PNG applying the given filter type per scanline."""
    h, w, c = img.shape
    bpp = c
    raw = bytearray()
    recon = img.reshape(h, w * c).astype(np.int64)
    for y, ft in enumerate(filter_types):
        cur = recon[y]
        prev = recon[y - 1] if y else np.zeros(w * c, dtype=np.int64)
        line = bytearray([ft])
        for x in range(w * c):
            left = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                pred = codecs._paeth(int(left), int(up), int(ul))
            line.append((int(cur[x]) - int(pred)) & 0xFF)
        raw += line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        codecs._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_handles_all_filter_types():
    img = _img(10, 9, 3, seed=7)
    stream = _png_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert np.array_equal(codecs.decode_png(stream), img)


def test_bmp_roundtrip_including_row_padding():
    # w=5: row bytes 15, pad 1 — exercises the 4-byte alignment path
    img = _img(6, 5, 3, seed=3)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    t = np.linspace(0, 1, 1600, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples = sig if ch == 1 else np.stack([sig, 0.25 * sig], axis=1)
    out, rate = codecs.decode_wav(codecs.encode_wav(samples, 16000))
    assert rate == 16000
    assert out.shape == (1600, ch)
    ref = samples if ch == 2 else samples[:, None]
    assert np.max(np.abs(out - ref)) < 1.0 / 32767  # PCM16 quantization bound


def test_video_container_samples_without_decoding_skipped_frames():
    frames = [_img(8, 8, 3, seed=s) for s in range(7)]
    blob = codecs.encode_video(frames)
    sampled = codecs.decode_video_frames(blob, every_n=3)
    assert [i for i, _ in sampled] == [0, 3, 6]
    for i, f in sampled:
        assert np.array_equal(f, frames[i])


def test_resize_nearest_identity_and_downscale():
    img = _img(16, 12, 3, seed=1)
    assert np.array_equal(codecs.resize_nearest(img, 12, 16), img)
    small = codecs.resize_nearest(img, 6, 8)
    assert small.shape == (8, 6, 3)
    # pixel-center sampling: top-left output pixel reads img[1, 1]
    assert np.array_equal(small[0, 0], img[1, 1])


def test_rgb_to_gray_is_bt601():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 1] = [0, 255, 0]
    img[1, 0] = [0, 0, 255]
    img[1, 1] = [255, 255, 255]
    g = codecs.rgb_to_gray(img)
    assert g.tolist() == [[76, 150], [29, 255]]
