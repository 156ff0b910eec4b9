"""Golden tests for the real multimodal codecs (BMP, PNG): images are
hand-assembled byte-for-byte in the test, so the expected pixels are
known exactly — no image library on either side."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from duckdb_vortex_spark.operators.multimodal import (
    _decode_bmp,
    _decode_payload,
    _decode_png,
    _decode_wav,
    _no_features,
)


def make_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal 24-bit uncompressed BMP from RGB rows (top-down input)."""
    h = len(pixels)
    w = len(pixels[0])
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(pixels):  # stored bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r])  # BGR on disk
        line += b"\x00" * (stride - len(line))
        body += line
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + dib + body)


def make_png(rows: list[bytes], channels: int = 3, filters: list[int] | None = None) -> bytes:
    """Minimal 8-bit PNG. ``rows`` are RAW pixel bytes per scanline;
    each row is filtered with the given filter type before deflate, so
    the decoder's defilter paths are exercised for real."""
    h = len(rows)
    w = len(rows[0]) // channels
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    filters = filters or [0] * h
    bpp = channels
    raw = bytearray()
    prev = bytes(len(rows[0]))
    for ft, row in zip(filters, rows):
        line = np.frombuffer(row, np.uint8).astype(np.int32)
        pr = np.frombuffer(prev, np.uint8).astype(np.int32)
        if ft == 0:
            filt = line
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            filt = (line - left) & 0xFF
        elif ft == 2:
            filt = (line - pr) & 0xFF
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            filt = (line - (left + pr) // 2) & 0xFF
        else:  # Paeth
            filt = np.zeros_like(line)
            for i in range(len(line)):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(pr[i])
                c = int(pr[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (int(line[i]) - pred) & 0xFF
        raw += bytes([ft]) + bytes(filt.astype(np.uint8))
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_bmp_golden_pixels():
    img = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    w, h, pixels = _decode_bmp(make_bmp(img))
    assert (w, h) == (3, 2)
    assert pixels == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30, 40, 50, 60, 70, 80, 90]
    )


def test_bmp_features_via_decode_payload():
    img = [[(0, 0, 0), (255, 255, 255)]]
    feats = _decode_payload("image/bmp", make_bmp(img))
    assert feats == dict(
        _no_features(),
        byte_mean=127.5,
        byte_min=0,
        byte_max=255,
        width=2,
        height=1,
    )


@pytest.mark.parametrize("filters", [[0, 0, 0], [1, 2, 3], [4, 4, 4], [0, 4, 2]])
def test_png_all_filter_types_roundtrip(filters):
    rng = np.random.default_rng(sum(filters) + 11)
    rows = [bytes(rng.integers(0, 256, 4 * 3, dtype=np.uint8)) for _ in range(3)]
    w, h, pixels = _decode_png(make_png(rows, channels=3, filters=filters))
    assert (w, h) == (4, 3)
    assert pixels == b"".join(rows)


def test_png_grayscale_and_rgba():
    gray = [bytes([0, 100, 200, 255])]
    w, h, pixels = _decode_png(make_png(gray, channels=1))
    assert (w, h, pixels) == (4, 1, gray[0])
    rgba = [bytes(range(16))]
    w, h, pixels = _decode_png(make_png(rgba, channels=4, filters=[1]))
    assert (w, h, pixels) == (4, 1, rgba[0])


def test_png_features_via_decode_payload():
    rows = [bytes([10, 20, 30, 40])]
    feats = _decode_payload("image/png", make_png(rows, channels=1))
    assert feats == dict(
        _no_features(),
        byte_mean=25.0,
        byte_min=10,
        byte_max=40,
        width=4,
        height=1,
    )


def test_unsupported_still_raises():
    with pytest.raises(ValueError):  # implemented codec, truncated payload
        _decode_payload("image/jpeg", b"\xff\xd8\xff")
    with pytest.raises(NotImplementedError):
        _decode_payload("audio/mpeg", b"ID3")
    with pytest.raises(ValueError):
        _decode_payload("audio/wav", b"RIFF")  # truncated: not a WAV


def test_extract_features_mixed_codecs(spark):
    """The mapInPandas plumbing routes per-row media types to the right
    codec inside one Arrow batch."""
    from duckdb_vortex_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    bmp = make_bmp([[(9, 9, 9)]])
    png = make_png([bytes([1, 2, 3])], channels=1)
    fake = struct.pack("<ii", 2, 1) + bytes([5, 6])
    rows = [
        (1, "mem://a", "image/bmp", len(bmp), bytearray(bmp)),
        (2, "mem://b", "image/png", len(png), bytearray(png)),
        (3, "mem://c", "fake/raw", len(fake), bytearray(fake)),
        (4, "mem://d", "image/bmp", 0, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.doc_id: r for r in extract_features(df).collect()}
    assert out[1].byte_mean == 9.0 and out[1].width == 1 and out[1].height == 1
    assert out[2].byte_mean == 2.0 and out[2].width == 3
    assert out[3].byte_min == 5 and out[3].byte_max == 6
    assert out[4].byte_mean is None


def make_wav(samples: "np.ndarray", sample_rate: int = 8000, bits: int = 16,
             fmt: int = 1, extra_chunk: bool = False) -> bytes:
    """Minimal RIFF/WAVE from float samples shaped (frames, channels)."""
    n_ch = samples.shape[1]
    if fmt == 3:
        data = samples.astype("<f4").tobytes()
    elif bits == 8:
        data = (samples * 128.0 + 128.0).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        data = (samples * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    else:
        data = (samples * 2147483648.0).clip(-2**31, 2**31 - 1).astype("<i4").tobytes()
    balign = n_ch * bits // 8
    fmt_body = struct.pack("<HHIIHH", fmt, n_ch, sample_rate, sample_rate * balign, balign, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if extra_chunk:  # decoder must skip unknown chunks
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd length -> pad byte
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_16bit_golden():
    t = np.arange(16) / 8000.0
    mono = np.sin(2 * np.pi * 440 * t).reshape(-1, 1)
    rate, out = _decode_wav(make_wav(mono, 8000, 16))
    assert rate == 8000 and out.shape == (16, 1)
    # 16-bit quantization error bound: 1/32768
    assert np.abs(out - mono).max() <= 1.0 / 32768


def test_wav_variants_and_chunk_skip():
    stereo = np.stack([np.linspace(-0.5, 0.5, 10), np.zeros(10)], axis=1)
    for bits, fmt, tol in ((8, 1, 1 / 128), (16, 1, 1 / 32768), (32, 1, 1e-9), (32, 3, 1e-7)):
        rate, out = _decode_wav(make_wav(stereo, 44100, bits, fmt, extra_chunk=True))
        assert rate == 44100 and out.shape == (10, 2)
        assert np.abs(out - stereo).max() <= tol, (bits, fmt)


def test_wav_features_via_decode_payload():
    x = np.full((100, 2), 0.5)
    feats = _decode_payload("audio/wav", make_wav(x, 16000, 16))
    assert feats["sample_rate"] == 16000
    assert feats["n_channels"] == 2
    assert feats["n_samples"] == 100
    assert abs(feats["rms"] - 0.5) < 1e-4
    assert feats["width"] is None and feats["byte_mean"] is None


def test_extract_features_with_audio(spark):
    from duckdb_vortex_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    wav = make_wav(np.full((50, 1), -0.25), 22050, 16)
    bmp = make_bmp([[(1, 2, 3)]])
    rows = [
        (1, "mem://w", "audio/wav", len(wav), bytearray(wav)),
        (2, "mem://b", "image/bmp", len(bmp), bytearray(bmp)),
    ]
    out = {r.doc_id: r for r in extract_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert out[1].sample_rate == 22050 and out[1].n_samples == 50
    assert abs(out[1].rms - 0.25) < 1e-3
    assert out[1].width is None
    assert out[2].width == 1 and out[2].sample_rate is None


# --- GIF ------------------------------------------------------------------


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW encoder (variable width, clear/EOI) for round-trip
    tests — the decoder sees genuine dictionary-growth streams."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code, width):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, min_code_size + 1
    # the decoder rebuilds entry k only after reading the code FOLLOWING
    # the one that created it, so its width bump lands one code later
    # than a naive encoder's — defer each bump by one emission to match
    pending = False
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if pending:
            width += 1
            pending = False
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                pending = True
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
        if pending:
            width += 1
            pending = False
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(frames, palette, w, h, interlace=False, local_tables=False):
    """Assemble a GIF89a byte-for-byte. frames: list of index bytes."""
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    while len(pal) < 3 * 4:
        pal += b"\x00\x00\x00"
    gct_flag = 0 if local_tables else 0x80
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, gct_flag | 0x01, 0, 0)  # 4-entry table
    if not local_tables:
        out += pal[: 3 * 4]
    for idx in frames:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE (skipped by decoder)
        fflags = (0x80 | 0x01 if local_tables else 0) | (0x40 if interlace else 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, fflags)
        if local_tables:
            out += pal[: 3 * 4]
        if interlace:
            order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, h, st)]
            idx = b"".join(idx[r * w : (r + 1) * w] for r in order)
        mcs = 2
        out += bytes([mcs])
        data = lzw_encode(idx, mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]


def test_gif_single_frame_golden():
    from duckdb_vortex_spark.operators.multimodal import _decode_gif

    idx = bytes([0, 1, 2, 3])  # 2x2
    w, h, frames = _decode_gif(make_gif([idx], PALETTE, 2, 2))
    assert (w, h, len(frames)) == (2, 2, 1)
    assert frames[0] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


def test_gif_animated_and_local_tables():
    from duckdb_vortex_spark.operators.multimodal import _decode_gif

    f1, f2, f3 = bytes([0, 0, 1, 1]), bytes([2, 2, 3, 3]), bytes([1, 0, 3, 2])
    for local in (False, True):
        w, h, frames = _decode_gif(make_gif([f1, f2, f3], PALETTE, 2, 2, local_tables=local))
        assert (w, h, len(frames)) == (2, 2, 3)
        assert frames[2] == bytes([0, 255, 0, 255, 0, 0, 9, 9, 9, 0, 0, 255])


def test_gif_interlaced_rows():
    from duckdb_vortex_spark.operators.multimodal import _decode_gif

    # 1x8: row r holds palette index r % 4
    idx = bytes([r % 4 for r in range(8)])
    w, h, frames = _decode_gif(make_gif([idx], PALETTE, 1, 8, interlace=True))
    assert (w, h) == (1, 8)
    expect = b"".join(bytes(PALETTE[r % 4]) for r in range(8))
    assert frames[0] == expect


def test_gif_lzw_roundtrip_random():
    from duckdb_vortex_spark.operators.multimodal import _lzw_decode

    rng = np.random.default_rng(7)
    for n in (5, 64, 1000, 5000):
        idx = bytes(rng.integers(0, 4, n, dtype=np.uint8))
        assert _lzw_decode(lzw_encode(idx, 2), 2, n) == idx


def test_gif_features_via_decode_payload():
    feats = _decode_payload("image/gif", make_gif([bytes([3, 3, 3, 3])], PALETTE, 2, 2))
    assert feats["width"] == 2 and feats["height"] == 2
    assert feats["n_frames"] == 1
    assert feats["byte_mean"] == 9.0 and feats["sample_rate"] is None


def test_gif_real_encoder_interop():
    """Byte strings produced by real-world GIF encoders (the canonical
    1x1 pixel GIFs), pinning cross-encoder LZW width conventions."""
    import base64

    from duckdb_vortex_spark.operators.multimodal import _decode_gif

    transparent_1x1 = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert _decode_gif(transparent_1x1) == (1, 1, [b"\x00\x00\x00"])
    red_1x1 = base64.b64decode(
        "R0lGODlhAQABAPAAAP8AAP///yH5BAAAAAAALAAAAAABAAEAAAICRAEAOw=="
    )
    assert _decode_gif(red_1x1) == (1, 1, [b"\xff\x00\x00"])


# --- JPEG -----------------------------------------------------------------

# Goldens encoded by a REAL encoder (Java 17 javax.imageio JPEG writer,
# libjpeg-family) from known pixel patterns; *_rgb / *_l are what that
# same real DECODER produced, so the assertions pin cross-implementation
# agreement, not self-consistency.
_JPEG_GOLDEN = {
    "gray8x8": (  # 8x8 solid gray(128), q=1.0, 4:2:0
        "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/2wBDAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/wAARCAAIAAgDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwAooooA/9k="
    ),
    "red16x16": (  # 16x16 solid red, q=0.9, 4:2:0
        "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoHBwYIDAoMDAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/2wBDAQMEBAUEBQkFBQkUDQsNFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBT/wAARCAAQABADASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwD50ooor8MP9Uz/2Q=="
    ),
    "grad17x13": (  # 17x13 RGB gradient, q=1.0, 4:2:0, non-MCU-aligned
        "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/2wBDAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/wAARCAANABEDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwD+b/4TfsWeb9m/4lIOdn/LD/7H69D7mv05+E37Dnm/Zf8AiT9dn/LD6dtuf0PWv1m+C/wA8FubTMfXy/8Al3Tpxx/rP8+nNfrd8F/2dvA7m1Bj/wCef/LtGew/6aenH/16/wA1uGPFLE+JXs/rE60/rFr+15vtWbvzfP5nzH0A/wBorn+DWSWxGY+79W2jW6KHb0fmfzvf8MJf9Qb/AMgf/Y0V/Xd/wzr4F/55f+S8f/xdFfo3+pFHtT6fy+X9fLyV/wDddftLOIdP9pzPp0r/ANz+95M//9k="
    ),
    "gray10x6": (  # 10x6 single-component grayscale gradient
        "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAGAAoBAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/AIfhnosX7np2qHX/AIx+JdG8R6ppdvYaK0Fldy28bSQyliqOVBOJAM4HoK//2Q=="
    ),
}
_JPEG_EXPECT_GRAD_RGB = (  # javax.imageio's own decode of grad17x13
    "AAIACAQAGAQAJgQANgQARAMAVAQAYgMAcwQAgAMAjwQBngMArQQBvAMAywQB2QMB5QUDBBEADxMCHhMBLRMCPRMFSxMGWxMHaRMGeBMHhhQJlhMLpBQMtBMLwhQN0hIN3xQQ7BUSBCQADicAHyYELCYEPSYHSyYLWicMaSUOeCYQhycRliUTpSYXtCYYwyca0iYc3ycf6ygiBDcADjkBHjkELTkHPDoKSzoPWjgSaTkVeDkYhjkblzkfpjkiszkkwjkn0jkr4Dou7DsxBEsAD00EHUwGLUsLPEwOS0wTW0sYaksceEwfh0wklkwppUwstEwvw0w000w530w87E5CBF0AD2AEHmAJLWEPO2ATSmAYWl8daV8ieF8nh18slmA0pF84s187wl9A019G4WBL7WFQBHAAD3IFHXILLHISPHMYS3MdW3IkanErdnEvhnI3lnI+pXJDs3JIwnJN0XJU33NZ7HVfBIMADoUHHoUPLYUVPIUcS4QjWoUraYUxeIQ4hoZAlYVHpIVOs4VUw4Vc0YVj4IZr7IhwA5YAD5kIHpgRLJcWPJceS5goW5gxaZg4d5g/h5hIlpdRpphZs5lgwpho0phy35h47JuAA6kBD6sJHqsRLasbPKojS6stWqs1aas/eKpHh6tRlatZpatjtKxtwqt10qx/4KyH7a6PBLwCEL8KHr4ULL4fPL4oTL4yWr08ab5Heb5Rh75Zlr5lpb5ts755w7+C0r6M4L+W7MGfBc4EENALINAWLtAiPtAtS9A3W9BDa9BOe9BZidFlmNBtptF4ttCGxNCQ09Cb4tGl7dOuCd4GE+IQI+EbMeEnQOEzT+E+X+FLbeJWfeJii+JtmuF5qeKEuOGSx+Kd1+Ko5OOz8OS8"
)
_JPEG_EXPECT_GRAY_L = "ABozSmZ9lrC86QokPVRwh6C63vMWMElgfJOsxuHUITtUa4eet9HgIixGX3aSqcLc6gc1T2h/m7LL5f8U"


def _jpeg_bytes(name):
    import base64

    return base64.b64decode(_JPEG_GOLDEN[name])


def test_jpeg_solid_images_exact():
    """Solid-color JPEGs decode byte-exactly vs the real decoder."""
    import numpy as np

    from duckdb_vortex_spark.operators.multimodal import _decode_jpeg

    w, h, rgb = _decode_jpeg(_jpeg_bytes("gray8x8"))
    assert (w, h) == (8, 8)
    assert set(np.frombuffer(rgb, np.uint8)) == {128}

    w, h, rgb = _decode_jpeg(_jpeg_bytes("red16x16"))
    assert (w, h) == (16, 16)
    px = np.frombuffer(rgb, np.uint8).reshape(-1, 3)
    assert (px == [254, 0, 0]).all()  # q=0.9 quantization shifts red by 1


def test_jpeg_gradient_real_decoder_interop():
    """Non-MCU-aligned RGB gradient (17x13, 4:2:0): agreement with
    javax.imageio's decode within IDCT/upsample rounding (<=2/255)."""
    import base64

    import numpy as np

    from duckdb_vortex_spark.operators.multimodal import _decode_jpeg

    w, h, rgb = _decode_jpeg(_jpeg_bytes("grad17x13"))
    assert (w, h) == (17, 13)
    mine = np.frombuffer(rgb, np.uint8).astype(int)
    exp = np.frombuffer(base64.b64decode(_JPEG_EXPECT_GRAD_RGB), np.uint8).astype(int)
    assert mine.shape == exp.shape
    assert np.abs(mine - exp).max() <= 2
    assert np.abs(mine - exp).mean() <= 0.5


def test_jpeg_grayscale_single_component():
    """Single-component (luma-only) JPEG decodes byte-exactly."""
    import base64

    import numpy as np

    from duckdb_vortex_spark.operators.multimodal import _decode_jpeg

    w, h, rgb = _decode_jpeg(_jpeg_bytes("gray10x6"))
    assert (w, h) == (10, 6)
    px = np.frombuffer(rgb, np.uint8).reshape(6, 10, 3)
    exp = np.frombuffer(base64.b64decode(_JPEG_EXPECT_GRAY_L), np.uint8).reshape(6, 10)
    assert (px[:, :, 0] == exp).all()
    assert (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 0] == px[:, :, 2]).all()


def test_jpeg_via_decode_payload_features():
    feats = _decode_payload("image/jpeg", _jpeg_bytes("gray8x8"))
    assert feats["width"] == 8 and feats["height"] == 8
    assert feats["byte_mean"] == 128.0


def test_jpeg_rejects_progressive_and_garbage():
    import pytest as _pytest

    from duckdb_vortex_spark.operators.multimodal import _decode_jpeg

    with _pytest.raises(ValueError):
        _decode_jpeg(b"\x00\x01not a jpeg")
    # flip the golden's SOF0 marker to SOF2 (progressive): explicit seam
    data = bytearray(_jpeg_bytes("gray8x8"))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with _pytest.raises(NotImplementedError, match="baseline"):
        _decode_jpeg(bytes(data))


# --- AVI / MJPEG ----------------------------------------------------------

def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def _build_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     compression: bytes = b"MJPG") -> bytes:
    """Spec-conformant minimal AVI: RIFF('AVI ', LIST hdrl(avih,
    LIST strl(strh, strf=BITMAPINFOHEADER)), LIST movi('00dc'
    frames)) — the layout every MJPEG camera/ffmpeg writer emits."""
    avih = struct.pack(
        "<IIIIIIIIII4I",
        40_000,                      # usec/frame (25 fps)
        0, 0, 0x10,                  # maxbytes, padding, HASINDEX-ish flags
        len(frames), 0, 1, 0,        # total frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + compression
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, 25, 0,
                      len(frames), 0, 10_000, 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, compression, width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in frames))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


def test_avi_mjpeg_decodes_frames_via_jpeg_decoder():
    """An MJPEG AVI built from real-encoder JPEG frames decodes through
    the container walk + the interop-pinned JPEG decoder: dimensions
    from avih, every '00dc' chunk counted, sampled frames' pixels
    identical to decoding the JPEGs directly."""
    from duckdb_vortex_spark.operators.multimodal import (
        _decode_avi_mjpeg,
        _decode_jpeg,
        _decode_payload,
    )

    frames = [_jpeg_bytes("red16x16")] * 3
    avi = _build_avi_mjpeg(frames, 16, 16)
    w, h, pixels, n_frames = _decode_avi_mjpeg(avi)
    assert (w, h, n_frames) == (16, 16, 3)
    _, _, one = _decode_jpeg(frames[0])
    assert pixels[: len(one)] == one  # sampled frame == direct decode

    feats = _decode_payload("video/avi", avi)
    assert feats["n_frames"] == 3 and feats["width"] == 16 and feats["height"] == 16
    assert feats["byte_mean"] is not None


def test_avi_with_audio_stream_still_decodes_video():
    """An AVI carrying an audio stream AFTER the video strl (the layout
    every camera muxer emits) must still decode: the audio stream's
    strf (WAVEFORMATEX + extra bytes, >=20 bytes) must NOT overwrite
    the video biCompression fourcc — strf is bound to the preceding
    strh fccType, and only the 'vids' stream's strf is read."""
    from duckdb_vortex_spark.operators.multimodal import _decode_avi_mjpeg, _decode_jpeg

    frames = [_jpeg_bytes("red16x16")] * 2
    avih = struct.pack(
        "<IIIIIIIIII4I",
        40_000, 0, 0, 0x10, len(frames), 0, 2, 0, 16, 16, 0, 0, 0, 0,
    )
    vstrh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, 25, 0,
                      len(frames), 0, 10_000, 0, 0, 0, 16, 16)
    )
    vstrf = struct.pack(
        "<IiiHH4sIiiII", 40, 16, 16, 1, 24, b"MJPG", 16 * 16 * 3, 0, 0, 0, 0,
    )
    astrh = (
        b"auds" + b"\x00\x00\x00\x00"
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, 44100, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    )
    # WAVEFORMATEX for MP3 (wFormatTag=0x55) + 12 extra bytes -> 30 bytes,
    # clearing the >=20-byte bar that used to clobber the video fourcc.
    astrf = struct.pack("<HHIIHHH", 0x55, 2, 44100, 16000, 1, 0, 12) + b"\x00" * 12
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", vstrh) + _riff_chunk(b"strf", vstrf))
        + _riff_list(b"strl", _riff_chunk(b"strh", astrh) + _riff_chunk(b"strf", astrf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in frames))
    avi = _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)

    w, h, pixels, n_frames = _decode_avi_mjpeg(avi)
    assert (w, h, n_frames) == (16, 16, 2)
    _, _, one = _decode_jpeg(frames[0])
    assert pixels[: len(one)] == one


def test_avi_rejects_non_mjpeg_codec():
    """Inter-frame codecs stay behind the documented seam."""
    import pytest as _pytest

    from duckdb_vortex_spark.operators.multimodal import _decode_avi_mjpeg

    avi = _build_avi_mjpeg([_jpeg_bytes("gray8x8")], 8, 8, compression=b"H264")
    with _pytest.raises(NotImplementedError, match="H264"):
        _decode_avi_mjpeg(avi)


def test_avi_bad_magic_raises():
    import pytest as _pytest

    from duckdb_vortex_spark.operators.multimodal import _decode_avi_mjpeg

    with _pytest.raises(ValueError):
        _decode_avi_mjpeg(b"RIFXAAAA" + b"\x00" * 16)
