"""Baseline-JPEG decoder tests (operators/jpeg.py) against a test-side
encoder built straight from T.81: forward DCT, canonical Huffman
emission with tables DECLARED in the stream's own DHT segments (the
decoder must build whatever the file declares — one variable-length DC
table, one fixed-length AC table), byte stuffing, restart markers.

A unit quantization table makes the roundtrip near-lossless, so pixel
error bounds are tight (float DCT/IDCT rounding only)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from project_map_reduce_spark.operators import jpeg as J

# --- encoder-side tables (declared in DHT, so any valid set works) ---

# Annex-K-shaped DC table: 12 categories, variable code lengths 2-9.
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))

# AC table: every (run, size) pair we can emit, all at 8 bits (162
# symbols fit in the 256-slot length-8 space; prefix-free since all
# codes share one length).
_AC_SYMBOLS = bytes(
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_COUNTS = [0] * 16
_AC_COUNTS[7] = len(_AC_SYMBOLS)  # counts[7] => code length 8


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def align(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _cat(v):
    return 0 if v == 0 else abs(v).bit_length()


def _emit_coef(bw, v, t):
    if t:
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)


def _encode_gray_jpeg(w, h, pixels, *, restart_interval=0):
    px = np.frombuffer(pixels, np.uint8).astype(np.float64).reshape(h, w)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    padded = np.pad(px, ((0, bh_ * 8 - h), (0, bw_ * 8 - w)), mode="edge")
    M = J._IDCT_M
    bw = _BitWriter()
    pred = 0
    n_mcu = 0
    for by in range(bh_):
        for bx in range(bw_):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.align()
                bw.out += bytes(
                    [0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)]
                )
                pred = 0
            n_mcu += 1
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = M @ block @ M.T  # forward DCT (M orthonormal)
            # quantize (unit table) and read out in zigzag order
            q = np.rint(coef).astype(int).flatten()[J.ZIGZAG]
            diff = int(q[0]) - pred
            pred = int(q[0])
            t = _cat(diff)
            code, n = _DC_CODES[t]
            bw.write(code, n)
            _emit_coef(bw, diff, t)
            k = 63
            while k > 0 and q[k] == 0:
                k -= 1
            i = 1
            while i <= k:
                run = 0
                while q[i] == 0:
                    run += 1
                    i += 1
                while run >= 16:
                    code, n = _AC_CODES[0xF0]
                    bw.write(code, n)
                    run -= 16
                v = int(q[i])
                t = _cat(v)
                code, n = _AC_CODES[(run << 4) | t]
                bw.write(code, n)
                _emit_coef(bw, v, t)
                i += 1
            if k < 63:
                code, n = _AC_CODES[0x00]
                bw.write(code, n)
    bw.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # unit table, id 0
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
        + bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS,
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(bw.out) + b"\xff\xd9"
    )


# --- tests -----------------------------------------------------------


def test_jpeg_uniform_block_exact():
    w, h = 16, 16
    pixels = bytes([137]) * (w * h)
    raw = _encode_gray_jpeg(w, h, pixels)
    dw, dh, out = J.decode_jpeg_gray(raw)
    assert (dw, dh) == (w, h)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int)
        - np.frombuffer(pixels, np.uint8).astype(int)
    )
    assert err.max() <= 1


def test_jpeg_gradient_roundtrip_with_crop():
    """Non-multiple-of-8 dims exercise edge-padding and cropping; unit
    quantization keeps the error within DCT float rounding."""
    w, h = 29, 18
    pixels = bytes(
        (7 * x + 11 * y) % 256 for y in range(h) for x in range(w)
    )
    raw = _encode_gray_jpeg(w, h, pixels)
    dw, dh, out = J.decode_jpeg_gray(raw)
    assert (dw, dh) == (w, h)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int)
        - np.frombuffer(pixels, np.uint8).astype(int)
    )
    assert err.max() <= 3, err.max()


def test_jpeg_noise_and_byte_stuffing():
    """Pseudo-random pixels produce dense AC runs (ZRL paths, large
    magnitudes) and, statistically, stuffed 0xFF scan bytes."""
    w, h = 24, 16
    pixels = bytes((i * 2654435761) % 256 for i in range(w * h))
    raw = _encode_gray_jpeg(w, h, pixels)
    dw, dh, out = J.decode_jpeg_gray(raw)
    assert (dw, dh) == (w, h)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int)
        - np.frombuffer(pixels, np.uint8).astype(int)
    )
    assert err.max() <= 3, err.max()


def test_jpeg_restart_markers():
    w, h = 40, 8  # 5 MCUs; interval 2 -> RST0 after 2, RST1 after 4
    pixels = bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
    plain = _encode_gray_jpeg(w, h, pixels)
    with_rst = _encode_gray_jpeg(w, h, pixels, restart_interval=2)
    assert b"\xff\xd0" in with_rst  # marker actually present
    assert J.decode_jpeg_gray(with_rst) == J.decode_jpeg_gray(plain)


def test_jpeg_rejects_malformed_and_progressive():
    w, h = 8, 8
    raw = _encode_gray_jpeg(w, h, bytes(64))
    with pytest.raises(ValueError):
        J.decode_jpeg_gray(raw[:40])  # truncated mid-headers
    with pytest.raises(ValueError):
        # SOF9: arithmetic-coded sequential — not supported
        J.decode_jpeg_gray(raw.replace(b"\xff\xc0", b"\xff\xc9"))
    with pytest.raises(ValueError):
        J.decode_jpeg_gray(b"not a jpeg")


def test_jpeg_rejects_truncated_scan():
    """A stream cut mid-entropy-data must raise, not silently decode
    the tail blocks from zero padding (the _fill zero-feed)."""
    w, h = 29, 18
    pixels = bytes((7 * x + 11 * y) % 256 for y in range(h) for x in range(w))
    raw = _encode_gray_jpeg(w, h, pixels)
    sos = raw.index(b"\xff\xda")
    scan_start = sos + 2 + struct.unpack(">H", raw[sos + 2 : sos + 4])[0]
    # cut half the entropy bytes (and the EOI with them)
    cut = scan_start + (len(raw) - 2 - scan_start) // 2
    with pytest.raises(ValueError):
        J.decode_jpeg_gray(raw[:cut])
    # scan data intact but EOI marker missing → still malformed
    with pytest.raises(ValueError):
        J.decode_jpeg_gray(raw[:-2])


# --- MJPEG AVI: demux + decode = real video frame extraction ---------


def _make_avi(w, h, frames, *, junk_audio=True):
    """Minimal spec-shaped AVI: RIFF('AVI ') → LIST hdrl (avih) +
    LIST movi ('00dc' video chunks, optionally '01wb' audio chunks the
    demux must skip)."""

    def chunk(fourcc, data):
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack(
        "<10I", 40000, 0, 0, 0, len(frames), 0, 1, 0, w, h
    ) + bytes(16)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi_body = b"movi"
    for i, f in enumerate(frames):
        movi_body += chunk(b"00dc", f)
        if junk_audio:
            movi_body += chunk(b"01wb", bytes(5 + i))  # odd size → pad
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_demux_and_decode_frames():
    """End-to-end MJPEG video: 3 distinct JPEG frames packed into an
    AVI; avi_info reads the header, avi_video_frames returns true
    offsets (skipping interleaved audio chunks), and every sliced
    frame decodes back to its source pixels."""
    from project_map_reduce_spark.operators import codecs

    w, h = 16, 8
    planes = [
        bytes((i * 40 + 3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
        for i in range(3)
    ]
    jpegs = [_encode_gray_jpeg(w, h, p) for p in planes]
    avi = _make_avi(w, h, jpegs)
    assert codecs.avi_info(avi) == (w, h, 3)
    frames = codecs.avi_video_frames(avi)
    assert len(frames) == 3
    for (off, ln), jpg, plane in zip(frames, jpegs, planes):
        assert avi[off : off + ln] == jpg
        dw, dh, out = J.decode_jpeg_gray(avi[off : off + ln])
        assert (dw, dh) == (w, h)
        err = np.abs(
            np.frombuffer(out, np.uint8).astype(int)
            - np.frombuffer(plane, np.uint8).astype(int)
        )
        assert err.max() <= 3


def test_avi_demux_malformed():
    from project_map_reduce_spark.operators import codecs

    with pytest.raises(ValueError):
        codecs.avi_info(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    avi = _make_avi(8, 8, [_encode_gray_jpeg(8, 8, bytes(64))])
    with pytest.raises(ValueError):
        codecs.avi_video_frames(avi[:-10])  # truncated movi chunk
    # header-only AVI (no movi) → no frames
    no_movi = avi[: avi.index(b"movi") - 12]
    with pytest.raises(ValueError):
        codecs.avi_video_frames(no_movi)
