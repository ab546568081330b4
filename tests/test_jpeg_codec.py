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


# --- progressive (SOF2) encoder: spectral selection + successive
# --- approximation, from the T.81 Annex G flowcharts ----------------

# AC table for progressive scans: EOBn codes (r<<4 for r in 0..14) in
# addition to ZRL and every (run, size) pair — all at code length 8.
_PAC_SYMBOLS = bytes(
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_PAC_COUNTS = [0] * 16
_PAC_COUNTS[7] = len(_PAC_SYMBOLS)
_PAC_CODES = _canonical_codes(_PAC_COUNTS, _PAC_SYMBOLS)


def _dct_quant_blocks(w, h, pixels):
    """Quantized (unit table) zigzag-order coefficient blocks, raster
    order over the edge-padded 8x8 grid — the shared forward path for
    the baseline and progressive encoders."""
    px = np.frombuffer(pixels, np.uint8).astype(np.float64).reshape(h, w)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    padded = np.pad(px, ((0, bh_ * 8 - h), (0, bw_ * 8 - w)), mode="edge")
    M = J._IDCT_M
    out = []
    for by in range(bh_):
        for bx in range(bw_):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = M @ block @ M.T
            out.append(np.rint(coef).astype(int).flatten()[J.ZIGZAG])
    return out


def _emit_dc_scan(bw, blocks, ah, al):
    if ah == 0:
        pred = 0
        for q in blocks:
            v = int(q[0]) >> al  # arithmetic shift: the DC point transform
            diff = v - pred
            pred = v
            t = _cat(diff)
            code, n = _DC_CODES[t]
            bw.write(code, n)
            _emit_coef(bw, diff, t)
    else:
        for q in blocks:
            bw.write((int(q[0]) >> al) & 1, 1)


def _ac_point(v, al):
    """AC point transform: magnitude shift, sign preserved (G.1.2.1)."""
    t = abs(int(v)) >> al
    return t if v >= 0 else -t


def _emit_ac_first(bw, blocks, ss, se, al):
    eob = 0

    def flush():
        nonlocal eob
        if not eob:
            return
        rr = eob.bit_length() - 1
        code, n = _PAC_CODES[rr << 4]
        bw.write(code, n)
        if rr:
            bw.write(eob - (1 << rr), rr)
        eob = 0

    for q in blocks:
        vals = [_ac_point(q[k], al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eob += 1
            continue
        flush()
        r = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r >= 16:
                code, n = _PAC_CODES[0xF0]
                bw.write(code, n)
                r -= 16
            t = _cat(v)
            code, n = _PAC_CODES[(r << 4) | t]
            bw.write(code, n)
            _emit_coef(bw, v, t)
            r = 0
        if nz[-1] < len(vals) - 1:
            eob += 1  # trailing zeros fold into an EOB run
    flush()


def _emit_ac_refine(bw, blocks, ss, se, al):
    eob = 0
    pend = []

    def flush():
        nonlocal eob, pend
        if not eob:
            assert not pend
            return
        rr = eob.bit_length() - 1
        code, n = _PAC_CODES[rr << 4]
        bw.write(code, n)
        if rr:
            bw.write(eob - (1 << rr), rr)
        for b in pend:
            bw.write(b, 1)
        eob = 0
        pend = []

    for q in blocks:
        vals = [_ac_point(q[k], al) for k in range(ss, se + 1)]
        hist = [abs(int(q[k])) >> (al + 1) != 0 for k in range(ss, se + 1)]
        new = [i for i, (v, hh) in enumerate(zip(vals, hist)) if v and not hh]
        if not new:
            eob += 1
            pend += [abs(vals[i]) & 1 for i in range(len(vals)) if hist[i]]
            continue
        flush()
        last_new = new[-1]
        r = 0
        br = []

        def zrls():
            nonlocal r, br
            while r > 15:
                code, n = _PAC_CODES[0xF0]
                bw.write(code, n)
                r -= 16
                for b in br:
                    bw.write(b, 1)
                br = []

        for i in range(last_new + 1):
            if hist[i]:
                zrls()  # ZRLs emit at ANY nonzero, before its bit
                br.append(abs(vals[i]) & 1)
            elif vals[i] == 0:
                r += 1
            else:
                assert abs(vals[i]) == 1, "refine scan must be Ah=Al+1"
                zrls()
                code, n = _PAC_CODES[(r << 4) | 1]
                bw.write(code, n)
                bw.write(1 if vals[i] > 0 else 0, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                r = 0
        tail = [
            abs(vals[i]) & 1
            for i in range(last_new + 1, len(vals))
            if hist[i]
        ]
        if last_new < len(vals) - 1:
            eob += 1
            pend += tail
    flush()


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _prog_headers(w, h, ncomp):
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, ncomp)
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp)),
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
        + bytes([0x10]) + bytes(_PAC_COUNTS) + _PAC_SYMBOLS,
    )
    return b"\xff\xd8" + dqt + sof + dht


def _sos(comp_ids, ss, se, ah, al):
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])
    return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def _encode_gray_progressive(w, h, pixels, scans):
    """scans: list of ('dc', ah, al) / ('ac', ss, se, ah, al)."""
    blocks = _dct_quant_blocks(w, h, pixels)
    out = bytearray(_prog_headers(w, h, 1))
    for sc in scans:
        bw = _BitWriter()
        if sc[0] == "dc":
            _, ah, al = sc
            out += _sos([1], 0, 0, ah, al)
            _emit_dc_scan(bw, blocks, ah, al)
        else:
            _, ss, se, ah, al = sc
            out += _sos([1], ss, se, ah, al)
            if ah == 0:
                _emit_ac_first(bw, blocks, ss, se, al)
            else:
                _emit_ac_refine(bw, blocks, ss, se, al)
        bw.align()
        out += bw.out
    return bytes(out + b"\xff\xd9")


# --- progressive tests ----------------------------------------------


def _gradient(w, h, a=7, b=11):
    return bytes((a * x + b * y) % 256 for y in range(h) for x in range(w))


_FULL_SCANS = [
    ("dc", 0, 1),          # DC first at Al=1
    ("ac", 1, 5, 0, 2),    # low band first at Al=2
    ("ac", 6, 63, 0, 2),   # high band first at Al=2
    ("dc", 1, 0),          # DC refinement to full precision
    ("ac", 1, 5, 2, 1),    # low band refine Al=2→1 (Ah=2)
    ("ac", 6, 63, 2, 1),
    ("ac", 1, 5, 1, 0),    # low band refine Al=1→0 (Ah=1)
    ("ac", 6, 63, 1, 0),
]


def test_progressive_spectral_only_equals_baseline():
    """Spectral-selection-only progressive (DC + two AC band scans at
    full precision) must decode BYTE-IDENTICAL to the baseline decode
    of the same pixels: same quantized coefficients, same IDCT."""
    for w, h in ((16, 16), (29, 18), (8, 8)):
        pixels = _gradient(w, h)
        base = J.decode_jpeg_gray(_encode_gray_jpeg(w, h, pixels))
        prog = _encode_gray_progressive(
            w, h, pixels,
            [("dc", 0, 0), ("ac", 1, 5, 0, 0), ("ac", 6, 63, 0, 0)],
        )
        assert J.decode_jpeg_gray(prog) == base


def test_progressive_successive_approximation_equals_baseline():
    """Full successive-approximation ladder (DC Al=1→0, AC Al=2→1→0
    over split bands): refinement bits must reassemble the exact
    coefficients, so the decode equals the baseline decode."""
    for w, h in ((24, 16), (29, 18)):
        pixels = bytes((i * 2654435761) % 256 for i in range(w * h))
        base = J.decode_jpeg_gray(_encode_gray_jpeg(w, h, pixels))
        prog = _encode_gray_progressive(w, h, pixels, _FULL_SCANS)
        assert J.decode_jpeg_gray(prog) == base


def test_progressive_eob_runs():
    """A mostly-flat image (many all-zero AC bands) forces EOBn codes
    with run > 1 — the batched-skip path on both first and refinement
    scans, including correction bits carried by skipped blocks."""
    w, h = 64, 24  # 24 blocks, most of them flat
    px = bytearray([120]) * (w * h)
    for y in range(8):           # texture only the top-left block
        for x in range(8):
            px[y * w + x] = (120 + 13 * x * y) % 256
    for y in range(8):           # and one mid-image block
        for x in range(8):
            px[(8 + y) * w + 32 + x] = (40 + 29 * x + 17 * y) % 256
    pixels = bytes(px)
    base = J.decode_jpeg_gray(_encode_gray_jpeg(w, h, pixels))
    prog = _encode_gray_progressive(w, h, pixels, _FULL_SCANS)
    assert J.decode_jpeg_gray(prog) == base


def test_progressive_roundtrip_property():
    """Randomized-image extension of the roundtrip property: for a
    spread of sizes and pixel mixes, progressive == baseline decode."""
    rnd = 2654435761
    for seed, (w, h) in enumerate(((9, 9), (17, 12), (40, 8), (8, 33))):
        pixels = bytes(
            ((i * rnd) ^ (seed * 40503)) % 256 for i in range(w * h)
        )
        base = J.decode_jpeg_gray(_encode_gray_jpeg(w, h, pixels))
        prog = _encode_gray_progressive(w, h, pixels, _FULL_SCANS)
        assert J.decode_jpeg_gray(prog) == base


def test_progressive_color_interleaved_dc_and_chroma_skip():
    """3-component progressive: interleaved DC scan (all components
    entropy-decoded to keep sync) + per-component AC scans — the
    chroma AC scans are skipped to the next marker, and the luma plane
    must still equal the grayscale baseline decode."""
    w, h = 16, 16
    luma = _gradient(w, h)
    cb = _gradient(w, h, 3, 5)
    cr = _gradient(w, h, 13, 1)
    planes = [luma, cb, cr]
    blocks = [_dct_quant_blocks(w, h, p) for p in planes]
    out = bytearray(_prog_headers(w, h, 3))
    # interleaved DC scan: per MCU (1x1 sampling: one block per comp)
    out += _sos([1, 2, 3], 0, 0, 0, 0)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for m in range(len(blocks[0])):
        for ci in range(3):
            v = int(blocks[ci][m][0])
            diff = v - preds[ci]
            preds[ci] = v
            t = _cat(diff)
            code, n = _DC_CODES[t]
            bw.write(code, n)
            _emit_coef(bw, diff, t)
    bw.align()
    out += bw.out
    for ci in range(3):  # per-component AC scans
        out += _sos([ci + 1], 1, 63, 0, 0)
        bw = _BitWriter()
        _emit_ac_first(bw, blocks[ci], 1, 63, 0)
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    base = J.decode_jpeg_gray(_encode_gray_jpeg(w, h, luma))
    assert J.decode_jpeg_gray(bytes(out)) == base


def test_progressive_rejects_malformed():
    w, h = 16, 16
    pixels = _gradient(w, h)
    prog = _encode_gray_progressive(w, h, pixels, _FULL_SCANS)
    with pytest.raises(ValueError):  # truncated mid-scan, EOI gone
        J.decode_jpeg_gray(prog[: len(prog) * 2 // 3])
    with pytest.raises(ValueError):  # headers only, no scan at all
        J.decode_jpeg_gray(_prog_headers(w, h, 1) + b"\xff\xd9")


def _encode_gray_progressive_rst(w, h, pixels, scans, ri):
    """Progressive encoder variant with restart intervals: every ``ri``
    MCUs (blocks — single-component scans) the entropy segment
    byte-aligns, pending EOB runs flush BEFORE the marker (a run may
    not cross a restart boundary), an RSTn marker lands in the stream,
    and DC predictors reset."""
    blocks = _dct_quant_blocks(w, h, pixels)
    out = bytearray(_prog_headers(w, h, 1))
    out += _seg(0xDD, struct.pack(">H", ri))  # DRI
    for sc in scans:
        bw = _BitWriter()
        if sc[0] == "dc":
            _, ah, al = sc
            out += _sos([1], 0, 0, ah, al)
            pred = 0
            for m, q in enumerate(blocks):
                if ri and m and m % ri == 0:
                    bw.align()
                    bw.out += bytes([0xFF, 0xD0 + ((m // ri - 1) % 8)])
                    pred = 0
                if ah == 0:
                    v = int(q[0]) >> al
                    diff = v - pred
                    pred = v
                    t = _cat(diff)
                    code, n = _DC_CODES[t]
                    bw.write(code, n)
                    _emit_coef(bw, diff, t)
                else:
                    bw.write((int(q[0]) >> al) & 1, 1)
        else:
            _, ss, se, ah, al = sc
            out += _sos([1], ss, se, ah, al)
            emit = _emit_ac_first if ah == 0 else _emit_ac_refine
            # emit per restart-interval chunk: EOB runs cannot cross
            # the boundary, and each chunk is its own entropy segment
            for c0 in range(0, len(blocks), ri):
                if c0:
                    bw.align()
                    bw.out += bytes([0xFF, 0xD0 + ((c0 // ri - 1) % 8)])
                emit(bw, blocks[c0 : c0 + ri], ss, se, al)
        bw.align()
        out += bw.out
    return bytes(out + b"\xff\xd9")


def test_progressive_restart_intervals():
    """Restart markers inside progressive scans (DC and AC, first and
    refinement): predictors and EOB runs reset per interval, and the
    decode equals the no-restart decode, which equals baseline."""
    w, h = 48, 24  # 18 blocks; ri=4 → 4 restarts per scan
    px = bytearray([130]) * (w * h)
    for y in range(8):
        for x in range(8):
            px[y * w + x] = (50 + 17 * x + 23 * y) % 256
            px[(16 + y) * w + 40 + x] = (10 + 29 * x * y) % 256
    pixels = bytes(px)
    base = J.decode_jpeg_gray(_encode_gray_jpeg(w, h, pixels))
    rst = _encode_gray_progressive_rst(w, h, pixels, _FULL_SCANS, 4)
    assert rst.count(b"\xff\xd0") >= 1  # markers really present
    assert J.decode_jpeg_gray(rst) == base


def test_progressive_dc_predictor_overflow_safe():
    """A DC scan whose predictor walks past 2^31 (max-category diffs at
    Al=13, hundreds of blocks) must decode deterministically — not wrap
    (numpy 1.x int32) or raise OverflowError (numpy 2.x): the
    coefficient store is int64 and the output clamps per pixel."""
    w = h = 128  # 256 blocks; 2047<<13 per block walks past 2^31
    out = bytearray(_prog_headers(w, h, 1))
    out += _sos([1], 0, 0, 0, 13)
    bw = _BitWriter()
    for _ in range((w // 8) * (h // 8)):
        code, n = _DC_CODES[11]
        bw.write(code, n)
        _emit_coef(bw, 2047, 11)  # +2047 diff every block
    bw.align()
    out += bw.out + b"\xff\xd9"
    dw, dh, px = J.decode_jpeg_gray(bytes(out))
    assert (dw, dh) == (w, h)
    assert len(px) == w * h
    assert set(px) == {255}  # huge positive DC clamps white everywhere
