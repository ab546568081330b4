"""Pure-Python/numpy baseline JPEG decoder (ITU T.81, public spec).

The last codec step the multimodal layer stubbed was JPEG's
compressed-pixel decode — but the baseline sequential DCT process is
fully specified in T.81 and needs nothing beyond integer Huffman
tables and an 8×8 IDCT (numpy). This module implements it:

- marker segment parse: DQT (8/16-bit tables), DHT (canonical Huffman
  code construction per Annex C), SOF0/SOF1 (baseline/extended
  sequential), SOF2 (progressive), SOS, DRI;
- entropy decode: MSB-first bit reader with byte-stuffing removal
  (FF 00 → FF), DC diff + EXTEND (F.2.2.1), AC run-length with ZRL and
  EOB, restart-marker handling (byte-align, reset DC predictors),
  truncation detection (consuming a zero-fed phantom bit or ending a
  scan without a terminating marker raises);
- PROGRESSIVE mode (T.81 Annex G, the dominant web-crawl JPEG flavor):
  multi-scan coefficient accumulation across spectral-selection bands
  and successive-approximation precision levels — interleaved and
  single-component DC scans (first + refinement bits), AC first scans
  with EOBn run codes, AC refinement with correction bits (runs count
  zero-history positions only), per-scan DHT/DRI redefinition, restart
  intervals inside any scan; chroma AC scans (single-component by
  B.2.3) are skipped to the next marker since only luma is emitted;
- dequantize → de-zigzag → vectorized IDCT (einsum over the 8×8
  DCT-II basis) → +128 level shift → clamp (shared by both modes);
- LUMA-ONLY output: chroma blocks are entropy-decoded where the
  bitstream demands it to stay in sync, then discarded — the
  multimodal surface is grayscale (same convention as the GIF
  palette-luminance decode). Output is cropped to the true dims.

Arithmetic-coded JPEG (SOF9/10/11/13-15) is a DECLARED WON'T-FIX, not
a pending gap: T.81's QM-coder requires the 113-entry probability
state machine of Table D.3 — a designed artifact that cannot be
re-derived from first principles, and no authoritative copy of it (or
any real arithmetic-coded sample to validate against) is available in
this offline environment. Shipping a reconstructed-from-memory table
would decode real files into silently WRONG pixels; an explicit error
is the correct engineering contract. So: these markers raise a
distinct "arithmetic-coded JPEG" ValueError, the multimodal layer
catches it and emits its in-band stub row with TRUE header dimensions
(tests/test_multimodal.py asserts the full chain), and a future
environment with the verified table swaps the raise for a decoder
without touching any caller. Hierarchical/lossless Huffman processes
(SOF3/5/6/7) also raise — never seen in crawls. Together baseline +
progressive cover essentially every real-world file. The test encoder
(tests/test_jpeg_codec.py, from-spec) emits both supported modes, and
progressive decodes are asserted equal to the BASELINE decode of the
same quantized coefficients, so the two code paths cross-check each
other rather than sharing a mistake.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 IDCT basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_IDCT_M = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])


class _Huff:
    """Canonical JPEG Huffman table (T.81 Annex C): an 8-bit first-level
    lookup table resolves codes up to 8 bits in one step (the vast
    majority — Annex K tables put all the hot symbols at ≤ 8 bits);
    longer codes fall back to the canonical per-length
    (min, max, value-offset) walk."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_off = [0] * 17
        self.symbols = symbols
        self.lut: list[tuple[int, int] | None] = [None] * 256
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            self.val_off[length] = k
            self.min_code[length] = code
            self.max_code[length] = code + n - 1 if n else -1
            if length <= 8:
                for _ in range(n):
                    base = code << (8 - length)
                    hit = (symbols[k + code - self.min_code[length]], length)
                    for suffix in range(1 << (8 - length)):
                        self.lut[base | suffix] = hit
                    code += 1
                code -= n  # restore for the canonical bookkeeping below
            code += n
            k += n
            code <<= 1
        if k != len(symbols):
            raise ValueError("DHT symbol count mismatch")


class _BitReader:
    """MSB-first scan-data reader: un-stuffs FF 00, stops at markers,
    surfaces restart markers for the MCU loop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None  # pending non-restart marker
        self.zero_fed = 0  # phantom bits fed past marker/EOF

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # feed zeros past the end; legal only as long as the
                # decoder never CONSUMES them (checked at interval/scan
                # boundaries — consuming one means truncated scan data)
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                self.zero_fed += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                    self.data
                ) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: NOT consumed here — the MCU loop
                    # calls expect_restart() at the interval boundary
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def huff(self, table: _Huff) -> int:
        # fast path: resolve ≤8-bit codes in one first-level LUT probe
        if self.nbits < 8:
            self._fill()
        hit = table.lut[(self.bitbuf >> (self.nbits - 8)) & 0xFF]
        if hit is not None:
            self.nbits -= hit[1]
            return hit[0]
        # long codes: canonical per-length walk, consuming bit by bit
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if table.max_code[length] >= 0 and code <= table.max_code[length]:
                idx = table.val_off[length] + code - table.min_code[length]
                return table.symbols[idx]
        raise ValueError("invalid Huffman code in scan data")

    def check_no_overrun(self) -> None:
        """Raise if any zero-fed phantom bit was actually consumed —
        i.e. the entropy stream ran out mid-MCU and the remaining
        blocks decoded from fabricated zeros. Phantom bits are fed
        strictly last, so the unconsumed tail of the buffer must still
        hold all of them."""
        if self.zero_fed > self.nbits:
            raise ValueError("JPEG scan data exhausted before final MCU")

    def expect_restart(self, n: int) -> None:
        """Byte-align and consume restart marker RSTn (mod 8)."""
        self.check_no_overrun()
        self.bitbuf = 0
        self.nbits = 0
        self.zero_fed = 0
        if self.marker is None:
            self._fill()  # force the reader up to the marker
            self.bitbuf = 0
            self.nbits = 0
            self.zero_fed = 0
        if self.marker != 0xD0 + (n & 7):
            raise ValueError(
                f"expected RST{n & 7}, found "
                f"{'none' if self.marker is None else hex(self.marker)}"
            )
        self.pos += 2
        self.marker = None

    def expect_scan_end(self) -> None:
        """After the final MCU: verify no phantom bits were consumed
        and that a real marker terminates the scan (EOI, DNL, or —
        in a progressive stream — the next scan's headers). A stream
        that just stops at EOF decoded its tail from zero padding."""
        self.check_no_overrun()
        if self.marker is not None:
            return
        pos = self.pos
        while pos + 1 < len(self.data):
            if self.data[pos] == 0xFF and self.data[pos + 1] != 0x00:
                self.marker = self.data[pos + 1]
                self.pos = pos  # at the marker's 0xFF
                return
            pos += 1
        raise ValueError("truncated JPEG scan (no terminating marker)")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1: map t magnitude bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(raw: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline OR progressive JPEG's luma plane to 8-bit
    grayscale.

    Returns (width, height, pixels) row-major. Raises ValueError for
    arithmetic-coded and hierarchical processes, 12-bit precision, and
    malformed/truncated streams."""
    try:
        return _decode(raw)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"malformed JPEG: {ex}") from ex


def _decode(raw: bytes) -> tuple[int, int, bytes]:
    if raw[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (w, h, components)
    progressive = False
    prog: _ProgState | None = None
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker desync at {pos}")
        marker = raw[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(raw):
            break
        (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        seg = raw[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                vals = seg[p : p + n]
                if len(vals) != n:
                    raise ValueError("truncated DQT")
                arr = (
                    np.frombuffer(vals, ">u2")
                    if pq
                    else np.frombuffer(vals, np.uint8)
                ).astype(np.float64)
                qt[tq] = arr
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(
                    counts, symbols
                )
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            # Declared won't-fix (see module docstring): the QM-coder's
            # Table D.3 state machine cannot be verified offline, and a
            # reconstructed table would decode real files silently
            # wrong. Contract: raise HERE (distinct message), so the
            # multimodal chain degrades to its in-band stub row with
            # TRUE header dimensions — asserted in tests.
            raise ValueError(
                f"arithmetic-coded JPEG (SOF marker 0x{marker:02x}): "
                "QM-coder decode is a declared won't-fix"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — scan follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            scan_order = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
                scan_order.append(cs)
            if not progressive:
                return _decode_scan(
                    raw,
                    pos + 2 + seglen,
                    frame,
                    scan_tables,
                    qt,
                    huff_dc,
                    huff_ac,
                    restart_interval,
                )
            if prog is None:
                prog = _ProgState(frame)
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = prog.decode_scan(
                raw,
                pos + 2 + seglen,
                scan_order,
                scan_tables,
                huff_dc,
                huff_ac,
                restart_interval,
                ss,
                se,
                ahl >> 4,
                ahl & 0x0F,
            )
            continue
        pos += 2 + seglen
    if prog is not None:
        return prog.finish(qt)
    raise ValueError("no scan data found")


def _decode_scan(
    raw, pos, frame, scan_tables, qt, huff_dc, huff_ac, restart_interval
):
    w, h, comps = frame
    if not comps:
        raise ValueError("no components")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("bad sampling factors")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    luma = comps[0]
    if (luma["h"], luma["v"]) != (hmax, vmax):
        # luma subsampled below another component would leave the
        # output plane smaller than (w, h) — reject rather than return
        # a short buffer (essentially nonexistent in real files)
        raise ValueError("luma is not the max-resolution component")
    for c in comps:
        if c["id"] not in scan_tables:
            raise ValueError(f"component {c['id']} missing from scan")
        if c["tq"] not in qt:
            raise ValueError(f"missing quant table {c['tq']}")
        td, ta = scan_tables[c["id"]]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("missing Huffman table for scan")

    r = _BitReader(raw, pos)
    pred = {c["id"]: 0 for c in comps}
    # luma block grid (in 8px blocks), sized to full MCUs
    lw, lh = mcus_x * luma["h"], mcus_y * luma["v"]
    blocks = np.zeros((lh * lw, 64), np.float64)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.expect_restart(n_mcu // restart_interval - 1)
                pred = {c["id"]: 0 for c in comps}
            n_mcu += 1
            for c in comps:
                td, ta = scan_tables[c["id"]]
                dc_t, ac_t = huff_dc[td], huff_ac[ta]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = _decode_block(r, dc_t, ac_t, pred, c["id"])
                        if c is luma:
                            row = my * luma["v"] + by
                            col = mx * luma["h"] + bx
                            blocks[row * lw + col] = coef * q
    r.expect_scan_end()
    return _idct_plane(blocks, lw, lh, w, h)


def _idct_plane(blocks, lw, lh, w, h):
    """Dezigzag + vectorized IDCT over all (dequantized) luma blocks,
    stitch the lh×lw block grid into a plane, crop to true dims."""
    dz = np.zeros_like(blocks)
    dz[:, ZIGZAG] = blocks
    dz = dz.reshape(-1, 8, 8)
    pix = np.einsum("ux,nuv,vy->nxy", _IDCT_M, dz, _IDCT_M) + 128.0
    pix = np.clip(np.rint(pix), 0, 255).astype(np.uint8)
    plane = (
        pix.reshape(lh, lw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(lh * 8, lw * 8)
    )
    return w, h, plane[:h, :w].tobytes()


def _decode_block(r, dc_t, ac_t, pred, cid):
    coef = np.zeros(64, np.float64)
    t = r.huff(dc_t)
    if t > 11:
        raise ValueError(f"bad DC magnitude category {t}")
    diff = _extend(r.bits(t), t)
    pred[cid] += diff
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = r.huff(ac_t)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(r.bits(size), size)
        k += 1
    return coef


def _skip_entropy(raw: bytes, pos: int) -> int:
    """Advance past a scan's entropy data to the next real marker
    (entropy segments carry no length field): stuffed FF 00 bytes and
    restart markers are scan-interior, everything else terminates.
    Used for chroma AC scans, whose coefficients the luma-only surface
    never needs — each progressive AC scan is single-component, so the
    bitstream stays in sync without decoding them."""
    while pos + 1 < len(raw):
        if raw[pos] != 0xFF:
            pos += 1
            continue
        nxt = raw[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
        elif nxt == 0xFF:
            pos += 1
        else:
            return pos
    raise ValueError("truncated JPEG scan (no terminating marker)")


def _ac_first(r, table, block, ss, se, al, eobrun):
    """Progressive AC first scan (Ah=0), one block's band (T.81
    G.1.2.2): run-length + EOBn codes, new coefficients land at
    magnitude << Al. Returns the remaining EOB run (blocks whose band
    is entirely zero in this scan)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = r.huff(table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            extra = r.bits(run) if run else 0
            return (1 << run) + extra - 1  # EOBn includes this block
        k += run
        if k > se:
            raise ValueError("AC run past end of band")
        block[k] = _extend(r.bits(size), size) << al
        k += 1
    return 0


def _ac_refine(r, table, block, ss, se, al, eobrun):
    """Progressive AC refinement scan (Ah=Al+1), one block's band
    (T.81 G.1.2.3): newly-nonzero coefficients arrive as ±1<<Al;
    every already-nonzero coefficient traversed consumes a correction
    bit. Mirrors the spec flowchart (and libjpeg's formulation): runs
    count ZERO-HISTORY positions only."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = r.huff(table)
            run, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if run != 15:
                    extra = r.bits(run) if run else 0
                    eobrun = (1 << run) + extra
                    break
                # ZRL: skip 16 zero-history positions
            elif size == 1:
                val = p1 if r.bits(1) else -p1
            else:
                raise ValueError("bad magnitude in AC refinement")
            zskip = run
            while k <= se:
                if block[k] != 0:
                    if r.bits(1) and (int(block[k]) & p1) == 0:
                        block[k] += p1 if block[k] > 0 else -p1
                else:
                    if zskip == 0:
                        break
                    zskip -= 1
                k += 1
            if size:
                if k > se:
                    raise ValueError("AC refinement run past band end")
                block[k] = val
            k += 1
    if eobrun > 0:
        # this block belongs to an EOB run: no new coefficients, but
        # every nonzero-history position still carries a correction bit
        while k <= se:
            if block[k] != 0:
                if r.bits(1) and (int(block[k]) & p1) == 0:
                    block[k] += p1 if block[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


class _ProgState:
    """Progressive (SOF2) decode state, filled scan by scan: per-scan
    DC predictors, the EOB-run counter, and the LUMA coefficient
    accumulator (chroma blocks are entropy-decoded only where the
    bitstream demands it — interleaved DC scans — and their AC scans,
    always single-component per T.81, are skipped outright). After the
    last scan, ``finish`` dequantizes and IDCTs exactly like the
    baseline path (shared ``_idct_plane``)."""

    def __init__(self, frame):
        w, h, comps = frame
        if not comps:
            raise ValueError("no components")
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        if hmax < 1 or vmax < 1:
            raise ValueError("bad sampling factors")
        self.frame = frame
        self.mcus_x = -(-w // (8 * hmax))
        self.mcus_y = -(-h // (8 * vmax))
        for c in comps:
            # interleaved (MCU-padded) grid vs the non-interleaved grid
            # (T.81 A.2.2: ceil over the component's own sample dims)
            c["bw"] = self.mcus_x * c["h"]
            c["bh"] = self.mcus_y * c["v"]
            cw = -(-(w * c["h"]) // hmax)
            ch = -(-(h * c["v"]) // vmax)
            c["nw"] = -(-cw // 8)
            c["nh"] = -(-ch // 8)
        self.luma = comps[0]
        if (self.luma["h"], self.luma["v"]) != (hmax, vmax):
            raise ValueError("luma is not the max-resolution component")
        self.by_id = {}
        for c in comps:
            if c["id"] in self.by_id:
                raise ValueError("duplicate component id")
            self.by_id[c["id"]] = c
        # int64, not int32: a (corrupt or adversarial) DC scan can walk
        # the predictor past 2^31 across many blocks (diffs are only
        # bounded per block), and numpy would either wrap silently
        # (1.x) or raise OverflowError outside the ValueError contract
        # (2.x). int64 is unreachable: ≤ 2^26 blocks by the dimension
        # fields × max |pred<<13| ≈ 2^60.
        self.coef = np.zeros(
            (self.luma["bh"] * self.luma["bw"], 64), np.int64
        )
        self.got_scan = False

    def _dc_block(self, r, c, row, col, huff, ah, al, preds):
        if ah == 0:
            t = r.huff(huff[c["id"]])
            if t > 11:
                raise ValueError(f"bad DC magnitude category {t}")
            preds[c["id"]] += _extend(r.bits(t), t)
            if c is self.luma:
                self.coef[row * c["bw"] + col, 0] = preds[c["id"]] << al
        else:
            bit = r.bits(1)
            if bit and c is self.luma:
                self.coef[row * c["bw"] + col, 0] |= 1 << al

    def decode_scan(
        self, raw, pos, order, tables, huff_dc, huff_ac, ri, ss, se, ah, al
    ):
        """Decode one scan's entropy data; returns the offset of the
        terminating marker's 0xFF."""
        self.got_scan = True
        if al > 13 or (ah and ah != al + 1):
            raise ValueError(f"bad successive approximation Ah={ah} Al={al}")
        try:
            comps = [self.by_id[cid] for cid in order]
        except KeyError as ex:
            raise ValueError(f"scan component {ex} not in frame") from ex
        if ss == 0:  # DC scan (interleaved or single-component)
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            huff = {}
            if ah == 0:
                for c in comps:
                    td, _ = tables[c["id"]]
                    if td not in huff_dc:
                        raise ValueError("missing DC Huffman table")
                    huff[c["id"]] = huff_dc[td]
            r = _BitReader(raw, pos)
            preds = {c["id"]: 0 for c in comps}
            n_mcu = 0
            if len(comps) > 1:
                for my in range(self.mcus_y):
                    for mx in range(self.mcus_x):
                        if ri and n_mcu and n_mcu % ri == 0:
                            r.expect_restart(n_mcu // ri - 1)
                            preds = {c["id"]: 0 for c in comps}
                        n_mcu += 1
                        for c in comps:
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    self._dc_block(
                                        r, c,
                                        my * c["v"] + by,
                                        mx * c["h"] + bx,
                                        huff, ah, al, preds,
                                    )
            else:
                c = comps[0]
                for row in range(c["nh"]):
                    for col in range(c["nw"]):
                        if ri and n_mcu and n_mcu % ri == 0:
                            r.expect_restart(n_mcu // ri - 1)
                            preds = {c["id"]: 0 for c in comps}
                        n_mcu += 1
                        self._dc_block(r, c, row, col, huff, ah, al, preds)
            r.expect_scan_end()
            return r.pos
        # AC scan: always single-component in progressive (T.81 B.2.3)
        if len(order) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not ss <= se <= 63:
            raise ValueError(f"bad spectral band [{ss}, {se}]")
        c = comps[0]
        if c is not self.luma:
            return _skip_entropy(raw, pos)
        _, ta = tables[c["id"]]
        if ta not in huff_ac:
            raise ValueError("missing AC Huffman table")
        table = huff_ac[ta]
        r = _BitReader(raw, pos)
        eobrun = 0
        n_mcu = 0
        for row in range(c["nh"]):
            for col in range(c["nw"]):
                if ri and n_mcu and n_mcu % ri == 0:
                    r.expect_restart(n_mcu // ri - 1)
                    eobrun = 0
                n_mcu += 1
                block = self.coef[row * c["bw"] + col]
                if ah == 0:
                    eobrun = _ac_first(r, table, block, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(r, table, block, ss, se, al, eobrun)
        if eobrun:
            raise ValueError("EOB run extends past the last block")
        r.expect_scan_end()
        return r.pos

    def finish(self, qt):
        """All scans consumed (EOI reached): dequantize the accumulated
        luma coefficients and IDCT, identically to the baseline tail."""
        if not self.got_scan:
            raise ValueError("no scan data found")
        w, h, _ = self.frame
        if self.luma["tq"] not in qt:
            raise ValueError(f"missing quant table {self.luma['tq']}")
        blocks = self.coef.astype(np.float64) * qt[self.luma["tq"]]
        return _idct_plane(blocks, self.luma["bw"], self.luma["bh"], w, h)
