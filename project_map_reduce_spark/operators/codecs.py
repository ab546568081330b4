"""Stdlib-only media codecs — the REAL part of the multimodal decode.

No image/audio library ships in this container, but the container
constraint only rules out *compressed-pixel* decoding for formats whose
entropy coders need native libs (JPEG's Huffman/DCT). Everything else
is parseable from the public specs with ``struct`` + ``zlib`` + ``wave``:

- **PNG** (W3C spec / RFC 2083): full header parse AND full pixel
  decode for the 8-bit grayscale non-interlaced subset — including all
  five scanline filters (None/Sub/Up/Average/Paeth), which is what a
  real unfilter pass means. This is the same subset our encoder
  (operators/rasterize.py) emits, so the PDF→PNG→resize→PNG chain is
  real end to end.
- **JPEG** (ITU T.81): marker walk to the SOF segment for true
  dimensions + component count. Pixel decode would need the entropy
  coder — that single step stays stubbed upstream, and is the ONLY
  stubbed codec step left.
- **GIF** (GIF87a/89a): logical-screen descriptor for dimensions.
- **WAV** (RIFF/WAVE): stdlib ``wave`` for channels / sample rate /
  frame count.

All parsers raise ``ValueError`` on malformed payloads; callers turn
that into in-band status='error' rows (ref Workers.java:186-221).
"""

from __future__ import annotations

import functools
import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _valueerror_contract(fn):
    """Enforce the module contract: malformed payloads raise ValueError.

    Truncated inputs would otherwise surface as struct.error /
    zlib.error / IndexError from the parsing internals — and a caller
    that (correctly) catches only ValueError would crash its executor
    task instead of emitting an in-band status='error' row."""

    @functools.wraps(fn)
    def wrapped(*args, **kw):
        try:
            return fn(*args, **kw)
        except (struct.error, zlib.error, IndexError) as ex:
            raise ValueError(f"malformed payload: {ex}") from ex

    return wrapped


def _png_chunks(raw: bytes):
    if raw[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    while pos + 12 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", raw[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {tag!r}")
        yield tag, data
        if tag == b"IEND":
            return
        pos += 12 + length
    raise ValueError("no IEND chunk")


@_valueerror_contract
def png_info(raw: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — any PNG."""
    for tag, data in _png_chunks(raw):
        if tag != b"IHDR":
            raise ValueError("first chunk is not IHDR")
        if len(data) != 13:  # spec-fixed IHDR length
            raise ValueError(f"IHDR length {len(data)} != 13")
        w, h, depth, color = struct.unpack(">IIBB", data[:10])
        if w < 1 or h < 1:
            raise ValueError(f"bad dimensions {w}x{h}")
        return w, h, depth, color
    raise ValueError("empty PNG")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


@_valueerror_contract
def decode_png_gray8(raw: bytes) -> tuple[int, int, bytes]:
    """Full pixel decode of an 8-bit grayscale non-interlaced PNG,
    honoring all five scanline filters. Returns (width, height, pixels)
    with ``pixels`` row-major, one byte per pixel."""
    width = height = None
    idat = b""
    for tag, data in _png_chunks(raw):
        if tag == b"IHDR":
            if len(data) != 13:  # spec-fixed IHDR length
                raise ValueError(f"IHDR length {len(data)} != 13")
            width, height, depth, color = struct.unpack(">IIBB", data[:10])
            interlace = data[12]
            if (depth, color) != (8, 0):
                raise ValueError(
                    f"unsupported PNG subset (depth={depth}, color={color})"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("missing IHDR")
    dec = zlib.decompress(idat)
    stride = width + 1
    if len(dec) != stride * height:
        raise ValueError("scanline data size mismatch")
    out = bytearray(width * height)
    prev = bytes(width)
    for y in range(height):
        f = dec[y * stride]
        row = bytearray(dec[y * stride + 1 : (y + 1) * stride])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(1, width):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif f == 2:  # Up
            for x in range(width):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(width):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(width):
                left = row[x - 1] if x else 0
                c = prev[x - 1] if x else 0
                row[x] = (row[x] + _paeth(left, prev[x], c)) & 0xFF
        else:
            raise ValueError(f"bad filter {f} on row {y}")
        out[y * width : (y + 1) * width] = row
        prev = row
    return width, height, bytes(out)


# JPEG segment markers that carry frame dimensions (ITU T.81 B.2.2):
# SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC), which share the range.
_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


@_valueerror_contract
def jpeg_info(raw: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the first SOF segment."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker desync at {pos}")
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        if marker in _SOF_MARKERS:
            if seglen < 8:
                raise ValueError("SOF segment too short")
            _prec, h, w, ncomp = struct.unpack(
                ">BHHB", raw[pos + 4 : pos + 10]
            )
            if w < 1 or h < 1:
                raise ValueError(f"bad dimensions {w}x{h}")
            return w, h, ncomp
        if marker == 0xD9:  # EOI before any SOF
            break
        pos += 2 + seglen
    raise ValueError("no SOF segment found")


@_valueerror_contract
def gif_info(raw: bytes) -> tuple[int, int]:
    """(width, height) from the GIF logical screen descriptor."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    if len(raw) < 10:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", raw[6:10])
    if w < 1 or h < 1:
        raise ValueError(f"bad dimensions {w}x{h}")
    return w, h


@_valueerror_contract
def wav_info(raw: bytes) -> tuple[int, int, int]:
    """(n_channels, sample_rate, n_frames) via the stdlib wave reader
    (validates the RIFF/WAVE/fmt chunk structure for real)."""
    try:
        with wave.open(io.BytesIO(raw)) as w:
            return w.getnchannels(), w.getframerate(), w.getnframes()
    except wave.Error as ex:
        raise ValueError(str(ex)) from ex
