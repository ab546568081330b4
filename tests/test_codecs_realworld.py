"""Real-world codec validation: decode files produced by ACTUAL
encoders (libjpeg/libpng/ImageMagick lineage) that happen to ship on
the host — independent of our own test encoders, so a symmetric
encoder/decoder misunderstanding cannot hide here. Every case covers a
path this engine implements from spec: progressive JPEG (SOF2 with
successive approximation, as real web-crawl files use it), packed
2-/4-bit palette PNGs, the canonical libpng Adam7-interlaced RGBA test
image, and real GIFs.

Each test skips if the host file is absent (the fixtures are not ours
to vendor); dimensions are externally-verifiable truth, the md5 pins
decode determinism against regressions.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from project_map_reduce_spark.operators import codecs
from project_map_reduce_spark.operators.jpeg import decode_jpeg_gray

_PY_ICONS = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11"
    "/idlelib/Icons"
)

# (path, kind, expected (w, h), decode-md5 prefix)
_CASES = [
    (
        "/usr/share/gitweb/static/git-favicon.png",
        "png", (16, 16), "5873b7d6",
    ),  # 2-bit palette — the packed-row favicon layout
    (
        "/usr/share/icons/locolor/32x32/apps/gvim.png",
        "png", (32, 32), "692829f2",
    ),  # 4-bit palette
    (
        "/usr/share/doc/libpng-dev/examples/pngtest.png",
        "png", (91, 69), "249508b4",
    ),  # libpng's own Adam7-interlaced RGBA test image
    (
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "jpg", (493, 58), "3055e28e",
    ),  # real progressive JPEG (SOF2)
    (
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
        "jpg", (493, 312), "0802aaf3",
    ),  # real progressive JPEG (SOF2)
    (
        f"{_PY_ICONS}/idle_48.gif",
        "gif", (48, 48), "c2048540",
    ),
]


def _sof_marker(raw: bytes) -> int:
    """First SOF marker byte via a REAL segment walk (lengths honored —
    a naive byte scan would trip on FF Cx bytes inside APPn metadata
    such as an embedded EXIF thumbnail's own SOF)."""
    import struct

    assert raw[:2] == b"\xff\xd8", "not a JPEG"
    pos = 2
    sofs = {m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)}
    while pos + 4 <= len(raw):
        assert raw[pos] == 0xFF, f"marker desync at {pos}"
        marker = raw[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in sofs:
            return marker
        assert marker != 0xD9, "EOI before any SOF"
        (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        pos += 2 + seglen
    raise AssertionError("no SOF marker found")


@pytest.mark.parametrize(
    "path,kind,dims,md5p",
    _CASES,
    ids=[os.path.basename(c[0]) for c in _CASES],
)
def test_realworld_decode(path, kind, dims, md5p):
    if not os.path.exists(path):
        pytest.skip(f"host fixture absent: {path}")
    raw = open(path, "rb").read()
    if kind == "png":
        w, h, px = codecs.decode_png_luma(raw)
    elif kind == "jpg":
        # these fixtures exist to prove PROGRESSIVE coverage — fail
        # loudly if a host upgrade ever swaps in a baseline file
        sof = _sof_marker(raw)
        assert sof == 0xC2, f"fixture is no longer progressive (SOF {sof:#x})"
        w, h, px = decode_jpeg_gray(raw)
    else:
        w, h, px = codecs.decode_gif_gray(raw)
    assert (w, h) == dims
    assert len(px) == w * h
    assert hashlib.md5(px).hexdigest()[:8] == md5p
