"""Pure-Python PDF text extraction — the real analog of the reference's
core per-record workload (pdfbox ``ToText``, Workers.java:131-184),
implemented with only the standard library so it runs in this container.

Scope (deliberately minimal but REAL — it reads actual PDF structure,
not a fake): scans ``stream … endstream`` content blocks, inflates
FlateDecode streams via ``zlib`` (stdlib), and walks the text-showing
operators ``Tj``, ``'``, ``"`` and ``TJ`` in document order, decoding
PDF literal strings (escapes + octal) and hex strings. Out of scope:
nested unescaped parentheses, font-encoded glyph remapping (CID/ToUnicode),
and non-Flate filters — those need a real PDF library; the operator's
error channel reports them as best-effort extraction, in-band (ref A7).

Used by ``operators.multimodal.pdf_to_text`` inside the same
``mapInPandas`` plumbing as the stubbed image codecs — this one is not
a stub.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\n?endstream", re.DOTALL)
# \\[\s\S] (not \\.) so escaped newlines — line continuations — stay
# inside the literal match even without DOTALL.
_LITERAL = rb"\((?:\\[\s\S]|[^\\()])*\)"
_HEX = rb"<[0-9A-Fa-f\s]*>"
# One combined scan so Tj/'/" and TJ hits interleave in document order.
_SHOW_RE = re.compile(
    rb"(?P<one>" + _LITERAL + rb"|" + _HEX + rb")\s*(?:Tj|'|\")"
    rb"|(?P<arr>\[(?:" + _LITERAL + rb"|" + _HEX + rb"|[^\]])*\])\s*TJ"
)
_STR_IN_ARR = re.compile(_LITERAL + rb"|" + _HEX)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _decode_literal(tok: bytes) -> bytes:
    """Decode a PDF literal string token ``(...)`` (escapes + octal)."""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\":
            nxt = body[i + 1 : i + 2]
            # Octal digits only (0-7): \8 and \9 are literal digits per
            # the PDF spec's "ignore the backslash" fallback.
            if nxt in b"01234567" and nxt:
                j = i + 1
                while j < min(len(body), i + 4) and body[j] in b"01234567":
                    j += 1
                out += bytes([int(body[i + 1 : j], 8) & 0xFF])
                i = j
            elif nxt in (b"\r", b"\n"):
                # Backslash-EOL = line continuation (PDF 7.3.4.2):
                # produces NOTHING; CRLF counts as one EOL marker.
                i += 2
                if nxt == b"\r" and body[i : i + 1] == b"\n":
                    i += 1
            else:
                out += _ESCAPES.get(nxt, nxt)
                i += 2
        else:
            out += c
            i += 1
    return bytes(out)


def _decode_hex(tok: bytes) -> bytes:
    h = re.sub(rb"\s", b"", tok[1:-1])
    if len(h) % 2:
        h += b"0"  # PDF spec: odd final digit implies trailing 0
    return bytes.fromhex(h.decode("ascii"))


def _decode_token(tok: bytes) -> bytes:
    return _decode_literal(tok) if tok.startswith(b"(") else _decode_hex(tok)


def extract_pdf_text(raw: bytes) -> str:
    """Extract shown text from a PDF payload, in document order.

    Raises ``ValueError`` for non-PDF payloads (no ``%PDF`` magic) —
    callers surface that through the in-band error channel.
    """
    if not raw.startswith(b"%PDF"):
        raise ValueError("not a PDF payload (missing %PDF magic)")
    pieces: list[bytes] = []
    for m in _STREAM_RE.finditer(raw):
        data = m.group(1)
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass  # not FlateDecode (or already plain) — parse as-is
        for sm in _SHOW_RE.finditer(data):
            if sm.group("one") is not None:
                pieces.append(_decode_token(sm.group("one")))
            else:
                pieces.extend(
                    _decode_token(t.group(0))
                    for t in _STR_IN_ARR.finditer(sm.group("arr"))
                )
    return b" ".join(p for p in pieces if p).decode("latin-1")
