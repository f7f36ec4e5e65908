"""Minimal pure-Python PDF text extraction (the S1 fallback codec).

Covers the common machine-generated PDF shape: FlateDecode (zlib — stdlib)
or uncompressed page content streams with literal-string text-showing
operators (Tj, ', ", TJ arrays) inside BT/ET text blocks. Format knowledge
is the public PDF spec (ISO 32000-1: §7.3.4 literal strings, §7.4.4
FlateDecode, §9.4 text-showing operators).

This is deliberately NOT a general PDF renderer: no CMap/ToUnicode fonts
(non-WinAnsi encodings degrade to raw bytes), no LZW/DCT/CCITT streams, no
encryption, no cross-reference validation. Production deployments should
install ``pypdf`` — ``sources.files.read_pdf_chunks`` prefers it when
importable and falls back here (reference parity: services/crud/chunks.py:
439-443 uses PdfReader's page.extract_text()).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _unescape(raw: bytes) -> str:
    """PDF literal-string unescape (spec §7.3.4.2): named escapes, octal
    \\ddd codes, line continuations; undefined escapes drop the backslash."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = raw[i + 1]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif 0x30 <= nxt <= 0x37:  # octal
            m = _OCTAL_RE.match(raw, i + 1)
            out.append(int(m.group(1), 8) & 0xFF)
            i = m.end()
        elif nxt in (0x0A, 0x0D):  # line continuation
            i += 2
            if nxt == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(nxt)
            i += 2
    return out.decode("latin-1")


def _literal_strings(data: bytes, start: int) -> tuple[str, int]:
    """Parse one ( ... ) literal string starting at ``start`` (which must
    point at '('); returns (decoded, index past the closing paren).
    Balanced parens nest (spec §7.3.4.2)."""
    depth = 0
    i = start
    buf = bytearray()
    while i < len(data):
        c = data[i]
        if c == 0x5C and i + 1 < len(data):  # escape: copy verbatim
            buf += data[i:i + 2]
            i += 2
            continue
        if c == 0x28:  # (
            depth += 1
            if depth > 1:
                buf.append(c)
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return _unescape(bytes(buf)), i + 1
            buf.append(c)
        else:
            buf.append(c)
        i += 1
    return _unescape(bytes(buf)), i


def _extract_text_ops(content: bytes) -> str:
    """Concatenate the outputs of text-showing operators in one content
    stream. Tj / ' / " show one string; TJ shows an array of strings with
    kerning numbers (ignored). Td/TD/T*/' start new lines -> newline."""
    parts: list[str] = []
    i, n = 0, len(content)
    pending: list[str] = []  # strings seen since the last operator token

    def flush_line() -> None:
        if parts and parts[-1] != "\n":
            parts.append("\n")

    while i < n:
        c = content[i]
        if c == 0x28:  # literal string
            s, i = _literal_strings(content, i)
            pending.append(s)
            continue
        if c == 0x25:  # % comment -> end of line
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        # operator tokens are short alpha/quote runs
        if (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in (0x27, 0x22):
            j = i
            while j < n and ((0x41 <= content[j] <= 0x5A)
                             or (0x61 <= content[j] <= 0x7A)
                             or content[j] in (0x27, 0x22, 0x2A)):
                j += 1
            op = content[i:j]
            if op in (b"Tj", b"TJ"):
                parts.extend(pending)
            elif op in (b"'", b'"'):
                flush_line()
                parts.extend(pending)
            elif op in (b"Td", b"TD", b"T*"):
                flush_line()
            if op in (b"Tj", b"TJ", b"'", b'"'):
                pending = []
            i = j
            continue
        i += 1
    return "".join(parts).strip()


def pdf_extract_pages(data: bytes) -> list[str]:
    """PDF bytes -> list of page texts. Each stream object is FlateDecode'd
    (or taken raw); streams containing a BT text block are treated as page
    content streams, in document order (true for the simple single-content-
    stream-per-page layout every basic writer emits)."""
    pages: list[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            decoded = zlib.decompress(raw)
        except zlib.error:
            decoded = raw
        if b"BT" in decoded:
            text = _extract_text_ops(decoded)
            if text:
                pages.append(text)
    return pages
