"""Minimal PDF text extraction + generation (pure Python, stdlib zlib).

The north rule's extraction tier includes "PDF/layout parse" alongside the
HTML path.  This module implements the common machine-generated-PDF text
path honestly, with the limits stated:

- object/stream scan: ``N 0 obj … stream … endstream`` pairs, with
  ``/FlateDecode`` streams inflated via zlib (the encoding virtually every
  PDF writer emits); other filters are skipped;
- content-stream text operators: ``(…) Tj``, ``<hex> Tj``, ``[…] TJ``
  inside BT/ET blocks, literal-string escapes (\\ ( ) n r t b f, octal)
  decoded per the spec;
- layout: a line break is emitted per text-positioning op (Td/TD/T*) and
  between BT blocks — the layout heuristic a boilerplate pipeline needs,
  not a renderer;
- out of scope (degrade to skipping, never crash): CMap/ToUnicode tables,
  composite fonts, encrypted files, object streams.  Text behind those is
  not recovered — the extractor prefers silence to garbage.

``make_simple_pdf`` generates a valid single-font PDF (one page per input
document, UTF-8 carried as hex strings) — the deterministic test fixture
and the synth path for the Spark operator, so extract(make(text)) == text
exactly and the DuckDB oracle can be the original table.
"""

from __future__ import annotations

import re
import zlib

# --- extraction -----------------------------------------------------------------

# tempered: the innermost dict immediately before `stream` (no nested <<)
_RE_STREAM = re.compile(
    rb"<<((?:(?!<<|>>).)*)>>\s*stream\r?\n(.*?)endstream", re.S)
# direct /Length only: `/Length 12 0 R` is an indirect reference — slicing
# to the object number would silently drop the stream; the EOL-strip
# fallback handles indirect lengths instead.  (?!\d) forces the FULL number
# before the indirect-ref lookahead runs — without it the regex backtracks
# to a digit prefix ('1' of '12') where the lookahead no longer matches.
_RE_LENGTH = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_RE_BT = re.compile(rb"BT(.*?)ET", re.S)
# (literal) Tj | <hex> Tj | [array] TJ  — ' and " (show-with-spacing) too
_RE_SHOW = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?:Tj|'|\")"
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?:Tj|'|\")"
    rb"|\[(?P<arr>.*?)\]\s*TJ"
    rb"|(?P<move>T\*|-?[\d.]+\s+-?[\d.]+\s+T[dD])", re.S)
_RE_ARR_ITEM = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1:i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
            # octal \ddd (1-3 OCTAL digits — \8 and \9 are stray
            # backslashes per spec, int(_, 8) would crash on them)
            j = i + 1
            while (j < min(i + 4, n)
                   and b"0" <= raw[j:j + 1] <= b"7"):
                j += 1
            out.append(int(raw[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt == b"\n":                       # line continuation
            i += 2
        else:                                    # spec: stray \ is dropped
            i += 1
    return bytes(out)


def _decode_hex(h: bytes) -> bytes:
    h = re.sub(rb"\s", b"", h)
    if len(h) % 2:
        h += b"0"                                # spec: odd length pads 0
    return bytes.fromhex(h.decode("ascii"))


def _text_from_content(content: bytes) -> list[str]:
    """Text lines from one content stream (BT/ET blocks, show + move ops)."""
    lines: list[str] = []
    for bt in _RE_BT.finditer(content):
        cur = bytearray()
        shown = False           # an empty Tj is still a (blank) line
        for m in _RE_SHOW.finditer(bt.group(1)):
            if m.group("move") is not None:
                if shown:
                    lines.append(cur.decode("utf-8", "replace"))
                    cur = bytearray()
                    shown = False
                continue
            shown = True
            if m.group("lit") is not None:
                cur += _unescape_literal(m.group("lit"))
            elif m.group("hex") is not None:
                cur += _decode_hex(m.group("hex"))
            else:
                for item in _RE_ARR_ITEM.finditer(m.group("arr")):
                    if item.group("lit") is not None:
                        cur += _unescape_literal(item.group("lit"))
                    else:
                        cur += _decode_hex(item.group("hex"))
        if shown:
            lines.append(cur.decode("utf-8", "replace"))
    return lines


def extract_pdf_text(data: bytes) -> str:
    """All recoverable text, pages/blocks joined by newlines."""
    if not isinstance(data, (bytes, bytearray)) or not data.startswith(
            b"%PDF"):
        return ""
    lines: list[str] = []
    for m in _RE_STREAM.finditer(data):
        meta, body = m.group(1), m.group(2)
        if b"/FlateDecode" in meta:
            # /Length is authoritative (compressed data may itself end in
            # EOL bytes, so stripping the pre-endstream EOL heuristically
            # can truncate); fall back to a single-EOL strip without it
            ln = _RE_LENGTH.search(meta)
            if ln:
                body = body[:int(ln.group(1))]
            elif body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith((b"\n", b"\r")):
                body = body[:-1]
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        if b"BT" in body:
            lines.extend(_text_from_content(body))
    return "\n".join(lines)


# --- generation (test fixture / synth path) ---------------------------------------


def _content_stream(text: str) -> bytes:
    """One page's content: each input line is a hex-string Tj followed by a
    Td line advance — byte-safe for any UTF-8 text, so the round trip is
    exact."""
    ops = [b"BT /F1 12 Tf 50 780 Td"]
    for line in text.split("\n"):
        ops.append(b"<" + line.encode("utf-8").hex().encode("ascii")
                   + b"> Tj")
        ops.append(b"0 -14 Td")
    ops.append(b"ET")
    return zlib.compress(b"\n".join(ops))


def make_simple_pdf(texts: list[str]) -> bytes:
    """Valid minimal PDF: one page per input string, Helvetica, Flate
    content streams, correct xref."""
    objs: list[bytes] = []
    n_pages = len(texts)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    objs.append(b"2 0 obj << /Type /Pages /Count %d /Kids [%s] >> endobj"
                % (n_pages, kids))
    objs.append(b"3 0 obj << /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >> endobj")
    for i, text in enumerate(texts):
        pid, cid = page_ids[i], page_ids[i] + 1
        objs.append(
            b"%d 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            b" endobj" % (pid, cid))
        stream = _content_stream(text)
        objs.append(
            b"%d 0 obj << /Length %d /Filter /FlateDecode >> stream\n"
            b"%s\nendstream endobj" % (cid, len(stream), stream))
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o + b"\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer << /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)
