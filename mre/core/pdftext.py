"""Minimal PDF text + layout extraction, pure Python (stdlib zlib only).

north_rule requires "PDF/layout parse" alongside the HTML path. No PDF
library exists in this container, so this module implements the common
subset directly:

* object scan (no xref needed — works on linearized/appended files too):
  every ``<< dict >> stream … endstream`` body is considered a candidate
  content stream; ``/FlateDecode`` bodies are inflated, unfiltered bodies
  used as-is, anything else skipped;
* content-stream tokenizer for the text operators: BT/ET, Tf, Td, TD, Tm,
  T*, Tj, TJ, ' and "; literal ``(…)`` strings with escapes and ``<hex>``
  strings;
* layout reconstruction: text runs carry their device-space (x, y); runs
  are grouped into lines by y (within half the leading), lines sorted
  top→bottom, runs within a line left→right — i.e. reading order, not
  stream order.

Handles text produced by the vast majority of simple generators (and our
deterministic fixture PDFs); embedded-CMap/Type0 subset fonts come out as
raw bytes, which is the documented limitation vs a full PDF stack.
"""

from __future__ import annotations

import re
import zlib
from typing import Optional

_STREAM_RX = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_ENDSTREAM = b"endstream"

# content-stream tokens we care about
_TOKEN_RX = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"
    rb"|/[^\s/<>()\[\]{}]+"        # name
    rb"|[-+]?\d*\.?\d+"            # number
    rb"|[A-Za-z'\"*]+",            # operator
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(tok: bytes) -> str:
    body = tok[1:-1]
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = body[i + 1:i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and body[j:j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1:j], 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _decode_hex(tok: bytes) -> str:
    h = re.sub(rb"\s", b"", tok[1:-1])
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


_LENGTH_RX = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def _content_streams(pdf: bytes) -> list[bytes]:
    out = []
    for m in _STREAM_RX.finditer(pdf):
        start = m.end()
        lm = _LENGTH_RX.search(m.group(1))
        if lm:  # literal /Length is authoritative
            body = pdf[start:start + int(lm.group(1))]
        else:
            end = pdf.find(_ENDSTREAM, start)
            if end < 0:
                continue
            body = pdf[start:end]
            # strip exactly ONE trailing EOL (compressed bodies may
            # legitimately end in 0x0A/0x0D — rstrip would corrupt them)
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n") or body.endswith(b"\r"):
                body = body[:-1]
        d = m.group(1)
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" in d:
            continue  # unsupported filter
        if b"BT" in body:
            out.append(body)
    return out


class _TextState:
    __slots__ = ("x", "y", "lx", "ly", "leading", "size", "runs")

    def __init__(self) -> None:
        self.x = self.y = 0.0      # current text position
        self.lx = self.ly = 0.0    # line start
        self.leading = 12.0
        self.size = 12.0
        self.runs: list[tuple[float, float, str]] = []

    def show(self, s: str) -> None:
        if s:
            self.runs.append((self.y, self.x, s))
            # crude advance so consecutive Tj on one line keep order
            self.x += 0.5 * self.size * len(s)


def _run_stream(body: bytes, st: _TextState) -> None:
    stack: list = []
    in_text = False
    for m in _TOKEN_RX.finditer(body):
        tok = m.group(0)
        c = tok[0:1]
        if c == b"(":
            stack.append(_decode_literal(tok))
        elif c == b"<":
            stack.append(_decode_hex(tok))
        elif c == b"[" or c == b"]":
            continue  # TJ arrays: strings already on the stack in order
        elif c == b"/":
            stack.append(tok.decode("latin-1"))
        elif tok[0:1].isdigit() or c in (b"-", b"+", b"."):
            try:
                stack.append(float(tok))
            except ValueError:
                stack.append(0.0)
        else:
            op = tok
            if op == b"BT":
                in_text = True
                st.x = st.y = st.lx = st.ly = 0.0
            elif op == b"ET":
                in_text = False
            elif not in_text:
                stack.clear()
                continue
            elif op == b"Tf" and len(stack) >= 2:
                st.size = float(stack[-1])
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = float(stack[-2]), float(stack[-1])
                if op == b"TD":
                    st.leading = -ty if ty else st.leading
                st.lx += tx
                st.ly += ty
                st.x, st.y = st.lx, st.ly
            elif op == b"Tm" and len(stack) >= 6:
                st.lx, st.ly = float(stack[-2]), float(stack[-1])
                st.x, st.y = st.lx, st.ly
            elif op == b"T*":
                st.ly -= st.leading
                st.x, st.y = st.lx, st.ly
            elif op == b"TL" and stack:
                st.leading = float(stack[-1])
            elif op == b"Tj" and stack:
                if isinstance(stack[-1], str):
                    st.show(stack[-1])
            elif op == b"TJ":
                for v in stack:
                    if isinstance(v, str):
                        st.show(v)
            elif op in (b"'", b'"'):
                st.ly -= st.leading
                st.x, st.y = st.lx, st.ly
                if stack and isinstance(stack[-1], str):
                    st.show(stack[-1])
            stack.clear()


def extract_pdf_text(pdf: Optional[bytes]) -> Optional[str]:
    """PDF bytes → text in reading order (lines top→bottom, runs
    left→right), or None if no text could be extracted. Never raises."""
    if not pdf or not pdf.startswith(b"%PDF"):
        return None
    try:
        st = _TextState()
        for body in _content_streams(pdf):
            _run_stream(body, st)
        if not st.runs:
            return None
        # group runs into lines by y (tolerance: half the default leading)
        runs = sorted(st.runs, key=lambda r: (-r[0], r[1]))
        lines: list[list[tuple[float, float, str]]] = []
        for run in runs:
            if lines and abs(lines[-1][0][0] - run[0]) < 6.0:
                lines[-1].append(run)
            else:
                lines.append([run])
        out_lines = []
        for line in lines:
            out_lines.append("".join(r[2] for r in
                                     sorted(line, key=lambda r: r[1])))
        text = "\n".join(out_lines).strip()
        return text or None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# deterministic fixture PDF generator (for tests/bench — no external data)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(lines: list[str], compress: bool = True) -> bytes:
    """A minimal valid single-page PDF showing ``lines`` top to bottom."""
    parts = ["BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            parts.append("0 -14 Td")
        parts.append(f"({_esc(line)}) Tj")
    parts.append("ET")
    content = " ".join(parts).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


__all__ = ["extract_pdf_text", "make_pdf"]
