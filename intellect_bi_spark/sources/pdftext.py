"""Minimal pure-stdlib PDF and docx text extraction (SURVEY §2.1 S8, §2.11 R1).

The reference extracts per-page PDF text with ``pypdf`` and whole-document
docx text with ``docx2txt`` (etl/index_docs.py:15-32, api/ingest_docs.py:27-43).
Neither library ships in this container, so this module vendors the minimal
subset of behavior the ingest path needs, from the public PDF 1.7 (ISO
32000-1) and OOXML (ECMA-376) specs:

- PDF: parse ``N 0 obj … endobj`` bodies, walk Catalog → /Pages → /Kids to
  get pages in document order, FlateDecode (zlib) content streams, and pull
  text shown by the Tj / TJ / ' / " operators inside BT…ET blocks.
- docx: a docx is a zip; document text lives in ``word/document.xml`` as
  ``<w:t>`` runs grouped into ``<w:p>`` paragraphs.

Deliberately unsupported (rare in machine-generated report PDFs, and the
callers fall back to a diagnostic marker): cross-reference *streams* with
compressed object streams, encryption, CID/Type0 composite fonts with
custom CMaps, and embedded images. Extracted text is whitespace-normalized
downstream (R2) so intra-page spacing fidelity is not load-bearing.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree

__all__ = ["extract_pdf_pages", "extract_docx_text"]

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\[[^\]]*\]|\d+\s+\d+\s+R)", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)

# Literal-string escape table (PDF 1.7 §7.3.4.2).
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


def extract_pdf_pages(data: bytes) -> list[tuple[int, str]]:
    """Return ``[(page_number, text), …]`` with 1-based page numbers in
    document order — the shape the reference builds from
    ``enumerate(reader.pages, start=1)`` (etl/index_docs.py:19-22).

    Raises ``ValueError`` if the file is not parseable as a simple PDF
    (no objects, no page tree) so callers can surface a marker row.
    """
    objects: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objects[int(m.group(1))] = m.group(2)
    if not objects:
        raise ValueError("no PDF objects found")

    root_m = None
    for root_m in _ROOT_RE.finditer(data):  # last trailer wins
        pass
    page_nums = _page_objects(objects, root_m)
    if not page_nums:
        raise ValueError("no page tree found")

    pages: list[tuple[int, str]] = []
    for i, num in enumerate(page_nums, start=1):
        content = _page_content(objects, objects[num])
        pages.append((i, _content_text(content)))
    return pages


def _page_objects(objects: dict[int, bytes], root_m) -> list[int]:
    """Catalog → /Pages → depth-first /Kids walk, preserving order."""
    pages_root = None
    if root_m is not None:
        cat = objects.get(int(root_m.group(1)))
        if cat is not None:
            pm = _PAGES_RE.search(cat)
            if pm is not None:
                pages_root = int(pm.group(1))
    if pages_root is None:
        # Degenerate fallback: any object that looks like a page, in
        # object-number order (stable for single-pass writers).
        return [
            n
            for n in sorted(objects)
            if re.search(rb"/Type\s*/Page\b", objects[n])
        ]
    out: list[int] = []
    seen: set[int] = set()
    stack = [pages_root]
    while stack:
        num = stack.pop()
        if num in seen or num not in objects:
            continue
        seen.add(num)
        body = objects[num]
        kids = _KIDS_RE.search(body)
        if kids is not None:
            # push in reverse so pop() visits kids in document order
            stack.extend(
                int(r.group(1)) for r in reversed(list(_REF_RE.finditer(kids.group(1))))
            )
        elif re.search(rb"/Type\s*/Page\b", body):
            out.append(num)
    return out


def _page_content(objects: dict[int, bytes], page_body: bytes) -> bytes:
    cm = _CONTENTS_RE.search(page_body)
    if cm is None:
        return b""
    parts: list[bytes] = []
    for ref in _REF_RE.finditer(cm.group(1)):
        body = objects.get(int(ref.group(1)), b"")
        sm = _STREAM_RE.search(body)
        if sm is None:
            continue
        raw = sm.group(1)
        if b"/FlateDecode" in body.split(b"stream", 1)[0]:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                # streams whose length pulled in trailing whitespace
                raw = zlib.decompressobj().decompress(raw)
        parts.append(raw)
    return b"\n".join(parts)


def _content_text(content: bytes) -> str:
    """Pull shown text from a decoded content stream.

    Walks tokens; collects literal/hex strings; emits them on the text-show
    operators (Tj, ', ", TJ) and a newline on the line-advance operators
    (Td, TD, T*, ', ") — the same granularity pypdf's plain extract_text
    gives for simple one-font pages. Whitespace is collapsed downstream.
    """
    out: list[str] = []
    i, n = 0, len(content)
    pending: list[str] = []  # strings seen since the last operator
    in_array: list[str] | None = None
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            s, i = _literal_string(content, i)
            (in_array if in_array is not None else pending).append(s)
        elif c == b"<" and content[i : i + 2] != b"<<":
            j = content.find(b">", i)
            if j == -1:
                break
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", content[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            (in_array if in_array is not None else pending).append(
                bytes.fromhex(hexs.decode("ascii")).decode("latin-1")
            )
            i = j + 1
        elif c == b"<":  # dictionary << … >> — skip balanced
            depth, i = 1, i + 2
            while i < n and depth:
                if content[i : i + 2] == b"<<":
                    depth, i = depth + 1, i + 2
                elif content[i : i + 2] == b">>":
                    depth, i = depth - 1, i + 2
                else:
                    i += 1
        elif c == b"[":
            in_array = []
            i += 1
        elif c == b"]":
            pending = in_array or []
            in_array = None
            i += 1
        else:
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            if m:
                op = m.group(0)
                if op in (b"Tj", b"TJ"):
                    out.extend(pending)
                elif op in (b"'", b'"'):
                    out.append("\n")
                    out.extend(pending)
                elif op in (b"Td", b"TD", b"T*"):
                    out.append("\n")
                elif op == b"ET":
                    out.append("\n")
                pending = []
                i += len(op)
            else:
                i += 1
    return "".join(out)


def _literal_string(content: bytes, i: int) -> tuple[str, int]:
    """Decode a ``( … )`` literal string starting at ``i``; returns
    (text, index-after-close). Handles nesting and §7.3.4.2 escapes."""
    assert content[i : i + 1] == b"("
    depth = 1
    i += 1
    buf = bytearray()
    n = len(content)
    while i < n and depth:
        b = content[i : i + 1]
        if b == b"\\":
            nxt = content[i + 1 : i + 2]
            if nxt in _ESCAPES:
                buf += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \ddd (1-3 digits)
                m = re.match(rb"[0-7]{1,3}", content[i + 1 :])
                buf.append(int(m.group(0), 8) & 0xFF)
                i += 1 + len(m.group(0))
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and content[i : i + 1] == b"\n":
                    i += 1
            else:
                buf += nxt
                i += 2
        elif b == b"(":
            depth += 1
            buf += b
            i += 1
        elif b == b")":
            depth -= 1
            if depth:
                buf += b
            i += 1
        else:
            buf += b
            i += 1
    return buf.decode("latin-1"), i


_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def extract_docx_text(data: bytes) -> str:
    """Whole-document text, paragraphs joined with blank lines — the shape
    ``docx2txt.process`` returns and the reference treats as a single page
    (etl/index_docs.py:24-27). Tabs and explicit breaks become whitespace.

    Raises ``ValueError`` when the zip or document XML is malformed.
    """
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml = zf.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError) as exc:
        raise ValueError(f"not a docx: {exc}") from exc
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError as exc:
        raise ValueError(f"bad document.xml: {exc}") from exc
    paras: list[str] = []
    for p in root.iter(f"{_W}p"):
        runs: list[str] = []
        for el in p.iter():
            if el.tag == f"{_W}t":
                runs.append(el.text or "")
            elif el.tag == f"{_W}tab":
                runs.append("\t")
            elif el.tag in (f"{_W}br", f"{_W}cr"):
                runs.append("\n")
        paras.append("".join(runs))
    return "\n\n".join(paras)
