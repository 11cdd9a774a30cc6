"""Document text extraction: bytes → per-page text.

Reference parity: app/services/extract_text.py (PDF via PyMuPDF, HTML
via BeautifulSoup, TXT passthrough; per-page error status) and
app/services/html_extractor.py (raw HTML → per-<h1-h3> sections shaped
like PDF pages, for better chunks from scraped manuals).

PDF support is gated on PyMuPDF being installed (it is not baked into
this image) — a clear error tells the operator what to install; every
other format works stdlib/bs4-only.
"""
from __future__ import annotations

import dataclasses
import re


@dataclasses.dataclass
class ExtractedPage:
    number: int  # 1-based
    text: str
    section: str = ""
    error: str = ""


@dataclasses.dataclass
class ExtractedDoc:
    pages: list[ExtractedPage]
    kind: str  # pdf | html | txt | md
    warnings: list[str] = dataclasses.field(default_factory=list)


_PAGE_BREAK = re.compile(r"\f")


def _extract_txt(data: bytes) -> ExtractedDoc:
    text = data.decode("utf-8", errors="replace")
    chunks = _PAGE_BREAK.split(text) if "\f" in text else [text]
    pages = [ExtractedPage(i + 1, c.strip()) for i, c in enumerate(chunks) if c.strip()]
    return ExtractedDoc(pages or [ExtractedPage(1, "")], "txt")


def _extract_html(data: bytes) -> ExtractedDoc:
    """Per-heading sections shaped like pages (html_extractor.py:1-326
    behavior: each h1–h3 starts a new 'page' whose section path is the
    heading chain)."""
    from bs4 import BeautifulSoup

    soup = BeautifulSoup(data, "lxml")
    for tag in soup(["script", "style", "nav", "footer", "header"]):
        tag.decompose()
    body = soup.body or soup

    pages: list[ExtractedPage] = []
    current: list[str] = []
    section = ""

    def flush():
        nonlocal current
        text = "\n".join(t for t in current if t.strip()).strip()
        if text:
            pages.append(ExtractedPage(len(pages) + 1, text, section=section))
        current = []

    for el in body.descendants:
        name = getattr(el, "name", None)
        if name in ("h1", "h2", "h3"):
            flush()
            section = el.get_text(" ", strip=True)
            current.append(f"# {section}")
        elif name in ("p", "li", "td", "th", "pre"):
            txt = el.get_text(" ", strip=True)
            if txt:
                current.append(txt)
    flush()
    if not pages:
        text = body.get_text("\n", strip=True)
        pages = [ExtractedPage(1, text)]
    return ExtractedDoc(pages, "html")


def _extract_pdf(data: bytes) -> ExtractedDoc:
    try:
        import fitz  # PyMuPDF
    except ImportError as e:
        raise RuntimeError(
            "PDF extraction requires PyMuPDF (pip install pymupdf); "
            "this environment doesn't ship it — convert to text/HTML upstream "
            "or install the dependency in deployment."
        ) from e
    doc = fitz.open(stream=data, filetype="pdf")
    pages = []
    warnings = []
    for i, page in enumerate(doc):
        try:
            pages.append(ExtractedPage(i + 1, page.get_text("text")))
        except Exception as e:  # per-page error status, keep going
            pages.append(ExtractedPage(i + 1, "", error=str(e)))
            warnings.append(f"page {i + 1}: {e}")
    return ExtractedDoc(pages, "pdf", warnings)


def sniff_kind(filename: str, data: bytes) -> str:
    name = filename.lower()
    if name.endswith(".pdf") or data[:5] == b"%PDF-":
        return "pdf"
    if name.endswith((".html", ".htm")) or b"<html" in data[:2048].lower():
        return "html"
    if name.endswith((".md", ".markdown")):
        return "md"
    return "txt"


def extract_text_from_bytes(data: bytes, filename: str = "") -> ExtractedDoc:
    kind = sniff_kind(filename, data)
    if kind == "pdf":
        return _extract_pdf(data)
    if kind == "html":
        return _extract_html(data)
    doc = _extract_txt(data)
    return dataclasses.replace(doc, kind=kind)
