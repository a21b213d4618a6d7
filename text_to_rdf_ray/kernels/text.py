"""Deterministic text kernels: HTML -> text, sentence split, chunking.

- ``extract_text``: boilerplate-stripping HTML extractor (new stage; the
  reference consumes already-plain text — SURVEY.md S3).  Versioned pure
  function of the html bytes: byte-identical output per url is an invariant
  tested with golden hashes.
- ``split_sentences_naive``: the reference's naive ``'.'`` split used by
  rule-based coref (/root/reference/src/coref.rs:263).
- ``split_segments``: paragraph/sentence segmentation used by the pattern
  extractor (paragraphs on blank lines, sentences on terminator followed by
  an uppercase start — robust to DocRED's detached-punctuation tokens).
- ``chunk_text``: sentence-boundary chunker preserving the reference's
  sizing contract (3,500 chars / 400 overlap, /root/reference/src/chunking.rs:99-106)
  with exact start/end offsets into the source document.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

EXTRACTOR_VERSION = "v1"

# Tags whose entire subtree is boilerplate.
_SKIP_TAGS = frozenset(
    ["script", "style", "noscript", "head", "nav", "footer", "header", "aside", "template"]
)
_VOID_TAGS = frozenset(["br", "hr", "img", "input", "meta", "link", "area", "base", "col",
                        "embed", "source", "track", "wbr"])


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS or self._skip_depth:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


def extract_text(html: bytes | str) -> str:
    """Extract visible text from HTML, dropping boilerplate subtrees.

    Character data outside skip-listed tags is concatenated verbatim
    (entities unescaped); no whitespace normalization is applied, so text
    embedded in a single content element round-trips byte-identically.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return "".join(parser.parts)


def split_sentences_naive(text: str) -> list[str]:
    """Reference coref sentence split: ``'.'``-separated, drop blank parts."""
    return [s for s in text.split(".") if s.strip()]


_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z\"(“])")


def split_segments(text: str) -> list[tuple[str, int]]:
    """Split into (segment, start_offset) pairs.

    Paragraph breaks (blank lines) always split; within a paragraph we split
    after ``.!?`` only when followed by whitespace + an uppercase opener, so
    abbreviation-style tokens ("Apple Inc . is ...") stay in one segment.
    """
    segments: list[tuple[str, int]] = []
    offset = 0
    for para in re.split(r"(\n\s*\n)", text):
        if not para.strip():
            offset += len(para)
            continue
        start = offset
        pieces = _SENT_BOUNDARY.split(para)
        pos = start
        for piece in pieces:
            idx = text.index(piece, pos)
            if piece.strip():
                segments.append((piece, idx))
            pos = idx + len(piece)
        offset += len(para)
    return segments


CHUNK_MAX_CHARS = 3500
CHUNK_OVERLAP = 400
CHUNK_TOKEN_THRESHOLD = 2000  # est. tokens = len(text)//4 (extractor.rs:311-314)


def estimate_tokens(text: str) -> int:
    return len(text) // 4


def needs_chunking(text: str, threshold_tokens: int = CHUNK_TOKEN_THRESHOLD) -> bool:
    return estimate_tokens(text) >= threshold_tokens


def chunk_text(
    text: str,
    max_chars: int = CHUNK_MAX_CHARS,
    overlap: int = CHUNK_OVERLAP,
) -> list[tuple[int, str, int, int]]:
    """Split at sentence-ish boundaries into <= max_chars chunks with overlap.

    Returns ``(chunk_id, chunk_text, start_offset, end_offset)`` with exact
    offsets (chunk_text == text[start:end]).  Boundary choice prefers the
    last sentence terminator in the window, then the last whitespace, then a
    hard cut, so chunks never split mid-word unless a single token exceeds
    the window.
    """
    n = len(text)
    if n <= max_chars:
        return [(0, text, 0, n)]
    chunks: list[tuple[int, str, int, int]] = []
    start = 0
    cid = 0
    step_min = max(1, max_chars - overlap)
    while start < n:
        end = min(start + max_chars, n)
        if end < n:
            window = text[start:end]
            cut = max(window.rfind(". "), window.rfind(".\n"), window.rfind("! "), window.rfind("? "))
            if cut >= step_min // 2:
                end = start + cut + 1
            else:
                ws = window.rfind(" ")
                if ws >= step_min // 2:
                    end = start + ws
        chunks.append((cid, text[start:end], start, end))
        cid += 1
        if end >= n:
            break
        # next chunk starts `overlap` before this chunk's end; always move forward
        start = max(end - overlap, start + 1)
    return chunks
