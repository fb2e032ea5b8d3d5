"""Extraction text-repair kernels: line-break de-hyphenation and
mojibake (encoding-damage) detection.

Both are the post-OCR / post-extraction cleanup passes a
main-content pipeline runs after the reference's per-document
extraction flow (ref `core/text_processor.py` assembles page text
with line breaks; scanned-page OCR and PDF text layers both emit
hyphenated hard wraps): stateless, RE2-only vectorized pyarrow
kernels (no Python loop over rows, no lookaheads) so every transform
is replayable verbatim by DuckDB's regexp functions — the wave-88
arrow/SQL identical-transform-chain discipline.

- ``dehyphenate``: join "exam-\\nple" -> "example" (letter,
  hyphen, newline, letter). The repair count per doc is the
  non-overlapping match count BEFORE repair.
- ``mojibake markers``: count UTF-8-misdecoded signatures
  (``Ã``, ``â€``, ``Â`` — the classic latin-1-decoded-UTF-8
  artifacts) and score chars-normalized ppm.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "HYPHEN_BREAK_RE",
    "MOJIBAKE_RE",
    "dehyphenate_column",
    "hyphen_break_counts",
    "mojibake_counts",
]

# capture groups so the two letters are kept on rejoin
HYPHEN_BREAK_RE = r"([a-zA-Z])-\n([a-zA-Z])"
# count-only (no captures needed)
HYPHEN_BREAK_COUNT_RE = r"[a-zA-Z]-\n[a-zA-Z]"
MOJIBAKE_RE = "Ã|â€|Â"


def dehyphenate_column(col: pa.ChunkedArray | pa.Array):
    """Repaired text: every letter-"-\\n"-letter seam is joined."""
    return pc.replace_substring_regex(
        col, pattern=HYPHEN_BREAK_RE, replacement=r"\1\2"
    )


def hyphen_break_counts(col: pa.ChunkedArray | pa.Array):
    """int64 non-overlapping count of hyphenated hard wraps."""
    return pc.cast(
        pc.count_substring_regex(col, HYPHEN_BREAK_COUNT_RE), pa.int64()
    )


def mojibake_counts(col: pa.ChunkedArray | pa.Array):
    """int64 count of mojibake marker sequences."""
    return pc.cast(pc.count_substring_regex(col, MOJIBAKE_RE), pa.int64())
