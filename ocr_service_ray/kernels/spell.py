"""Rule-based fallback spell corrector.

Reproduces ``SimpleSpellCorrector``
(``/root/reference/models/spell_corrector.py:192-230``): in
number-like tokens (``\\b[ОIЗБВSGl0-9]+\\b``) map the frequent OCR
letter→digit confusions О→0, I→1, З→3, Б→6, В→8, S→5, G→6, Z→2, l→1,
o→0. This is the corrector the reference falls back to when the RuT5
model fails to load (``core/processor.py:84-87``); the RuT5 stage
itself is hard-disabled in the reference hot path
(``core/processor.py:259``) and is therefore an optional, off-by-
default stage here too.
"""

from __future__ import annotations

import re

_COMMON_ERRORS = [
    ("О", "0"),
    ("I", "1"),
    ("З", "3"),
    ("Б", "6"),
    ("В", "8"),
    ("S", "5"),
    ("G", "6"),
    ("Z", "2"),
    ("l", "1"),
    ("o", "0"),
]

_NUMBER_PATTERN = re.compile(r"\b[ОIЗБВSGl0-9]+\b")


def simple_spell_correct(text: str) -> str:
    """``spell_corrector.py:203-230``."""

    def replace_in_numbers(match: re.Match) -> str:
        num_str = match.group()
        for letter, digit in _COMMON_ERRORS:
            num_str = num_str.replace(letter, digit)
        return num_str

    return _NUMBER_PATTERN.sub(replace_in_numbers, text)
