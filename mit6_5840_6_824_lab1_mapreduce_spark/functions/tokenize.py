"""Tokenizer with reference parity.

The reference splits on any non-letter rune — Go ``unicode.IsLetter``
via ``strings.FieldsFunc`` (reference src/mrapps/wc.go:21-24), dropping
empty tokens, keeping case. The JVM-side equivalent is the Unicode
letter class ``\\p{L}``; the pure-Python restatement uses
``[^\\W\\d_]`` (``\\w`` minus digits/underscore == Unicode letters),
since stdlib ``re`` lacks ``\\p{L}``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java/RE2 pattern (used by both Spark and the DuckDB oracle).
LETTER_SPLIT_RE = r"[^\p{L}]+"

# Pure-Python equivalent for the RDD engine + sequential oracle.
_PY_SPLIT = re.compile(r"[^\w]|[\d_]", re.UNICODE)
_PY_TOKEN = re.compile(r"[^\W\d_]+", re.UNICODE)


def tokenize_py(text: str) -> list[str]:
    """Maximal runs of Unicode letters; case preserved; no empties."""
    return _PY_TOKEN.findall(text)


def letter_tokens(col: Column) -> Column:
    """Array of letter-run tokens with empties removed (JVM-side)."""
    return F.filter(F.split(col, LETTER_SPLIT_RE), lambda t: t != F.lit(""))
