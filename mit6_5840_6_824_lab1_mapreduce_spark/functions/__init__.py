from .tokenize import LETTER_SPLIT_RE, letter_tokens, tokenize_py
from .hashing import fnv1a32, reduce_bucket

__all__ = [
    "LETTER_SPLIT_RE",
    "letter_tokens",
    "tokenize_py",
    "fnv1a32",
    "reduce_bucket",
]
