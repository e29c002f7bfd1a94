"""Hash functions with reference parity.

``fnv1a32`` reimplements the reference's shuffle partitioner hash
(reference src/mr/worker.go:25-29: FNV-1a 32-bit, masked non-negative)
so intermediate bucket layout can be reproduced byte-for-byte in parity
tests. Spark's own HashPartitioner is used everywhere performance
matters; FNV is only for layout parity.
"""

from __future__ import annotations

_FNV_OFFSET = 0x811C9DC5
_FNV_PRIME = 0x01000193


def fnv1a32(key: str) -> int:
    h = _FNV_OFFSET
    for b in key.encode("utf-8"):
        h ^= b
        h = (h * _FNV_PRIME) & 0xFFFFFFFF
    return h


def reduce_bucket(key: str, n_reduce: int) -> int:
    """Reference bucket assignment: ihash(key) & 0x7fffffff % nReduce."""
    return (fnv1a32(key) & 0x7FFFFFFF) % n_reduce
