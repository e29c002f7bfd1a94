"""The reference's OWN acceptance test, on its real corpus: run the
distributed engine over the 3.3 MB Gutenberg texts shipped with the
reference (src/main/pg-*.txt) and diff against the sequential oracle —
the exact strategy of src/main/test-mr.sh:77-139 (mrsequential output
as golden, compare after canonical sort).

Filenames: wholeTextFiles yields ``file:/abs/path`` URIs while the
reference passes bare paths to the map UDF; both sides are normalized
to the basename so the indexer's document lists are byte-comparable.
"""

from __future__ import annotations

import glob
import os

import pytest

from mit6_5840_6_824_lab1_mapreduce_spark.operators import mrapps
from mit6_5840_6_824_lab1_mapreduce_spark.operators.mapreduce import (
    run_job,
    run_sequential,
    whole_text_input,
)

CORPUS_GLOB = "/root/reference/src/main/pg-*.txt"
FILES = sorted(glob.glob(CORPUS_GLOB))


def _sequential_corpus() -> list[tuple[str, str]]:
    out = []
    for path in FILES:
        with open(path, encoding="utf-8") as f:
            out.append((os.path.basename(path), f.read()))
    return out


def _distributed_corpus(spark):
    return whole_text_input(spark, CORPUS_GLOB).map(
        lambda fc: (os.path.basename(fc[0]), fc[1])
    )


@pytest.mark.skipif(not FILES, reason="reference Gutenberg corpus not present")
def test_wc_real_corpus_golden(spark):
    m, r = mrapps.APPS["wc"]
    got = sorted(run_job(_distributed_corpus(spark), m, r, n_reduce=10).collect())
    want = sorted(run_sequential(_sequential_corpus(), m, r))
    assert got == want  # 22k+ distinct words, bit-identical


@pytest.mark.skipif(not FILES, reason="reference Gutenberg corpus not present")
def test_indexer_real_corpus_golden(spark):
    m, r = mrapps.APPS["indexer"]
    got = sorted(run_job(_distributed_corpus(spark), m, r, n_reduce=10).collect())
    want = sorted(run_sequential(_sequential_corpus(), m, r))
    assert got == want
