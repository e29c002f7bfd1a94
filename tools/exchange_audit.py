"""Exchange-width audit: flag any shuffle that carries a wide column.

Shuffling the corpus `text` column is the classic silent scale killer
(round 6's code review caught one attempt: a projection moved above a
join shipped text through the join's exchange whenever the other side
couldn't broadcast). This tool makes the check mechanical: for every
registered query, render the FORMATTED physical plan (plan-only — no
execution), find every `Exchange`, and classify each one whose input
schema contains `text`:

- ``guard``     — RoundRobinPartitioning REPARTITION_BY_NUM: the gated
                  single-file documents spread in plans/tables.py
                  (never fires on a real corpus — scale-benign);
- ``semi-join`` — hashpartitioning keyed on a doc id: the MinHash
                  verify path's candidate semi-join, runtime-mitigated
                  by AQE broadcast conversion + default-on bloom
                  filters (SCALE.md §"Exchange-width audit");
- anything else — FLAGGED. A new text-carrying exchange outside the
                  two documented classes is a scale regression; the
                  tool exits 1.

``embedding`` (256 B/row) hits are reported informationally — the
similarity family legitimately shuffles vectors into its buckets.

Usage: python tools/exchange_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def _exchanges(plan: str):
    """Yield (node_id, input_cols, arguments) for every Exchange."""
    for m in re.finditer(r"\((\d+)\) Exchange", plan):
        nid = m.group(1)
        seg = plan[plan.find(f"({nid}) Exchange"):][:600]
        inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", seg)
        arg = re.search(r"Arguments: ([^\n]*)", seg)
        if inp and arg:
            yield nid, inp.group(1), arg.group(1)


def classify(cols: str, args: str) -> str:
    if "RoundRobinPartitioning" in args and "REPARTITION_BY_NUM" in args:
        return "guard"
    if "hashpartitioning" in args and re.search(r"hashpartitioning\((?:doc_)?id#", args):
        return "semi-join"
    return "FLAGGED"


def main() -> int:
    from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY
    from mit6_5840_6_824_lab1_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="exchange-audit", master="local[4]", shuffle_partitions=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    counts = {"guard": 0, "semi-join": 0, "FLAGGED": 0, "embedding": 0}
    flagged: list[tuple[str, str, str, str]] = []
    for name, entry in REGISTRY.items():
        plan = entry.fn(spark, SF)._jdf.queryExecution().explainString(mode)
        for nid, cols, args in _exchanges(plan):
            if re.search(r"\btext#", cols):
                cls = classify(cols, args)
                counts[cls] += 1
                if cls == "FLAGGED":
                    flagged.append((name, nid, cols[:100], args[:100]))
            elif re.search(r"\bembedding#", cols):
                counts["embedding"] += 1
    print(
        f"==== EXCHANGE AUDIT: {len(REGISTRY)} queries — text exchanges: "
        f"{counts['guard']} guard, {counts['semi-join']} semi-join, "
        f"{counts['FLAGGED']} FLAGGED; embedding exchanges (info): "
        f"{counts['embedding']} ===="
    )
    for name, nid, cols, args in flagged:
        print(f"[FLAGGED] {name} node {nid}: [{cols}] {args}")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
