"""Differential test of the KV replay against the pure-Python
reference model (restating src/models/kv.go:40-54 + dedup), on a
randomized op log with retries — the interesting case (FIXTURES F5)."""

from __future__ import annotations

import random

from mit6_5840_6_824_lab1_mapreduce_spark.operators.kv import (
    lookup,
    replay_final_state,
    replay_python_model,
)

SCHEMA = "seq long, client_id long, request_id long, op string, key string, value string"


def _gen_ops(n: int, seed: int) -> list[tuple]:
    rng = random.Random(seed)
    ops, seq = [], 0
    next_req = {c: 0 for c in range(5)}
    for _ in range(n):
        c = rng.randrange(5)
        op = rng.choice(["Put", "Append", "Append", "Get"])
        key = f"k{rng.randrange(8)}"
        val = None if op == "Get" else str(rng.randrange(100))
        if op != "Get":
            rid = next_req[c]
            # clerk retry: same (client, request) committed twice
            repeats = 2 if rng.random() < 0.3 else 1
            for _ in range(repeats):
                ops.append((seq, c, rid, op, key, val))
                seq += 1
            next_req[c] += 1
        else:
            ops.append((seq, c, next_req[c], op, key, val))
            seq += 1
    return ops


def test_replay_matches_reference_model(spark):
    ops = _gen_ops(400, seed=42)
    df = spark.createDataFrame(ops, schema=SCHEMA)
    got = {r["key"]: r["value"] for r in replay_final_state(df).collect()}
    want = replay_python_model(ops)
    assert got == want


def test_replay_retry_suppression_exact(spark):
    # Hand-built log: retried Append must apply once; Put resets.
    ops = [
        (1, 1, 1, "Append", "k", "a"),
        (2, 1, 1, "Append", "k", "a"),  # retry → suppressed
        (3, 2, 1, "Append", "k", "b"),
        (4, 1, 2, "Put", "k", "X"),
        (5, 1, 3, "Append", "k", "c"),
        (6, 1, 3, "Append", "k", "c"),  # retry → suppressed
        (7, 3, 1, "Get", "k", None),
    ]
    df = spark.createDataFrame(ops, schema=SCHEMA)
    state = replay_final_state(df)
    assert lookup(state, "k") == "Xc"
    assert lookup(state, "missing") == ""  # ErrNoKey → ""


def test_put_only_last_writer_wins(spark):
    ops = [
        (1, 1, 1, "Put", "k", "first"),
        (2, 1, 2, "Put", "k", "second"),
        (3, 2, 1, "Put", "k", "third"),
    ]
    df = spark.createDataFrame(ops, schema=SCHEMA)
    assert lookup(replay_final_state(df), "k") == "third"


import pytest


@pytest.mark.parametrize("seed", [1, 2, 3, 11, 99])
def test_replay_matches_reference_model_seeds(spark, seed):
    ops = _gen_ops(250, seed=seed)
    df = spark.createDataFrame(ops, schema=SCHEMA)
    got = {r["key"]: r["value"] for r in replay_final_state(df).collect()}
    assert got == replay_python_model(ops)


def test_regressing_request_id_dropped_high_water(spark):
    """A stale retry whose request_id is BELOW the client's high-water
    mark when it commits must be dropped (server.go:128-134), not kept
    as a 'first occurrence' of that id. Round-1 verdict K5 fix."""
    ops = [
        (1, 1, 5, "Append", "k", "a"),  # applied, hw(client 1) = 5
        (2, 1, 3, "Append", "k", "z"),  # stale retry, 3 ≤ 5 → dropped
        (3, 1, 6, "Append", "k", "b"),  # applied
        (4, 2, 1, "Append", "k", "c"),  # other client unaffected
        (5, 2, 1, "Append", "k", "c"),  # exact duplicate → dropped
    ]
    df = spark.createDataFrame(ops, schema=SCHEMA)
    state = replay_final_state(df)
    assert lookup(state, "k") == "abc"
    assert replay_python_model(ops) == {"k": "abc"}


def _gen_ops_regressing(n: int, seed: int) -> list[tuple]:
    """Op log with out-of-order clerk retries: occasionally a stale op
    (request_id below the client's current max) commits late."""
    rng = random.Random(seed)
    ops, seq = [], 0
    next_req = {c: 0 for c in range(5)}
    for _ in range(n):
        c = rng.randrange(5)
        op = rng.choice(["Put", "Append", "Append", "Get"])
        key = f"k{rng.randrange(8)}"
        val = None if op == "Get" else str(rng.randrange(100))
        if op != "Get":
            if next_req[c] > 2 and rng.random() < 0.2:
                rid = rng.randrange(next_req[c])  # regressing stale retry
            else:
                rid = next_req[c]
                next_req[c] += 1
            ops.append((seq, c, rid, op, key, val))
        else:
            ops.append((seq, c, next_req[c], op, key, val))
        seq += 1
    return ops


@pytest.mark.parametrize("seed", [7, 23, 71])
def test_replay_matches_model_on_regressing_ids(spark, seed):
    ops = _gen_ops_regressing(300, seed=seed)
    df = spark.createDataFrame(ops, schema=SCHEMA)
    got = {r["key"]: r["value"] for r in replay_final_state(df).collect()}
    assert got == replay_python_model(ops)


def _gen_tagged_appends(n: int, seed: int, n_clients: int = 5) -> list[tuple]:
    """Append-only log on ONE shared key, every value tagged
    'x <client> <request> y' (the reference's probe format), with
    exact-duplicate clerk retries AND regressing stale ids."""
    rng = random.Random(seed)
    ops, seq = [], 0
    next_req = {c: 0 for c in range(n_clients)}
    for _ in range(n):
        c = rng.randrange(n_clients)
        if next_req[c] > 2 and rng.random() < 0.2:
            rid = rng.randrange(next_req[c])  # stale retry, regressing id
        else:
            rid = next_req[c]
            next_req[c] += 1
        val = f"x {c} {rid} y"
        for _ in range(2 if rng.random() < 0.3 else 1):  # duplicate commit
            ops.append((seq, c, rid, "Append", "k", val))
            seq += 1
    return ops


@pytest.mark.parametrize("seed", [1, 5, 13, 42, 77])
def test_per_client_append_order_invariant(spark, seed):
    """Direct restatement of checkClntAppends
    (/root/reference/src/kvraft/test_test.go:141): parse the final
    concatenated value and assert, independently of the Python model,
    that each client's APPLIED appends appear in request-id order,
    exactly once — and that the applied set is exactly what the
    high-water rule (server.go:128-134) admits from the log."""
    import re
    from collections import defaultdict

    ops = _gen_tagged_appends(200, seed=seed)
    df = spark.createDataFrame(ops, schema=SCHEMA)
    value = lookup(replay_final_state(df), "k")

    tags = re.findall(r"x (\d+) (\d+) y", value)
    # the value must be wholly composed of intact tags (no torn writes)
    assert "".join(f"x {c} {r} y" for c, r in tags) == value
    # exactly once: no (client, request) applied twice anywhere
    assert len(tags) == len(set(tags))
    seen: dict[int, list[int]] = defaultdict(list)
    for c, r in tags:
        seen[int(c)].append(int(r))
    # per-client subsequence is strictly increasing in request id
    for c, rids in seen.items():
        assert rids == sorted(set(rids)), f"client {c} appends out of order: {rids}"
    # completeness: applied set == the high-water rule scanned over the
    # log in commit order (a direct restatement of the rule, not the
    # full KV model)
    expect: dict[int, list[int]] = defaultdict(list)
    hw: dict[int, int] = {}
    for _seq, c, rid, _op, _k, _v in sorted(ops):
        if c in hw and rid <= hw[c]:
            continue
        hw[c] = rid
        expect[c].append(rid)
    assert dict(seen) == dict(expect)
