"""The bench artifact guard (judge r06): a BENCH_FULL record must
never be replaced by a run at a different scale factor — that's how
the committed sf0.1 r06 record got clobbered by a leaked sf0.01 env
and the round-over-round diff silently compared across scales."""

from __future__ import annotations

import json

from bench import write_full_record


def _payload(sf: str) -> dict:
    return {"sf": sf, "queries": {"q": 1.0}, "canary": {"start": 0.5}}


def test_writes_fresh_record(tmp_path):
    p = tmp_path / "BENCH_FULL_r99.json"
    assert write_full_record(p, "0.1", _payload("0.1"))
    assert json.loads(p.read_text())["sf"] == "0.1"


def test_overwrites_same_sf(tmp_path):
    p = tmp_path / "BENCH_FULL_r99.json"
    write_full_record(p, "0.1", _payload("0.1"))
    new = _payload("0.1") | {"queries": {"q": 2.0}}
    assert write_full_record(p, "0.1", new)
    assert json.loads(p.read_text())["queries"]["q"] == 2.0


def test_refuses_cross_sf_overwrite(tmp_path, capsys):
    p = tmp_path / "BENCH_FULL_r99.json"
    write_full_record(p, "0.1", _payload("0.1"))
    assert not write_full_record(p, "0.01", _payload("0.01"))
    assert json.loads(p.read_text())["sf"] == "0.1"  # untouched
    assert "REFUSING" in capsys.readouterr().err


def test_corrupt_existing_record_is_replaced(tmp_path):
    """An unreadable record can't testify to its sf — treat as absent
    rather than wedging the bench forever."""
    p = tmp_path / "BENCH_FULL_r99.json"
    p.write_text("{not json")
    assert write_full_record(p, "0.1", _payload("0.1"))
    assert json.loads(p.read_text())["sf"] == "0.1"
