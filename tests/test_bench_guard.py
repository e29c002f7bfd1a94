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
    """A record that can't testify to its sf — unreadable, valid JSON
    that isn't an object, or an object without the key — is treated
    as absent rather than crashing after the timed suite or wedging
    the bench forever (review r07: .get on parsed 'null' raised
    AttributeError; a dict without 'sf' compared as the string
    'None' and refused every future write)."""
    for garbage in ["{not json", "null", "[]", '"0.1"', "{}",
                    '{"queries": {}}']:
        p = tmp_path / "BENCH_FULL_r99.json"
        p.write_text(garbage)
        assert write_full_record(p, "0.1", _payload("0.1")), garbage
        assert json.loads(p.read_text())["sf"] == "0.1"
        p.unlink()
