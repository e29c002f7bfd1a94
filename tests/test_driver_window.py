"""Driver-window discipline: the grading driver correctness-checks
only the FIRST 50 entries of ``__spark_entry__.queries()``, so the
ordering list must stay exactly at the cap and keep every
not-yet-driver-checked query seated (judge feedback r02: queries that
keep 'losing the seat lottery' never get hard-signal coverage)."""

from __future__ import annotations

import json
import pathlib

import pytest

import __spark_entry__ as entry

WINDOW = 50
REPO = pathlib.Path(__file__).resolve().parent.parent


def _driver_checked() -> set[str] | None:
    """Union of query names across all CORRECTNESS_r*.json files;
    None when no file exists yet (fresh clone)."""
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if not files:
        return None
    seen: set[str] = set()
    for f in files:
        seen |= set(json.loads(f.read_text()))
    return seen


def test_priority_list_fits_the_window():
    assert len(entry._PRIORITY) <= WINDOW, (
        f"_PRIORITY has {len(entry._PRIORITY)} entries; the driver caps at "
        f"{WINDOW} — entries past the cap are silently never checked"
    )


def test_priority_names_exist():
    names = set(entry.queries())
    ghosts = [n for n in entry._PRIORITY if n not in names]
    assert not ghosts, f"_PRIORITY references unregistered queries: {ghosts}"


def test_never_checked_queries_are_seated():
    checked = _driver_checked()
    if checked is None:
        return  # no driver rounds recorded yet
    names = list(entry.queries())
    window = set(names[:WINDOW])
    never = [n for n in names if n not in checked]
    unseated = [n for n in never if n not in window]
    # Allow at most the overflow that cannot fit once the backlog
    # exceeds the window (those must be the NEWEST queries, which get
    # first seats next round) — but never a silently forgotten one.
    # Pinned rows only consume a seat a never-checked query could have
    # used when they are NOT themselves never-checked (advisor r03).
    pinned_checked = sum(
        1 for n in entry._PINNED_KV if n in names and n in checked
    )
    overflow_budget = max(0, len(never) + pinned_checked - WINDOW)
    assert len(unseated) <= overflow_budget, (
        f"never-driver-checked queries left outside the {WINDOW}-seat "
        f"window with seats available: {unseated}"
    )


# With 155 registered and a 50-seat window (minus pins / promotions /
# changed rows), the steady-state rotation re-confirms every row every
# ~3-4 rounds. These two bounds turn that arithmetic into an invariant
# so a seat-ordering bug that silently starves a row fails loudly
# instead of aging it forever (r08 verdict, residual #2).
MAX_CONFIRMATION_AGE = 5  # hard cap: no row's green proof older than this
MAX_UNSEATED_AGE = 4  # rows this old MUST hold a seat this round


def test_no_row_ages_past_the_staleness_cap():
    """Every registered query with a driver confirmation must have
    been re-confirmed within MAX_CONFIRMATION_AGE rounds. Firing also
    doubles as the registration-budget alarm: if a changed-row burst
    starves the stale rotation for this long, registry growth has
    outrun the window."""
    last = entry._last_checked_round()
    if not last:
        return  # no driver rounds recorded yet
    nxt = entry._next_round()
    ancient = {
        n: last[n]
        for n in entry.queries()
        if n in last and nxt - last[n] > MAX_CONFIRMATION_AGE
    }
    assert not ancient, (
        f"rows whose last driver confirmation is older than "
        f"{MAX_CONFIRMATION_AGE} rounds (next round = r{nxt:02d}): {ancient}"
    )


def test_oldest_cohort_is_fully_seated():
    """Proactive half of the cap: any row already MAX_UNSEATED_AGE
    rounds stale must be inside the current window, so it gets
    re-confirmed BEFORE it can breach the hard cap above."""
    last = entry._last_checked_round()
    if not last:
        return
    nxt = entry._next_round()
    window = set(entry._PRIORITY)
    starving = {
        n: last[n]
        for n in entry.queries()
        if n in last and nxt - last[n] >= MAX_UNSEATED_AGE and n not in window
    }
    assert not starving, (
        f"rows {MAX_UNSEATED_AGE}+ rounds stale left outside the window "
        f"(they would breach the r{MAX_CONFIRMATION_AGE}-round cap next "
        f"round): {starving}"
    )


def test_window_prefers_oldest_confirmation():
    """The computed ordering must seat rows whose last driver
    confirmation is oldest before fresher ones (refresh coverage,
    verdict r03 item 2) — among UNCHANGED rows; changed-since-
    confirmation rows legitimately jump the staleness queue
    (round-6 change-aware window)."""
    last = entry._last_checked_round()
    if not last:
        return
    changed = entry._changed_since_confirmation(last)
    names = list(entry.queries())
    pinned = set(entry._PINNED_KV)
    in_window = [
        n for n in names[:WINDOW] if n not in pinned and n not in changed
    ]
    out_window = [
        n for n in names[WINDOW:] if n not in pinned and n not in changed
    ]
    if not in_window or not out_window:
        return
    oldest_out = min(last.get(n, 0) for n in out_window)
    newest_in = max(last.get(n, 0) for n in in_window)
    assert newest_in <= oldest_out, (
        "a row with a fresher driver confirmation is seated while an "
        "older one waits outside the window"
    )


def test_changed_queries_jump_the_queue():
    """Round-5 verdict task 1: a query whose definition changed after
    its last CORRECTNESS row holds a proof of STALE code — it must
    re-seat ahead of merely-stale rows. Every changed query is seated
    unless the changed set alone overflows the window."""
    last = entry._last_checked_round()
    if not last:
        return
    changed = entry._changed_since_confirmation(last)
    names = list(entry.queries())
    window = set(names[:WINDOW])
    unseated = sorted(n for n in changed if n not in window)
    # Budget must count the pins that legitimately hold seats a
    # changed row could not take (mirrors the sibling never-checked
    # budget at line 59; a plain len(changed) - WINDOW fires
    # spuriously once the changed set reaches WINDOW - floor).
    pinned_seated = sum(
        1 for n in entry._PINNED_KV if n in window and n not in changed
    )
    overflow_budget = max(0, len(changed) + pinned_seated - WINDOW)
    assert len(unseated) <= overflow_budget, (
        f"changed-since-confirmation queries left outside the window "
        f"while unchanged rows hold seats: {unseated}"
    )


def test_next_round_defs_snapshot_is_current():
    """QUERY_DEFS_r{NN}.json for the UPCOMING driver round must match
    the registry's current definition hashes — otherwise the next
    round's change detection compares against a stale snapshot.

    SELF-HEALING (verdict r07 task 2): the snapshot is a pure function
    of current source, and the driver drops CORRECTNESS_r{NN-1}.json
    AFTER the builder's last commit — so at judging time the "next"
    round advances and the file cannot exist yet. Demanding a manual
    `dump_query_defs.py` run nobody can take made this guard red at
    every round boundary (r06, r07). Now: when the snapshot is ABSENT
    the guard writes it (byte-identical to the dump tool's output) and
    passes; when PRESENT with stale content it still fails loudly —
    the tamper check is preserved, the unmeetable step is gone."""
    from mit6_5840_6_824_lab1_mapreduce_spark.queries.defs import current_defs

    last = entry._last_checked_round()
    nxt = max(last.values(), default=0) + 1
    snap_file = REPO / f"QUERY_DEFS_r{nxt:02d}.json"
    cur = current_defs()
    if not snap_file.exists():
        # Atomic write (tmp + rename): a parallel test runner or an
        # interrupted run must never leave a half-written snapshot
        # that the content check below would then call "stale".
        tmp = snap_file.with_suffix(".json.tmp")
        tmp.write_text(
            json.dumps(dict(sorted(cur.items())), indent=0, sort_keys=True)
            + "\n"
        )
        tmp.replace(snap_file)
        return
    snap = json.loads(snap_file.read_text())
    drifted = sorted(
        n for n in set(snap) | set(cur) if snap.get(n) != cur.get(n)
    )
    assert not drifted, (
        f"{snap_file.name} is stale for {drifted}; "
        f"run: python tools/dump_query_defs.py {nxt}"
    )


def test_defs_snapshots_cover_their_rounds_rosters():
    """Every query with a CORRECTNESS row in round R must appear in
    QUERY_DEFS_r{R}.json — otherwise change detection silently treats
    it as unchanged forever (missing-snapshot fallback). The snapshot
    must also be GIT-TRACKED, not merely present: the self-healing
    next-round guard auto-writes its file locally, and an auto-written
    but never-committed snapshot would keep local tests green while
    any other checkout (the driver's included) lacks the file — this
    closes that gap loudly as soon as the round's CORRECTNESS artifact
    lands. Only rounds WITH a CORRECTNESS file are held to it, so the
    freshly auto-written next-round file stays exempt."""
    import subprocess

    # Distinguish "git unavailable" (skip the tracking check, loudly)
    # from "zero tracked snapshots" (a real failure: every confirmed
    # round's snapshot must be committed) — keying on empty stdout
    # alone silently downgraded the check when the command failed
    # (advisor r08).
    proc = subprocess.run(
        ["git", "ls-files", "QUERY_DEFS_r*.json"],
        cwd=REPO, capture_output=True, text=True,
    )
    git_ok = proc.returncode == 0
    tracked = set(proc.stdout.split()) if git_ok else set()
    confirmed = sorted(REPO.glob("CORRECTNESS_r*.json"))
    for cf in confirmed:
        rno = int(cf.stem.split("r")[-1])
        df = REPO / f"QUERY_DEFS_r{rno:02d}.json"
        assert df.exists(), f"no defs snapshot for round {rno}"
        if git_ok:
            assert df.name in tracked, (
                f"{df.name} exists locally but is not git-tracked — "
                f"commit it (auto-written snapshots must not stay local)"
            )
        defs = json.loads(df.read_text())
        missing = sorted(set(json.loads(cf.read_text())) - set(defs))
        assert not missing, f"round {rno} roster missing from defs: {missing}"
    # Skip LAST (review r09): the existence and roster-coverage
    # assertions above are git-independent and must run even in an
    # exported tree; only the tracked-in-git check is waived, loudly.
    if not git_ok and confirmed:
        pytest.skip(
            "git ls-files unavailable — tracked-snapshot check waived "
            f"(existence/coverage asserted): {proc.stderr.strip()[:120]}"
        )


def _order(names, last, changed, pinned, floor=entry._PIN_FLOOR):
    win = entry._seat_order(
        list(names), dict(last), set(changed), list(pinned), floor
    )
    return win[:WINDOW]


def test_seat_order_synthetic_changed_jumps_staleness():
    """Unit contract on a synthetic history: a changed r(max-1) row
    outranks every unchanged r(max-2) row once seats run short."""
    names = [f"q{i:03d}" for i in range(60)]
    # q000..q049 confirmed in round 3 (stale), q050..q058 in round 4,
    # q059 in round 5; q055 changed after its round-4 row.
    last = {n: 3 for n in names[:50]}
    last.update({n: 4 for n in names[50:59]})
    last["q059"] = 5
    win = _order(names, last, {"q055"}, [])
    assert "q055" in win
    # the one unchanged r03 row it displaced is the LAST-registered one
    assert win.count("q055") == 1 and "q049" not in win


def test_seat_order_synthetic_never_checked_leads():
    names = [f"q{i:03d}" for i in range(55)]
    last = {n: 2 for n in names[:54]}  # q054 never checked
    win = _order(names, last, set(), [])
    assert "q054" in win


def test_seat_order_synthetic_valve_releases_for_changed_rows():
    """When the changed set alone overflows the seats (changed rows
    always sort to the front, so that is the only way one goes
    unseated), a fresh, unchanged, releasable pin yields its seat."""
    qs = [f"q{i:03d}" for i in range(50)]
    names = qs + ["pin_a", "pin_b", "pin_c"]
    last = {n: 5 for n in names}
    last.update({n: 3 for n in qs})  # 50 changed rows vs 47 base seats
    win = _order(names, last, set(qs), ["pin_a", "pin_b", "pin_c"])
    assert "pin_a" in win and "pin_b" in win  # floor holds
    assert "pin_c" not in win                 # released to a changed row
    assert sum(1 for n in win if n in set(qs)) == 48


def test_seat_order_synthetic_one_round_old_pin_yields_to_changed():
    """Round-6 widening: a pin confirmed ONE round ago (not fresh,
    not needy) also yields to an otherwise-unseated changed row — but
    a pin that is itself >= 2 rounds stale keeps its seat (it is as
    needy as the row it would unblock)."""
    qs = [f"q{i:03d}" for i in range(49)]
    names = qs + ["pin_a", "pin_b", "pin_old", "pin_stale"]
    last = {n: 5 for n in names}
    last.update({n: 3 for n in qs})  # 49 changed rows vs 46 base seats
    last["pin_old"] = 4    # one round old: releasable
    last["pin_stale"] = 3  # two rounds stale: needy itself, keeps seat
    win = _order(
        names, last, set(qs), ["pin_a", "pin_b", "pin_old", "pin_stale"]
    )
    assert "pin_old" not in win, "one-round-old pin blocked a changed row"
    assert "pin_stale" in win, "needy pin lost its seat"
    # the valve keeps releasing down to the floor (pin_b goes too),
    # so 48 of the 49 changed rows seat alongside the two kept pins
    assert "pin_b" not in win and "pin_a" in win
    assert sum(1 for n in win if n in set(qs)) == 48


def test_seat_order_synthetic_changed_pin_is_not_released():
    """A pin that is ITSELF changed keeps its seat (it needs the
    re-proof too) — the valve must release a different fresh pin."""
    qs = [f"q{i:03d}" for i in range(50)]
    names = qs + ["pin_a", "pin_b", "pin_c", "pin_d"]
    last = {n: 5 for n in names}
    last.update({n: 3 for n in qs})
    last["pin_d"] = 3
    win = _order(
        names, last, set(qs) | {"pin_d"}, ["pin_a", "pin_b", "pin_c", "pin_d"]
    )
    assert "pin_d" in win, "changed pin lost its seat"
    assert "pin_c" not in win  # the unchanged fresh pin was released


def test_seat_order_degraded_pins_floor_tracks_guarded_names():
    """If a name-guarded pin ever left the registry, the valve floor
    must shrink to the guarded pins actually present — a count floor
    would stop early and shield an unguarded fresh pin from release
    (code-review r06). Simulated: only ONE never-release pin present,
    two releasable fresh pins, needy changed rows for both seats."""
    qs = [f"q{i:03d}" for i in range(50)]
    guarded = sorted(entry._NEVER_RELEASE)[0]
    names = qs + [guarded, "pin_x", "pin_y"]
    last = {n: 5 for n in names}
    last.update({n: 3 for n in qs})
    win = _order(
        names, last, set(qs), [guarded, "pin_x", "pin_y"],
        floor=1,  # what _ordered_names computes for one guarded pin
    )
    assert guarded in win, "name-guarded pin lost its seat"
    assert "pin_x" not in win and "pin_y" not in win, (
        "releasable fresh pins kept seats while changed rows waited"
    )
    assert sum(1 for n in win if n in set(qs)) == 49


def test_dump_tool_hash_matches_canonical():
    """tools/dump_query_defs.py carries a pinned inline copy of
    queries.defs.def_hash (so it can hash historical checkouts that
    predate the module); the two implementations must agree."""
    import importlib.util

    from mit6_5840_6_824_lab1_mapreduce_spark.queries import REGISTRY
    from mit6_5840_6_824_lab1_mapreduce_spark.queries.defs import def_hash

    spec = importlib.util.spec_from_file_location(
        "dump_query_defs", REPO / "tools" / "dump_query_defs.py"
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    for name, e in REGISTRY.items():
        assert tool._def_hash(e) == def_hash(e), name


def test_pin_release_valve_seats_stale_rows():
    """A pinned KV row confirmed in the most recent round must not
    crowd out a row whose confirmation is >= 2 rounds older (round-5
    verdict item 3): after the valve, no unseated query may be >= 2
    rounds staler than the freshest pinned row still holding a seat —
    unless the pin floor (the Get/Put core) is the binding constraint."""
    last = entry._last_checked_round()
    if not last:
        return
    max_round = max(last.values())
    changed = entry._changed_since_confirmation(last)
    names = list(entry.queries())
    window = set(names[:WINDOW])
    pinned_in = [n for n in entry._PINNED_KV if n in window]
    assert len(pinned_in) >= entry._PIN_FLOOR
    for n in entry._NEVER_RELEASE:
        assert n in window, f"name-guarded pin {n} lost its seat"
    needy_out = [
        n for n in names[WINDOW:]
        if n not in entry._PINNED_KV
        and (n in changed or last.get(n, 0) <= max_round - 2)
    ]
    if needy_out:
        # valve exhausted: no RELEASABLE pin (not name-guarded, not
        # itself changed, confirmed within the last two rounds) may
        # still hold a seat a needy row could use — a pin that is
        # itself >= 2 rounds stale or changed legitimately keeps its
        # seat (it needs the re-proof too).
        releasable = [
            n for n in pinned_in
            if n not in entry._NEVER_RELEASE
            and n not in changed
            and last.get(n, 0) > max_round - 2
        ]
        assert not releasable, (
            f"needy rows unseated while releasable pins remain: "
            f"{needy_out} vs {releasable}"
        )


def test_seat_plan_tool_bounds_match():
    """tools/seat_plan.py carries pinned copies of the staleness
    bounds this module defines (the tool must not import test
    modules); the copies must agree or the tool's BREACHED verdicts
    drift from what CI actually enforces."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "seat_plan", REPO / "tools" / "seat_plan.py"
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    assert tool.MAX_CONFIRMATION_AGE == MAX_CONFIRMATION_AGE
    assert tool.MAX_UNSEATED_AGE == MAX_UNSEATED_AGE
