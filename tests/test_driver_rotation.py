"""The driver-contract rotation (``__spark_entry__._oldest_first``).

VERDICT r10 #1: the fixed-arc round-robin let 86/262 names sit with no
driver row newer than round 4 because promotions kept consuming the
50-row prefix budget ahead of the arc tail. The replacement schedule is
oldest-first: failed names, then never-checked names, then everything
else sorted by the round of its newest driver row ascending. These
tests pin the invariants on a synthetic report history so a future
edit can't silently reintroduce starvation.
"""

from __future__ import annotations

import importlib
import sys


def _entry():
    # import once, against the real on-disk reports; the helpers under
    # test are pure functions of module state we override per-test
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def _order(mapping, reports, monkeypatch):
    e = _entry()
    last = {}
    for i, rep in enumerate(reports, start=1):
        for name in rep:
            last[name] = i
    failed = [
        n
        for n, row in (reports[-1] if reports else {}).items()
        if not (isinstance(row, dict) and row.get("hash_match") is True)
    ]
    monkeypatch.setattr(e, "_LAST_CHECKED", last)
    monkeypatch.setattr(e, "_FAILED_LAST_ROUND", failed)
    return list(e._oldest_first(mapping))


GREEN = {"hash_match": True}
RED = {"hash_match": False}


def test_failed_then_fresh_then_stalest(monkeypatch):
    mapping = {k: k for k in ["a", "b", "c", "d", "e"]}
    # a checked r1, b checked r2, c failed in r2, d never checked,
    # e checked r1 (after a in registry order)
    reports = [{"a": GREEN, "e": GREEN}, {"b": GREEN, "c": RED}]
    got = _order(mapping, reports, monkeypatch)
    assert got == ["c", "d", "a", "e", "b"]


def test_oldest_first_is_self_advancing(monkeypatch):
    """Names verified in round N sink to the back of round N+1's
    order, so a fixed prefix drains the whole registry in
    ceil(n/budget) rounds even though the schedule never tracks an
    offset."""
    mapping = {f"q{i:02d}": i for i in range(10)}
    reports = [{f"q{i:02d}": GREEN for i in range(10)}]
    budget = 4
    seen = set()
    for _ in range(3):  # ceil(10/4)
        got = _order(mapping, reports, monkeypatch)
        head = got[:budget]
        # a simulated driver round: head gets fresh green rows
        reports = reports + [{n: GREEN for n in head}]
        seen.update(head)
    assert seen == set(mapping)


def test_never_checked_does_not_hide_failures(monkeypatch):
    mapping = {"fresh": 1, "broken": 2}
    reports = [{"broken": {"hash_match": False, "err": "boom"}}]
    got = _order(mapping, reports, monkeypatch)
    assert got == ["broken", "fresh"]


def test_ordering_is_a_permutation_of_the_registry():
    """Reordering must never drop or duplicate a name — the driver
    iterates queries() as THE registry, so a lost key would silently
    unregister an operator."""
    e = _entry()
    from matrixinversion_spark.registry import QUERIES

    ordered = list(e.queries())
    assert sorted(ordered) == sorted(QUERIES)
    assert len(ordered) == len(set(ordered))


def test_live_ordering_rest_is_sorted_by_staleness():
    """Against the real CORRECTNESS_r*.json history: after the
    promoted prefix (failed names — which legitimately carry the
    NEWEST round stamp — then never-checked names), the remaining
    order must be non-decreasing in last-checked round. This is the
    drain property itself, stated so it stays true even in a round
    where a failure is promoted to the head."""
    e = _entry()
    names = list(e.queries())
    lc = e._LAST_CHECKED
    # intersect with the live registry, mirroring _oldest_first's own
    # filter — a failed name deregistered since the last report must
    # not crash the index() loop below
    promoted = (set(e._FAILED_LAST_ROUND) & set(names)) | {
        n for n in names if n not in lc
    }
    rest = [lc[n] for n in names if n not in promoted]
    assert rest, "registry unexpectedly empty of checked names"
    assert all(a <= b for a, b in zip(rest, rest[1:])), (
        "non-promoted names are not ordered stalest-first"
    )
    # and promotions always precede the rest
    tail_names = [n for n in names if n not in promoted]
    first_rest = names.index(tail_names[0])
    assert all(
        names.index(p) < first_rest for p in promoted
    ), "a promoted name appears after a non-promoted one"
