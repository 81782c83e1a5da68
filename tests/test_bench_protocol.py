"""Unit tests for bench.py's trust-protocol helpers (pure Python — no
Spark). The headline the driver records must be the number a re-run
reproduces: trimmed median of 5 reps, started only in a quiet loadavg
window (1-min AND 5-min checked — the 5-min guard exists because a run
started seconds after another heavy job sees a deceptively low 1-min
load while the box is still draining; measured 1.48x headline gap)."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)


@pytest.fixture(scope="module")
def bench():
    mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(mod)
    return mod


def test_trimmed_median_drops_one_cold_and_one_lucky_rep(bench):
    # one cold first rep (9.4) and one lucky rep (3.4) must not move it
    assert bench._trimmed_median([9.368, 5.513, 5.571, 5.337, 4.979]) == 5.513
    assert bench._trimmed_median([5.0, 5.0, 50.0, 5.0, 5.0]) == 5.0


def test_trimmed_median_small_rep_fallback(bench):
    assert bench._trimmed_median([2.0]) == 2.0
    assert bench._trimmed_median([2.0, 4.0]) == 3.0
    assert bench._trimmed_median([1.0, 2.0, 30.0]) == 2.0


def test_quiet_gate_rejects_draining_host_and_reports_why(bench, monkeypatch):
    """1-min load low but 5-min high = box still draining a prior job:
    the gate must NOT report quiet (this exact shape produced the 1.48x
    slow run that motivated the 5-min check) — and it must RECORD the
    failing 5-min value, so a quiet:false row is auditable instead of
    showing only a deceptively low 1-min number (ADVICE r4)."""
    monkeypatch.setattr(os, "getloadavg", lambda: (0.75, 5.0, 3.0))
    ok, l1, l5 = bench._wait_for_quiet(max_load=1.0, max_wait_s=0)
    assert not ok
    assert l1 == 0.75
    assert l5 == 5.0  # the term that actually failed is visible


def test_quiet_gate_accepts_quiet_host(bench, monkeypatch):
    monkeypatch.setattr(os, "getloadavg", lambda: (0.2, 0.9, 1.2))
    ok, l1, l5 = bench._wait_for_quiet(max_load=1.0, max_wait_s=0)
    assert ok and l1 == 0.2 and l5 == 0.9


def test_quiet_gate_waits_then_succeeds(bench, monkeypatch):
    loads = iter([(3.0, 3.0, 2.0), (0.5, 0.8, 1.0)])
    current = {"v": (3.0, 3.0, 2.0)}

    def fake_loadavg():
        return current["v"]

    def fake_sleep(_):
        current["v"] = next(loads, (0.5, 0.8, 1.0))

    monkeypatch.setattr(os, "getloadavg", fake_loadavg)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    ok, l1, l5 = bench._wait_for_quiet(max_load=1.0, max_wait_s=60)
    assert ok and l1 == 0.5 and l5 == 0.8
