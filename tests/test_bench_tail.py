"""Driver-tail bench lines (VERDICT r15 item 1): the final captured
lines must carry REAL per-query names and seconds, each line under the
~2000-char tail budget, never the round-11 {"n": count} degrade at
today's registry size."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, driver_tail_lines  # noqa: E402


def _parse(lines):
    return [json.loads(ln) for ln in lines]


def test_small_registry_single_line():
    timings = {f"q{i}": 1.234 for i in range(10)}
    lines = driver_tail_lines(timings, 12.34, 0.1)
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "headline_queries_total"
    assert rec["value"] == 12.34
    assert rec["queries"] == {f"q{i}": 1.2 for i in range(10)}
    assert len(lines[0]) < 1900


def test_current_headline_set_splits_with_real_names():
    # the real registry: 102 names no longer fit one sub-1900-char line
    timings = {name: 1.234 for name in HEADLINE}
    total = round(1.234 * len(HEADLINE), 3)
    lines = driver_tail_lines(timings, total, 0.1)
    assert all(len(ln) < 1900 for ln in lines)
    recs = _parse(lines)
    # the FINAL line holds the total under the driver contract keys
    last = recs[-1]
    assert last["metric"] == "headline_queries_total"
    assert last["value"] == total
    assert last["unit"] == "sec"
    assert last["sf"] == 0.1
    # the union of all parts reconstructs every query with a float
    merged: dict = {}
    for r in recs:
        merged.update(r["queries"])
    assert set(merged) == set(HEADLINE)
    assert all(isinstance(v, float) for v in merged.values())
    # never the blind degrade
    assert "n" not in merged or "n" in HEADLINE


def test_error_entries_survive_and_errors_flag_carried():
    timings = {name: 1.0 for name in HEADLINE}
    timings[HEADLINE[-1]] = "ERROR: RuntimeError: boom"
    lines = driver_tail_lines(timings, 101.0, 0.1, errors=1)
    recs = _parse(lines)
    merged: dict = {}
    for r in recs:
        merged.update(r["queries"])
    assert merged[HEADLINE[-1]] == "ERROR"
    assert recs[-1]["errors"] == 1
