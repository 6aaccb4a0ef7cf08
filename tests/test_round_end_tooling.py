"""The round-end ritual's adjudication-completeness gate (VERDICT r14
nit #1): a bench_compare REGRESSED list must be FULLY covered by
ADJUDICATIONS.md table rows or the ritual fails — round 14 shipped a
hand-written "every flag re-measured" claim that covered 5 of 9 flags.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _round_end():
    spec = importlib.util.spec_from_file_location(
        "round_end_mod", REPO / "tools" / "round_end.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


COMPARE_OUT = """\
| query | old min..max | new min..max | verdict |
|---|---|---|---|
| q_fast | 0.1..0.2 | 0.15..0.18 | ok |
| q_slow | 1.0..1.2 | 2.5..2.6 | REGRESSED |
| q_other | 0.5..0.6 | 1.4..1.5 | REGRESSED |

REGRESSED: q_slow, q_other
"""


def test_parse_regressed():
    m = _round_end()
    assert m.parse_regressed(COMPARE_OUT) == ["q_slow", "q_other"]
    assert m.parse_regressed("all good\n") == []


def test_partial_adjudication_leaves_gaps():
    m = _round_end()
    partial = (
        "# Adjudications\n"
        "| query | old tree | new tree | verdict |\n"
        "|---|---|---|---|\n"
        "| q_slow | 2.4 | 2.5 | drift |\n")
    gaps = m.adjudication_gaps(["q_slow", "q_other"], partial)
    assert gaps == ["q_other"]


def test_full_adjudication_has_no_gaps():
    m = _round_end()
    full = (
        "| query | verdict |\n"
        "|---|---|\n"
        "| `q_slow` | drift |\n"
        "| q_other | justified scope growth |\n")
    assert m.adjudication_gaps(["q_slow", "q_other"], full) == []


def test_empty_adjudication_file_fails_everything():
    m = _round_end()
    assert m.adjudication_gaps(["a", "b"], "") == ["a", "b"]


def test_partial_adjudication_exits_nonzero(tmp_path, monkeypatch):
    """End-to-end shape of the gate: simulate the main()-level decision
    for a partial adjudication — the failure list must be non-empty,
    which is exactly what drives sys.exit(1)."""
    m = _round_end()
    regressed = m.parse_regressed(COMPARE_OUT)
    partial = "| q_slow | drift |\n"
    gaps = m.adjudication_gaps(regressed, partial)
    failures = []
    if gaps:
        failures.append("bench_compare (adjudication missing: "
                        + ", ".join(gaps) + ")")
    assert failures, "partial adjudication must fail the ritual"
    assert "q_other" in failures[0]
