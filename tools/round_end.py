"""The round-end verification ritual, as ONE command (VERDICT r8 item 4
— rounds 7 and 8 skipped parts of it by hand and shipped a red suite /
lost artifacts):

    python tools/round_end.py [round_number]

Runs, in order, capturing everything under ROUND_END.md:
  1. python tools/check_oracle.py /root/testdata/sf0.01   (full gate)
  2. python -m pytest tests/ -q                            (full suite)
  3. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py
     -> writes the raw line to BENCH_LOCAL.json (the round-over-round
        reference the judge diffs against)
  4. python tools/arrow_fetch_sweep.py
  5. python tools/bench_compare.py <previous BENCH_LOCAL> <new>
     (regression gate, ±20% band around the old min..max spread)

Exit code is non-zero if ANY step fails, so it can gate a commit.
The previous BENCH_LOCAL.json is kept at BENCH_LOCAL.prev.json for the
comparison and for the judge.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], env: dict | None = None) -> tuple[int, str]:
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=REPO, env=e, text=True,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    return p.returncode, p.stdout


def tail(text: str, n: int = 15) -> str:
    lines = [ln for ln in text.splitlines()
             if not ln.startswith(("[Stage", "\r")) and ln.strip()]
    return "\n".join(lines[-n:])


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "?"
    report: list[str] = [f"# Round-end verification (round {rnd})",
                         f"_{time.strftime('%Y-%m-%d %H:%M:%S')}_", ""]
    failures: list[str] = []

    steps: list[tuple[str, list[str], dict | None]] = [
        ("oracle gate (sf0.01)",
         [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
         None),
        ("pytest (full suite)",
         [sys.executable, "-m", "pytest", "tests/", "-q"], None),
        ("arrow fetch sweep",
         [sys.executable, "tools/arrow_fetch_sweep.py"], None),
    ]
    for title, cmd, env in steps:
        print(f"== {title} ...", flush=True)
        rc, outp = run(cmd, env)
        status = "PASS" if rc == 0 else f"FAIL (exit {rc})"
        if rc != 0:
            failures.append(title)
        report += [f"## {title} — {status}", "```", tail(outp), "```", ""]
        print(f"   {status}")

    print("== bench (sf0.1) ...", flush=True)
    rc, outp = run([sys.executable, "bench.py"],
                   {"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1"})
    line = next((ln for ln in reversed(outp.splitlines())
                 if ln.startswith('{"metric"')), None)
    if rc != 0 or line is None:
        failures.append("bench")
        report += ["## bench — FAIL", "```", tail(outp), "```", ""]
        print("   FAIL")
    else:
        parsed = json.loads(line)
        prev = os.path.join(REPO, "BENCH_LOCAL.json")
        prev_copy = os.path.join(REPO, "BENCH_LOCAL.prev.json")
        had_prev = os.path.exists(prev)
        if had_prev:
            shutil.copy(prev, prev_copy)
        with open(prev, "w") as f:
            f.write(line + "\n")
        report += [f"## bench — PASS (Σmin {parsed['value']} s over "
                   f"{len(parsed['queries'])} queries at sf{parsed['sf']})",
                   ""]
        print(f"   PASS ({parsed['value']} s)")
        if had_prev:
            print("== bench_compare vs previous ...", flush=True)
            rc, outp = run([sys.executable, "tools/bench_compare.py",
                            prev_copy, prev])
            status = "no regressions" if rc == 0 else "REGRESSIONS"
            if rc != 0:
                failures.append("bench_compare")
            report += [f"## bench_compare — {status}", "", outp, ""]
            print(f"   {status}")

    report += ["## verdict",
               ("ALL GREEN" if not failures
                else "FAILED: " + ", ".join(failures)), ""]
    with open(os.path.join(REPO, "ROUND_END.md"), "w") as f:
        f.write("\n".join(report))
    print(f"\nwrote ROUND_END.md — "
          f"{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
