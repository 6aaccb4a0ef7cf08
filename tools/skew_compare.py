"""Compare full-surface smoke walls between an adversarial-skew slice
and its same-size unskewed baseline (VERDICT r10 item 1): reads the
JSONL written by `tools/smoke_surface.py --out`, pairs each slice with
its baseline dir, and prints every query whose slice wall exceeds
`ratio_floor` x baseline (only where both walls >= `abs_floor` seconds
— sub-second swings are host noise, the round-9 drift lesson).

Usage: python tools/skew_compare.py walls.jsonl slice_dir baseline_dir
       [ratio_floor] [abs_floor]
Exit code = number of flagged queries.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = sys.argv[1]
    slice_dir, base_dir = sys.argv[2], sys.argv[3]
    ratio_floor = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    abs_floor = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0

    walls: dict[str, dict[str, float]] = {}
    errors: list[tuple[str, str]] = []
    for ln in open(path):
        r = json.loads(ln)
        if "error" in r:
            errors.append((r["dir"], r["query"]))
            continue
        walls.setdefault(r["dir"], {})[r["query"]] = r["wall_s"]
    s, b = walls.get(slice_dir, {}), walls.get(base_dir, {})
    flagged = []
    for q in sorted(set(s) & set(b)):
        if s[q] >= abs_floor and s[q] > ratio_floor * max(b[q], 0.2):
            flagged.append((s[q] / max(b[q], 0.01), q, b[q], s[q]))
    flagged.sort(reverse=True)
    print(f"{slice_dir} vs {base_dir}: {len(s)} slice / {len(b)} base "
          f"queries; {len(errors)} errors; flagged (> {ratio_floor}x "
          f"and >= {abs_floor}s):")
    for ratio, q, bw, sw in flagged:
        print(f"  {q}: {bw:.2f}s -> {sw:.2f}s ({ratio:.1f}x)")
    for d, q in errors:
        if d == slice_dir:
            print(f"  ERROR {q}")
    return len(flagged) + sum(1 for d, _ in errors if d == slice_dir)


if __name__ == "__main__":
    sys.exit(main())
