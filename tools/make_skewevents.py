"""Build the WHALE-USER events skew slice (round 10) — the events twin
of tools/make_skew_slice.py's document shapes, attacking every
window-on-user operator (scd2, twap, markov, attribution, funnels):

  whale user   every `stride`-th event (default 1 of 5 => 20% of all
               events) is re-assigned to ONE user id, preserving
               timestamps — the bot-traffic geometry where a single
               user's event stream dwarfs the population.

Measured findings live in SCALE.md ("Whale-user skew slice"): every
window-on-user operator is whale-immune (O(n log n) per user) except
the pair-level interval attribution join, whose output is quadratic
per user BY SEMANTICS — `streaming/joins.last_touch_attribution` is
the bounded-output fix.

All other tables are copied verbatim from the source dir so any
queries() entry can run against the slice.

Usage: python tools/make_skewevents.py [out_dir] [src_dir] [stride] [whale_id]
  default: /root/skewevents /root/scale10x 5 77
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/skewevents")
    src = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/scale10x")
    stride = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    whale = int(sys.argv[4]) if len(sys.argv) > 4 else 77
    out.mkdir(parents=True, exist_ok=True)

    ev = pq.read_table(src / "events.parquet")
    eid = np.asarray(ev["event_id"].combine_chunks())
    uid = np.asarray(ev["user_id"].combine_chunks()).copy()
    uid[eid % stride == 0] = whale
    t = pa.table({"event_id": ev["event_id"], "ts": ev["ts"],
                  "user_id": pa.array(uid, pa.int64()),
                  "event_type": ev["event_type"],
                  "value": ev["value"], "props": ev["props"]})
    pq.write_table(t, out / "events.parquet", row_group_size=100_000)
    n_whale = int((eid % stride == 0).sum())
    print(f"events: {ev.num_rows} rows, whale user {whale} owns "
          f"{n_whale} ({100 * n_whale // ev.num_rows}%)")

    for p in src.glob("*.parquet"):
        if p.name != "events.parquet":
            shutil.copy(p, out / p.name)
    print(f"other tables copied verbatim from {src}")


if __name__ == "__main__":
    main()
