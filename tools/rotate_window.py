"""Driver-window rotation planner (the VERDICT r3 #1 mechanism, made
reproducible for every future round).

The driver's correctness harness externally checks only the FIRST 50
entries of ``__spark_entry__.queries()``.  This tool reads every
``CORRECTNESS_r*.json`` artifact in the repo root, computes which
oracle pairs have EVER been driver-green, and prints:

* coverage accounting (ever-checked / never-checked),
* the recommended next window: never-checked pairs first (in current
  registration order), back-filled with the least-recently-checked
  pairs when fewer than 50 remain unchecked,
* the exact ordering to paste into the ``queries()`` return dict.

Usage: ``python3 tools/rotate_window.py``  (read-only; the edit to
``__spark_entry__.py`` stays a reviewed, committed change).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_by_round() -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        with open(p) as f:
            d = json.load(f)
        out[m.group(1)] = {
            k for k, v in d.items()
            if isinstance(v, dict) and v.get("hash_match")
        }
    return out


def main() -> None:
    import __spark_entry__ as entry

    order = list(entry.queries().keys())
    rounds = driver_green_by_round()
    ever: set[str] = set().union(*rounds.values()) if rounds else set()
    last_checked: dict[str, str] = {}
    for rnd in sorted(rounds):
        for q in rounds[rnd]:
            last_checked[q] = rnd

    never = [q for q in order if q not in ever]
    print(f"registered pairs: {len(order)}")
    for rnd in sorted(rounds):
        print(f"  round {rnd}: {len(rounds[rnd])} driver-green")
    print(f"ever driver-checked: {len(ever)}  never: {len(never)}")

    window = never[:50]
    if len(window) < 50:
        # back-fill with the least-recently-checked pairs (stable by
        # registration order within a round)
        backfill = sorted(
            (q for q in order if q in ever),
            key=lambda q: (last_checked[q], order.index(q)),
        )
        window += backfill[: 50 - len(window)]
    tail = [q for q in order if q not in window]

    print(f"\nrecommended next window ({len(window)}; "
          f"{len(never[:50])} never-checked + {len(window) - len(never[:50])} "
          "least-recently-checked back-fill):")
    for q in window:
        tag = "NEVER" if q not in ever else f"last r{last_checked[q]}"
        print(f"  {q}  [{tag}]")
    print("\npaste order (window then tail):")
    for q in window + tail:
        print(f'        "{q}": {q},')


if __name__ == "__main__":
    main()
