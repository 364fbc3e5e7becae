"""Derive the next round's driver-window rotation from recorded
lineage, instead of hand-maintaining it (the r5 ADVICE caught the
hand-computed window math drifting from the diff).

Reads every CORRECTNESS_r*.json in the repo root, computes each
query's LATEST driver-checked round, and prints:

1. the lineage histogram (how many rows' latest check is each round);
2. the queries with NO driver row yet (they outrank the priority list
   — the window budget they consume);
3. a suggested ``DRIVER_WINDOW_PRIORITY`` body: stalest lineage first
   (oracled before rows-only within a round), to paste into
   registry.py after appending the new round's greens to
   ``DRIVER_VERIFIED``;
4. the PREDICTED 50-slot window under the current registry ordering,
   so the operator can see exactly which re-checks fit.

Purely advisory — registry.py stays the source of truth the driver
actually reads.
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, "/root/repo")

from weather_etl_spark.registry import load_all

ROOT = Path(__file__).resolve().parent.parent


def lineage() -> dict[str, int]:
    latest: dict[str, int] = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        for name, row in json.loads(p.read_text()).items():
            # a row counts as driver-checked when it hash-passed OR ran
            # as a rows-only check (recorded with err == 'no_oracle')
            ok = row.get("err") is None or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    specs = load_all()
    latest = lineage()
    reg_names = list(specs)

    never = [n for n in reg_names if n not in latest]
    hist = Counter(latest[n] for n in reg_names if n in latest)
    print("lineage histogram (latest driver-checked round -> rows):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")
    print(f"  never: {len(never)}")
    if never:
        print("\nnever-driver-checked (outrank the priority list):")
        for n in never:
            print(f"  {n}")

    checked = [n for n in reg_names if n in latest]
    stalest = sorted(
        checked,
        key=lambda n: (
            latest[n],
            specs[n].oracle is None,  # oracled rows first within a round
            reg_names.index(n),
        ),
    )
    budget = 50 - len(never)
    print(f"\nsuggested DRIVER_WINDOW_PRIORITY (window budget after "
          f"{len(never)} new rows: {budget} re-check slots):")
    for n in stalest[: max(budget, 0) + 15]:
        marker = "" if specs[n].oracle is not None else "  # rows-only"
        print(f'    "{n}",{marker}')
    print("    # ... (tail truncated; stalest-first order continues)")

    window = reg_names[:50]
    print("\npredicted 50-slot window under CURRENT registry order:")
    print(f"  new (first verdict): "
          f"{[n for n in window if n not in latest]}")
    print(f"  re-checks: {[n for n in window if n in latest]}")


if __name__ == "__main__":
    main()
