"""Emit FRESHNESS.json — the driver-verdict freshness ledger.

One entry per registered query: the ROUND of its latest driver verdict
(hash-pass, or rows-only accounted via err == 'no_oracle' with a row
count), or 0 when no driver round has ever checked it.  The r8 verdict
ordered this emitted mechanically (order #7): the r3-stale set only
became visible by hand-diffing eight CORRECTNESS files; this ledger
makes lineage age a committed, test-pinned artifact —
tests/test_survey_sync.py recomputes the map from CORRECTNESS_r*.json
and fails when the committed ledger drifts.

Run after each round's CORRECTNESS_r{N}.json lands:

    PYTHONPATH=. python tools/emit_freshness.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from weather_etl_spark.registry import load_all  # noqa: E402


def freshness() -> dict[str, int]:
    latest: dict[str, int] = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        for name, row in json.loads(p.read_text()).items():
            ok = row.get("err") is None or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return {name: latest.get(name, 0) for name in sorted(load_all())}


def main() -> None:
    ledger = freshness()
    out = ROOT / "FRESHNESS.json"
    out.write_text(json.dumps(ledger, indent=0, sort_keys=True) + "\n")
    by_round: dict[int, int] = {}
    for rnd in ledger.values():
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print(f"wrote {out} ({len(ledger)} rows)")
    for rnd in sorted(by_round):
        label = f"r{rnd}" if rnd else "never"
        print(f"  {label}: {by_round[rnd]}")


if __name__ == "__main__":
    main()
