"""Fresh-seed adversarial-battery campaign runner.

The committed batteries are deterministic (offset 0 = the documented
seeds) so a red run always reproduces; this tool re-runs ALL of them
under a list of fresh seed offsets (and optionally fresh stream sizes
for the two python-model differentials), hunting divergences the
committed seeds happen to miss.  Pure verification — it changes
nothing; each offset is one full pytest invocation so a failure
pinpoints (offset, test) exactly.

Usage:
    python tools/sweep_battery_seeds.py 1000001 31415926 ...
    python tools/sweep_battery_seeds.py --sizes 40,3000 5550001

With no offsets given, draws three from the clock (recorded in the
output so the run is reproducible after the fact).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

BATTERIES = [
    "tests/test_drift_random_parity.py",
    "tests/test_text_adversarial_parity.py",
    "tests/test_orders_adversarial_parity.py",
    "tests/test_embed_adversarial_parity.py",
    "tests/test_graph_adversarial_parity.py",
    "tests/test_eventseq_random_differential.py",
    "tests/test_joinwin_random_differential.py",
]

#: The batteries whose stream size honors SPARK_GRAFT_BATTERY_N (the
#: two python-model differentials).  Named explicitly rather than
#: sliced off BATTERIES so reordering/appending there can't silently
#: point the size sweep at batteries that ignore the knob.
SIZED_BATTERIES = [
    "tests/test_eventseq_random_differential.py",
    "tests/test_joinwin_random_differential.py",
]

#: A full battery file finishes well inside 15 min on this host; a hung
#: Spark session would otherwise stall the whole campaign silently
#: (capture_output swallows all progress).
BATTERY_TIMEOUT_S = 2400


def child_env(offset: int) -> dict[str, str]:
    """The exact env the campaign children inherit.  Factored out so
    the canary and run_one cannot drift apart (the r10 env-dropping
    bug silently re-ran committed seeds for a whole campaign)."""
    return dict(os.environ, SPARK_GRAFT_BATTERY_SEED_OFFSET=str(offset))


def canary(offset: int = 424243) -> None:
    """Assert a child spawned with child_env() actually derives its
    battery seeds from the given offset, via the same helper the
    batteries import.  Raises on any discrepancy."""
    probe = (
        "import sys; sys.path.insert(0, '.'); "
        "from tests.conftest import battery_seed; "
        "print(battery_seed(0))"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True,
        env=child_env(offset), cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), timeout=60,
    )
    got = out.stdout.strip()
    if out.returncode != 0 or got != str(offset):
        raise RuntimeError(
            f"seed canary FAILED: child derived battery_seed(0)={got!r}, "
            f"expected {offset} (rc={out.returncode}, "
            f"stderr={out.stderr[-500:]!r}) — the campaign would "
            f"silently re-run committed seeds; aborting"
        )


def run_one(offset: int, n: str | None) -> bool:
    env = child_env(offset)
    tag = f"offset={offset}"
    files = BATTERIES
    if n is not None:
        env["SPARK_GRAFT_BATTERY_N"] = n
        tag += f" n={n}"
        files = SIZED_BATTERIES
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *files, "-q", "--tb=short"],
            capture_output=True, text=True, env=env, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
            timeout=BATTERY_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired as exc:
        print(f"[HUNG] {tag}  killed after {BATTERY_TIMEOUT_S}s "
              f"({', '.join(files)})")
        # TimeoutExpired carries whatever the child printed before the
        # kill — the last test line is the stall's best diagnosis.
        partial = exc.stdout or b""
        if isinstance(partial, bytes):
            partial = partial.decode(errors="replace")
        if partial.strip():
            print(partial[-4000:])
        return False
    ok = proc.returncode == 0
    last = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    print(f"[{'PASS' if ok else 'FAIL'}] {tag}  {time.time()-t0:.0f}s  {last}")
    if not ok:
        print(proc.stdout[-4000:])
    return ok


def main() -> int:
    args = sys.argv[1:]
    sizes: list[str] = []
    if args and args[0] == "--sizes":
        sizes = args[1].split(",")
        args = args[2:]
    offsets = [int(a) for a in args] or [
        int(time.time()) * 7 + k for k in range(3)
    ]
    print(f"offsets: {offsets}  sizes: {sizes or '-'}")
    canary()  # refuse to start a campaign whose children drop the seed
    print("seed canary: child receives SPARK_GRAFT_BATTERY_SEED_OFFSET ok")
    ok = True
    for off in offsets:
        ok &= run_one(off, None)
        for n in sizes:
            ok &= run_one(off, n)
    print("campaign:", "ALL GREEN" if ok else "FAILURES (see above)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
