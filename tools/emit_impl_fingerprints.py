"""Emit IMPL_FINGERPRINTS.json — the per-query implementation ledger.

One entry per registered query: a sha256 over the AST dump of the
registered callable's source (comments/formatting-insensitive).  The
r9 verdict's order #3 asked for the "implementation changed => driver
lineage stale" rule to be mechanical instead of relying on the builder
remembering: tests/test_survey_sync.py recomputes every hash and fails
when a query's current implementation differs from the fingerprint
recorded at its last driver verdict UNLESS that query is queued in
DRIVER_WINDOW_PRIORITY for a fresh verdict.

Refresh policy (mirrors FRESHNESS.json):

    PYTHONPATH=. python tools/emit_impl_fingerprints.py --round N
        after CORRECTNESS_r{N}.json lands: re-records the hash ONLY for
        the rows that round checked (their verdict now covers the
        current source).  MUST be run as the FIRST action of the new
        round, before any engine edit: the stamped hash is the CURRENT
        source's, which equals the verified source's only while the
        tree still matches the snapshot the driver judged.  The tool
        enforces the cheap half of that contract by refusing to run
        --round on a dirty working tree; a committed rewrite landing
        between the driver run and the refresh would still be blessed
        silently — that residual gap is why the ordering rule exists.

    PYTHONPATH=. python tools/emit_impl_fingerprints.py --all
        full (re)population — initial bootstrap, or after an audited
        decision that current source is verdict-covered.

Known limitation (documented, not hidden): the hash covers the
registered callable's own body.  A rewrite inside a shared helper the
callable delegates to does not move the hash; those still need the
builder/judge to queue the affected rows by hand.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from weather_etl_spark.registry import load_all  # noqa: E402

LEDGER = ROOT / "IMPL_FINGERPRINTS.json"


def impl_hash(fn) -> str:
    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    return hashlib.sha256(ast.dump(tree).encode()).hexdigest()[:16]


def current_hashes() -> dict[str, str]:
    return {name: impl_hash(spec.fn) for name, spec in load_all().items()}


def _tree_is_dirty() -> bool:
    import subprocess

    out = subprocess.run(
        ["git", "status", "--porcelain"], cwd=ROOT,
        capture_output=True, text=True, check=True,
    ).stdout
    return bool(out.strip())


def main() -> None:
    args = sys.argv[1:]
    # Strict mode parsing: exactly --all, or exactly --round N.  A
    # typo must be a usage error regardless of whether the ledger
    # already exists on this machine.
    if len(args) == 2 and args[0] == "--round" and args[1].isdigit():
        if _tree_is_dirty():
            raise SystemExit(
                "--round refuses on a dirty working tree: the stamped "
                "hashes must be the source the driver verified — "
                "commit/stash first, and run this as the round's FIRST "
                "action (see module docstring)"
            )
        now = current_hashes()
        rnd = int(args[1])
        cpath = ROOT / f"CORRECTNESS_r{rnd:02d}.json"
        checked = set(json.loads(cpath.read_text()))
        old = json.loads(LEDGER.read_text()) if LEDGER.exists() else {}
        ledger = {
            n: (now[n] if n in checked else old.get(n, now[n]))
            for n in sorted(now)
        }
        tag = f"--round {rnd} ({len(checked)} rows refreshed)"
    elif args == ["--all"]:
        now = current_hashes()
        ledger = dict(sorted(now.items()))
        tag = "--all (full repopulation)"
    else:
        print(__doc__)
        raise SystemExit("pass --round N or --all")
    LEDGER.write_text(json.dumps(ledger, indent=0, sort_keys=True) + "\n")
    drifted = sorted(n for n in now if ledger[n] != now[n])
    print(f"wrote {LEDGER} ({len(ledger)} rows) {tag}")
    print(f"  rows whose current impl differs from verdict-time hash: "
          f"{len(drifted)}")
    for n in drifted:
        print(f"    {n}")


if __name__ == "__main__":
    main()
