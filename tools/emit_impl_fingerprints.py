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
        the rows that round checked, computed AT THE COMMIT THE DRIVER
        JUDGED — the parent of the commit that added
        CORRECTNESS_r{N}.json (extracted via `git archive` into a temp
        dir and hashed by a subprocess importing that tree).  A rewrite
        landing after the driver ran therefore cannot be blessed: the
        stamped hash is the verified source's, and the current tree's
        divergence from it trips the test until the row is re-queued.
        Falls back to hashing the current tree (with a loud warning)
        only when git/lineage extraction fails, guarded by the
        clean-tree refusal below.

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


#: Inline hashing script run inside the extracted verdict-time tree —
#: re-states impl_hash/current_hashes so it works in trees that
#: predate this tool's existence.
_HASH_SCRIPT = """
import ast, hashlib, inspect, json, sys, textwrap, warnings
warnings.filterwarnings("ignore")
sys.path.insert(0, sys.argv[1])
from weather_etl_spark.registry import load_all
out = {}
for name, spec in load_all().items():
    src = textwrap.dedent(inspect.getsource(spec.fn))
    out[name] = hashlib.sha256(
        ast.dump(ast.parse(src)).encode()).hexdigest()[:16]
print(json.dumps(out))
"""


def hashes_at_verdict_commit(rnd: int) -> dict[str, str] | None:
    """Hashes of every registered fn at the snapshot the round-``rnd``
    driver judged: the parent of the commit that added
    CORRECTNESS_r{rnd}.json.  None when lineage can't be extracted
    (no such commit / archive or import failure) — caller falls back
    to the current tree with a warning."""
    import subprocess
    import tempfile

    fname = f"CORRECTNESS_r{rnd:02d}.json"
    try:
        add_commit = subprocess.run(
            ["git", "log", "--format=%H", "--diff-filter=A", "--", fname],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.split()
        if not add_commit:
            return None
        snapshot = f"{add_commit[-1]}^"  # first add; parent = judged tree
        with tempfile.TemporaryDirectory(prefix="fp-verdict-") as tmp:
            tar = subprocess.run(
                ["git", "archive", snapshot],
                cwd=ROOT, capture_output=True, check=True,
            ).stdout
            subprocess.run(
                ["tar", "-x", "-C", tmp], input=tar, check=True,
            )
            out = subprocess.run(
                [sys.executable, "-c", _HASH_SCRIPT, tmp],
                capture_output=True, text=True, check=True, cwd=tmp,
            ).stdout
        return json.loads(out.strip().splitlines()[-1])
    except (subprocess.CalledProcessError, OSError, ValueError,
            IndexError):
        return None


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
        verdict = hashes_at_verdict_commit(rnd)
        src_label = "verdict-commit"
        if verdict is None:
            print("WARNING: could not hash the verdict-time snapshot "
                  "(git lineage extraction failed) — falling back to "
                  "the CURRENT tree; valid only if nothing was "
                  "committed since the driver ran", file=sys.stderr)
            verdict, src_label = now, "current-tree FALLBACK"
        old = json.loads(LEDGER.read_text()) if LEDGER.exists() else {}
        # Never silently bless the CURRENT tree's hash: a checked row
        # absent from the verdict-time tree, or an unchecked row absent
        # from the old ledger, has no verified fingerprint to carry
        # forward.  Unreachable under the registration freeze, but this
        # tool is the mechanical safety rail — refuse instead of
        # defaulting (re-run with --all after an audited decision).
        missing_verdict = sorted(n for n in now
                                 if n in checked and n not in verdict)
        missing_old = sorted(n for n in now
                             if n not in checked and n not in old)
        if missing_verdict or missing_old:
            raise SystemExit(
                "refusing to self-bless unverified implementations:\n"
                f"  checked rows absent from the verdict-time tree: "
                f"{missing_verdict}\n"
                f"  unchecked rows absent from the old ledger: "
                f"{missing_old}\n"
                "these have no verified hash to carry forward — audit "
                "them, then run --all if the current source is "
                "verdict-covered"
            )
        ledger = {
            n: (verdict[n] if n in checked else old[n])
            for n in sorted(now)
        }
        tag = (f"--round {rnd} ({len(checked)} rows refreshed from "
               f"{src_label})")
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
