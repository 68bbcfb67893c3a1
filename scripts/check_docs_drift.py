"""Fail CI when NOTES.md's headline test count drifts >10% from the
collected suite (the round-3 verdict's ledger-discipline guard: docs
must describe HEAD, not a previous round)."""

import re
import subprocess
import sys

ROOT = __file__.rsplit("/", 2)[0]


def main() -> int:
    notes = open(f"{ROOT}/NOTES.md", encoding="utf-8").read()
    m = re.search(r"Suite:\s*~?(\d+)\s+tests", notes)
    if not m:
        print("NOTES.md: no 'Suite: N tests' headline found", file=sys.stderr)
        return 1
    claimed = int(m.group(1))
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=ROOT)
    mm = re.search(r"(\d+) tests collected", out.stdout)
    if not mm:
        print("pytest collect failed:", out.stdout[-500:], file=sys.stderr)
        return 1
    collected = int(mm.group(1))
    drift = abs(collected - claimed) / max(collected, 1)
    print(f"NOTES.md claims {claimed} tests, collected {collected} "
          f"(drift {drift:.1%})")
    if drift > 0.10:
        print("NOTES.md test-count drift exceeds 10% — refresh the ledger",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
