#!/usr/bin/env python3
"""Keep CITATION.cff's version/date in sync with pyproject.toml.

Mirrors the reference's release hygiene (ref scripts/sync_citation.py +
the CI check-citation job): the citation file must always carry the
package version, so a release bump cannot silently leave a stale DOI
record. Own implementation — line-oriented rewrite, no YAML dependency.

Usage:
    python scripts/sync_citation.py          # rewrite CITATION.cff
    python scripts/sync_citation.py --check  # exit 1 if out of sync (CI)
"""

from __future__ import annotations

import re
import sys
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PYPROJECT = ROOT / "pyproject.toml"
CITATION = ROOT / "CITATION.cff"


def pyproject_version() -> str:
    try:
        import tomllib
    except ModuleNotFoundError:  # Python < 3.11
        m = re.search(r'^version\s*=\s*"([^"]+)"', PYPROJECT.read_text(),
                      re.MULTILINE)
        if not m:
            sys.exit("ERROR: no version in pyproject.toml")
        return m.group(1)
    with open(PYPROJECT, "rb") as f:
        return tomllib.load(f)["project"]["version"]


def main() -> int:
    check = "--check" in sys.argv
    want = pyproject_version()
    lines = CITATION.read_text().splitlines(keepends=True)
    changed = False
    seen_version = False
    for i, line in enumerate(lines):
        # Only the top-level software version (before any nested block).
        if line.startswith("version:") and not seen_version:
            seen_version = True
            have = line.split(":", 1)[1].strip().strip('"')
            if have != want:
                if check:
                    print(f"CITATION.cff version {have} != "
                          f"pyproject {want}", file=sys.stderr)
                    return 1
                lines[i] = f"version: {want}\n"
                changed = True
        elif line.startswith("date-released:") and changed:
            today = datetime.now(timezone.utc).strftime("%Y-%m-%d")
            lines[i] = f'date-released: "{today}"\n'
    if not seen_version:
        print("CITATION.cff has no top-level version field", file=sys.stderr)
        return 1
    if changed:
        CITATION.write_text("".join(lines))
        print(f"CITATION.cff updated to {want}")
    elif not check:
        print("CITATION.cff already in sync")
    return 0


if __name__ == "__main__":
    sys.exit(main())
