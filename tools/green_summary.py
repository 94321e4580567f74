"""Regenerate GREEN_SUMMARY.json — the committed fold of every driver
CORRECTNESS_r*.json into query -> latest-hash-green-round.

The query registry's rotation ordering needs this map at import time;
before round 11 it re-parsed every committed artifact on every import
(10 files then, 30 by round 30) and a corrupt artifact silently became
"no evidence", which could re-rotate the whole set. Now the import
reads this summary plus only artifacts newer than ``folded_through``
(normally zero or one file). Run after each round's driver artifact
lands and commit the result:

    python tools/green_summary.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from insect_observation_data_pipeline_spark.queries import _fold_green  # noqa: E402


def build() -> dict:
    last: dict[str, int] = {}
    folded_through = 0
    skipped: list[str] = []
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(f.stem.rsplit("r", 1)[-1])
            rows = json.loads(f.read_text())
        except (ValueError, OSError):
            # ValueError covers the round-number parse, JSONDecodeError
            # and UnicodeDecodeError alike
            skipped.append(f.name)  # loud, unlike the old silent import
            continue
        if not _fold_green(last, rnd, rows):
            # valid JSON, wrong shape (e.g. a top-level array): same
            # loud skip, never an AttributeError (round-11 review)
            skipped.append(f.name)
            continue
        folded_through = max(folded_through, rnd)
    if skipped:
        print(f"WARNING: unparseable artifacts skipped: {skipped}",
              file=sys.stderr)
    return {
        "folded_through": folded_through,
        "last_green": dict(sorted(last.items())),
    }


def main() -> int:
    out = REPO / "GREEN_SUMMARY.json"
    summary = build()
    out.write_text(json.dumps(summary, indent=1) + "\n")
    print(
        f"wrote {out.name}: {len(summary['last_green'])} queries folded "
        f"through round {summary['folded_through']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
