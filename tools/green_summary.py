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


def build() -> tuple[dict, list[str]]:
    """Returns (summary, skipped-artifact names). Skips are LOUD at the
    call sites: main() exits nonzero on any (round-12 review: a
    truncated committed artifact previously warned on stderr but exited
    0, so a scripted regeneration committed a summary silently missing
    that round's greens — and the import path only reads artifacts
    NEWER than folded_through, making the loss permanent)."""
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
    return (
        {
            "folded_through": folded_through,
            "last_green": dict(sorted(last.items())),
        },
        skipped,
    )


def main() -> int:
    out = REPO / "GREEN_SUMMARY.json"
    summary, skipped = build()
    if skipped:
        # refuse to WRITE, not just to exit nonzero (round-12 follow-up
        # review: a flow ignoring the exit code would still commit the
        # lossy summary, and the loss is permanent because import only
        # reads artifacts newer than folded_through)
        print(
            f"ERROR: {len(skipped)} committed artifact(s) unreadable "
            f"({skipped}) — refusing to write {out.name}; repair the "
            "artifacts first",
            file=sys.stderr,
        )
        return 1
    out.write_text(json.dumps(summary, indent=1) + "\n")
    print(
        f"wrote {out.name}: {len(summary['last_green'])} queries folded "
        f"through round {summary['folded_through']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
