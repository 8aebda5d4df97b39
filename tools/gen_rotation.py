"""Generate the next _DRIVER_PRIORITY rotation mechanically.

Reads the latest CORRECTNESS_r{N}.json, splits its rows into green
(hash/rows-schema matched) and red, and prints:

1. a ready-to-paste ``_R{N}_VERIFIED`` set literal for the greens,
2. the red rows (they must LEAD the next head — re-verify first),
3. the next head-50 drawn from the queue file (default: the ``r8/r9
   driver-priority queue`` block in NOTES.md), minus anything already
   verified, topped up from the remaining never-verified registry order.

Usage: python tools/gen_rotation.py [CORRECTNESS_rNN.json]

Prints suggestions only — the human (or next session) pastes into
__spark_entry__.py, then MUST sweep the new head green on the vanilla
session (tools/driver_check.py with SPARK_GRAFT_ONLY) BEFORE committing,
per the round discipline in CLAUDE.md / NOTES.md.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_correctness() -> str:
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        raise SystemExit("no CORRECTNESS_r*.json found")
    return files[-1]


def queue_from_notes() -> list[str]:
    """Parse the ordered queue block NOTES.md carries for the next rounds.

    Uses the LAST heading matching "rN[/rM] driver-priority queue" so each
    round's close-out can append a fresh queue block without editing the
    tool (the r8->r9 handoff hardcoded "r8/r9" and needed this edit).
    """
    text = open(os.path.join(REPO, "NOTES.md")).read()
    # anchored to line start (ADVICE round 9): only true markdown headings
    # open a block, so an inline prose mention of the phrase cannot be
    # parsed as one
    blocks = re.findall(
        r"^## r\d+(?:/r\d+)? driver-priority queue.*?\n(.*?)(?=\n## |\Z)",
        text,
        re.S | re.M,
    )
    if not blocks:
        return []
    # List items are 2-space-indented names standing ALONE on their line
    # (optionally followed by a parenthesized note) — anchoring to the
    # whole token keeps indented prose words out, and dict.fromkeys drops
    # accidental duplicates while preserving queue order.
    names = re.findall(r"^  ([a-z0-9_]+)(?:\s+\(.*)?$", blocks[-1], re.M)
    return list(dict.fromkeys(names))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else latest_correctness()
    rn = re.search(r"_r(\d+)", os.path.basename(path)).group(1).lstrip("0")
    rows = json.load(open(path))
    green, red = [], []
    for name, r in rows.items():
        ok = bool(r.get("rows_match")) and bool(r.get("schema_match"))
        # hash key name has varied; treat a present-and-false hash as red
        for k, v in r.items():
            if k.startswith("hash") and v is False:
                ok = False
        (green if ok else red).append(name)
    green.sort()

    print(f"# --- paste into __spark_entry__.py ---")
    print(f"_R{rn}_VERIFIED = {{")
    for i in range(0, len(green), 3):
        print("    " + ", ".join(f"'{n}'" for n in green[i : i + 3]) + ",")
    print("}")
    print(f"# add `| _R{rn}_VERIFIED` to _VERIFIED\n")

    if red:
        print(f"# RED rows — these LEAD the next head (re-verify after fixing):")
        for n in red:
            print(f"#   {n}")

    import __spark_entry__ as e
    from wheels_in_motion_analytics_spark.registry import load_all_queries

    specs = load_all_queries()
    verified = e._VERIFIED | set(green)
    queue = [n for n in queue_from_notes() if n in specs and n not in verified]
    backfill = [n for n in specs if n not in verified and n not in queue]
    head = (red + [n for n in queue if n not in red] + backfill)[:50]
    print(f"\n# suggested next head-50 ({len(red)} red + queue order):")
    print("_DRIVER_PRIORITY = [")
    for n in head:
        print(f'    "{n}",')
    print("]")
    never = [n for n in specs if n not in verified]
    print(f"\n# never-verified remaining after this head: {len(never) - len([h for h in head if h in never])}")


if __name__ == "__main__":
    main()
