"""Pin the driver-rotation bookkeeping in __spark_entry__.py (no session).

Round 8's verdict caught an arithmetic slip in the hand-maintained
rotation notes (a 51-name head against a 50-row driver budget silently
dropped `l_diversity_audit`); these pins make the mechanical invariants
of the rotation — name validity, coverage, duplicate-freedom, and queue
parseability — fail loudly instead of drifting in prose.
"""

from __future__ import annotations

import importlib.util
import os

import __spark_entry__ as entry
from wheels_in_motion_analytics_spark.registry import load_all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPECS = load_all_queries()


def test_verified_names_all_exist():
    # a registry rename would silently shrink coverage accounting
    unknown = entry._VERIFIED - set(SPECS)
    assert not unknown, f"_VERIFIED names not in the registry: {sorted(unknown)}"


def test_per_round_verified_sets_overlap_only_deliberately():
    # a name in two _RN_VERIFIED sets means it was driver-verified twice;
    # that is legitimate ONLY for deliberate re-verifications (the query's
    # code changed after its first row, so it was re-queued — documented
    # at the _R4_VERIFIED/_R5_VERIFIED comments). Pin the known set so a
    # new overlap (an accidental rotation double-count) fails loudly.
    known_reverified = {
        "embedding_near_dup_pairs",      # r2 -> r4 (blocked-matmul rewrite)
        "similarity_topk_bruteforce",    # r2 -> r4 (same rewrite family)
        "grouped_map_demean",            # r2 -> r4
        "approx_count_distinct",         # r3 -> r4 (audited-verdict oracle)
        "versioned_change_feed",         # r4 -> r5 (versioned-table rework)
        "versioned_update_copy_on_write",  # r4 -> r5
    }
    # the r10 surplus budget is a deliberate freshness wave over 43
    # already-green env-risk rows (r9 verdict item 2) — when round 11
    # pastes _R10_VERIFIED those names legitimately appear twice
    known_reverified |= entry._R10_FRESHNESS_WAVE
    rounds = [
        (n, getattr(entry, n))
        for n in dir(entry)
        if n.startswith("_R") and n.endswith("_VERIFIED")
    ]
    seen: dict[str, str] = {}
    dups = []
    for rname, names in rounds:
        for q in names:
            if q in seen and q not in known_reverified:
                dups.append((q, seen[q], rname))
            seen[q] = rname
    assert not dups, f"undocumented names in multiple _RN_VERIFIED sets: {dups}"


def test_priority_head_covers_every_never_verified_query():
    # the driver's budget lands on _DRIVER_PRIORITY first; every
    # never-verified registry entry must be queued (else it can never get
    # a correctness row), with no duplicates and no unknown names
    prio = entry._DRIVER_PRIORITY
    assert len(prio) == len(set(prio)), "duplicate names in _DRIVER_PRIORITY"
    unknown = set(prio) - set(SPECS)
    assert not unknown, f"_DRIVER_PRIORITY names not in the registry: {sorted(unknown)}"
    never = {n for n in SPECS if n not in entry._VERIFIED}
    unqueued = never - set(prio)
    assert not unqueued, (
        f"never-driver-verified queries missing from _DRIVER_PRIORITY: "
        f"{sorted(unqueued)}"
    )


def test_queries_yield_priority_order_first():
    # the driver consumes queries() in yield order; the head must lead
    names = list(entry.queries())
    prio = [n for n in entry._DRIVER_PRIORITY if n in SPECS]
    assert names[: len(prio)] == prio


def test_notes_queue_block_parses_to_known_names():
    # the gen_rotation.py handoff: the newest NOTES.md queue block must
    # parse non-empty, dedup-free, and to real registry names
    tool = os.path.join(REPO, "tools", "gen_rotation.py")
    spec = importlib.util.spec_from_file_location("gen_rotation_tool", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queue = mod.queue_from_notes()
    assert queue, "no driver-priority queue block parsed from NOTES.md"
    assert len(queue) == len(set(queue))
    unknown = set(queue) - set(SPECS)
    assert not unknown, f"queue names not in the registry: {sorted(unknown)}"
