"""Deterministic driver-window rotation (r6 verdict task 7).

The driver's per-round CORRECTNESS gate checks only the FIRST
``WINDOW`` (50) entries of ``__spark_entry__.queries()``.  With more
than ``2 * WINDOW`` registered gates, hand-maintaining which gates sit
in the window each round became the repo's recurring process defect
(rounds 3, 5 and 6 each carried rotation debt).  This module replaces
the hand assembly with a pure function of the recorded
``CORRECTNESS_r*.json`` history:

``compute_rotation(names, last_green, window)`` returns

- ``window_set`` — the gates that must occupy the first ``WINDOW``
  registry slots next round: every never-green gate (new this round),
  then the stalest greens first (oldest last-green round), ties broken
  by name so the choice is reproducible from the committed JSON files
  alone;
- ``deferred`` — the parked gates whose last green row is OLDER than
  the latest recorded round.  When the next round's CORRECTNESS file
  lands these become two rounds stale, which the staleness guard in
  ``tests/test_driver_contract.py`` only permits for members of
  ``ROTATION_DEFERRED`` — so this IS the required membership of that
  set, and its size equals the structural deficit
  ``len(names) - 2 * window`` exactly when every gate is green on the
  usual two-round cadence.

``tests/test_driver_contract.py`` asserts the shipped registry matches
this function's output, so window assembly can no longer drift from
the history.  ``python tools/rotation.py`` prints the plan for the
next round (new gates must be appended to the registry first).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterable, Mapping

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_green_history(repo: str = REPO) -> tuple[dict[str, int], int]:
    """(last driver-green round per gate, latest recorded round) from
    the committed ``CORRECTNESS_r*.json`` files.  A gate counts green
    on ``hash_match``; a gate the driver ran WITHOUT an oracle
    (``err == "no_oracle"`` with a recorded row count — only the
    rows-only-by-design allowlist can produce this, the contract tests
    forbid oracle-less gates otherwise) counts as driver-verified too,
    so it rotates on the normal cadence instead of consuming a window
    slot forever as never-green.  A gate whose oracle RAN but
    hash-mismatched stays non-green — rows-only near-misses don't
    reset staleness."""
    last_green: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
            data = json.load(open(path))
        except Exception:
            continue
        latest = max(latest, rnd)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ran_rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if row.get("hash_match") or ran_rows_only:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, latest


def compute_rotation(
    names: Iterable[str],
    last_green: Mapping[str, int],
    window: int = WINDOW,
    latest: int | None = None,
) -> tuple[set[str], set[str]]:
    """Pure rotation policy: (window membership, deferred membership).

    Ranking: never-green gates first (the driver must see them before
    they strand — ``test_never_green_queries_sit_in_driver_window``),
    then ascending last-green round (stalest first), name as the final
    tiebreak.  Deferred = parked gates not green in the latest recorded
    round; they will be exactly two rounds stale when the next round's
    file lands, the one staleness the contract test reserves for
    ``ROTATION_DEFERRED``.
    """
    names = list(names)
    if len(names) != len(set(names)):
        raise ValueError("duplicate gate names in registry")
    ranked = sorted(
        names,
        key=lambda n: (n in last_green, last_green.get(n, 0), n),
    )
    window_set = set(ranked[:window])
    if latest is None:
        # fallback only: a round whose CORRECTNESS file records ZERO
        # hash-matches (driver regression) would leave this inference
        # stale — callers should thread load_green_history()'s latest
        latest = max(last_green.values(), default=0)
    deferred = {
        n
        for n in names
        if n not in window_set and last_green.get(n, latest) < latest
    }
    return window_set, deferred


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    last_green, latest = load_green_history()
    window_set, deferred = compute_rotation(names, last_green, latest=latest)
    in_window = [n for n in names if n in window_set]
    print(f"latest recorded round: r{latest}; registry: {len(names)} gates")
    print(f"\n-- window ({len(window_set)}) --")
    for n in sorted(window_set, key=lambda n: (last_green.get(n, -1), n)):
        print(f"  {n}  (last green: "
              f"{'never' if n not in last_green else 'r%d' % last_green[n]})")
    print(f"\n-- ROTATION_DEFERRED ({len(deferred)}) --")
    for n in sorted(deferred):
        print(f"  {n}  (last green: r{last_green[n]})")
    shipped = set(names[:WINDOW])
    if shipped == window_set:
        print("\nshipped registry order MATCHES the computed window")
    else:
        print("\nMISMATCH with shipped registry order:")
        print("  rotate IN :", sorted(window_set - shipped))
        print("  rotate OUT:", sorted(shipped - window_set))


if __name__ == "__main__":
    main()
