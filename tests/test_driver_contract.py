"""Guards on the driver-gate registry in ``__spark_entry__``.

The driver's per-round CORRECTNESS check covers only the FIRST 50
entries of ``queries()``. These tests pin the invariants that keep that
window honest:

- every registered query has an oracle (no silent rows-only holes);
- any query that has never received a green CORRECTNESS row in a past
  round must sit inside the 50-query window, so appending new gates at
  the end can't leave them permanently unchecked (r3 verdict task 8).
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _greens_from_past_rounds() -> set[str]:
    greens: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                greens.add(name)
    return greens


def test_every_query_has_an_oracle():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = sorted(set(queries) - set(oracles))
    assert missing == [], f"rows-only gates (no oracle SQL): {missing}"


def test_oracles_have_no_orphans():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    orphans = sorted(set(oracles) - set(queries))
    assert orphans == [], f"oracle SQL without a query: {orphans}"


def test_never_green_queries_sit_in_driver_window():
    """A query with no green CORRECTNESS row in any recorded round must
    occupy one of the first 50 registry slots, where the driver will
    actually check it next round."""
    names = list(entry_mod.queries())
    greens = _greens_from_past_rounds()
    stranded = [
        n for i, n in enumerate(names) if i >= DRIVER_WINDOW and n not in greens
    ]
    assert stranded == [], (
        f"{len(stranded)} never-green queries are outside the driver's "
        f"{DRIVER_WINDOW}-query window: {stranded}"
    )


def test_window_is_full():
    """Fewer than 50 registered queries would waste driver coverage."""
    assert len(entry_mod.queries()) >= DRIVER_WINDOW
