"""Rewrite ``__spark_entry__._FUNCS`` / ``ROTATION_DEFERRED`` in the
order ``tools/rotation.py`` computes from CORRECTNESS history.

Workflow when adding a gate: append the new ``"name": callable`` entry
anywhere in the ``_FUNCS`` literal (and its ``_ORACLES`` SQL), then run

    python tools/regen_registry.py

The new gate is never-green, so the rotation policy front-loads it into
the driver window automatically; displaced greens flow into
``ROTATION_DEFERRED``. ``tests/test_driver_contract.py::
test_window_matches_computed_rotation`` fails until this has been run.

``--check`` verifies without writing: exit 1 iff the shipped registry
differs from the computed order (CI / pre-commit hook form).
"""

from __future__ import annotations

import re
import sys

from rotation import REPO, compute_rotation, load_green_history

ENTRY = f"{REPO}/__spark_entry__.py"

FUNCS_PAT = re.compile(
    r"# Registry order is LOAD-BEARING.*?"
    r"_FUNCS: dict\[str, Callable\[\[SparkSession, str\], DataFrame\]\]"
    r" = \{.*?\n\}\n",
    re.S,
)
DEFERRED_PAT = re.compile(
    r"ROTATION_DEFERRED: frozenset\[str\] = frozenset\(\n    \{.*?\n    \}\n\)\n",
    re.S,
)


def regenerate(write: bool = True) -> bool:
    """Returns True iff the shipped registry differs from the computed
    order (and rewrites it unless ``write=False``)."""
    src = open(ENTRY).read()
    m = FUNCS_PAT.search(src)
    if not m or len(FUNCS_PAT.findall(src)) != 1:
        raise RuntimeError("could not locate the _FUNCS literal")
    entries = dict(re.findall(r'"(\w+)":\s*(\w+),', m.group(0)))
    last_green, latest = load_green_history(REPO)
    window_set, deferred = compute_rotation(list(entries), last_green, latest=latest)
    ranked = sorted(
        entries, key=lambda n: (n in last_green, last_green.get(n, 0), n)
    )
    win = [n for n in ranked if n in window_set]
    parked_def = sorted(deferred)
    parked_rest = [n for n in ranked if n not in window_set and n not in deferred]

    lines = [
        "# Registry order is LOAD-BEARING: the driver checks the FIRST 50",
        "# entries only. From round 7 on the order is COMPUTED, not",
        "# hand-maintained: tools/rotation.py ranks gates never-green-first,",
        "# then stalest-green-first (name tiebreak), from the committed",
        "# CORRECTNESS_r*.json history; tests/test_driver_contract.py asserts",
        "# the shipped window and ROTATION_DEFERRED equal the computed ones.",
        "# Regenerate with `python tools/regen_registry.py` after appending",
        "# a new gate or when a new CORRECTNESS_r*.json lands.",
        "_FUNCS: dict[str, Callable[[SparkSession, str], DataFrame]] = {",
        f"    # --- driver window (never-green gates first, then stalest",
        f"    # greens by (round, name); latest recorded round: r{latest}) ---",
    ]
    lines += [f'    "{n}": {entries[n]},' for n in win]
    lines += [
        "    # ---------------------------------------------------------------",
        "    # Parked behind the 50-slot window: first the ROTATION_DEFERRED",
        "    # overflow (rotates into the next window), then the fresh greens.",
    ]
    lines += [f'    "{n}": {entries[n]},' for n in parked_def]
    lines += ["    # --- fresh greens (eligible to park two rounds) ---------------"]
    lines += [f'    "{n}": {entries[n]},' for n in parked_rest]
    lines += ["}"]
    new_funcs = "\n".join(lines) + "\n"

    dlines = [
        "ROTATION_DEFERRED: frozenset[str] = frozenset(",
        "    {",
        "        # Computed by tools/rotation.py (see tools/regen_registry.py):",
        "        # parked gates whose last green row predates the latest",
        "        # recorded round — they rotate into the NEXT window.",
    ]
    dlines += [f'        "{n}",' for n in parked_def]
    dlines += ["    }", ")"]
    new_deferred = "\n".join(dlines) + "\n"

    if len(DEFERRED_PAT.findall(src)) != 1:
        raise RuntimeError("could not locate the ROTATION_DEFERRED literal")
    out = FUNCS_PAT.sub(lambda _: new_funcs, src)
    out = DEFERRED_PAT.sub(lambda _: new_deferred, out)
    changed = out != src
    if changed and write:
        open(ENTRY, "w").write(out)
    print(
        f"registry: {len(entries)} gates; window {len(win)}; "
        f"deferred {len(parked_def)}; "
        + (
            ("REWRITTEN" if write else "STALE (--check)")
            if changed
            else "already in computed order"
        )
    )
    return changed


if __name__ == "__main__":
    check = "--check" in sys.argv[1:]
    changed = regenerate(write=not check)
    # --check: nonzero exit iff stale (hook/CI form); rewrite mode
    # always exits 0 — it just fixed whatever was stale
    sys.exit(1 if (check and changed) else 0)
