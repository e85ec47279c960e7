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


def test_no_oracle_emits_hugeint():
    """DuckDB types an uncast ``sum(INTEGER/BIGINT)`` as HUGEINT
    (int128); the driver's fetch path renders HUGEINT differently from
    BIGINT, so the value hash diverges even when every value is
    numerically identical (root cause of all 8 r4 hash-reds). Doctrine:
    oracle aggregates are always cast to a concrete width. This guard
    binds every oracle against the sf0.001 tables (``describe`` plans
    without executing) and asserts no output column types as HUGEINT."""
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip(f"no testdata at {sf_dir}")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    offenders = []
    for name, sql in entry_mod.oracle_sql().items():
        if not sql:
            continue
        try:
            rows = con.execute(
                f"describe select * from ({sql.rstrip().rstrip(';')}) q"
            ).fetchall()
        except Exception as exc:  # unbindable oracle is its own failure
            offenders.append((name, f"describe failed: {exc}"))
            continue
        for col, coltype, *_ in rows:
            if "HUGEINT" in str(coltype).upper():
                offenders.append((name, f"{col}: {coltype}"))
    assert offenders == [], f"oracles emitting HUGEINT/int128: {offenders}"
