"""The bench record must survive the driver's tail-only output buffer.

r9 lesson: BENCH_r09.json landed with ``parsed: null`` because the one
headline-first JSON line, grown past ~4 KB by 57 extended timings, was
truncated from the head by the driver's tail window. The contract now:
the LAST line bench prints is a complete, compact headline record, and
the bulky extended map rides an earlier line that may be lost without
losing the official number.
"""

from __future__ import annotations

import json

import bench

# Conservative stand-in for the driver's tail window: the r9 line that
# DID survive intact (ext fragment + metadata) was well above this, so
# any record under it is safe.
TAIL_BUDGET_BYTES = 4096


def _fake(n: int, prefix: str) -> dict[str, float]:
    return {f"{prefix}_{i:03d}": round(0.123 + i * 0.01, 3) for i in range(n)}


def test_last_line_is_complete_compact_headline_record():
    timings = _fake(len(bench.HEADLINE), "headline")
    # far beyond today's 57 ext queries — the headline line must not
    # grow with the extended basket at all
    timings_ext = _fake(500, "extension_query_with_a_long_name")
    lines = bench.emit_records(timings, timings_ext, 0.1)
    last = json.loads(lines[-1])
    assert last["metric"] == "headline_queries_total_wall"
    assert last["unit"] == "sec"
    assert last["value"] == round(sum(timings.values()), 3)
    assert last["queries"] == timings
    assert last["sf"] == 0.1
    assert "queries_ext" not in last, "bulky ext map belongs on its own line"
    assert len(lines[-1].encode()) < TAIL_BUDGET_BYTES


def test_ext_detail_chunks_precede_and_union_to_full_map():
    """r10 lesson: the ONE detail line was itself head-truncated
    (41/62 entries survived). Chunks of ≤EXT_CHUNK queries keep every
    line individually small so truncation drops whole parseable lines."""
    timings = _fake(len(bench.HEADLINE), "headline")
    timings_ext = _fake(63, "ext")
    lines = bench.emit_records(timings, timings_ext, 0.1)
    details = [json.loads(l) for l in lines[:-1]]
    assert len(details) == 4  # ceil(63 / 20)
    merged: dict[str, float] = {}
    for i, d in enumerate(details):
        assert d["metric"] == "ext_queries_detail"
        assert d["chunk"] == i + 1 and d["n_chunks"] == len(details)
        assert len(d["queries_ext"]) <= bench.EXT_CHUNK
        assert d["ext_total"] == round(sum(timings_ext.values()), 3)
        assert len(lines[i].encode()) < TAIL_BUDGET_BYTES
        merged.update(d["queries_ext"])
    assert merged == timings_ext
    # headline agrees on the ext total so either alone is consistent
    assert json.loads(lines[-1])["ext_total"] == details[0]["ext_total"]
