"""Construction-cost audit: py4j round-trips + wall time to BUILD each
benched query's DataFrame (no execution).

Usage:
    python tools/construct_audit.py [query ...]      # default: whole basket

For each query: one warm construction (fills process-level memos, the
steady state a long-lived driver sits in), then a second timed
construction with py4j round-trips counted by patching the gateway
send_command. Round-trip counts are deterministic — host-speed-proof —
which is why r13/r14 lean on them for construction A/Bs.

Prints one JSON line per query and a total line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from sqlbackuphistoryetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_counter = {"n": 0}


def _patch_gateway() -> None:
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    def wrap(cls):
        orig = cls.send_command

        def counted(self, *a, **kw):
            _counter["n"] += 1
            return orig(self, *a, **kw)

        cls.send_command = counted

    wrap(jg.GatewayClient)
    wrap(jg.GatewayConnection)
    wrap(cs.ClientServerConnection)
    wrap(cs.JavaClient)


def main() -> None:
    import bench

    names = sys.argv[1:] or (bench.HEADLINE + bench.EXTENDED)
    spark = get_spark(app_name="sbh-construct-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    _patch_gateway()

    rows = []
    for name in names:
        qs[name](spark, SF_DIR)  # warm: memos filled, lazy imports done
        _counter["n"] = 0
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR)
        dt = time.perf_counter() - t0
        rows.append({"query": name, "construct_sec": round(dt, 3),
                     "py4j_roundtrips": _counter["n"]})
        print(json.dumps(rows[-1]), flush=True)
        spark.catalog.clearCache()
    total = {
        "total_construct_sec": round(sum(r["construct_sec"] for r in rows), 3),
        "total_py4j_roundtrips": sum(r["py4j_roundtrips"] for r in rows),
        "n_queries": len(rows),
    }
    print(json.dumps(total), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
