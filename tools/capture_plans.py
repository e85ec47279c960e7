"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python tools/capture_plans.py <tag-dir> <suffix> [query ...]
e.g.   python tools/capture_plans.py plans/r13 before semdedup_text_prune

Plans are captured at sf0.1 (the bench scale) under the same session
configuration bench.py uses, so Exchange counts / join strategies /
PushedFilters in the dumps are the shapes the bench actually runs.
AQE plans print `isFinalPlan=false` here — the dumps are the static
shapes; runtime coalescing is on top.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from sqlbackuphistoryetl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
