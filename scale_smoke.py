"""Scale smoke (SURVEY §5.5): synthetic backup history at millions of
rows, generated distributively (spark.range — no driver data), pushed
through the idempotent merge and the set-based fleet planner.

Run: python scale_smoke.py [n_rows]          (default 2,000,000)
Prints one JSON line with wall times; records go to BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.operators.merge import idempotent_append
from sqlbackuphistoryetl_spark.plans.chain_all import restore_plan_all
from sqlbackuphistoryetl_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_DBS = 2_000
LSN_BASE = "10000000000000000000000"  # 23 digits


def synthetic_history(spark, n: int):
    """n rows of roughly-valid chains across N_DBS databases × 8 servers:
    per db, sequence of backups every ~hour; every 24th a Full, every
    6th a Diff, rest contiguous Logs. All expressions JVM-side."""
    df = spark.range(0, n)
    db_id = (F.col("id") % N_DBS).cast("long")
    seq = (F.col("id") / N_DBS).cast("long")
    kind = (
        F.when(seq % 24 == 0, "Full").when(seq % 6 == 0, "Diff").otherwise("Log")
    )
    start = F.timestamp_seconds(F.lit(1704067200) + seq * 3600 + db_id % 1800)
    lsn_lo = F.lit(LSN_BASE).cast("decimal(25,0)") + (seq * 1000 + db_id)
    lsn_hi = lsn_lo + 999
    return df.select(
        F.col("id").alias("LogID"),
        F.concat(F.lit("db_"), F.lpad(db_id.cast("string"), 4, "0")).alias("database_name"),
        kind.alias("BackupType"),
        F.concat(F.lit("X:\\bk\\f_"), F.col("id").cast("string"), F.lit(".bak")).alias(
            "physical_device_name"
        ),
        start.alias("backup_start_date"),
        (start + F.expr("INTERVAL 5 MINUTES")).alias("backup_finish_date"),
        F.concat(F.lit("SQLNODE0"), (db_id % 8).cast("string")).alias("server_name"),
        F.when(db_id % 4 == 0, F.concat(F.lit("AG0"), (db_id % 2).cast("string"))).alias("ag_name"),
        F.lit("FULL").alias("recovery_model"),
        lsn_lo.alias("first_lsn"),
        lsn_hi.alias("last_lsn"),
        F.lit(1000).alias("UncompressedSizeMB"),
        F.lit(300).alias("CompressedSizeMB"),
        F.lit(False).alias("is_copy_only"),
        F.lit(None).cast("string").alias("encryptor_type"),
        F.lit(None).cast("string").alias("key_algorithm"),
        F.lit(2).alias("device_type"),
        F.lit(1).alias("position"),
        F.lit(None).cast("string").alias("DBFileInformation"),
    )


def main() -> None:
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_")
    target = f"{tmp}/consolidated"
    timings = {}

    hist = synthetic_history(spark, N)

    t0 = time.perf_counter()
    appended = idempotent_append(spark, hist, target)
    timings["initial_merge"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    replayed = idempotent_append(
        spark, synthetic_history(spark, N // 10), target,
    )
    timings["replay_merge_10pct"] = round(time.perf_counter() - t0, 2)

    sink = spark.read.parquet(target)
    import datetime as dt

    t0 = time.perf_counter()
    plan = restore_plan_all(sink, dt.datetime(2024, 1, 25, 12, 0))
    n_steps = plan.count()
    timings["fleet_plan_all"] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "rows": N,
                "appended": appended,
                "replay_appended": replayed,
                "plan_steps": n_steps,
                "timings_sec": timings,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
