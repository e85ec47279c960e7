"""Scale-adaptive partition-width policy shared by the range-sort
materializers (sharding.global_ordinals, packing.global_cumsum).

Ordinals/prefix sums are rank-in-total-order quantities — identical
for ANY partition count — so the width is pure execution shape. A
fixed defaultParallelism pays p-task sampling + count jobs even for a
model-sized key set (guide §2: derive partitioning from input size,
don't tune a constant for one host). Narrowing happens ONLY on a
confidently small estimate (est < target × cap): plans with unknown
stats report huge sizes and keep the full width, so a bad estimate can
only cost parallelism on provably small inputs, never serialize a
100 TB sort.
"""

from __future__ import annotations

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame

#: target bytes per range partition when deriving the sort width from
#: the input's size estimate (conf-overridable)
TARGET_BYTES_CONF = "spark.sqlbackuphistoryetl.ordinals.targetPartitionBytes"
TARGET_BYTES_DEFAULT = 32 * 1024 * 1024


def adaptive_partitions(df: DataFrame, num_partitions: int | None) -> int:
    """Range-sort width: caller's explicit count, else derived from the
    input's size estimate, capped at defaultParallelism.

    The estimate reads the ANALYZED plan's stats (r14): analysis is
    already done for any constructed classic DataFrame, so this skips
    the full optimizer pass the old ``optimizedPlan().stats()`` probe
    paid per call (~87 → ~50 ms on a mid-size plan, and the optimize
    pass grew with plan depth — the exact serial-driver cost class the
    r13/r14 construction work removes). Analyzed-plan estimates can
    only be LARGER (no filter pruning), so the narrowing contract above
    is preserved in the safe direction. Classic-py4j only by nature
    (``_jdf``): Spark Connect callers take the cap via the narrow
    except below.
    """
    spark = df.sparkSession
    cap = spark.sparkContext.defaultParallelism
    if num_partitions:
        return num_partitions
    try:
        est = int(df._jdf.queryExecution().analyzed().stats().sizeInBytes())
        target = int(spark.conf.get(TARGET_BYTES_CONF, str(TARGET_BYTES_DEFAULT)))
    except (Py4JError, AttributeError, ValueError):
        # Py4JError: JVM-side analysis failure; AttributeError: no _jdf
        # (Spark Connect); ValueError: unparseable conf. Anything else
        # is a real bug and should surface, not silently fall back.
        return cap
    if target > 0 and est < target * cap:
        return max(1, min(cap, -(-est // target)))
    return cap
