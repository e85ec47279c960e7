"""Deterministic string aggregation (SURVEY §2.4 A6/A7).

T-SQL STRING_AGG without WITHIN GROUP has nondeterministic order; the
reference relies on it for stripe lists and MOVE clauses
(sql:758-763,773-786,976-982,1085-1128). The engine makes order
deterministic — sort_array before concat — matching the intent of the
reference's ``order by physical_device_name`` inserts
(sql:611,668,1020); documented as an intentional strengthening
(SURVEY §2.11.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_string_agg(expr: Column | str, sep: str) -> Column:
    """Aggregate expression: concat_ws(sep, array_sort(collect_list(expr))).

    Use inside ``groupBy(...).agg(...)``; JVM-side, no UDF.
    """
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.concat_ws(sep, F.array_sort(F.collect_list(col)))


def device_clause(device_type: Column | str = "device_type",
                  device_name: Column | str = "physical_device_name") -> Column:
    """``URL = N'<dev>'`` when device_type=9 else ``DISK = N'<dev>'``
    (sql:776,978,1090,1177)."""
    dtype = F.col(device_type) if isinstance(device_type, str) else device_type
    dname = F.col(device_name) if isinstance(device_name, str) else device_name
    prefix = F.when(dtype == 9, F.lit("URL = N'")).otherwise(F.lit("DISK = N'"))
    return F.concat(prefix, dname, F.lit("'"))
