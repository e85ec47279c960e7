"""Windows-path surgery as native Spark column expressions
(SURVEY §2.8 — sql:693-702,730-736).

The reference finds the last ``\\`` with the reverse/charindex trick:

    LeafPath = left(p, len(p) - charindex('\\', reverse(p), 1) + 1)
    FileName = right(p, charindex('\\', reverse(p)) - 1)

Re-expressed with the same primitives (length/instr/reverse/substring)
so the logic stays whole-stage-codegen'd JVM-side — no UDFs. Python
twins (`leaf_path_py`/`file_name_py`) exist for driver-side command
assembly on already-collected rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def leaf_path(path: Column | str) -> Column:
    """Directory part including the trailing backslash."""
    p = _c(path)
    # position of last '\' from the end
    rev_idx = F.instr(F.reverse(p), "\\")
    return F.substring(p, 1, (F.length(p) - rev_idx + 1).cast("int"))


def file_name(path: Column | str, prefix: Column | str | None = None) -> Column:
    """File name after the last backslash, optionally prefixed
    (@FileNamePrefix, sql:733-736)."""
    p = _c(path)
    rev_idx = F.instr(F.reverse(p), "\\")
    name = F.substring(p, (F.length(p) - rev_idx + 2).cast("int"), F.lit(4000))
    if prefix is None:
        return name
    pfx = F.lit(prefix) if isinstance(prefix, str) else prefix
    return F.concat(F.coalesce(pfx, F.lit("")), name)


def ensure_trailing_backslash(path: Column | str) -> Column:
    """'' → NULL; append '\\' when missing (sql:691-702)."""
    p = _c(path)
    return (
        F.when(p == "", F.lit(None).cast("string"))
        .when(p.isNull(), F.lit(None).cast("string"))
        .when(F.substring(p, -1, 1) != "\\", F.concat(p, F.lit("\\")))
        .otherwise(p)
    )


# --- driver-side twins (restore-command assembly on collected rows) ---

def leaf_path_py(path: str) -> str:
    i = path.rfind("\\")
    return path[: i + 1] if i >= 0 else ""


def file_name_py(path: str, prefix: str | None = None) -> str:
    i = path.rfind("\\")
    return (prefix or "") + (path[i + 1 :] if i >= 0 else path)


def ensure_trailing_backslash_py(path: str | None) -> str | None:
    if path is None or path == "":
        return None
    return path if path.endswith("\\") else path + "\\"
