"""Process-level memo for pure Column-builder functions.

Building a large Column tree one method call at a time pays a py4j
round-trip (~0.4 ms) per call, all serial driver time. The shared
builder chains (charset dispatch, jusText block classification, the
entity-decode tokenizer) each cost ~0.3-1.3 s and ~500-1400 round
trips PER CONSTRUCTION (measured r13), and every consumer query
constructs them again. A Column is an immutable, unresolved
expression tree — reusing one object across many plans is ordinary
PySpark usage, and resolution happens per-plan at analysis — so a
pure builder's output is a function of (input expression, scalar
parameters) and safe to memoize for the life of the process.

This is driver-side steady state (the guide's "initialise heavyweight
state once", applied to plan construction), NOT data or result
caching: nothing derived from any input table is stored, the first
construction in a process still pays full cost, and a fresh process
rebuilds everything.

Keys: scalar arguments by value; Column arguments by their JVM
``toString()`` (one round-trip), which prints the full expression
tree with quoted string literals — two inputs that print identically
are the same unresolved tree, for which the builder returns an
identical column anyway. Unhashable / unknown argument types simply
bypass the memo (correctness never depends on a hit).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

from pyspark.sql import Column

_memo: dict[tuple, Column] = {}


def _key_part(v: Any) -> Any:
    if isinstance(v, Column):
        return ("col", v._jc.toString())
    if isinstance(v, (str, int, float, bool)) or v is None:
        return (type(v).__name__, v)
    if isinstance(v, (tuple, list)):
        return tuple(_key_part(x) for x in v)
    raise TypeError(f"unmemoizable arg type {type(v).__name__}")


def column_memo(fn: Callable[..., Column]) -> Callable[..., Column]:
    """Memoize a pure ``(... ) -> Column`` builder (see module doc)."""

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> Column:
        try:
            key = (
                fn.__module__,
                fn.__qualname__,
                _key_part(args),
                _key_part(tuple(sorted(kwargs.items()))),
            )
        except TypeError:
            return fn(*args, **kwargs)
        hit = _memo.get(key)
        if hit is None:
            hit = _memo[key] = fn(*args, **kwargs)
        return hit

    return wrapper


def column_memo_lru(maxsize: int = 64) -> Callable:
    """Bounded variant for builders keyed on DATA-DERIVED scalars
    (e.g. a fitted vocabulary's merge rules): the process-wide
    :func:`column_memo` dict never evicts, so every distinct fitted
    input would pin its composed expression tree on the driver forever
    (r13 advice). An LRU of ``maxsize`` trees keeps the within-query
    and steady-state reuse while bounding driver memory."""

    def deco(fn: Callable[..., Column]) -> Callable[..., Column]:
        from collections import OrderedDict

        lru: "OrderedDict[tuple, Column]" = OrderedDict()

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Column:
            try:
                key = (_key_part(args), _key_part(tuple(sorted(kwargs.items()))))
            except TypeError:
                return fn(*args, **kwargs)
            hit = lru.get(key)
            if hit is None:
                hit = lru[key] = fn(*args, **kwargs)
                if len(lru) > maxsize:
                    lru.popitem(last=False)
            else:
                lru.move_to_end(key)
            return hit

        return wrapper

    return deco
