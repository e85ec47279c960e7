"""exprcache.column_memo: plan-fragment memoization contract (r13).

The memo may only ever return a Column the wrapped builder could have
returned for those exact arguments: str/scalar args key by value,
Column args by their full JVM expression string, anything else
bypasses. Correctness must never depend on a hit OR a miss."""

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.exprcache import column_memo
from sqlbackuphistoryetl_spark.functions.htmlfns import decode_entities
from sqlbackuphistoryetl_spark.extensions.maincontent import main_content_extract


def test_str_args_hit_and_param_miss(spark):
    calls = []

    @column_memo
    def build(col, k=1):
        calls.append((col, k))
        return F.length(col) + F.lit(k)

    a = build("x", k=1)
    b = build("x", k=1)
    c = build("x", k=2)
    assert a is b          # identical object on a hit
    assert c is not a      # different scalar param -> rebuild
    assert calls == [("x", 1), ("x", 2)]


def test_column_args_key_by_expression(spark):
    calls = []

    @column_memo
    def build(col):
        calls.append(1)
        return F.upper(col)

    a = build(F.col("t"))
    b = build(F.col("t"))           # same expression tree -> hit
    c = build(F.substring("t", 1, 2))  # different tree -> miss
    assert a is b and c is not a
    assert len(calls) == 2


def test_literal_type_distinguished(spark):
    @column_memo
    def build(col):
        return F.concat(F.lit("p"), col.cast("string"))

    assert build(F.lit(1)) is not build(F.lit("1"))


def test_unmemoizable_args_bypass(spark):
    calls = []

    @column_memo
    def build(col, opts):
        calls.append(1)
        return F.length(col)

    build("t", {"a": 1})
    build("t", {"a": 1})
    assert len(calls) == 2  # dict arg -> no caching, no error


def test_memoized_builders_evaluate_correctly(spark):
    df = spark.createDataFrame(
        [("&amp;lt;",), ("&#38;lt;",)], ["t"]
    )
    first = df.select(decode_entities("t").alias("d")).collect()
    again = df.select(decode_entities("t").alias("d")).collect()
    assert [r["d"] for r in first] == ["&lt;", "&lt;"]
    assert first == again


def test_memoized_column_reusable_across_frames(spark):
    html = "<html><body><nav><a href='/'>x</a></nav><p>" + (
        "real content words here and some more of them to pass the bar "
        * 2
    ) + "</p></body></html>"
    col = main_content_extract("t")
    d1 = spark.createDataFrame([(html,)], ["t"]).select(col.alias("m"))
    d2 = spark.createDataFrame([(html,), (html,)], ["t"]).select(
        col.alias("m")
    )
    r1 = [r["m"] for r in d1.collect()]
    r2 = [r["m"] for r in d2.collect()]
    assert r1[0].startswith("real content") and r2 == [r1[0], r1[0]]
