"""Persistent MinHash index (extensions/dedup_index.py): stored-side
incremental dedup equals the one-job cross-corpus pipeline, appends are
visible to later queries, and parameters ride with the index."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.dedup import minhash_lsh_cross
from sqlbackuphistoryetl_spark.extensions.dedup_index import (
    append_minhash_index,
    query_minhash_index,
    read_index_meta,
    write_minhash_index,
)


def _docs(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_index_query_equals_cross_pipeline(spark, tmp_path):
    docs = _docs(spark)
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "mh_index")
    write_minhash_index(existing, path)
    assert read_index_meta(spark, path) == (32, 8, 5)

    got = {
        (r["incoming_id"], r["index_id"], round(r["est_jaccard"], 9))
        for r in query_minhash_index(spark, incoming, path).collect()
    }
    want = {
        (r["incoming_id"], r["existing_id"], round(r["est_jaccard"], 9))
        for r in minhash_lsh_cross(incoming, existing).collect()
    }
    assert got == want and len(want) > 0


def test_index_append_extends_matches(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "mh_index")
    # index starts with only the first third; a near-dup's partner sits
    # in the second third and is invisible until appended
    third = docs.count() // 3
    write_minhash_index(docs.filter(F.col("doc_id") < third), path)
    probe = docs.filter(F.col("doc_id") >= 2 * third)
    before = query_minhash_index(spark, probe, path).count()
    append_minhash_index(docs.filter(
        (F.col("doc_id") >= third) & (F.col("doc_id") < 2 * third)), path)
    after = query_minhash_index(spark, probe, path).count()
    assert after >= before
    # appended entries use the stored params: full-corpus parity check
    write_minhash_index(docs.filter(F.col("doc_id") < third), path)
    append_minhash_index(docs.filter(F.col("doc_id") >= third), path)
    via_append = {
        (r["incoming_id"], r["index_id"])
        for r in query_minhash_index(spark, probe, path).collect()
    }
    write_minhash_index(docs, path)
    via_full = {
        (r["incoming_id"], r["index_id"])
        for r in query_minhash_index(spark, probe, path).collect()
    }
    assert via_append == via_full


def test_query_missing_index_fails_clearly(spark, tmp_path):
    import pytest

    from sqlbackuphistoryetl_spark.extensions.dedup_index import (
        query_minhash_index,
    )

    docs = _docs(spark).limit(5)
    with pytest.raises(Exception) as e:
        query_minhash_index(spark, docs, str(tmp_path / "nope")).count()
    assert "nope" in str(e.value) or "PATH_NOT_FOUND" in str(e.value)


def test_schema_drift_report(spark):
    from sqlbackuphistoryetl_spark.sources.readers import schema_drift

    a = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, v double")
    b = spark.createDataFrame([(1, "x", 2)], "id long, name string, v int")
    c = spark.createDataFrame([(1, "x")], "id long, extra string")
    assert schema_drift(a, a) == []
    drift = schema_drift(a, b)
    assert drift == [{"column": "v", "change": "type_changed",
                      "batch_type": "double", "sink_type": "int"}]
    drift2 = {d["column"]: d["change"] for d in schema_drift(a, c)}
    assert drift2 == {"name": "added", "v": "added", "extra": "dropped"}


def test_delete_from_index_stops_matches(spark, tmp_path):
    from pyspark.sql import functions as F2

    from sqlbackuphistoryetl_spark.extensions.dedup_index import (
        delete_from_minhash_index,
        query_minhash_index,
        write_minhash_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    write_minhash_index(docs, path)
    probe = docs.limit(20)
    before = query_minhash_index(spark, probe, path, min_est_jaccard=0.99)
    # every probe doc matches itself in the index
    self_matches = {r["index_id"] for r in before.collect()}
    victim = sorted(self_matches)[:5]
    delete_from_minhash_index(
        spark, path, spark.createDataFrame([(v,) for v in victim], ["doc_id"])
    )
    after = {r["index_id"]
             for r in query_minhash_index(spark, probe, path,
                                          min_est_jaccard=0.99).collect()}
    assert not (after & set(victim))  # victims never match again
    assert self_matches - set(victim) <= after  # others unaffected


def test_script_profile_counts(spark):
    from sqlbackuphistoryetl_spark.functions.textfns import script_profile

    docs = spark.createDataFrame(
        [(1, "Hello 世界 42"), (2, "你好世界"), (3, "12345"), (4, "!!!")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in script_profile(docs).collect()}
    assert (out[1]["n_latin"], out[1]["n_cjk"], out[1]["n_digit"],
            out[1]["n_space"], out[1]["n_other"]) == (5, 2, 2, 2, 0)
    assert out[1]["dominant_script"] == "latin"
    assert out[2]["dominant_script"] == "cjk" and out[2]["n_cjk"] == 4
    assert out[3]["dominant_script"] == "digit"
    assert out[4]["dominant_script"] == "other" and out[4]["n_other"] == 3


def test_sync_index_with_corpus_diff(spark, tmp_path):
    from pyspark.sql import functions as F2

    from sqlbackuphistoryetl_spark.extensions.dedup_index import (
        query_minhash_index,
        sync_index_with_corpus,
        write_minhash_index,
    )

    docs = _docs(spark)
    v1 = docs.filter(F2.col("doc_id") < 300)
    # v2: drops ids < 50, changes 100-109 (text replaced), adds >= 300
    changed = v1.filter((F2.col("doc_id") >= 100) & (F2.col("doc_id") < 110)) \
        .withColumn("text", F2.concat(F2.lit("CHANGED "), F2.col("text")))
    v2 = (
        v1.filter((F2.col("doc_id") >= 50) &
                  ~((F2.col("doc_id") >= 100) & (F2.col("doc_id") < 110)))
        .unionByName(changed)
        .unionByName(docs.filter(F2.col("doc_id") >= 300))
    )

    path = str(tmp_path / "idx_sync")
    write_minhash_index(v1, path)
    churn = sync_index_with_corpus(spark, path, v1, v2)
    assert churn["removed"] == 50 and churn["changed"] == 10
    assert churn["added"] == docs.filter(F2.col("doc_id") >= 300).count()

    # synced index answers queries exactly like a fresh v2 index
    probe = docs.limit(40)
    synced = {(r["incoming_id"], r["index_id"])
              for r in query_minhash_index(spark, probe, path).collect()}
    rebuilt_path = str(tmp_path / "idx_rebuilt")
    write_minhash_index(v2, rebuilt_path)
    rebuilt = {(r["incoming_id"], r["index_id"])
               for r in query_minhash_index(spark, probe, rebuilt_path).collect()}
    assert synced == rebuilt
