"""chunk_dedup (C4-style span removal) and the Bloom pre-filter —
correctness properties plus the plan shapes that make them 100 TB-safe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.dedup import (
    bloom_bitmap,
    bloom_might_contain,
    chunk_dedup,
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestChunkDedup:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        boiler = " ".join(f"b{i}" for i in range(4))  # one full 4-token chunk
        rows = [
            (1, boiler + " u1 u2 u3 u4"),       # first occurrence of boiler
            (2, boiler + " v1 v2 v3 v4"),       # boiler repeated → dropped
            (3, "w1 w2 w3 w4 " + boiler),       # boiler repeated → dropped
            (4, "x1 x2"),                       # single short chunk, unique
            (5, ""),                            # no tokens at all
            (6, boiler),                        # ONLY the boiler → empties out
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_first_occurrence_kept_rest_dropped(self, spark, corpus):
        out = {
            r["doc_id"]: r
            for r in chunk_dedup(corpus, chunk_tokens=4).collect()
        }
        assert out[1]["clean_text"] == "b0 b1 b2 b3 u1 u2 u3 u4"
        assert out[2]["clean_text"] == "v1 v2 v3 v4"
        assert out[3]["clean_text"] == "w1 w2 w3 w4"
        assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 1)

    def test_empty_and_fully_dropped_docs_survive(self, spark, corpus):
        out = {
            r["doc_id"]: r
            for r in chunk_dedup(corpus, chunk_tokens=4).collect()
        }
        assert (out[5]["n_chunks"], out[5]["n_kept"], out[5]["clean_text"]) == (
            0, 0, "",
        )
        assert (out[6]["n_chunks"], out[6]["n_kept"], out[6]["clean_text"]) == (
            1, 0, "",
        )
        assert out[4]["clean_text"] == "x1 x2"
        assert len(out) == 6  # one row per input doc, always

    def test_within_doc_repeats_also_dedup(self, spark):
        df = spark.createDataFrame(
            [(7, "a b a b a b")], ["doc_id", "text"]
        )
        row = chunk_dedup(df, chunk_tokens=2).collect()[0]
        assert row["clean_text"] == "a b"
        assert (row["n_chunks"], row["n_kept"]) == (3, 1)

    def test_plan_no_python_no_cartesian(self, spark, corpus):
        plan = _explain(chunk_dedup(corpus, chunk_tokens=4))
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestBloomPrefilter:
    M, K = 1 << 14, 4

    @pytest.fixture(scope="class")
    def keyed(self, spark):
        return spark.range(0, 500).select(
            F.md5(F.col("id").cast("string")).alias("content_md5"),
            F.col("id"),
        )

    def test_no_false_negatives(self, spark, keyed):
        bloom = bloom_bitmap(keyed, m_bits=self.M, k_hashes=self.K)
        out = bloom_might_contain(
            keyed, bloom, m_bits=self.M, k_hashes=self.K
        )
        assert out.filter(~F.col("might_exist")).count() == 0

    def test_new_keys_mostly_pass(self, spark, keyed):
        bloom = bloom_bitmap(keyed, m_bits=self.M, k_hashes=self.K)
        fresh = spark.range(10_000, 10_500).select(
            F.md5(F.col("id").cast("string")).alias("content_md5")
        )
        out = bloom_might_contain(fresh, bloom, m_bits=self.M, k_hashes=self.K)
        fp = out.filter(F.col("might_exist")).count()
        # 500 keys × 4 hashes into 16384 bits → fp rate ≈ (1-e^-0.122)^4 ≈ 0.02%
        assert fp <= 25  # generous: catches a broken hash, not noise

    def test_bitmap_is_tiny_and_join_is_broadcast(self, spark, keyed):
        bloom = bloom_bitmap(keyed, m_bits=self.M, k_hashes=self.K)
        assert bloom.count() <= self.M // 32
        plan = _explain(
            bloom_might_contain(keyed, bloom, m_bits=self.M, k_hashes=self.K)
        )
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan

    def test_incremental_union_of_bitmaps(self, spark, keyed):
        """Two half-corpus bitmaps bit_or-folded == the full bitmap —
        the property that makes nightly incremental rebuilds O(new)."""
        a = keyed.filter(F.col("id") < 250)
        b = keyed.filter(F.col("id") >= 250)
        merged = (
            bloom_bitmap(a, m_bits=self.M, k_hashes=self.K)
            .unionByName(bloom_bitmap(b, m_bits=self.M, k_hashes=self.K))
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        full = bloom_bitmap(keyed, m_bits=self.M, k_hashes=self.K)
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0
