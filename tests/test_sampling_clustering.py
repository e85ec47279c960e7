"""Unit tests for extensions.clustering and extensions.sampling plus
the token-length histogram — determinism, convergence, and exactness
properties the sf-gate queries rely on."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.clustering import (
    connected_components,
    dedup_representatives,
)
from sqlbackuphistoryetl_spark.extensions.sampling import (
    hash_rate_filter,
    rate_threshold_hex,
    stratified_sample,
    weighted_mix,
)
from sqlbackuphistoryetl_spark.functions.textfns import token_length_histogram


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


class TestConnectedComponents:
    def test_two_components(self, spark):
        got = _comp_map(
            connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
        )
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_long_chain_converges(self, spark):
        # min label must propagate 10 hops — exercises the iteration
        chain = [(i, i + 1) for i in range(10)]
        got = _comp_map(connected_components(_pairs(spark, chain)))
        assert got == {i: 0 for i in range(11)}

    def test_edge_direction_irrelevant(self, spark):
        a = _comp_map(connected_components(_pairs(spark, [(5, 2), (2, 9)])))
        b = _comp_map(connected_components(_pairs(spark, [(2, 5), (9, 2)])))
        assert a == b == {2: 2, 5: 2, 9: 2}

    def test_empty_pairs(self, spark):
        out = connected_components(_pairs(spark, []))
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["node", "comp"]

    def test_max_iter_raises(self, spark):
        chain = [(i, i + 1) for i in range(6)]
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(_pairs(spark, chain), max_iter=2)

    def test_dedup_representatives(self, spark):
        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in range(1, 6)], "doc_id long, text string"
        )
        kept = dedup_representatives(docs, _pairs(spark, [(1, 2), (2, 3)]))
        assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4, 5]


def _docs(spark, n=40):
    rows = [(i, "ab" if i % 2 == 0 else "cd", f"doc {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, grp string, text string")


class TestSampling:
    def test_stratified_exact_k_and_deterministic(self, spark):
        df = _docs(spark)
        s1 = stratified_sample(df, ["grp"], 5, "doc_id", salt="t")
        s2 = stratified_sample(df, ["grp"], 5, "doc_id", salt="t")
        r1 = sorted(r["doc_id"] for r in s1.collect())
        assert s1.groupBy("grp").count().collect()[0]["count"] == 5
        assert r1 == sorted(r["doc_id"] for r in s2.collect())

    def test_stratified_matches_python_md5_order(self, spark):
        df = _docs(spark, n=20)
        got = sorted(
            r["doc_id"]
            for r in stratified_sample(df, ["grp"], 3, "doc_id", salt="t").collect()
        )
        want = []
        for grp_ids in ([i for i in range(20) if i % 2 == 0], [i for i in range(20) if i % 2 == 1]):
            keyed = sorted(
                grp_ids, key=lambda i: hashlib.md5(f"t|{i}".encode()).hexdigest()
            )
            want.extend(keyed[:3])
        assert got == sorted(want)

    def test_stratified_k_larger_than_stratum(self, spark):
        df = _docs(spark, n=6)
        out = stratified_sample(df, ["grp"], 100, "doc_id", salt="t")
        assert out.count() == 6

    def test_partitioning_invariance(self, spark):
        df = _docs(spark)
        a = sorted(
            r["doc_id"]
            for r in stratified_sample(df, ["grp"], 4, "doc_id").collect()
        )
        b = sorted(
            r["doc_id"]
            for r in stratified_sample(
                df.repartition(7), ["grp"], 4, "doc_id"
            ).collect()
        )
        assert a == b

    def test_rate_filter_bounds(self, spark):
        df = _docs(spark)
        assert hash_rate_filter(df, 1.0, "doc_id").count() == df.count()
        assert hash_rate_filter(df, 0.0, "doc_id").count() == 0

    def test_rate_threshold_hex(self):
        assert rate_threshold_hex(0.0) == "00000000"
        assert rate_threshold_hex(1.0) == "g"
        assert rate_threshold_hex(0.7) == format(int(0.7 * 16**8), "08x")

    def test_rate_filter_matches_python_md5(self, spark):
        df = _docs(spark)
        got = sorted(
            r["doc_id"] for r in hash_rate_filter(df, 0.5, "doc_id", salt="x").collect()
        )
        thr = rate_threshold_hex(0.5)
        want = [
            i
            for i in range(40)
            if hashlib.md5(f"x|{i}".encode()).hexdigest()[:8] < thr
        ]
        assert got == want

    def test_weighted_mix_tags_and_rates(self, spark):
        df = _docs(spark)
        a = df.filter(F.col("doc_id") < 20)
        b = df.filter(F.col("doc_id") >= 20)
        out = weighted_mix([("a", a, 1.0), ("b", b, 0.0)], "doc_id")
        rows = out.collect()
        assert {r["source"] for r in rows} == {"a"}
        assert len(rows) == 20

    def test_weighted_mix_independent_salts(self, spark):
        # same ids in two sources must draw independently (per-source salt)
        df = _docs(spark)
        out = weighted_mix([("s1", df, 0.5), ("s2", df, 0.5)], "doc_id")
        kept = {(r["source"], r["doc_id"]) for r in out.collect()}
        s1 = {i for s, i in kept if s == "s1"}
        s2 = {i for s, i in kept if s == "s2"}
        assert s1 != s2  # astronomically unlikely to coincide if independent

    def test_weighted_mix_empty_sources_raises(self, spark):
        with pytest.raises(ValueError):
            weighted_mix([], "doc_id")

    def test_weighted_mix_upsampling(self, spark):
        # rate 2.5 → two full epochs + a half draw; every row appears
        # at least twice, expected multiplicity 2.5
        df = _docs(spark, n=40)
        out = weighted_mix([("s", df, 2.5)], "doc_id").collect()
        per_id = {}
        for r in out:
            per_id.setdefault(r["doc_id"], []).append(r["epoch"])
        assert set(per_id) == set(range(40))
        counts = [len(v) for v in per_id.values()]
        assert all(c in (2, 3) for c in counts)
        assert 40 * 2 < len(out) < 40 * 3  # the half-epoch drew something
        for epochs in per_id.values():
            assert {0, 1} <= set(epochs)  # full epochs always present


class TestTokenHistogram:
    def test_buckets_and_share(self, spark):
        texts = ["a", "a b c", " ".join(["w"] * 60), " ".join(["w"] * 61)]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        out = {
            r["bucket_lo"]: (r["bucket_hi"], r["n_docs"], r["share"])
            for r in token_length_histogram(df, "text", 50).collect()
        }
        assert out[0] == (49, 2, 0.5)
        assert out[50] == (99, 2, 0.5)

    def test_share_sums_to_one(self, spark):
        df = spark.createDataFrame(
            [(" ".join(["t"] * (i * 7 % 120)),) for i in range(1, 30)],
            "text string",
        )
        rows = token_length_histogram(df, "text", 25).collect()
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12
        assert sum(r["n_docs"] for r in rows) == 29
