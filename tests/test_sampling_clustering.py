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
    unimax_allocation,
    weighted_mix,
)
from sqlbackuphistoryetl_spark.functions.textfns import token_length_histogram


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


class _loop_only:
    """Force the distributed hash-min loop by disabling the r13
    driver union-find fallback for the duration of the block."""

    KEY = "spark.sqlbackuphistoryetl.cc.driverMaxEdges"

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.spark.conf.set(self.KEY, "0")

    def __exit__(self, *exc):
        self.spark.conf.unset(self.KEY)


class TestConnectedComponents:
    def test_two_components(self, spark):
        got = _comp_map(
            connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
        )
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_long_chain_converges(self, spark):
        # min label must propagate 10 hops — exercises the iteration
        chain = [(i, i + 1) for i in range(10)]
        with _loop_only(spark):
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
        with _loop_only(spark):
            with pytest.raises(RuntimeError, match="did not converge"):
                connected_components(_pairs(spark, chain), max_iter=2)

    def test_driver_fallback_matches_loop(self, spark):
        # r13: the small-graph driver union-find must produce exactly
        # the loop's labels — long ids, string ids (UTF-8 order),
        # chains, stars, and disjoint singles
        cases = [
            [(1, 2), (2, 3), (3, 4), (10, 11)],
            [(i, i + 1) for i in range(10)],
            [(7, 1), (7, 2), (7, 3), (9, 8)],
        ]
        for edges in cases:
            fast = _comp_map(connected_components(_pairs(spark, edges)))
            with _loop_only(spark):
                slow = _comp_map(connected_components(_pairs(spark, edges)))
            assert fast == slow
        sp = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("Z", "é")], "id_a string, id_b string"
        )
        fast = _comp_map(connected_components(sp))
        with _loop_only(spark):
            slow = _comp_map(connected_components(sp))
        assert fast == slow == {"a": "a", "b": "a", "c": "a", "Z": "Z", "é": "Z"}

    def test_driver_fallback_rejects_null_ids(self, spark):
        pairs = spark.createDataFrame(
            [(1, None)], "id_a long, id_b long"
        )
        with pytest.raises(ValueError, match="null ids"):
            connected_components(pairs)

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


class TestGlobalSampleK:
    def _docs(self, spark, n=60):
        return spark.createDataFrame(
            [(i, f"text {i}") for i in range(n)], ["doc_id", "text"]
        )

    def test_exact_k_and_deterministic(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import global_sample_k

        docs = self._docs(spark)
        a = sorted(r.doc_id for r in global_sample_k(docs, 10, "doc_id").collect())
        b = sorted(r.doc_id for r in global_sample_k(docs, 10, "doc_id").collect())
        assert len(a) == 10 and a == b

    def test_matches_python_md5_order(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import global_sample_k

        docs = self._docs(spark)
        got = sorted(
            r.doc_id for r in global_sample_k(docs, 7, "doc_id", salt="z").collect()
        )
        want = sorted(
            sorted(
                range(60),
                key=lambda i: (hashlib.md5(f"z|{i}".encode()).hexdigest(), i),
            )[:7]
        )
        assert got == want

    def test_partitioning_invariance(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import global_sample_k

        docs = self._docs(spark)
        a = sorted(r.doc_id for r in global_sample_k(docs, 9, "doc_id").collect())
        b = sorted(
            r.doc_id
            for r in global_sample_k(docs.repartition(13), 9, "doc_id").collect()
        )
        assert a == b

    def test_k_larger_than_input(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import global_sample_k

        docs = self._docs(spark, n=4)
        assert global_sample_k(docs, 100, "doc_id").count() == 4


class TestHeavyHitterNgrams:
    def test_counts_and_ties(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import heavy_hitter_ngrams

        docs = spark.createDataFrame(
            [(0, "a b a b"), (1, "a b c"), (2, "x y")],
            ["doc_id", "text"],
        )
        rows = heavy_hitter_ngrams(docs, "text", n=2, k=2).collect()
        # bigrams: doc0: "a b","b a","a b"; doc1: "a b","b c"; doc2: "x y"
        # counts: "a b"=3, "b a"=1, "b c"=1, "x y"=1 → total 6
        assert [(r.gram, r.cnt, r.total_grams) for r in rows] == [
            ("a b", 3, 6),
            ("b a", 1, 6),  # tie broken gram-asc among count-1 grams
        ]
        assert rows[0].share == 3 / 6

    def test_short_doc_single_gram(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import heavy_hitter_ngrams

        docs = spark.createDataFrame([(0, "solo")], ["doc_id", "text"])
        rows = heavy_hitter_ngrams(docs, "text", n=2, k=5).collect()
        assert [(r.gram, r.cnt) for r in rows] == [("solo", 1)]


class TestScalarQuantizeProfile:
    def test_codes_bounded_and_degenerate_dim(self, spark):
        from sqlbackuphistoryetl_spark.extensions.similarity import (
            scalar_quantize_profile,
        )

        df = spark.createDataFrame(
            [(i, [float(i), 7.0]) for i in range(11)],
            "vec_id long, embedding array<float>",
        )
        rows = {r.dim: r for r in scalar_quantize_profile(df).collect()}
        d0 = rows[0]
        assert (d0.vmin, d0.vmax, d0.n) == (0.0, 10.0, 11)
        assert d0.code_min == 0 and d0.code_max == 255
        # dim 1 is constant → every code 0 by the degenerate rule
        d1 = rows[1]
        assert (d1.code_sum, d1.code_min, d1.code_max) == (0, 0, 0)

    def test_code_sum_matches_python(self, spark):
        import math

        from sqlbackuphistoryetl_spark.extensions.similarity import (
            scalar_quantize_profile,
        )

        vals = [0.0, 0.1, 0.35, 0.5, 0.77, 1.0]
        df = spark.createDataFrame(
            [(i, [v]) for i, v in enumerate(vals)],
            "vec_id long, embedding array<float>",
        )
        row = scalar_quantize_profile(df).collect()[0]
        # mirror: float32 storage, then the exact double expression
        import struct

        f32 = [struct.unpack("f", struct.pack("f", v))[0] for v in vals]
        lo, hi = min(f32), max(f32)
        want = sum(math.floor((x - lo) / (hi - lo) * 255.0 + 0.5) for x in f32)
        assert row.code_sum == want


class TestPairSourceMatrix:
    def test_canonical_pair_and_sums(self, spark):
        from sqlbackuphistoryetl_spark.extensions.dedup import pair_source_matrix

        pairs = spark.createDataFrame(
            [(1, 2, 0.5), (2, 3, 0.25), (3, 4, 1.0)],
            ["id_a", "id_b", "jaccard"],
        )
        docs = spark.createDataFrame(
            [(1, "web"), (2, "books"), (3, "web"), (4, "books")],
            ["doc_id", "source"],
        )
        rows = {
            (r.source_a, r.source_b): (r.n_pairs, r.qjaccard_sum)
            for r in pair_source_matrix(pairs, docs).collect()
        }
        # all three pairs cross web↔books and fold into ONE canonical
        # cell: 0.5 + 0.25 + 1.0 quantized at 1e6
        assert rows == {("books", "web"): (3, 1_750_000)}


class TestNewOpEmptyInputs:
    def test_heavy_hitter_empty_corpus(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import heavy_hitter_ngrams

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert heavy_hitter_ngrams(docs, "text", n=2, k=5).count() == 0

    def test_global_sample_k_empty(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import global_sample_k

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert global_sample_k(docs, 5, "doc_id").count() == 0

    def test_quantize_profile_empty(self, spark):
        from sqlbackuphistoryetl_spark.extensions.similarity import (
            scalar_quantize_profile,
        )

        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert scalar_quantize_profile(df).count() == 0


def test_weighted_sample_k_bias_and_determinism(spark):
    """A-ES weighted sampling: 100x-weight rows are drawn far more
    often, the draw is a pure function of (ids, salt), zero-weight rows
    lose to any positive weight, and the plan is TakeOrderedAndProject
    (bounded heaps, no global sort)."""
    from tests.test_plans_physical import _explain

    from sqlbackuphistoryetl_spark.extensions.sampling import (
    unimax_allocation,
        weighted_sample_k,
    )

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, 100.0)
        .when(F.col("id") < 60, 0.0)
        .otherwise(1.0)
        .alias("w"),
    )
    s = weighted_sample_k(df, 100, "w", "doc_id")
    ids = {r["doc_id"] for r in s.collect()}
    assert len(ids) == 100
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 25  # 100x weight: most of the 50 heavy rows drawn
    assert not any(50 <= i < 60 for i in ids)  # zero weight never wins
    ids2 = {r["doc_id"] for r in weighted_sample_k(df, 100, "w", "doc_id").collect()}
    assert ids == ids2
    assert ids != {r["doc_id"] for r in
                   weighted_sample_k(df, 100, "w", "doc_id", salt="w1").collect()}
    assert "TakeOrderedAndProject" in _explain(s)


class TestDSIR:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )

    def _hand_logw(self, raw_docs, target_docs, n_buckets):
        import hashlib
        import math

        def grams(text):
            ws = text.split()
            return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

        def bucket(g):
            return (
                int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
            )

        cq, cp = {}, {}
        for _, t in raw_docs:
            for g in grams(t):
                cq[bucket(g)] = cq.get(bucket(g), 0) + 1
        for _, t in target_docs:
            for g in grams(t):
                cp[bucket(g)] = cp.get(bucket(g), 0) + 1
        tq, tp = sum(cq.values()), sum(cp.values())
        du = {
            b: round(
                math.log(
                    ((cp.get(b, 0) + 1.0) / (tp + n_buckets))
                    / ((c + 1.0) / (tq + n_buckets))
                )
                * 1e6
            )
            for b, c in cq.items()
        }
        out = {}
        for i, t in raw_docs:
            gs = grams(t)
            out[i] = (len(gs), sum(du[bucket(g)] for g in gs))
        return out

    RAW = [
        (1, "spark shuffle join spark shuffle", "en"),
        (2, "der die das und der die", "de"),
        (3, "spark join window agg", "en"),
    ]

    def test_logweights_match_hand_math(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import (
    unimax_allocation,
            dsir_logweights,
        )

        raw = self._frame(spark, self.RAW)
        target = raw.filter(F.col("lang") == "en")
        got = {
            r["doc_id"]: (r["n_feats"], r["logw_u"])
            for r in dsir_logweights(raw, target, n_buckets=64).collect()
        }
        exp = self._hand_logw(
            [(i, t) for i, t, _ in self.RAW],
            [(i, t) for i, t, lang in self.RAW if lang == "en"],
            64,
        )
        assert got == exp

    def test_on_target_docs_outweigh_off_target(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import (
    unimax_allocation,
            dsir_logweights,
        )

        raw = self._frame(spark, self.RAW)
        lw = {
            r["doc_id"]: r["logw_u"]
            for r in dsir_logweights(
                raw, raw.filter(F.col("lang") == "en"), n_buckets=64
            ).collect()
        }
        assert lw[1] > lw[2] and lw[3] > lw[2]

    def test_resample_deterministic_and_bounded(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import (
    unimax_allocation,
            dsir_resample,
        )

        raw = self._frame(spark, self.RAW)
        tgt = raw.filter(F.col("lang") == "en")
        s1 = sorted(r["doc_id"] for r in dsir_resample(raw, tgt, 2).collect())
        s2 = sorted(r["doc_id"] for r in dsir_resample(raw, tgt, 2).collect())
        assert s1 == s2 and len(s1) == 2

    def test_plan_broadcast_delta_and_topk(self, spark):
        from sqlbackuphistoryetl_spark.extensions.sampling import (
    unimax_allocation,
            dsir_resample,
        )

        raw = self._frame(spark, self.RAW)
        plan = (
            dsir_resample(raw, raw.filter(F.col("lang") == "en"), 2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestUniMax:
    """unimax_allocation == reference waterfilling loop, plus the
    invariants the closed form must preserve."""

    @staticmethod
    def _py_unimax(counts: dict[str, int], budget: int, epochs: int):
        """Reference loop: ascending caps; language i is capped iff its
        cap fits the fair share over ALL languages still in the pool;
        the first uncapped language ends capping (waterfilling)."""
        langs = sorted(counts.items(), key=lambda kv: (kv[1] * epochs, kv[0]))
        n, remaining, m = len(langs), budget, 0
        out = {}
        for i, (lang, c) in enumerate(langs):
            cap = c * epochs
            if m == i and cap * (n - i) <= remaining:
                out[lang] = (c, cap, 1, cap)
                remaining -= cap
                m += 1
        share = remaining // (n - m) if n > m else 0
        for lang, c in counts.items():
            if lang not in out:
                out[lang] = (c, c * epochs, 0, share)
        return out

    def _run(self, spark, counts, budget, epochs):
        rows = [(f"d{lang}{i}", lang, 1)
                for lang, c in counts.items() for i in range(c)]
        df = spark.createDataFrame(rows, "doc_id string, lang string, n_tokens long")
        got = {
            r["lang"]: (r["corpus_tokens"], r["cap_tokens"],
                        r["is_capped"], r["alloc_tokens"])
            for r in unimax_allocation(df, budget, max_epochs=epochs).collect()
        }
        assert got == self._py_unimax(counts, budget, epochs)
        return got

    def test_partial_capping(self, spark):
        counts = {"en": 100, "fr": 30, "de": 20, "zh": 10}
        got = self._run(spark, counts, budget=150, epochs=2)
        # zh and de hit the 2-epoch cap; en and fr waterfill the rest
        assert got["zh"] == (10, 20, 1, 20)
        assert got["de"] == (20, 40, 1, 40)
        assert got["fr"][2] == 0 and got["en"][2] == 0
        assert got["fr"][3] == got["en"][3] == (150 - 60) // 2

    def test_all_capped_when_budget_exceeds_caps(self, spark):
        counts = {"a": 5, "b": 7}
        got = self._run(spark, counts, budget=1000, epochs=3)
        assert all(v[2] == 1 and v[3] == v[1] for v in got.values())

    def test_none_capped_small_budget(self, spark):
        counts = {"a": 50, "b": 60, "c": 70}
        got = self._run(spark, counts, budget=30, epochs=1)
        assert all(v[2] == 0 and v[3] == 10 for v in got.values())

    def test_invariants_on_grid(self, spark):
        counts = {"a": 13, "b": 29, "c": 101, "d": 7, "e": 55}
        total = sum(counts.values())
        for epochs in (1, 2, 4):
            for budget in (0, 1, total // 3, total, 2 * total,
                           epochs * total - 1, epochs * total,
                           epochs * total + 1):
                got = self._run(spark, counts, budget, epochs)
                allocs = {k: v[3] for k, v in got.items()}
                caps = {k: v[1] for k, v in got.items()}
                # feasibility: nobody exceeds their epoch cap
                assert all(allocs[k] <= caps[k] for k in counts)
                # budget never overspent; leftover < number of uncapped
                # languages unless every language is capped
                spent = sum(allocs.values())
                n_uncapped = sum(1 for v in got.values() if v[2] == 0)
                assert spent <= budget or n_uncapped == 0
                if n_uncapped:
                    assert budget - spent < n_uncapped

    def test_tie_break_deterministic(self, spark):
        # equal caps order by lang name; result must be stable
        counts = {"x": 10, "y": 10, "z": 10}
        a = self._run(spark, counts, budget=25, epochs=1)
        b = self._run(spark, counts, budget=25, epochs=1)
        assert a == b


class TestBPEPairCounts:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_hand_counts_with_end_marker(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import bpe_pair_counts

        out = {
            (r["lhs"], r["rhs"]): r["pair_count"]
            for r in bpe_pair_counts(
                self._docs(spark, ["aa ab", "ab"]), k=10
            ).collect()
        }
        # words: aa x1, ab x2
        assert out == {
            ("a", "a"): 1, ("a", "</w>"): 1,
            ("a", "b"): 2, ("b", "</w>"): 2,
        }

    def test_within_word_repeats_count_per_occurrence(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import bpe_pair_counts

        out = {
            (r["lhs"], r["rhs"]): r["pair_count"]
            for r in bpe_pair_counts(self._docs(spark, ["aaa"]), k=10).collect()
        }
        assert out[("a", "a")] == 2  # both adjacent positions of 'aaa'

    def test_topk_cut_and_ordering(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import bpe_pair_counts

        rows = bpe_pair_counts(
            self._docs(spark, ["ab ab ab cd cd xy"]), k=2
        ).collect()
        assert len(rows) == 2
        # (a,b) and (b,</w>) tie at 3; lexicographic (lhs, rhs) breaks it
        assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["pair_count"]) == ("a", "b", 3)
        assert (rows[1]["lhs"], rows[1]["rhs"], rows[1]["pair_count"]) == ("b", "</w>", 3)

    def test_plan_take_ordered_no_python(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import bpe_pair_counts

        plan = (
            bpe_pair_counts(self._docs(spark, ["ab cd"]), k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan


class TestR6LateOpEmptyInputs:
    def test_unimax_empty_corpus(self, spark):
        df = spark.createDataFrame([], "doc_id string, lang string, n_tokens long")
        assert unimax_allocation(df, 1000, 2).count() == 0

    def test_pmi_empty_corpus(self, spark):
        from sqlbackuphistoryetl_spark.extensions.lm_filter import pmi_collocations

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert pmi_collocations(docs, min_count=1, k=5).count() == 0

    def test_bpe_empty_corpus(self, spark):
        from sqlbackuphistoryetl_spark.functions.textfns import bpe_pair_counts

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert bpe_pair_counts(docs, k=5).count() == 0

    def test_hard_negatives_empty_queries(self, spark):
        from sqlbackuphistoryetl_spark.extensions.similarity import (
            mine_hard_negatives,
        )

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
        )
        empty = emb.filter("vec_id < 0")
        assert mine_hard_negatives(emb, empty, k=3).count() == 0

    def test_rrf_empty_list_contributes_nothing(self, spark):
        from sqlbackuphistoryetl_spark.extensions.similarity import rrf_fuse

        a = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
        b = spark.createDataFrame([], "doc_id long, rank long")
        rows = rrf_fuse([a, b]).collect()
        assert len(rows) == 1
        assert rows[0]["rank_2"] is None
        assert abs(rows[0]["rrf"] - 1 / 61) < 1e-12
