"""Physical-plan quality gates (SURVEY §4): the optimizations we rely
on at 100 TB must actually appear in the plan — filters reaching the
parquet scan, small dims broadcast, no Python in the hot path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark import schema
from sqlbackuphistoryetl_spark.sources.extract import extract_backup_history
from sqlbackuphistoryetl_spark.sources.fixtures import consolidated_rows, raw_source_tables
from sqlbackuphistoryetl_spark.sources.readers import SourceTables


def _explain(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _parquet_sources(spark, tmp_path):
    """Persist raw tables to parquet so scans are real FileSourceScanExec."""
    src = raw_source_tables(spark)
    base = tmp_path / "raw"
    names = ["backupset", "backupmediafamily", "backupfile", "databases",
             "replica_states", "availability_groups"]
    for n in names:
        getattr(src, n).write.mode("overwrite").parquet(str(base / f"{n}.parquet"))
    return SourceTables(
        **{n: spark.read.parquet(str(base / f"{n}.parquet")) for n in names}
    )


def test_watermark_filter_pushed_to_scan(spark, tmp_path):
    src = _parquet_sources(spark, tmp_path)
    df = extract_backup_history(src, dt.datetime(2025, 1, 1, 10, 0))
    plan = _explain(df)
    # the watermark predicate must reach the backupset parquet scan
    assert "PushedFilters" in plan
    assert "backup_finish_date" in plan.split("PushedFilters")[1][:500]


def test_dimension_joins_broadcast(spark, tmp_path):
    src = _parquet_sources(spark, tmp_path)
    df = extract_backup_history(src, dt.datetime(2025, 1, 1, 10, 0))
    plan = _explain(df)
    assert plan.count("BroadcastHashJoin") >= 3  # databases, replica_states, AGs
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_extract_column_pruning(spark, tmp_path):
    src = _parquet_sources(spark, tmp_path)
    narrow = extract_backup_history(src, dt.datetime(2025, 1, 1, 10, 0)).select(
        "database_name", "BackupType"
    )
    plan = _explain(narrow)
    # pruned scan of backupset should NOT read every column: the narrow
    # projection needs database_name/type plus join keys; encryption
    # columns must be pruned out of ReadSchema
    scan_schema = plan.split("ReadSchema")[1][:400]
    assert "encryptor_type" not in scan_schema
    assert "key_algorithm" not in scan_schema


def test_chain_scan_prunes_partitions(spark, tmp_path):
    from sqlbackuphistoryetl_spark.operators.merge import idempotent_append

    target = str(tmp_path / "consolidated")
    df = spark.createDataFrame(consolidated_rows(), schema.CONSOLIDATED)
    idempotent_append(spark, df, target)
    sink = spark.read.parquet(target)
    pruned = sink.filter(F.col("backup_date") == F.lit("2025-01-01"))
    plan = _explain(pruned)
    assert "PartitionFilters" in plan
    assert "backup_date" in plan.split("PartitionFilters")[1][:300]


def _docs(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta {i} eta theta") for i in range(50)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_jaccard_plan_no_cartesian(spark):
    """The inverted-index all-pairs jaccard must never plan an N² join:
    pairs form only through the gram equi-join, and the posting list is
    a persisted (reused) subplan."""
    from sqlbackuphistoryetl_spark.extensions.dedup import ngram_jaccard_all_pairs

    df = ngram_jaccard_all_pairs(_docs(spark), text_col="text", id_col="doc_id")
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan  # posting list materialized once
    assert "BatchEvalPython" not in plan


def test_minhash_lsh_plan_no_cartesian(spark):
    from sqlbackuphistoryetl_spark.extensions.dedup import minhash_lsh_candidates

    df = minhash_lsh_candidates(_docs(spark), text_col="text", id_col="doc_id")
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # band join is an equi-join
    assert "BatchEvalPython" not in plan


def test_simhash_plan_no_cartesian(spark):
    from sqlbackuphistoryetl_spark.extensions.dedup import simhash_buckets

    df = simhash_buckets(_docs(spark), text_col="text", id_col="doc_id")
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_brute_force_topk_broadcasts_queries(spark):
    """Exact ANN is a deliberate broadcast cross join: queries (small)
    broadcast against the corpus — the plan must show the broadcast,
    never a shuffle cartesian."""
    from sqlbackuphistoryetl_spark.extensions.similarity import brute_force_topk

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(30)], ["vec_id", "embedding"]
    )
    df = brute_force_topk(vecs, vecs.limit(2), k=3)
    plan = _explain(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_rp_lsh_plan_equi_join(spark):
    from sqlbackuphistoryetl_spark.extensions.similarity import rp_lsh_topk

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3), 0.5]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    df = rp_lsh_topk(vecs, vecs.limit(2), k=3, planes=8, band_bits=4, dims=4)
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # bucket join is equi


def _sample_docs(spark):
    return spark.createDataFrame(
        [(i, "g" if i % 2 else "h", f"text {i}") for i in range(60)],
        ["doc_id", "grp", "text"],
    )


def test_weighted_mix_no_shuffle(spark):
    """The md5-threshold mix is a pure map-side union: zero exchanges,
    zero Python — a rate filter must cost one pass at any scale."""
    from sqlbackuphistoryetl_spark.extensions.sampling import weighted_mix

    df = _sample_docs(spark)
    out = weighted_mix(
        [("a", df.filter(F.col("doc_id") < 30), 0.5),
         ("b", df.filter(F.col("doc_id") >= 30), 0.5)],
        "doc_id",
    )
    plan = _explain(out)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_stratified_sample_single_exchange(spark):
    """Per-stratum top-k shuffles once on the strata key, and the
    planner's partial WindowGroupLimit must sit BEFORE that exchange —
    each input partition ships at most k rows per stratum, so a
    mega-stratum never funnels its full row mass through the shuffle."""
    from sqlbackuphistoryetl_spark.extensions.sampling import stratified_sample

    out = stratified_sample(_sample_docs(spark), ["grp"], 3, "doc_id")
    plan = _explain(out)
    assert plan.count("hashpartitioning(") == 1
    partial = plan.find("WindowGroupLimit")
    exchange = plan.find("Exchange")
    assert 0 <= partial < exchange  # pre-shuffle top-k prune present
    assert "BatchEvalPython" not in plan


def test_token_histogram_partial_agg(spark):
    """The corpus pass must map-side-combine: a partial HashAggregate
    before the exchange, and only one corpus-wide shuffle (the tiny
    bucket-frame window exchange is on the agg output, not the corpus)."""
    from sqlbackuphistoryetl_spark.functions.textfns import token_length_histogram

    out = token_length_histogram(_sample_docs(spark), "text", 10)
    plan = _explain(out)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan


def test_chain_fold_single_shuffle_no_python(spark):
    """The stateful batch twin is one keyed shuffle (the groupBy) plus
    a JVM fold — no Python, no window over the raw events."""
    import datetime as dt
    from decimal import Decimal

    from sqlbackuphistoryetl_spark.streaming.stateful import chain_status_batch

    df = spark.createDataFrame(
        [("S1", "db1", "Full", Decimal(1), Decimal(9),
          dt.datetime(2025, 1, 1, 0, 1))],
        "server_name string, database_name string, BackupType string, "
        "first_lsn decimal(25,0), last_lsn decimal(25,0), "
        "backup_finish_date timestamp",
    )
    plan = _explain(chain_status_batch(df))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_global_sample_k_take_ordered(spark):
    """Exact-k global sample must compile to TakeOrderedAndProject —
    per-partition bounded heap, O(k·partitions) merge — never a global
    sort or a single-task row_number window."""
    from sqlbackuphistoryetl_spark.extensions.sampling import global_sample_k

    out = global_sample_k(_sample_docs(spark), 5, "doc_id")
    plan = _explain(out)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_heavy_hitter_partial_agg_and_topk(spark):
    """Gram counting must map-side-combine (partial + final
    HashAggregate) and the top-k must be TakeOrderedAndProject over the
    vocabulary, not a full sort; the share denominator must not add a
    window over the vocabulary frame."""
    from sqlbackuphistoryetl_spark.functions.textfns import heavy_hitter_ngrams

    out = heavy_hitter_ngrams(_sample_docs(spark), "text", n=2, k=3)
    plan = _explain(out)
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_quantize_profile_broadcast_calibration(spark):
    """The per-dim calibration frame (dims rows) must broadcast back
    onto the exploded components — the corpus side never shuffles for
    that join — and both aggregates must map-side-combine."""
    from sqlbackuphistoryetl_spark.extensions.similarity import (
        scalar_quantize_profile,
    )

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 0.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    plan = _explain(scalar_quantize_profile(df))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_source_matrix_keyed_joins_only(spark):
    """The source-label pulls are keyed equi-joins on the pair ids —
    no cartesian/nested-loop anywhere, no Python."""
    from sqlbackuphistoryetl_spark.extensions.dedup import (
        ngram_jaccard_all_pairs,
        pair_source_matrix,
    )

    docs = _sample_docs(spark).withColumnRenamed("grp", "source")
    pairs = ngram_jaccard_all_pairs(docs, text_col="text", id_col="doc_id")
    plan = _explain(pair_source_matrix(pairs, docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_bucketed_join_shuffle_free(spark, tmp_path):
    """The pay-the-shuffle-once layout: both sides written bucketed +
    sorted on the join key must join with ZERO Exchange (and zero
    Sort beyond the bucket files' own order) — the property that
    amortizes the big-table shuffle across every downstream run."""
    from sqlbackuphistoryetl_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    write_bucketed(left, "bkt_left", str(tmp_path / "l"), ["k"], 8)
    write_bucketed(right, "bkt_right", str(tmp_path / "r"), ["k"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real SMJ so the assertion tests bucketing, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, "bkt_left").join(
            read_bucketed(spark, "bkt_right"), "k"
        )
        plan = _explain(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists bkt_left")
        spark.sql("drop table if exists bkt_right")


def test_sessionize_single_exchange_shared_windows(spark):
    """Both windows and the session aggregate share ONE user_id
    partitioning: exactly one Exchange in the whole plan, no Python."""
    import datetime as dtm

    from sqlbackuphistoryetl_spark.operators.sessionize import session_stats

    ev = spark.createDataFrame(
        [(i, i % 7, dtm.datetime(2024, 1, 1) + dtm.timedelta(minutes=i), 1.0)
         for i in range(100)],
        ["event_id", "user_id", "ts", "value"],
    )
    plan = _explain(session_stats(ev, gap_minutes=30))
    # formatted explain names each node twice (tree line + detail header)
    assert plan.count("Exchange") // 2 == 1
    # lag and the running sum stay on the SAME (user_id, ts, event_id)
    # window spec — two Window nodes (the sum consumes the lag through a
    # projection) but only ONE sort and one exchange feed them both
    assert plan.count("Window") // 2 == 2
    assert plan.count("Sort") // 2 == 1
    assert "BatchEvalPython" not in plan


def test_boilerplate_no_cartesian_partial_agg(spark):
    """Line-df aggregation runs a map-side partial (HashAggregate pair)
    and the heavy-line anti-join is keyed, never a cartesian."""
    from sqlbackuphistoryetl_spark.extensions.curation import (
        remove_boilerplate_lines,
    )

    docs = spark.createDataFrame(
        [(i, f"HEADER\nbody {i}") for i in range(50)], ["doc_id", "text"]
    )
    plan = _explain(remove_boilerplate_lines(docs, min_docs=3))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan


def test_temperature_and_split_map_side_only(spark):
    """After the tiny driver-side count, temperature filtering and split
    assignment are pure map-side expressions — zero Exchange."""
    from sqlbackuphistoryetl_spark.extensions.curation import (
        assign_split,
        temperature_sample,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(60)], ["doc_id", "lang"]
    )
    assert "Exchange" not in _explain(temperature_sample(docs, "lang", 20, "doc_id"))
    assert "Exchange" not in _explain(assign_split(docs, "doc_id"))


def test_cross_contamination_broadcast_bench_no_cartesian(spark):
    """The semantic-decontam band join broadcasts the (tiny) bench side
    and never degenerates to a cartesian; no row-at-a-time Python (the
    vectorized sketch is an ArrowEvalPython node, which is sanctioned)."""
    from sqlbackuphistoryetl_spark.extensions.similarity import (
        embedding_cross_contamination,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = embedding_cross_contamination(
        emb.filter(F.col("vec_id") >= 10), emb.filter(F.col("vec_id") < 10),
        threshold=0.35, planes=32, band_bits=2,
    )
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # Arrow batches only


def test_gate_coarse_filters_push_to_scan(spark):
    """The driver gates compare event times as epoch-µs bigints (a
    computed column Catalyst can't push), so each carries a redundant
    coarse raw-timestamp bound that MUST reach the parquet scan — at
    100 TB that predicate is the row-group skip. Guards q1/j6/p4 plus
    the r5-hardened order/lineitem-date gates (j2/a4)."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    for fn, col in [
        (E.q1_pricing_summary, "l_shipdate"),
        (E.j6_watermark_antijoin_dedup, "ts"),
        (E.p4_watermark_overlap_window, "ts"),
        (E.j2_customers_without_recent_orders, "o_orderdate"),
        (E.a4_min_after_threshold, "l_shipdate"),
    ]:
        plan = _explain(fn(spark, sf))
        assert "PushedFilters" in plan, fn.__name__
        pushed = plan.split("PushedFilters")[1][:400]
        assert col in pushed, f"{fn.__name__}: no pushed bound on {col}: {pushed}"


def test_duplicated_spans_plan_shape(spark):
    """Span dedup must stay O(total tokens): no pair join at all (the
    election is a window function on the win key), no Python, no
    cartesian; exactly two exchanges — the window-key election and the
    per-doc island merge."""
    from sqlbackuphistoryetl_spark.extensions.dedup import duplicated_window_spans

    df = duplicated_window_spans(_docs(spark), window_tokens=3)
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # two hash exchanges: the win-key election and the per-doc island
    # pass (the span groupBy rides the doc_id partitioning — clustering
    # on a key subset satisfies the aggregate's distribution)
    assert plan.count("hashpartitioning(") == 2


def test_semdedup_assignment_is_map_side(spark):
    """SemDeDup's centroid assignment must be a pure map stage (broadcast
    literal argmax, no UDF, no shuffle); the only joins are the cell-keyed
    pair join and the keep anti/left join — equi-joins, never a cartesian."""
    from sqlbackuphistoryetl_spark.extensions.similarity import (
        semdedup_prune,
        strata_centroids,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    # assignment alone (explicit centroids → no collect in the plan path)
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    pruned = semdedup_prune(vecs, threshold=0.9, centroids=cents)
    plan = _explain(pruned)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    # strata quantizer is ONE aggregation (sort-based: min_by carries an
    # array-typed buffer, which hash agg doesn't support) with a single
    # exchange — no window, no join, no Python
    cplan = _explain(strata_centroids(vecs, 4))
    assert "Aggregate" in cplan and "Window" not in cplan
    assert cplan.count("hashpartitioning(") == 1
    assert "Join" not in cplan
    assert "BatchEvalPython" not in cplan


def test_gopher_flags_single_pass_no_shuffle(spark):
    """The Gopher composite is one whole-stage-codegen projection: no
    exchange, no Python, no join anywhere in the plan."""
    from sqlbackuphistoryetl_spark.functions.textfns import gopher_quality_flags

    df = _docs(spark).select("doc_id", *gopher_quality_flags("text"))
    plan = _explain(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "codegen id" in plan  # the projection compiles into codegen


def test_gopher_repetition_pandas_backend_single_stage(spark):
    """r13: the default (pandas) backend is ONE mapInPandas stage —
    per-document stats need no gram shuffle at all. The only Exchange
    allowed is the small-corpus spread of the raw text; a second one
    means a shuffle of derived rows regressed in."""
    from sqlbackuphistoryetl_spark.functions.textfns import gopher_repetition

    plan = _explain(gopher_repetition(_docs(spark)))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


def test_gopher_repetition_bounded_shuffles_no_python(spark):
    """The repetition half's JVM backend shuffles exactly where the
    algorithm needs it — gram-frequency election and coverage
    resolution — with no Python and no cartesian anywhere. Exchange
    count is pinned as an upper bound so a regression into a join
    cascade (one shuffle per n-gram order) fails loudly."""
    from sqlbackuphistoryetl_spark.functions.textfns import gopher_repetition

    plan = _explain(
        gopher_repetition(_docs(spark), pin_counted=False, backend="jvm")
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # 9 gram orders must NOT each pay their own exchange
    assert plan.count("Exchange hashpartitioning") <= 8


def test_fineweb_flags_single_pass_no_shuffle(spark):
    """The FineWeb trio is one whole-stage-codegen projection, same
    contract as the Gopher composite."""
    from sqlbackuphistoryetl_spark.functions.textfns import (
        fineweb_quality_flags,
    )

    df = _docs(spark).select("doc_id", *fineweb_quality_flags("text"))
    plan = _explain(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "codegen id" in plan


def test_gopher_repetition_election_is_aggregate_not_window(spark):
    """r7 rework: the (doc, n, gram) frequency election must be a
    map-side-combinable hash aggregate — a Window here would sort every
    gram row inside the shuffle."""
    from sqlbackuphistoryetl_spark.functions.textfns import gopher_repetition

    plan = _explain(
        gopher_repetition(_docs(spark), pin_counted=False, backend="jvm")
    )
    # the only window functions allowed are the lead() gram builders;
    # a count() window here would mean the election regressed from the
    # hash aggregate back to a sorting window
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "lead(" in line, line
            assert "count(" not in line, line
    assert "partial_count" in plan
    # r8 rework: the election no longer carries a collect_list, which
    # forced per-group-buffer ObjectHashAggregateExec (~one group per
    # gram row); a reappearance means the split-aggregate + semi-join
    # coverage shape regressed
    assert "ObjectHashAggregate" not in plan
    assert "collect_list" not in plan


def test_edit_distance_probe_window_is_multi_match_bounded(spark):
    """PassJoin r7: the pair is still found through the tightened
    multi-match-aware probe windows (recall exhaustively covered by
    the brute-force + fuzz tests; the ONLY cross join in the plan is
    the deliberate tiny-string bucket, bounded at <= 2d chars)."""
    from sqlbackuphistoryetl_spark.extensions.dedup import edit_distance_join

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrst"), (2, "abcdefghijklmnopqrsu")],
        "doc_id long, text string",
    )
    out = edit_distance_join(docs, max_dist=3)
    rows = out.collect()
    assert [(r["id_a"], r["id_b"], r["ed"]) for r in rows] == [(1, 2, 1)]


def test_r8_codec_gates_plan_shapes(spark):
    """The r8 codec gates must stay map-side: each gate's ONLY
    exchange is its deliberate repartition (Python-bound codec work
    must spread across cores — since 754a9b2 the AVI gate fans out
    too), and neither plan contains a join or row-at-a-time Python."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    jpeg = _explain(E.multimodal_jpeg_fingerprint(spark, sf))
    # exactly one Exchange NODE (the explicit repartition; formatted
    # output prints each node twice — tree + detail)
    assert jpeg.count("+- Exchange") == 1, jpeg
    avi = _explain(E.multimodal_avi_frames(spark, sf))
    assert avi.count("+- Exchange") == 1, avi
    for plan in (jpeg, avi):
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan  # Arrow mapInPandas only
        assert "CartesianProduct" not in plan


def test_minhash_index_query_plan_shape(spark, tmp_path):
    """The post-compact index screen must be a band/bucket EQUI-join
    against the stored entries — no cartesian, no broadcast-NL, and
    the incoming side is the only side that gets re-hashed (the index
    side is a parquet scan)."""
    from sqlbackuphistoryetl_spark.extensions.dedup_index import (
        query_minhash_index,
        write_minhash_index,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text") for i in range(20)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    write_minhash_index(docs, path, num_hashes=8, bands=4, shingle_len=3)
    plan = _explain(
        query_minhash_index(spark, docs.limit(5), path, min_est_jaccard=0.1)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan parquet" in plan  # stored side is the index files
    assert "BatchEvalPython" not in plan


def test_r9_codec_gates_plan_shapes(spark):
    """The r9 codec gates keep the r8 discipline: ONE exchange (the
    deliberate pre-Python repartition), no join, Arrow-only Python."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    for name in (
        "multimodal_gif_fingerprint",
        "multimodal_tiff_fingerprint",
        "multimodal_flac_audio",
        "media_info_mixed",
        "image_exif_triage",
    ):
        plan = _explain(E._FUNCS[name](spark, sf))
        assert plan.count("+- Exchange") == 1, (name, plan)
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_r9_jvm_gates_have_no_python(spark):
    """html_extract_text / url_dedup_domain_stats / sentence_split are
    pure JVM expression chains: zero Python eval nodes; the sentence
    explode is map-side (no exchange), the URL rollup pays exactly its
    one groupBy exchange."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    html = _explain(E._FUNCS["html_extract_text"](spark, sf))
    assert "EvalPython" not in html and "Exchange" not in html

    sent = _explain(E._FUNCS["sentence_split_stats"](spark, sf))
    assert "EvalPython" not in sent and "Exchange" not in sent
    assert "Generate" in sent  # the posexplode

    url = _explain(E._FUNCS["url_dedup_domain_stats"](spark, sf))
    assert "EvalPython" not in url
    # count(distinct) plans the standard two-phase: one exchange for
    # the distinct, one for the domain rollup — and nothing more
    assert url.count("+- Exchange") == 2
