"""Property-based tests (SURVEY §5.4): generated LSN chains → the
planner's invariants must hold for ANY valid history."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark import schema
from sqlbackuphistoryetl_spark.plans.chain_all import restore_plan_all

B = Decimal(10) ** 22
T0 = dt.datetime(2025, 3, 1, 0, 0, 0)


@st.composite
def backup_history(draw):
    """A random but VALID chain for one database: Full at LSN 0, then a
    random mix of fulls/diffs/contiguous logs; random stripe counts."""
    rows = []
    log_id = 1
    # One LSN stream (the database's). Fulls/diffs snapshot the stream's
    # current position WITHOUT breaking the log chain: each log backup
    # spans [previous log's end, current position] — contiguous with the
    # previous LOG even when fulls/diffs happened in between (SQL Server
    # semantics: only log backups consume the log).
    lsn = 0            # stream position (advances on every event)
    log_chain_end = 0  # end of the last log backup
    last_full_lsn = None
    t = T0
    n_events = draw(st.integers(min_value=1, max_value=14))
    for _ in range(n_events):
        kind = draw(st.sampled_from(["Full", "Diff", "Log", "Log", "Log"]))
        if last_full_lsn is None:
            kind = "Full"
        stripes = draw(st.integers(min_value=1, max_value=3))
        copy_only = kind == "Full" and draw(st.booleans()) and last_full_lsn is not None
        t += dt.timedelta(minutes=draw(st.integers(min_value=5, max_value=120)))
        lsn += draw(st.integers(min_value=1, max_value=40))
        if kind == "Full":
            first, last = max(0, lsn - 5), lsn
            if not copy_only:
                last_full_lsn = last
        elif kind == "Diff":
            first, last = last_full_lsn, lsn
        else:
            first, last = log_chain_end, lsn
            log_chain_end = lsn
        for s in range(stripes):
            rows.append(
                dict(
                    LogID=log_id,
                    database_name="dbX",
                    BackupType=kind,
                    physical_device_name=f"X:\\bk\\{kind}_{last}_{s}.bak",
                    backup_start_date=t,
                    backup_finish_date=t + dt.timedelta(minutes=2),
                    server_name="SRV1",
                    ag_name=None,
                    recovery_model="FULL",
                    first_lsn=B + first,
                    last_lsn=B + last,
                    UncompressedSizeMB=10,
                    CompressedSizeMB=5,
                    is_copy_only=copy_only,
                    encryptor_type=None,
                    key_algorithm=None,
                    device_type=2,
                    position=1,
                    DBFileInformation=None,
                )
            )
            log_id += 1
    pit = T0 + dt.timedelta(minutes=draw(st.integers(min_value=30, max_value=2000)))
    return rows, pit


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(backup_history())
def test_restore_plan_invariants(spark, case):
    rows, pit = case
    hist = spark.createDataFrame(rows, schema.CONSOLIDATED)
    fulls_before = [
        r for r in rows
        if r["BackupType"] == "Full" and r["backup_start_date"] <= pit
    ]
    plan = restore_plan_all(hist, pit).orderBy("seq").collect()

    if not fulls_before:
        assert plan == []
        return
    assert plan, "a full exists before PIT ⇒ plan must not be empty"

    # starts with a Full, then ≤1 Diff, then Logs
    kinds = [r["BackupType"] for r in plan]
    assert kinds[0] == "Full"
    assert kinds.count("Full") == 1
    assert kinds.count("Diff") <= 1
    if "Diff" in kinds:
        assert kinds[1] == "Diff"

    # LSNs strictly increase along the chain; each step starts at or
    # before the previous step's end (restorability)
    lsns = [r["last_lsn"] for r in plan]
    assert lsns == sorted(lsns) and len(set(lsns)) == len(lsns)
    for prev, cur in zip(plan, plan[1:]):
        assert cur["first_lsn"] <= prev["last_lsn"]
        assert cur["last_lsn"] > prev["last_lsn"]

    # the chosen full is the LATEST eligible one
    best_full = max(r["last_lsn"] for r in fulls_before)
    assert plan[0]["last_lsn"] == best_full

    # logs cover through the PIT when log backups continue past it:
    # at most one plan log STARTS after the PIT (the tail)
    post_pit_logs = [
        r for r in plan
        if r["BackupType"] == "Log" and r["backup_start_date"] > pit
    ]
    assert len(post_pit_logs) <= 1


# ---------------------------------------------------- curation invariants


@st.composite
def random_corpus(draw):
    """Random small corpus: doc texts over a tiny alphabet with newlines
    so boilerplate/line structure actually arises."""
    n = draw(st.integers(min_value=1, max_value=12))
    line = st.text(alphabet="ab c", min_size=0, max_size=8)
    docs = []
    for i in range(n):
        n_lines = draw(st.integers(min_value=1, max_value=5))
        docs.append((i, "\n".join(draw(line) for _ in range(n_lines))))
    return docs


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=random_corpus())
def test_boilerplate_invariants(spark, case):
    """For ANY corpus: kept+removed == original line count, clean lines
    are a subsequence of the original lines, and removed lines' trimmed
    forms appear in ≥ min_docs distinct docs."""
    from sqlbackuphistoryetl_spark.extensions.curation import (
        remove_boilerplate_lines,
    )

    df = spark.createDataFrame(case, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df, min_docs=2).collect()}
    heavy = {}
    for _, text in case:
        for ln in {l.strip() for l in text.split("\n")}:
            if ln:
                heavy[ln] = heavy.get(ln, 0) + 1
    for doc_id, text in case:
        orig = text.split("\n")
        r = out[doc_id]
        assert r["kept_lines"] + r["removed_lines"] == len(orig)
        if r["kept_lines"] == 0:
            assert r["clean_text"] == ""
            continue
        # ''.split('\n') == [''] — one kept empty line round-trips as ''
        clean = r["clean_text"].split("\n")
        # subsequence check
        it = iter(orig)
        assert all(any(line == o for o in it) for line in clean)
        # every dropped non-empty line is genuinely heavy
        removed = list(orig)
        for line in clean:
            removed.remove(line)
        for line in removed:
            assert heavy.get(line.strip(), 0) >= 2


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 500), st.integers(1, 50)),
    min_size=1, max_size=40))
def test_token_budget_equals_naive(spark, rows):
    """For ANY (quality, tokens) corpus the distributed prefix-sum
    selection equals the single-window SQL definition."""
    from sqlbackuphistoryetl_spark.extensions.curation import (
        select_token_budget,
    )

    data = [(i, q, t) for i, (g, q, t) in enumerate(rows)]
    df = spark.createDataFrame(data, ["doc_id", "q", "n_tok"])
    budget = sum(t for _, _, t in data) // 2
    got = {(r["doc_id"], r["cum_tokens"])
           for r in select_token_budget(df, budget, "n_tok", "q", "doc_id").collect()}
    acc, want = 0, set()
    for _, q, t, i in sorted(((-q, None, t, i) for i, q, t in data)):
        pass
    # naive python walk in (q desc, doc_id) order
    acc = 0
    for i, q, t in sorted(data, key=lambda r: (-r[1], r[0])):
        acc += t
        if acc <= budget:
            want.add((i, acc))
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(0, 6), st.integers(-1000, 1000)),
    min_size=1, max_size=60),
    buckets=st.integers(1, 8))
def test_salted_agg_equals_plain(spark, rows, buckets):
    """For ANY (key, value) multiset and ANY bucket count the two-stage
    salted aggregation equals the plain one-stage group-by on every
    algebraic op — the merge identity sum∘sum == sum, sum∘count ==
    count, min∘min == min, max∘max == max holds regardless of how the
    salt splits a key's rows."""
    from collections import defaultdict

    from sqlbackuphistoryetl_spark.operators.skew import salted_agg

    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["k", "v", "rid"])
    got = {
        r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
        for r in salted_agg(
            df,
            ["k"],
            [("v", "sum", "s"), ("v", "count", "n"),
             ("v", "min", "lo"), ("v", "max", "hi")],
            buckets=buckets,
            salt_col="rid",
        ).collect()
    }
    want = defaultdict(list)
    for k, v, _ in data:
        want[k].append(v)
    assert got == {
        k: (sum(vs), len(vs), min(vs), max(vs)) for k, vs in want.items()
    }


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10_000), n=st.integers(20, 60))
def test_ivf_full_probe_equals_brute_force(spark, seed, n, tmp_path_factory):
    """At full probe the persisted-index pipeline (build → probe) must
    reproduce exact brute-force top-k for ANY corpus: cells partition
    the corpus, so assignment + cell join + re-rank is lossless."""
    import random

    from sqlbackuphistoryetl_spark.extensions.similarity import (
        brute_force_topk,
        ivf_build_index,
        ivf_probe_index,
        sampled_centroids,
    )

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = sampled_centroids(vecs, 5)
    path = str(tmp_path_factory.mktemp("ivf_prop") / "idx")
    ivf_build_index(vecs, path, centroids=cents)
    queries = vecs.filter(F.col("vec_id") < 3)
    probe = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_probe_index(
            spark, path, queries, cents, k=3, n_probe=len(cents)
        ).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(vecs, queries, k=3).collect()
    }
    assert probe == exact
