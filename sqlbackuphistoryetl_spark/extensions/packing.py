"""Sequence packing for LLM pretraining export (concat-and-chunk).

Pretraining dataloaders consume fixed-length token sequences, not
documents: the corpus is laid out in a stable global order, token
streams are concatenated, and the stream is cut every ``seq_len``
tokens. A document therefore maps to one or more (sequence, slice)
assignments — the exact metadata a distributed tokenizer/export job
needs to write shards without ever materializing the concatenation.

The naive expression of the global token cumsum —
``sum(n_tok) OVER (ORDER BY doc_id)`` with no partition — funnels the
whole corpus through ONE task. ``pack_sequences`` computes the same
answer with the two-phase prefix-sum plan used by
``sharding.global_ordinals``:

1. range-repartition by the (total) document order key;
2. one O(partitions) job collects per-partition TOKEN SUMS (a few
   hundred longs to the driver — bookkeeping, not data);
3. each partition computes its local running sum in a window
   partitioned by the physical partition id (sorts only its own
   range, fully parallel) and adds its broadcast prefix offset.

Cost: one shuffle (the range exchange) + one tiny count job,
regardless of corpus size. The per-doc explode emits exactly
ceil(span/seq_len)+1-ish rows — O(total_tokens / seq_len) output.

All arithmetic is integer (``div``): token offsets exceed 2^53 long
before a 100 TB corpus runs out, so double quotients are wrong here.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions import cachereg


def _prefix_offsets(ranged: DataFrame, weight_col: str) -> Column:
    """Broadcast map _pid -> sum of ``weight_col`` in all earlier
    partitions. One O(partitions) aggregate job."""
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum(weight_col).cast("long").alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0
    if not offsets:
        return F.lit(0).cast("long")
    # one parsed literal map, not 2·p F.lit round-trips (r13; same as
    # sharding.global_ordinals — pids and offsets are exact ints)
    off_map = F.expr(
        "map("
        + ", ".join(f"{int(pid)}, {int(off)}" for pid, off in offsets.items())
        + ")"
    )
    return F.coalesce(off_map[F.col("_pid")], F.lit(0)).cast("long")


def global_cumsum(
    df: DataFrame,
    weight_col: str,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``cum_end`` = running total of ``weight_col`` in
    ``order_cols`` order (inclusive of the current row), without a
    single-task global window. ``order_cols`` must be a TOTAL order.

    The ranged frame is persisted for the call's generation so the
    offset job and the output see the same sampled range boundaries.
    """
    from sqlbackuphistoryetl_spark.extensions.partitioning import (
        adaptive_partitions,
    )

    p = adaptive_partitions(df, num_partitions)
    cachereg.begin("global_cumsum")
    ranged = cachereg.persist(
        "global_cumsum",
        df.repartitionByRange(p, *[F.col(c) for c in order_cols]).withColumn(
            "_pid", F.spark_partition_id()
        ),
    )
    offset = _prefix_offsets(ranged, weight_col)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ranged.withColumn(
        "cum_end", (F.sum(F.col(weight_col)).over(w) + offset).cast("long")
    ).drop("_pid")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    seq_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its (sequence, slice) spans under
    concat-and-chunk packing at ``seq_len`` tokens.

    Output: the input columns plus
      - ``seq_id``    — 0-based fixed-length sequence index,
      - ``tok_begin`` — first token of this doc included in ``seq_id``
                        (offset WITHIN the document, 0-based),
      - ``tok_end``   — exclusive end offset within the document,
      - ``slice_tokens`` — tok_end - tok_begin.

    A document longer than ``seq_len`` spans several sequences (one
    output row per sequence it touches); zero-token documents are
    dropped (they occupy no stream positions).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    b = int(seq_len)
    c = global_cumsum(df, token_col, order_cols, num_partitions)
    # span arithmetic as parsed exprs over one select each instead of a
    # withColumn chain re-analyzing the accumulated plan per column
    # (r14, guide §7.3); identical div/greatest/least integer trees.
    tok = (
        token_col
        if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", token_col)
        else f"`{token_col}`"
    )
    c = c.filter(F.col(token_col) > 0).withColumn(
        "cum_start", F.expr(f"cum_end - CAST({tok} AS LONG)")
    )
    out = c.withColumn(
        "seq_id",
        F.explode(F.expr(f"sequence(cum_start div {b}, (cum_end - 1) div {b})")),
    )
    passthrough = [col for col in out.columns if col not in
                   ("cum_start", "cum_end", "seq_id")]
    return out.selectExpr(
        *passthrough,
        "seq_id",
        f"greatest(CAST(0 AS LONG), seq_id * {b} - cum_start) AS tok_begin",
        f"least(cum_end, (seq_id + 1) * {b}) - cum_start AS tok_end",
        f"(least(cum_end, (seq_id + 1) * {b}) - cum_start) - "
        f"greatest(CAST(0 AS LONG), seq_id * {b} - cum_start) AS slice_tokens",
    )


def materialize_sequences(
    spans: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reassemble the actual packed token streams from ``pack_sequences``
    span metadata — the export terminal that writes training sequences.

    Each span row pulls its document's token slice
    (``tokens[tok_begin:tok_end]``); slices are grouped by sequence and
    concatenated in document order. One join (spans → docs) + one keyed
    aggregate; the collect_list per sequence is bounded by
    seq_len tokens by construction, so the grouped state is O(seq_len)
    regardless of corpus size.

    Output: (seq_id, seq_tokens, seq_text) — seq_tokens == seq_len for
    every sequence except the final remainder.
    """
    toks = docs.select(
        F.col(id_col),
        F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0)).alias("_toks"),
    )
    agg = _reassemble(spans, toks, id_col, "_toks")
    flat = F.flatten(F.transform("_parts", lambda s: s["_piece"]))
    return agg.select(
        "seq_id",
        F.size(flat).alias("seq_tokens"),
        F.concat_ws(" ", flat).alias("seq_text"),
    )


def _reassemble(
    spans: DataFrame, tokens_df: DataFrame, id_col: str, tokens_col: str
) -> DataFrame:
    """Shared slice-join-sort core of the sequence materializers:
    attach each span's document token array, cut the span's slice, and
    collect slices per sequence sorted by document id. Returns
    (seq_id, _parts) with ``_parts`` an array of (_d, _piece) structs —
    array_sort on array<struct> orders by the leading field (_d),
    unique per sequence, so the concat order is total.

    When ``spans`` already carries ``tokens_col`` (pack_sequences
    passes its input columns through, and the materializers' contract
    is that ``tokens_df`` IS the frame the spans were packed from),
    the carried column is sliced directly — re-joining ``tokens_df``
    would recompute its whole lineage a second time for values every
    span row already holds (r13: bpe_packed_export re-ran the corpus
    encode through the join; 3.9 s → 2.4 s with the join gone)."""
    piece = F.slice(
        F.col(tokens_col),
        F.col("tok_begin") + 1,
        F.col("tok_end") - F.col("tok_begin"),
    )
    if tokens_col in spans.columns:
        per = spans.select(
            "seq_id", F.col(id_col).alias("_d"), piece.alias("_piece")
        )
    else:
        per = (
            spans.join(
                tokens_df.select(F.col(id_col), F.col(tokens_col)), id_col
            )
            .select("seq_id", F.col(id_col).alias("_d"), piece.alias("_piece"))
        )
    return per.groupBy("seq_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_d"), F.col("_piece")))
        ).alias("_parts")
    )


def materialize_id_sequences(
    spans: DataFrame,
    encoded: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "token_ids",
) -> DataFrame:
    """:func:`materialize_sequences` over ENCODED corpora — slices
    integer token-id arrays (e.g. :func:`~..bpe.bpe_encode_corpus`
    output) instead of re-tokenizing text, producing the fixed-length
    id streams a training job memory-maps. Same shape: one join
    (spans → encoded), one seq-keyed aggregate whose grouped state is
    bounded by seq_len ids.

    Output: (seq_id, seq_tokens, seq_ids) — ``seq_ids`` is the packed
    ``array<long>`` stream, full ``seq_len`` everywhere but the final
    remainder sequence.
    """
    agg = _reassemble(spans, encoded, id_col, tokens_col)
    flat = F.flatten(F.transform("_parts", lambda s: s["_piece"]))
    return agg.select(
        "seq_id",
        F.size(flat).alias("seq_tokens"),
        flat.alias("seq_ids"),
    )
