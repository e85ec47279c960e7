"""End-to-end training-corpus curation: the extension operators
composed into the standard pipeline order, one call from raw documents
to packed, sharded training data.

Stage order follows the published web-corpus recipes (C4/CCNet/
RefinedWeb-style): exact dedup before near-dup (cheap first), structure
cleaning before quality scoring (scores shouldn't see boilerplate),
sampling/mixing after filtering (rates apply to what survives), split
assignment before packing (a sequence never straddles splits), export
last.

Every stage is the already-oracle-gated operator from ``extensions/``;
this module adds only composition and a stage-count report. Laziness is
preserved across stages — Spark fuses adjacent map-side stages into
shared scans, and the expensive barriers (near-dup pair join, prefix
sums) appear exactly once each. The per-stage counts ride on ONE
``count`` action per stage boundary; pass ``report=False`` to skip them
entirely and keep the whole pipeline one job graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.clustering import dedup_representatives
from sqlbackuphistoryetl_spark.extensions.curation import (
    assign_split,
    cap_per_group,
    remove_boilerplate_lines,
    temperature_sample,
    trim_outliers,
)
from sqlbackuphistoryetl_spark.extensions.dedup import (
    minhash_lsh_candidates,
    shingle_jaccard_verify,
)
from sqlbackuphistoryetl_spark.extensions.packing import pack_sequences
from sqlbackuphistoryetl_spark.functions.textfns import whitespace_token_count


@dataclass
class CurationReport:
    stage_counts: dict[str, int] = field(default_factory=dict)

    def funnel(self) -> list[tuple[str, int]]:
        return list(self.stage_counts.items())


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
    near_dup_jaccard: float = 0.8,
    boilerplate_min_docs: int = 3,
    outlier_k: float = 3.0,
    per_source_cap: int | None = None,
    temperature_target: int | None = None,
    seq_len: int = 1024,
    report: bool = True,
) -> tuple[DataFrame, DataFrame, CurationReport]:
    """Run the full curation pipeline. Returns
    ``(curated_docs, packed_spans, report)``:

    1. exact dedup (md5 groupBy, min-id survivor);
    2. near-dup keep-one (MinHash+LSH candidates → exact shingle-Jaccard
       re-score ≥ threshold → connected components → min-id survivor);
    3. boilerplate-line removal (text replaced by the cleaned form);
    4. per-language robust length-outlier trim (median ± k·MAD);
    5. optional per-source cap (quality = token count, best-first);
    6. optional α=0.5 temperature sampling over language;
    7. train/val/test hash split;
    8. concat-and-chunk sequence packing of the train split.
    """
    rep = CurationReport()

    def _mark(name: str, df: DataFrame, pin: bool = False) -> DataFrame:
        if report:
            # ``pin`` marks an expensive barrier: with per-stage counts
            # on, every later count would re-run it from scratch —
            # checkpoint once so the counts downstream read the
            # materialized stage instead. Two pins: the near-dup pair
            # join (measured ~3× on the composite gate) and the
            # boilerplate rewrite (r5 verdict task 4 — its join output
            # otherwise recomputes stages 1-3 for each of the 4+ counts
            # after it). With report=False nothing is materialized and
            # the pipeline stays one lazy job graph.
            if pin:
                df = df.localCheckpoint(eager=True)
            rep.stage_counts[name] = df.count()
        return df

    _mark("input", docs)

    # 1. exact dedup — min-id per content hash, one hash-agg + semi-join
    h = F.md5(F.col(text_col))
    keep_ids = (
        docs.select(F.col(id_col), h.alias("_h"))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    docs = _mark("exact_dedup", docs.join(keep_ids, id_col, "left_semi"))

    # 2. near-dup keep-one
    cand = minhash_lsh_candidates(docs, text_col=text_col, id_col=id_col).select(
        "id_a", "id_b"
    )
    pairs = shingle_jaccard_verify(docs, cand).filter(
        F.col("jaccard") >= near_dup_jaccard
    )
    docs = _mark(
        "near_dedup", dedup_representatives(docs, pairs, id_col=id_col), pin=True
    )

    # 3. boilerplate lines out; text becomes the cleaned form
    cleaned = remove_boilerplate_lines(
        docs, text_col=text_col, id_col=id_col, min_docs=boilerplate_min_docs
    ).select(id_col, "clean_text")
    docs = _mark(
        "boilerplate",
        docs.drop(text_col).join(cleaned, id_col).withColumnRenamed(
            "clean_text", text_col
        ),
        pin=True,
    )

    # 4. token counts once — reused by every later stage
    docs = docs.withColumn("n_tok", whitespace_token_count(text_col))
    docs = _mark(
        "outlier_trim", trim_outliers(docs, lang_col, "n_tok", k=outlier_k)
    )

    # 5./6. volume shaping
    if per_source_cap is not None:
        # third pin (r13): everything after the cap (split count, span
        # count, and the caller's materialization of the returned docs)
        # otherwise re-runs token-count + trim + the cap window from the
        # boilerplate checkpoint once per consumer — three recomputes of
        # two aggregation barriers for a frame this stage already holds
        docs = _mark(
            "source_cap",
            cap_per_group(docs, source_col, per_source_cap, ["-n_tok", id_col]),
            pin=True,
        )
    if temperature_target is not None:
        docs = _mark(
            "temperature",
            temperature_sample(docs, lang_col, temperature_target, id_col),
        )

    # 7./8. split, pack the train side
    docs = assign_split(docs, id_col)
    train = docs.filter(F.col("split") == "train")
    spans = pack_sequences(train, "n_tok", [id_col], seq_len=seq_len)
    if report:
        rep.stage_counts["train_split"] = train.count()
        rep.stage_counts["packed_spans"] = spans.count()
    return docs, spans, rep
