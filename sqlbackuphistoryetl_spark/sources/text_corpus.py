"""JSONL corpus ingest — the source-format twin of
``extensions/sharding.py: write_sharded_jsonl``.

Training-data pipelines overwhelmingly interchange corpora as JSONL
(one JSON document per line, sharded files). Two rules make that safe
at 100 TB:

1. **Schema is declared, never inferred.** Inference is a full extra
   pass over the corpus AND non-deterministic under schema drift (the
   sampled files decide the types) — the same rule the ETL's msdb
   extract follows (schema.py: fixed StructTypes, no inference).
2. **Corrupt lines are quarantined, not dropped silently.** Web-scale
   JSONL always contains breakage (truncated uploads, encoding bugs).
   ``FAILFAST`` (default) aborts loudly; ``PERMISSIVE`` routes bad
   lines into a corrupt-record column the caller splits off with
   :func:`split_corrupt` and writes to a quarantine sink — dropped
   rows are the one thing a curation pipeline must never be silent
   about.

Scale shape: Spark's json source is splittable per file and
parallelizes across shard files; with a declared schema the reader
does a single pass, pruned to referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Read a JSONL corpus under ``path`` with the DECLARED ``schema``.

    ``mode``: ``FAILFAST`` (default — any malformed line fails the
    read) or ``PERMISSIVE`` (malformed lines surface in
    ``_corrupt_record``; split with :func:`split_corrupt`).

    Sharded layouts (``shard=N/part-*.json``, the write_sharded_jsonl
    shape) are handled by Spark's partition discovery, which supplies
    ``shard`` as a partition column — deliberately NOT
    ``recursiveFileLookup``, which would disable that discovery.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.names:
        schema = schema.add(CORRUPT_COL, StringType())
    reader = (
        spark.read.schema(schema)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("encoding", "UTF-8")
    )
    return reader.json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) split of a PERMISSIVE read. ``good`` drops
    the corrupt column; ``quarantine`` keeps only the raw bad lines.
    One cached scan feeds both splits; the cache is OWNED by the
    ``cachereg`` generation of this function (r6 advice: the brief
    3-tuple signature pushed ``pinned.unpersist()`` onto every
    caller) — the next ``split_corrupt`` call, or
    ``cachereg.release_caches("text_corpus.split_corrupt")``, releases
    it, and an early release only costs the cache benefit, never
    correctness. A Spark subtlety is handled here: referencing ONLY the
    corrupt column of a json scan raises AnalysisException (the reader
    refuses a corrupt-only projection), so the filter runs before the
    projection narrows."""
    from ..extensions import cachereg

    if CORRUPT_COL not in df.columns:
        raise ValueError(f"no {CORRUPT_COL} column — read with mode=PERMISSIVE")
    cachereg.begin("text_corpus.split_corrupt")
    pinned = cachereg.persist("text_corpus.split_corrupt", df)
    good = pinned.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = pinned.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
