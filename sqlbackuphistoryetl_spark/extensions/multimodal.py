"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a content_type.
Decode/feature-extraction runs as Arrow-batched pandas iterators
(``mapInPandas``) — the only place Python touches data, and it touches
whole columnar batches, never rows. The actual codec calls are STUBBED
(image/audio libraries are not in this container): ``decode_image``
raises NotImplementedError behind a clearly-marked gate, while the
Spark-side plumbing — schema, batch iteration, deterministic metadata —
is real and tested.

Scale notes: payload partitions should be sized by bytes
(spark.sql.files.maxPartitionBytes), not row count; metadata extraction
is embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_METADATA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("content_type", StringType(), True),
        StructField("byte_len", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("decode_status", StringType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB — image codecs are not available in this environment.

    Real implementation would Pillow/torchvision-decode the payload;
    the surrounding mapInPandas plumbing is the tested part.
    """
    raise NotImplementedError("image decode stub: codec libraries not installed")


def extract_payload_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary, content_type) → typed metadata.

    Arrow-batched; each pandas batch computes byte length + sha256 and
    records whether a real decoder exists for the content type.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_type": pdf["content_type"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else None),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "decode_status": pdf["content_type"].map(
                        lambda ct: "ok" if ct and ct.startswith("text/") else "stubbed"
                    ),
                }
            )

    return df.mapInPandas(_batches, PAYLOAD_METADATA)
