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
    ArrayType,
    BinaryType,
    FloatType,
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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB — image codecs are not available in this environment.

    Real implementation: decode → resample to (width, height) → re-encode.
    """
    raise NotImplementedError("image resize stub: codec libraries not installed")


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("content_type", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decoder", StringType(), True),
    ]
)


def decode_and_featurize(df: DataFrame, feature_dim: int = 16) -> DataFrame:
    """(doc_id, payload, content_type) → fixed-dim feature vectors.

    Arrow-batched ``mapInPandas``; the real pipeline would run an image/
    audio encoder here. This container has no codec libraries, so the
    decode step is a DETERMINISTIC FAKE (clearly marked): features are
    derived from the payload's sha256 digest, normalized to [-1, 1] —
    stable across runs/executors, exercising the real schema, batch
    iteration, and downstream ANN compatibility (array<float> matches
    extensions.similarity's vector column contract).
    """

    def _feat(digest: bytes) -> list[float]:
        # DETERMINISTIC FAKE decode: digest bytes → [-1, 1] floats.
        reps = (feature_dim + len(digest) - 1) // len(digest)
        raw = (digest * reps)[:feature_dim]
        return [b / 127.5 - 1.0 for b in raw]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(
                lambda b: _feat(hashlib.sha256(b).digest()) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_type": pdf["content_type"],
                    "feature": feats,
                    "decoder": pdf["content_type"].map(
                        lambda ct: "fake-sha256" if ct else None
                    ),
                }
            )

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_index", LongType(), False),
        StructField("frame_bytes", BinaryType(), True),
        StructField("n_frames", LongType(), True),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 64, stride: int = 2
) -> DataFrame:
    """Video-style frame sampling: one payload row fans out to every
    ``stride``-th frame. Real codecs would seek keyframes; here frames
    are a DETERMINISTIC FAKE (fixed-size byte slices) so the fan-out
    shape — 1→N rows inside ``mapInPandas``, no driver involvement, no
    shuffle — is real and testable. Output partitioning inherits the
    input's; size input partitions by bytes, not rows, because the
    expansion factor is per-payload."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, totals = [], [], [], []
            for r in pdf.itertuples(index=False):
                if r.payload is None:
                    continue
                n_frames = (len(r.payload) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    ids.append(r.doc_id)
                    idxs.append(fi)
                    frames.append(
                        bytes(r.payload[fi * frame_size : (fi + 1) * frame_size])
                    )
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(frames, dtype="object"),
                    "n_frames": pd.Series(totals, dtype="int64"),
                }
            )

    return df.mapInPandas(_batches, FRAME_SCHEMA)


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
