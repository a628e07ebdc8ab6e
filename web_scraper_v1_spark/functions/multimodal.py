"""Multimodal column plumbing: opaque binary payloads + typed metadata.

No reference counterpart (the reference's data plane is flat strings,
SURVEY.md §1.2); this is the media leg of the training-data pipeline layer.
Design per the task brief: image/audio/video payloads are opaque ``binary``
columns with a typed metadata struct; decode / feature-extract run as
Arrow-batched UDFs over ``mapInPandas`` so each Python batch sees a whole
Arrow record batch (real plumbing — schema, partitioning, batch shape —
with the codec itself stubbed, since no media libraries exist in this
container).

* ``decode_media`` raises NotImplementedError for real codecs — the
  clearly-marked stub seam where PIL/ffmpeg would plug in.
* ``fake_decode_features`` is the deterministic stand-in the tests use:
  a hash-derived fixed-size feature vector per payload, so the Spark-side
  contract (schemas, batching, null handling) is fully exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_media(payload: bytes, kind: str):
    """Real-codec seam — image/audio/video decoding requires libraries not
    present in this container. The Spark-side plumbing around this stub is
    real and tested via ``fake_decode_features``."""
    raise NotImplementedError(
        f"no media codec available for kind={kind!r}; "
        "plug PIL/soundfile/ffmpeg in here on a real cluster image"
    )


def _fake_feature_batch(payloads: pd.Series) -> np.ndarray:
    """Deterministic hash-derived features: FEATURE_DIM doubles in [0,1)
    per payload, vectorized over the Arrow batch. Null payload -> NaN row
    (skip-on-error analog, rabbitmq_consumer.go:84-87)."""
    out = np.full((len(payloads), FEATURE_DIM), np.nan)
    for i, p in enumerate(payloads):
        if p is None:
            continue
        b = np.frombuffer(bytes(p), dtype=np.uint8)
        # FEATURE_DIM byte-histogram-ish moments — cheap, deterministic
        chunks = np.array_split(b, FEATURE_DIM) if len(b) else []
        for j in range(FEATURE_DIM):
            if j < len(chunks) and len(chunks[j]):
                out[i, j] = float(chunks[j].sum() % 1000) / 1000.0
            else:
                out[i, j] = 0.0
    return out


def extract_features(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: whole-Arrow-batch iteration, stable
    output StructType, partition-preserving (no shuffle). Set
    ``use_fake=False`` to route through the real-codec seam (raises in this
    container)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_fake:
                feats = _fake_feature_batch(pdf["payload"])
                feat_col = [
                    None if np.isnan(row).all() else row.tolist()
                    for row in feats
                ]
            else:
                feat_col = [
                    decode_media(p, k)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "feature": feat_col,
                }
            )

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: each document's UTF-8 bytes become an
    opaque payload with hash-derived kind + metadata — exercising the
    binary-column path without external data (per FIXTURES.md policy)."""
    # kind keyed by doc_id % 3 (not a hash) so the media fixture — and
    # therefore the whole mapInPandas feature pipeline — is expressible in
    # the DuckDB oracle
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        ((F.col("doc_id") % 3) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(1920)) + 1)
            .cast("int")
            .alias("width"),
            (F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(1080)) + 1)
            .cast("int")
            .alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(300)) + 1)
            .cast("int")
            .alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
