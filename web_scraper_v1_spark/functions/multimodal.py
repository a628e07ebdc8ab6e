"""Multimodal column plumbing: opaque binary payloads + typed metadata.

No reference counterpart (the reference's data plane is flat strings,
SURVEY.md §1.2); this is the media leg of the training-data pipeline layer.
Design per the task brief: image/audio/video payloads are opaque ``binary``
columns with a typed metadata struct; decode / feature-extract run as
Arrow-batched UDFs over ``mapInPandas`` so each Python batch sees a whole
Arrow record batch (real plumbing — schema, partitioning, batch shape —
with the codec itself stubbed, since no media libraries exist in this
container).

* ``decode_media`` REALLY decodes the two containers parseable without
  media libraries — PPM P6 images and RIFF/PCM16 WAV audio (pure
  Python/numpy) — and raises NotImplementedError for every other codec:
  the clearly-marked seam where PIL/soundfile/ffmpeg would plug in.
* ``synthesize_real_media_from_documents`` emits VALID containers derived
  from document text, so the ``use_fake=False`` path runs end-to-end and
  is oracle-gated (``multimodal_real_decode``).
* ``fake_decode_features`` remains the codec-free stand-in:
  a hash-derived fixed-size feature vector per payload, so the Spark-side
  contract (schemas, batching, null handling) is exercised independently
  of any container format.
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


def _decode_ppm(payload: bytes) -> list[float]:
    """Pure-Python PPM (P6) decoder -> FEATURE_DIM moment vector. Feature
    math is exact-integer sums followed by ONE division each, so a SQL
    twin replays it bit-identically (oracle-parity rule: never chain
    transcendentals or reassociate float sums across engines):
    [w/1e4, h/1e4, sumR/(n*255), sumG/(n*255), sumB/(n*255),
     min/255, max/255, 0...]."""
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> pixels
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h
    px = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=i)
    sums = [int(px[c::3].sum(dtype=np.int64)) for c in range(3)]
    feat = [0.0] * FEATURE_DIM
    feat[0] = w / 10000.0
    feat[1] = h / 10000.0
    for c in range(3):
        feat[2 + c] = sums[c] / (n * 255.0)
    feat[5] = int(px.min()) / 255.0
    feat[6] = int(px.max()) / 255.0
    return feat


def _decode_wav(payload: bytes) -> list[float]:
    """Pure-Python WAV (RIFF/PCM16 mono) decoder -> FEATURE_DIM moment
    vector, same exact-integer discipline as ``_decode_ppm``:
    [rate/1e5, n/1e6, sum/(n*32768), min/32768, max/32768, 0...]."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, samples = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV format fmt={fmt} ch={channels} "
                    f"bits={bits} (PCM16 mono only)"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    n = len(samples)
    feat = [0.0] * FEATURE_DIM
    feat[0] = rate / 100000.0
    feat[1] = n / 1e6
    if n:
        feat[2] = int(samples.sum(dtype=np.int64)) / (n * 32768.0)
        feat[3] = int(samples.min()) / 32768.0
        feat[4] = int(samples.max()) / 32768.0
    return feat


def decode_media(payload: bytes, kind: str) -> list[float]:
    """Real-codec path: container-sniffed, dependency-free decoders for
    the two formats parseable without media libraries — PPM P6 images and
    RIFF/PCM16 WAV audio — returning the FEATURE_DIM moment vector.
    Payloads in any other container (JPEG, MP3, MP4, ...) still raise
    NotImplementedError: those genuinely need PIL/soundfile/ffmpeg, which
    this container does not ship — that seam is unchanged."""
    if payload.startswith(b"P6"):
        return _decode_ppm(payload)
    if payload.startswith(b"RIFF"):
        return _decode_wav(payload)
    raise NotImplementedError(
        f"no media codec available for kind={kind!r} "
        f"(magic={bytes(payload[:4])!r}); PPM-P6 and WAV-PCM16 decode "
        "natively, everything else needs PIL/soundfile/ffmpeg on a real "
        "cluster image"
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
                # per-payload codec calls (real decoders are per-file);
                # the batch axis stays Arrow — null payload skips, the
                # consumer's log-and-skip analog
                feat_col = [
                    None if p is None else decode_media(bytes(p), k)
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


# real-container fixture geometry (small on purpose: the point is valid
# containers through the real parse path, not bulk)
PPM_W, PPM_H = 8, 4          # 96 pixel bytes
WAV_RATE, WAV_N = 16000, 64  # 64 PCM16 samples


def _cycled_bytes(text: str, n: int) -> bytes:
    b = text.encode("utf-8")
    reps = -(-n // len(b))
    return (b * reps)[:n]


def ppm_from_text(text: str) -> bytes:
    """Valid P6 container whose pixel bytes are the document's bytes
    cycled to fill PPM_W x PPM_H x 3 — deterministic and replayable in
    SQL (corpus text is ASCII, so byte i == ascii(char i))."""
    head = f"P6\n{PPM_W} {PPM_H}\n255\n".encode()
    return head + _cycled_bytes(text, PPM_W * PPM_H * 3)


def wav_from_text(text: str) -> bytes:
    """Valid RIFF/WAVE PCM16-mono container with WAV_N samples derived
    from the document's bytes: sample j = (byte j - 128) * 256."""
    b = np.frombuffer(_cycled_bytes(text, WAV_N), dtype=np.uint8)
    samples = ((b.astype(np.int16) - 128) * 256).astype("<i2").tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + WAV_RATE.to_bytes(4, "little")
        + (WAV_RATE * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits
    )
    data = b"data" + len(samples).to_bytes(4, "little") + samples
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synthesize_real_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-container media fixture: even doc_ids become P6
    images, odd doc_ids become WAV-PCM16 clips, payload bytes derived
    from the document text (``ppm_from_text`` / ``wav_from_text``). The
    containers are valid, so ``extract_features(use_fake=False)`` parses
    them with the real decoders end-to-end — and the byte derivation is
    simple enough that a DuckDB oracle replays the decoded features
    exactly (the ``multimodal_real_decode`` registry query)."""

    @F.pandas_udf(T.BinaryType())
    def _payload(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [
                ppm_from_text(t) if d % 2 == 0 else wav_from_text(t)
                for d, t in zip(doc_id, text)
            ]
        )

    kind = F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(
        F.lit("audio")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        _payload(F.col("doc_id"), F.col("text")).alias("payload"),
        F.struct(
            F.lit(PPM_W).cast("int").alias("width"),
            F.lit(PPM_H).cast("int").alias("height"),
            F.lit(WAV_RATE).cast("int").alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("image/x-portable-pixmap"))
            .otherwise(F.lit("audio/wav"))
            .alias("mime"),
        ).alias("meta"),
    )


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
