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


def _parse_ppm(
    payload: bytes, offset: int = 0
) -> tuple[int, int, np.ndarray, int]:
    """Real P6 header + pixel parse starting at ``offset`` (supports
    concatenated-frame video containers): returns (w, h, pixel bytes as a
    flat uint8 array, offset just past this frame). Raises on anything
    that is not a maxval-255 P6 frame."""
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> pixels
    if payload[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens: list[int] = []
    i = offset + 2
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
    if len(payload) < i + 3 * n:
        raise ValueError("truncated P6 pixel data")
    px = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=i)
    return w, h, px, i + 3 * n


def _decode_ppm(payload: bytes) -> list[float]:
    """Pure-Python PPM (P6) decoder -> FEATURE_DIM moment vector. Feature
    math is exact-integer sums followed by ONE division each, so a SQL
    twin replays it bit-identically (oracle-parity rule: never chain
    transcendentals or reassociate float sums across engines):
    [w/1e4, h/1e4, sumR/(n*255), sumG/(n*255), sumB/(n*255),
     min/255, max/255, 0...]."""
    w, h, px, _end = _parse_ppm(payload)
    n = w * h
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


# --------------------------------------------------------------------------
# Image resize + video frame sampling (round 5): the remaining two media
# transforms of the training-data brief, both through the REAL container
# path — decode, transform with actual pixel indexing, re-encode, and
# re-parse the produced container so the round trip is what's verified.
# --------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.LongType(), True),
        T.StructField("out_h", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("px_min", T.LongType(), True),
        T.StructField("px_max", T.LongType(), True),
    ]
)


def resize_ppm(payload: bytes, factor: int = 2) -> bytes:
    """REAL nearest-neighbor downsample of a P6 container: parse, index
    pixels[::factor, ::factor], re-encode a valid P6 at the new
    geometry. Output pixel (x, y, c) == input pixel (factor*x, factor*y,
    c) — the exact arithmetic the SQL oracle replays byte-for-byte."""
    w, h, px, _end = _parse_ppm(payload)
    img = px.reshape(h, w, 3)
    out = img[::factor, ::factor, :]
    oh, ow = out.shape[0], out.shape[1]
    return f"P6\n{ow} {oh}\n255\n".encode() + out.tobytes()


def resize_features(media: DataFrame, factor: int = 2) -> DataFrame:
    """mapInPandas image resize: per payload, decode -> nearest-neighbor
    downsample -> re-encode -> RE-PARSE the produced container and emit
    its geometry + exact-integer channel moments. Emitting stats of the
    re-parsed output (not of the in-memory intermediate) makes the gate
    verify the whole round trip: a malformed re-encode cannot pass.
    Partition-preserving, Arrow-batched, null payload skips (the
    log-and-skip consumer analog)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    rows.append((mid, *([None] * 7)))
                    continue
                w, h, px, _ = _parse_ppm(resize_ppm(bytes(p), factor))
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        int(px[0::3].sum(dtype=np.int64)),
                        int(px[1::3].sum(dtype=np.int64)),
                        int(px[2::3].sum(dtype=np.int64)),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "out_w", "out_h",
                    "sum_r", "sum_g", "sum_b", "px_min", "px_max",
                ],
            )

    return media.mapInPandas(_resize, RESIZE_SCHEMA)


VIDEO_FRAMES = 4
_FRAME_SHIFT = 7  # frame f's pixel k = text byte (k + 7*f) % len(text)


def ppm_frame_from_text(text: str, frame: int) -> bytes:
    """Frame ``frame`` of the synthetic video: a valid P6 whose pixel k is
    the document's byte ((k + 7*frame) mod len) — each frame a small
    deterministic shift of the last, like consecutive video frames."""
    b = text.encode("utf-8")
    n = PPM_W * PPM_H * 3
    idx = (np.arange(n) + _FRAME_SHIFT * frame) % len(b)
    head = f"P6\n{PPM_W} {PPM_H}\n255\n".encode()
    return head + np.frombuffer(b, dtype=np.uint8)[idx].tobytes()


def video_from_text(text: str) -> bytes:
    """A 'video' container: VIDEO_FRAMES concatenated P6 frames. No
    public dependency-free video codec exists, so the container is the
    simplest thing a real frame parser can walk — sequential P6 frames,
    each self-describing via its own header (the MJPEG idea)."""
    return b"".join(
        ppm_frame_from_text(text, f) for f in range(VIDEO_FRAMES)
    )


def synthesize_video_from_documents(docs: DataFrame) -> DataFrame:
    """Every document becomes a VIDEO_FRAMES-frame video payload (valid
    concatenated P6 frames derived from the text), typed like the other
    media fixtures."""

    @F.pandas_udf(T.BinaryType())
    def _payload(text: pd.Series) -> pd.Series:
        return pd.Series([video_from_text(t) for t in text])

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        _payload(F.col("text")).alias("payload"),
        F.struct(
            F.lit(PPM_W).cast("int").alias("width"),
            F.lit(PPM_H).cast("int").alias("height"),
            F.lit(0).cast("int").alias("sample_rate"),
            F.lit(VIDEO_FRAMES).cast("int").alias("n_frames"),
            F.lit("video/x-ppm-frames").alias("mime"),
        ).alias("meta"),
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("px_min", T.LongType(), True),
        T.StructField("px_max", T.LongType(), True),
    ]
)


def sample_video_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """mapInPandas video frame sampling: REALLY walks the concatenated-P6
    container frame by frame (every frame is parsed to find the next
    offset — the walk fails loudly on a malformed frame), keeps every
    ``stride``-th frame, and emits per-kept-frame exact-integer channel
    moments. One input row fans out to ceil(n_frames/stride) output rows
    inside the Arrow batch — the explode happens Python-side so the
    payload binary never enters a Spark shuffle."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                buf, off, f = bytes(p), 0, 0
                while off < len(buf):
                    w, h, px, off = _parse_ppm(buf, off)
                    if f % stride == 0:
                        rows.append(
                            (
                                mid,
                                f,
                                int(px[0::3].sum(dtype=np.int64)),
                                int(px[1::3].sum(dtype=np.int64)),
                                int(px[2::3].sum(dtype=np.int64)),
                                int(px.min()),
                                int(px.max()),
                            )
                        )
                    f += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx",
                    "sum_r", "sum_g", "sum_b", "px_min", "px_max",
                ],
            )

    return media.mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.LongType(), True),
    ]
)


def ahash_features(media: DataFrame, factor: int = 2) -> DataFrame:
    """Average-hash (aHash) perceptual image fingerprint over the REAL
    resize path: decode -> nearest-neighbor downsample -> re-encode ->
    re-parse (the ``resize_features`` round trip), then per resized
    pixel a grayscale channel sum and bit i = (pixel i brighter than
    the image mean), compared by integer cross-multiplication
    (``n_pixels * gray[i] > total``) so the hash is exactly replayable
    with no float division. Emits (media_id, ahash int64); collision
    grouping happens Spark-side on the 8-byte key."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    rows.append((mid, None))
                    continue
                w, h, px, _ = _parse_ppm(resize_ppm(bytes(p), factor))
                gray = px.reshape(-1, 3).sum(axis=1, dtype=np.int64)
                total = int(gray.sum())
                bits = 0
                for i, gv in enumerate(gray[:64]):
                    if len(gray) * int(gv) > total:
                        bits |= 1 << i
                # int64 column: the classic 8x8 geometry sets bit 63, so
                # store the SIGNED reinterpretation of the 64-bit hash
                if bits >= 1 << 63:
                    bits -= 1 << 64
                rows.append((mid, bits))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.mapInPandas(_hash, AHASH_SCHEMA)
