"""Multimodal columns: image/audio/video as opaque `binary` payloads with
typed metadata, processed via Arrow-batched `mapInPandas`.

Not in the reference (text-only corpus); LLM-pipeline extension per the
builder brief. The container has no image/audio codecs, so the DECODE
step is pluggable: the default decoder is a DETERMINISTIC FAKE (byte-
histogram features), and `strict_decoder` raises NotImplementedError with
a clear message — while everything Spark-side (schema, batching,
partition preservation, UDF signatures) is real and tested.

Scale notes: payloads stay in executor Arrow batches end to end — no
collect, no base64 detours through strings; mapInPandas streams
batch-by-batch so one huge payload doesn't pin a whole partition in
memory at once.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stable across runs/engines) — the test stand-in for real blobs."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        # payload = md5 hex of the id, repeated id%7+1 times, as bytes
        F.encode(
            F.repeat(F.md5(F.col("id").cast("string")), (F.col("id") % 7 + 1).cast("int")),
            "UTF-8",
        ).alias("payload"),
        F.struct(
            (F.col("id") % 640).cast("int").alias("width"),
            (F.col("id") % 480).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.col("id") % 30 / 3.0).alias("duration_s"),
        ).alias("meta"),
    )
    return df


def byte_histogram_decoder(payload: bytes, kind: str) -> list[float]:
    """Default DETERMINISTIC FAKE decode/feature-extract: 8-bin histogram
    of byte values, L1-normalized. Stands in for a real image decode +
    embedding; same output shape and dtype contract."""
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    bins = [0] * 8
    for b in payload:
        bins[b >> 5] += 1
    total = float(len(payload))
    return [c / total for c in bins]


def strict_decoder(payload: bytes, kind: str) -> list[float]:
    """The real-decoder slot. The container ships no codecs, so this is a
    clearly-marked stub; swap in PIL/torchaudio/ffmpeg in production."""
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this environment; use byte_histogram_decoder or plug in your own "
        "Callable[[bytes, str], list[float]]"
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = byte_histogram_decoder,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow batches).

    The iterator-of-batches signature means memory is bounded by the Arrow
    batch size, not the partition size — the correct shape for multi-MB
    payloads at 100 TB.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def byte_subsample_resizer(
    payload: bytes, width: int, height: int, target_w: int, target_h: int
) -> bytes:
    """Default DETERMINISTIC FAKE resize: nearest-neighbor byte subsampling
    to exactly target_w * target_h bytes (1 'channel'), standing in for a
    real bilinear resize with the same contract — output size is a pure
    function of the TARGET, not the input."""
    n_out = target_w * target_h
    if not payload:
        return bytes(n_out)
    n_in = len(payload)
    return bytes(payload[(i * n_in) // n_out] for i in range(n_out))


def strict_resizer(
    payload: bytes, width: int, height: int, target_w: int, target_h: int
) -> bytes:
    """The real-resizer slot; the container ships no image codecs."""
    raise NotImplementedError(
        "real image resizing requires codec libraries not present in this "
        "environment; use byte_subsample_resizer or plug in your own"
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, int, int, int, int], bytes] = byte_subsample_resizer,
) -> DataFrame:
    """Resize the image rows' payloads via mapInPandas, passing non-image
    rows through untouched; meta.width/height are rewritten to the target
    on resized rows. Same bounded-memory Arrow-batch shape as
    extract_features; output schema == input schema, so the operator
    composes into any media pipeline position."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if k == "image":
                    p = resizer(p, m["width"], m["height"], target_w, target_h)
                    m = dict(m)
                    m["width"], m["height"] = target_w, target_h
                out_payload.append(p)
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return df.mapInPandas(run, schema=df.schema)


def frame_sample(df: DataFrame, frame_bytes: int = 32, every_n: int = 2) -> DataFrame:
    """'Video frame sampling' plumbing: split each payload into fixed-size
    chunks and keep every n-th — pure native expressions (sequence +
    transform + substring over binary-as-hex), no Python."""
    hexed = df.withColumn("__hex", F.hex(F.col("payload")))
    hex_chunk = 2 * frame_bytes
    n_frames = F.ceil(F.length("__hex") / hex_chunk).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.alias("frame_idx"),
            # Column.substr accepts Column positions (F.substring wants ints)
            F.col("__hex").substr(i * hex_chunk + 1, F.lit(hex_chunk)).alias("frame_hex"),
        ),
    )
    return (
        hexed.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame_hex").alias("frame_hex"))
        .filter(F.col("frame_idx") % every_n == 0)
    )
